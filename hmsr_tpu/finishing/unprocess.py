"""Inverse ISP: JPEG-domain image -> synthetic raw (for data generation).

Rebuild of the reference's ``unprocess_isp`` chain (reference
raw2rgb.py:30-112,179-202): random CCM (convex combination of four reference
xyz2cam matrices), random gains and noise levels from the published log-log
model, inverse smoothstep, gamma expansion, inverse CCM, and safe gain
inversion. The reference's dead-code bugs (``.cllp``, ``np.tensor``,
``np.max(a, b)`` misuse) are implemented with the intended semantics.
"""

import math
import random

import numpy as np

from .raw2rgb import RGB2XYZ

XYZ2CAMS = [[[1.0234, -0.2969, -0.2266],
             [-0.5625, 1.6328, -0.0469],
             [-0.0703, 0.2188, 0.6406]],
            [[0.4913, -0.0541, -0.0202],
             [-0.613, 1.3513, 0.2906],
             [-0.1564, 0.2151, 0.7183]],
            [[0.838, -0.263, -0.0639],
             [-0.2887, 1.0725, 0.2496],
             [-0.0627, 0.1427, 0.5438]],
            [[0.6596, -0.2079, -0.0562],
             [-0.4782, 1.3016, 0.1933],
             [-0.097, 0.1581, 0.5181]]]


def get_random_ccm(rng=None):
    """Random RGB -> camera CCM (convex combination of reference CCMs)."""
    rng = rng or np.random
    weights = rng.rand(len(XYZ2CAMS), 1, 1)
    xyz2cam = (np.asarray(XYZ2CAMS) * weights).sum(axis=0) / weights.sum()
    rgb2cam = xyz2cam @ RGB2XYZ
    return rgb2cam / rgb2cam.sum(axis=-1, keepdims=True)


def get_random_noise_parameters(log_min_shot=0.0001, log_max_shot=0.012,
                                sigma_read_noise=0.26):
    """Random (shot, read) noise levels from the log-log linear model."""
    log_shot = random.uniform(math.log(log_min_shot), math.log(log_max_shot))
    shot_noise = math.exp(log_shot)
    log_read = 2.18 * log_shot + 1.20 + random.gauss(0.0, sigma_read_noise)
    return shot_noise, math.exp(log_read)


def get_random_gains():
    """Random brightening + white balance gains."""
    rgb_gain = 1.0 / random.gauss(0.8, 0.1)
    red_gain = random.uniform(1.9, 2.4)
    blue_gain = random.uniform(1.5, 1.9)
    return rgb_gain, red_gain, blue_gain


def safe_invert_gains(image, red_gain, blue_gain, rgb_gain):
    """Invert gains, smoothly protecting saturated (near-white) pixels."""
    assert image.ndim == 3 and image.shape[2] == 3
    gains = np.array([1.0 / red_gain, 1.0, 1.0 / blue_gain]) / rgb_gain
    gains = gains.reshape((1, 1, 3))
    gray = np.mean(image, axis=-1, keepdims=True)
    inflection = 0.9
    mask = (np.clip(gray - inflection, 0.0, None) / (1.0 - inflection)) ** 2
    safe_gains = np.maximum(mask + (1.0 - mask) * gains, gains)
    return image * safe_gains


def apply_gains(image, red_gain, blue_gain, rgb_gain):
    """Apply white-balance + brightness gains (forward direction)."""
    assert image.ndim == 3 and image.shape[-1] in (3, 4)
    if image.shape[-1] == 3:
        gains = np.array([red_gain, 1.0, blue_gain]) * rgb_gain
    else:
        gains = np.array([red_gain, 1.0, 1.0, blue_gain]) * rgb_gain
    return np.clip(image * gains, 0.0, 1.0)


def invert_smoothstep(image):
    """Approximate inverse of the smoothstep tone curve."""
    image = np.clip(image, 0.0, 1.0)
    return 0.5 - np.sin(np.arcsin(1.0 - 2.0 * image) / 3.0)


def gamma_expansion(img, gamma=2.2):
    return np.clip(img, 1e-8, 1.0) ** gamma


def unprocess_isp(jpg, log_max_shot=0.012):
    """JPEG-domain RGB -> synthetic linear raw RGB + metadata."""
    rgb2cam = get_random_ccm()
    cam2rgb = np.linalg.inv(rgb2cam)
    rgb_gain, red_gain, blue_gain = get_random_gains()
    lambda_shot, lambda_read = get_random_noise_parameters(
        log_max_shot=log_max_shot)
    metadata = {"rgb2cam": rgb2cam, "cam2rgb": cam2rgb, "rgb_gain": rgb_gain,
                "red_gain": red_gain, "blue_gain": blue_gain,
                "lambda_shot": lambda_shot, "lambda_read": lambda_read}

    img = invert_smoothstep(jpg)
    img = gamma_expansion(img)
    raw = np.einsum("ij,hwj->hwi", rgb2cam, img)
    raw = safe_invert_gains(raw, red_gain, blue_gain, rgb_gain)
    return raw, metadata
