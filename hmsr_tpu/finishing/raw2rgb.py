"""Finishing ISP: color correction, sharpening, tone mapping, gamma.

Rebuild of reference raw2rgb.py:115-250 without skimage (scipy-based unsharp
mask with the same definition as ``skimage.filters.unsharp_mask``: gaussian
blur with sigma=radius, nearest-boundary, ``img + amount*(img - blurred)``).
Exposure-fusion tone mapping uses OpenCV's Mertens merge exactly like the
reference (raw2rgb.py:153-170), gated on cv2 availability.
"""

import warnings

import numpy as np
from scipy.ndimage import gaussian_filter

RGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                    [0.2126729, 0.7151522, 0.0721750],
                    [0.0193339, 0.1191920, 0.9503041]])


def get_color_matrix(xyz2cam=None):
    """Row-normalized RGB -> camera CCM from an xyz2cam matrix."""
    if xyz2cam is None or np.linalg.norm(xyz2cam) == 0:
        print("Warning -- CCM not found or given. Use eye matrix instead.")
        rgb2cam = RGB2XYZ
    else:
        rgb2cam = np.asarray(xyz2cam)[:3] @ RGB2XYZ
    rgb2cam = rgb2cam / rgb2cam.sum(axis=-1, keepdims=True)
    return rgb2cam.astype(np.float32)


def apply_ccm(image, ccm):
    assert image.ndim == 3 and image.shape[-1] == 3
    return np.einsum("ij,hwj->hwi", ccm, image)


def gamma_compression(img, gamma=2.2):
    return np.clip(img, 0.0, 1.0) ** (1.0 / gamma)


def unsharp_mask(img, radius, amount):
    """Per-channel unsharp masking (skimage-compatible definition)."""
    blurred = np.stack([gaussian_filter(img[..., c], sigma=radius, mode="nearest")
                        for c in range(img.shape[-1])], -1)
    return img + amount * (img - blurred)


def apply_smoothstep(image):
    """Mertens exposure-fusion tone mapping + smoothstep (reference recipe)."""
    try:
        import cv2
    except ImportError:
        warnings.warn("cv2 unavailable; falling back to plain smoothstep tonemap")
        image = np.clip(image, 0.0, 1.0)
        return 3 * image ** 2 - 2 * image ** 3
    times = [1, 0.5, 2]
    images = [(np.clip(image * t, 0, 1) * 255).astype(np.uint8) for t in times]
    merge_mertens = cv2.createMergeMertens()
    out = merge_mertens.process(images).astype(np.float32)
    return 3 * out ** 2 - 2 * out ** 3


def devignette(image):
    """Inverse cos^4 vignetting model (reference raw2rgb.py:204-210)."""
    h, w, _ = image.shape
    vf = np.abs(np.linspace(-h / w * np.pi / 2, h / w * np.pi / 2, h))
    vf = np.outer(vf, np.abs(np.linspace(-np.pi / 2, np.pi / 2, w)))
    return (2 - np.cos(vf) ** 4)[:, :, None] * image


def postprocess(img, do_color_correction=True, do_tonemapping=True,
                do_gamma=True, sharpening_config=None, do_devignette=False,
                xyz2cam=None):
    """Host-side finishing chain on the merged linear image (H, W, 3)."""
    img = np.asarray(img, dtype=np.float32)
    if do_color_correction:
        rgb2cam = get_color_matrix(xyz2cam)
        cam2rgb = np.linalg.inv(rgb2cam)
        img = np.clip(apply_ccm(img, cam2rgb), 0.0, 1.0)
    if sharpening_config is not None and sharpening_config.get("enabled", False):
        radius = sharpening_config.get("radius", 3)
        amount = sharpening_config.get("amount", 0.5)
        img = unsharp_mask(img, radius=radius, amount=amount)
    if do_devignette:
        img = devignette(img)
    if do_tonemapping:
        img = apply_smoothstep(img)
    img = np.clip(img, 0.0, 1.0)
    if do_gamma:
        img = gamma_compression(img)
    return np.clip(img, 0.0, 1.0)
