"""Synthetic raw burst generation with known ground truth.

Inverse-ISP-style burst simulator (in the spirit of the reference's
``unprocess_isp``, raw2rgb.py:179-202, and its Monte-Carlo noise model): take
a band-limited ground-truth linear RGB image, apply known sub-pixel shifts,
area-downsample to the sensor grid, mosaic through the CFA, and add
signal-dependent Gaussian noise ``std^2 = alpha*I + beta``.

This provides end-to-end accuracy tests and benchmarks with zero DNG
dependencies: ground truth is exact, shifts are known, and the noise model
matches the pipeline's calibration assumptions.
"""

import numpy as np

DEFAULT_CFA = np.array([[0, 1], [1, 2]])      # RGGB


def smooth_rgb(h, w, seed=0, detail=8, bandwidth=0.1):
    """Band-limited random linear-RGB image in [0.1, 0.9], shape (h, w, 3).

    ``bandwidth`` is the spectral cutoff in cycles/pixel on THIS grid; keep it
    below 0.5/sr_factor so the downsampled burst can represent the scene and
    reconstruction error measures the pipeline, not irrecoverable aliasing.

    Scene statistics are natural-image-like: a 1/f amplitude spectrum (knee at
    ``1/(4*detail)`` cycles/pixel) with a raised-cosine taper to exactly zero
    at ``bandwidth`` (no brick-wall ringing), a shared-luminance structure, and
    lower-bandwidth chroma — so demo outputs look like smooth colored terrain
    with fine detail rather than i.i.d. confetti, while alignment/merge still
    see energy at every representable scale.
    """
    rng = np.random.RandomState(seed)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.hypot(fy, fx)

    def field(cutoff):
        amp = 1.0 / (r + 1.0 / (4.0 * detail))
        t = np.clip(r / cutoff, 0.0, 1.0)
        amp = amp * 0.5 * (1.0 + np.cos(np.pi * t))
        amp[r >= cutoff] = 0.0
        x = np.real(np.fft.ifft2(amp * np.exp(2j * np.pi * rng.rand(h, w))))
        return x / (x.std() + 1e-9)

    luma = field(bandwidth)
    c1 = field(bandwidth / 4)
    c2 = field(bandwidth / 4)
    up = np.stack([luma + 0.5 * c1,
                   luma - 0.25 * c1 + 0.35 * c2,
                   luma - 0.45 * c2], -1)
    up = (up - up.min()) / (up.max() - up.min() + 1e-9)
    return (0.1 + 0.8 * up).astype(np.float32)


def spectral_shift(img, dx, dy):
    """img shifted so that out[y, x] = img[y - dy, x - dx] (periodic)."""
    h, w = img.shape[:2]
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    phase = np.exp(-2j * np.pi * (fy * dy + fx * dx))
    if img.ndim == 2:
        return np.real(np.fft.ifft2(np.fft.fft2(img) * phase))
    return np.stack([np.real(np.fft.ifft2(np.fft.fft2(img[..., c]) * phase))
                     for c in range(img.shape[-1])], -1)


def mosaic(rgb, cfa=DEFAULT_CFA):
    """Sample one CFA channel per pixel -> (H, W) raw."""
    h, w, _ = rgb.shape
    raw = np.zeros((h, w), np.float32)
    for i in range(2):
        for j in range(2):
            raw[i::2, j::2] = rgb[i::2, j::2, int(cfa[i, j])]
    return raw


def area_downsample(img, factor):
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    if img.ndim == 2:
        return img[:h2 * factor, :w2 * factor].reshape(
            h2, factor, w2, factor).mean(axis=(1, 3))
    return img[:h2 * factor, :w2 * factor].reshape(
        h2, factor, w2, factor, -1).mean(axis=(1, 3))


def make_synthetic_burst(h, w, n_frames, alpha=1.8e-4, beta=3.0e-6, seed=0,
                         max_shift=2.0, cfa=DEFAULT_CFA, grey=False, sr_factor=2):
    """Build (ref_raw, comp_raws, ground_truth, shifts).

    The ground truth lives on an ``sr_factor``-times finer grid than the raw
    frames (shape (h*sr, w*sr, 3) — or (h*sr, w*sr) in grey mode), so x2 SR
    outputs can be scored directly against it. Frame 0 (the reference) has
    zero shift; shifts are expressed in raw-pixel units.
    """
    rng = np.random.RandomState(seed)
    hr_h, hr_w = h * sr_factor, w * sr_factor
    truth = smooth_rgb(hr_h, hr_w, seed=seed)
    if grey:
        truth = truth.mean(-1)

    shifts = np.zeros((n_frames, 2), np.float32)
    shifts[1:] = rng.uniform(-max_shift, max_shift, size=(n_frames - 1, 2))

    frames = []
    for n in range(n_frames):
        dx, dy = shifts[n]
        hr_shifted = spectral_shift(truth, dx * sr_factor, dy * sr_factor)
        lr = area_downsample(hr_shifted, sr_factor)
        raw = lr if grey else mosaic(lr.astype(np.float32), cfa)
        noise = np.sqrt(np.maximum(alpha * raw + beta, 0)) * \
            rng.randn(*raw.shape)
        frames.append(np.clip(raw + noise, 0.0, 1.0).astype(np.float32))

    return frames[0], np.stack(frames[1:]), truth, shifts
