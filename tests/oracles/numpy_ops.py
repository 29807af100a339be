"""Pure-NumPy scalar oracles for the ops layer.

Each oracle transcribes the mathematical definition from the IPOL/SIGGRAPH
papers as surveyed in SURVEY.md — deliberately slow, loopy, and independent of
the jax implementations they validate.
"""

import numpy as np


def dogson_quadratic(x):
    ax = abs(x)
    if ax <= 0.5:
        return -2 * ax * ax + 1
    if ax <= 1.5:
        return ax * ax - 2.5 * ax + 1.5
    return 0.0


def eig_2x2(m00, m01, m10, m11):
    """Sorted-by-magnitude eigenvalues + the reference's eigenvector recipe."""
    b = -(m00 + m11)
    c = m00 * m11 - m01 * m10
    delta = max(b * b - 4 * c, 0.0)
    r1 = (-b + np.sqrt(delta)) / 2
    r2 = (-b - np.sqrt(delta)) / 2
    if abs(r1) >= abs(r2):
        l1, l2 = r1, r2
    else:
        l1, l2 = r2, r1

    if m01 == 0 and m00 == m11:
        e1 = np.array([1.0, 0.0]); e2 = np.array([0.0, 1.0])
    else:
        e1 = np.array([m00 + m01 - l2, m10 + m11 - l2])
        if e1[0] == 0:
            e1 = np.array([0.0, 1.0]); e2 = np.array([1.0, 0.0])
        elif e1[1] == 0:
            e1 = np.array([1.0, 0.0]); e2 = np.array([0.0, 1.0])
        else:
            e1 = e1 / np.linalg.norm(e1)
            sign = np.copysign(1.0, e1[0])
            e2 = np.array([-e1[1] * sign, abs(e1[0])])
    return (l1, l2), e1, e2


def local_stats_3x3(img):
    """Edge-clamped 3x3 mean/variance, channel-first (C, H, W)."""
    c, h, w = img.shape
    mean = np.zeros_like(img)
    var = np.zeros_like(img)
    for ch in range(c):
        for y in range(h):
            for x in range(w):
                s = 0.0
                s2 = 0.0
                for i in range(-1, 2):
                    for j in range(-1, 2):
                        yy = min(max(y + i, 0), h - 1)
                        xx = min(max(x + j, 0), w - 1)
                        v = img[ch, yy, xx]
                        s += v
                        s2 += v * v
                m = s / 9
                mean[ch, y, x] = m
                var[ch, y, x] = s2 / 9 - m * m
    return mean, var


def local_min_5x5(img):
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            m = np.inf
            for i in range(-2, 3):
                for j in range(-2, 3):
                    yy = min(max(y + i, 0), h - 1)
                    xx = min(max(x + j, 0), w - 1)
                    m = min(m, img[yy, xx])
            out[y, x] = m
    return out


def box_sum_valid(img, k):
    h, w = img.shape
    out = np.zeros((h - k + 1, w - k + 1))
    for y in range(h - k + 1):
        for x in range(w - k + 1):
            out[y, x] = img[y:y + k, x:x + k].sum()
    return out


def fft_lowpass_grey(img):
    h, w = img.shape
    spec = np.fft.fftshift(np.fft.fft2(img))
    spec[: h // 4, :] = 0
    spec[:, : w // 4] = 0
    spec[-h // 4:, :] = 0
    spec[:, -w // 4:] = 0
    return np.real(np.fft.ifft2(np.fft.ifftshift(spec)))


def gaussian_downsample(img, factor):
    """Valid separable gaussian filter + strided subsample (reference shapes)."""
    if factor == 1:
        return img
    sigma = 0.5 * factor
    radius = int(4 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    taps = np.exp(-0.5 / sigma ** 2 * x ** 2)
    taps /= taps.sum()

    h, w = img.shape
    tmp = np.zeros((h - 2 * radius, w))
    for y in range(tmp.shape[0]):
        for xx in range(w):
            tmp[y, xx] = (img[y:y + 2 * radius + 1, xx] * taps).sum()
    out = np.zeros((tmp.shape[0], w - 2 * radius))
    for y in range(out.shape[0]):
        for xx in range(out.shape[1]):
            out[y, xx] = (tmp[y, xx:xx + 2 * radius + 1] * taps).sum()
    h2, w2 = out.shape[0] // factor, out.shape[1] // factor
    return out[:h2 * factor:factor, :w2 * factor:factor]


def halfpixel_gradients(grey):
    h, w = grey.shape
    out = np.zeros((h - 1, w - 1, 2))
    for y in range(h - 1):
        for x in range(w - 1):
            out[y, x, 0] = 0.25 * ((grey[y, x + 1] - grey[y, x]) +
                                   (grey[y + 1, x + 1] - grey[y + 1, x]))
            out[y, x, 1] = 0.25 * ((grey[y + 1, x] - grey[y, x]) +
                                   (grey[y + 1, x + 1] - grey[y, x + 1]))
    return out


def sobel_gradients(img):
    h, w = img.shape
    p = np.pad(img, 1)
    gx = p[1:-1, 2:] - p[1:-1, :-2]
    gy = p[2:, 1:-1] - p[:-2, 1:-1]
    return gx, gy
