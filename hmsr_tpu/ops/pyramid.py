"""Gaussian pyramid construction.

Parity notes vs the reference (utils_image.py:360-391, alignment.py:74-82):
- kernel: the scipy ``_gaussian_kernel1d(sigma=0.5*factor, radius=int(2*factor
  + 0.5))`` taps, reimplemented locally (order 0, normalized);
- *valid* separable convolution (no padding) followed by ``x[::factor]``
  subsampling cropped to ``floor(filtered/factor)`` samples — level shapes are
  NOT ``ceil(H/factor)``; they shrink by the kernel support first;
- ``factor == 1`` bypasses filtering entirely;
- pyramid list is returned coarse -> fine like the reference's reversed list.

The convolution runs as an XLA ``conv_general_dilated`` with the subsampling
folded into the window strides (the reference filters everything then drops
rows; here the strided conv never computes them).
"""

import numpy as np
import jax.lax as lax
import jax.numpy as jnp

from ..utils.types import DEFAULT_FLOAT


def gaussian_kernel1d(sigma, radius):
    """Normalized order-0 Gaussian taps on [-radius, radius]."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    phi /= phi.sum()
    return phi.astype(np.float32)


def _conv_valid_1d(img, taps, axis, stride=1):
    """Valid correlation of a (H, W) image with 1-D taps along ``axis``."""
    k = len(taps)
    if axis == 0:
        kernel = jnp.asarray(taps).reshape(1, 1, k, 1)
        strides = (stride, 1)
    else:
        kernel = jnp.asarray(taps).reshape(1, 1, 1, k)
        strides = (1, stride)
    out = lax.conv_general_dilated(
        img[None, None].astype(DEFAULT_FLOAT), kernel.astype(DEFAULT_FLOAT),
        window_strides=strides, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0, 0]


def downsample(img, factor):
    """Gaussian blur (sigma = 0.5 * factor) + decimation by ``factor``."""
    if factor == 1:
        return img
    radius = int(4 * factor * 0.5 + 0.5)
    taps = gaussian_kernel1d(sigma=factor * 0.5, radius=radius)

    h, w = img.shape
    fh, fw = h - 2 * radius, w - 2 * radius
    h2, w2 = fh // factor, fw // factor

    out = _conv_valid_1d(img, taps, axis=0, stride=factor)
    out = _conv_valid_1d(out, taps, axis=1, stride=factor)
    # The strided conv may produce one extra sample vs the reference's
    # filter-then-slice [:h2*factor:factor]; crop to the reference shape.
    return out[:h2, :w2]


def build_gaussian_pyramid(image, factors):
    """Build the (coarse-first) Gaussian pyramid for the given factor chain."""
    pyramid = [downsample(image, factors[0])]
    for factor in factors[1:]:
        pyramid.append(downsample(pyramid[-1], factor))
    return pyramid[::-1]
