"""Dodgson quadratic interpolation kernels (vectorized).

Used by the robustness stage to upscale/warp local statistics from the guide
grid to the raw grid (reference utils_image.py:394-406). The piecewise
polynomial is evaluated branch-free with ``jnp.where`` so it fuses into the
surrounding gather stencil.
"""

import jax.numpy as jnp


def dogson_quadratic_kernel(x):
    """w(x) = -2x^2 + 1 for |x| <= 0.5 ; x^2 - 2.5|x| + 1.5 for |x| <= 1.5 ; 0."""
    ax = jnp.abs(x)
    near = -2.0 * ax * ax + 1.0
    mid = ax * ax - 2.5 * ax + 1.5
    return jnp.where(ax <= 0.5, near, jnp.where(ax <= 1.5, mid, 0.0))


def dogson_biquadratic_kernel(x, y):
    """Separable 2-D Dodgson kernel."""
    return dogson_quadratic_kernel(x) * dogson_quadratic_kernel(y)
