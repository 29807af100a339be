"""Image gradient operators.

- ``sobel_gradients``: the reference's 1-D [-1, 0, 1] "Sobel" with 'same'
  zero padding (ICA.py:10-21), as shifted-slice differences.
- ``halfpixel_gradients``: the two stacked 2-tap convs of the kernel
  estimation stage (kernels.py:97-112), producing gradients sampled at
  half-pixel positions, output shape (H-1, W-1, 2).
"""

import jax.numpy as jnp


def sobel_gradients(img):
    """(gradx, grady) with gradx[y, x] = img[y, x+1] - img[y, x-1], zero-padded."""
    h, w = img.shape
    px = jnp.pad(img, ((0, 0), (1, 1)))
    py = jnp.pad(img, ((1, 1), (0, 0)))
    gradx = px[:, 2:] - px[:, :-2]
    grady = py[2:, :] - py[:-2, :]
    return gradx, grady


def halfpixel_gradients(grey):
    """Half-pixel gradients: x-diff then y-average, and x-average then y-diff.

    full_grad_x[y, x] = 0.25*((I[y, x+1] - I[y, x]) + (I[y+1, x+1] - I[y+1, x]))
    full_grad_y[y, x] = 0.25*((I[y+1, x] - I[y, x]) + (I[y+1, x+1] - I[y, x+1]))
    Returns an array of shape (H-1, W-1, 2) with [..., 0] = gx, [..., 1] = gy.
    """
    dx = 0.5 * (grey[:, 1:] - grey[:, :-1])      # (H, W-1)
    gx = 0.5 * (dx[:-1, :] + dx[1:, :])          # (H-1, W-1)
    ax = 0.5 * (grey[:, 1:] + grey[:, :-1])      # (H, W-1)
    gy = 0.5 * (ax[1:, :] - ax[:-1, :])          # (H-1, W-1)
    return jnp.stack([gx, gy], axis=-1)
