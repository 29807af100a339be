"""Image comparison metrics (RMSE / PSNR).

Numerical parity with the reference helpers (reference
utils_image.py:408-437), reimplemented in NumPy without the unsigned-cast
machinery (inputs here are float arrays in [0, 1]).
"""

import numpy as np


def compute_rmse(image1, image2):
    """Root mean square error between two same-shaped images."""
    image1 = np.asarray(image1, dtype=np.float64)
    image2 = np.asarray(image2, dtype=np.float64)
    assert image1.shape == image2.shape, "images have different sizes"
    err = image1 - image2
    return float(np.sqrt(np.mean(err * err)))


def compute_psnr(image, noisy_image, max_value=1.0):
    """Peak signal-to-noise ratio between a clean and a noisy image."""
    image = np.asarray(image, dtype=np.float64)
    noisy_image = np.asarray(noisy_image, dtype=np.float64)
    if image.shape != noisy_image.shape:
        return None
    mse = np.mean((image - noisy_image) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_value ** 2 / mse))
