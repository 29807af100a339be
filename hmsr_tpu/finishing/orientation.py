"""EXIF orientation handling (8 cases), NumPy-side.

Same case table as the reference (utils_image.py:12-56), per
https://exiftool.org/TagNames/EXIF.html.
"""

import numpy as np


def apply_orientation(img, ori):
    if ori == 1:
        pass
    elif ori == 2:      # mirrored horizontal
        img = np.flip(img, axis=1)
    elif ori == 3:      # rotate 180
        img = np.rot90(img, k=2, axes=(0, 1))
    elif ori == 4:      # mirror vertical
        img = np.flip(img, axis=0)
    elif ori == 5:      # mirror horizontal + rotate 270 CW
        img = np.flip(img, axis=1)
        img = np.rot90(img, k=-3, axes=(0, 1))
    elif ori == 6:      # rotate 90 CW
        img = np.rot90(img, k=-1, axes=(0, 1))
    elif ori == 7:      # mirror horizontal + rotate 90 CW
        img = np.flip(img, axis=1)
        img = np.rot90(img, k=-1, axes=(0, 1))
    elif ori == 8:      # rotate 270 CW
        img = np.rot90(img, k=-3, axes=(0, 1))
    return img
