"""Raw (CFA) -> grey conversions.

Two methods, mirroring the reference (Alg. 3 and the decimation kernel,
reference utils_image.py:58-115,346-357):

- ``fft_lowpass_grey``: zero the outer quarter of the centered 2-D spectrum
  and take the real part of the inverse transform. Implemented as a single
  complex FFT + multiplicative mask + inverse FFT (one runtime, no
  Torch<->Numba handoff).
- ``decimate_to_grey``: 2x2 Bayer-quad mean, a reshape-reduce (no kernel
  needed; XLA fuses it).
"""

import numpy as np
import jax.numpy as jnp

from ..utils.types import DEFAULT_FLOAT


def _lowpass_mask(h, w):
    """Binary keep-mask replicating the reference's slice-zeroing exactly.

    The reference zeroes ``[: h//4]`` and ``[-h//4 :]`` — note that
    ``-h//4`` is ``(-h)//4`` (floor), making the band asymmetric for
    non-multiple-of-4 sizes; we reproduce those exact slices.
    """
    my = np.ones((h, 1), dtype=np.float32)
    mx = np.ones((1, w), dtype=np.float32)
    my[: h // 4] = 0.0
    my[-h // 4:] = 0.0
    mx[:, : w // 4] = 0.0
    mx[:, -w // 4:] = 0.0
    return my * mx


def fft_lowpass_grey(img):
    """Low-pass grey image via spectral masking (Alg. 3).

    Evaluated with a real-to-complex rfft2 (half the FFT work of the
    reference's complex path): for a real input, taking the real part of
    ``ifft2(M * fft2(x))`` equals ``irfft2(Msym * rfft2(x))`` with the
    Hermitian-symmetrized mask ``Msym = (M(k) + M(-k)) / 2`` — M is 0/1 and
    only asymmetric on the band edge rows/cols for non-multiple-of-4 sizes,
    where Msym takes the value 1/2.
    """
    h, w = img.shape
    mask = _lowpass_mask(h, w)
    # unshifted, Hermitian-symmetrized mask, cropped to the rfft half-plane
    m_u = np.fft.ifftshift(mask)
    m_sym = 0.5 * (m_u + m_u[np.ix_((-np.arange(h)) % h, (-np.arange(w)) % w)])
    m_half = jnp.asarray(m_sym[:, : w // 2 + 1].astype(np.float32))
    spec = jnp.fft.rfft2(img.astype(DEFAULT_FLOAT))
    out = jnp.fft.irfft2(spec * m_half, s=(h, w))
    return out.astype(DEFAULT_FLOAT)


def decimate_to_grey(img):
    """2x2 mean over each Bayer quad -> (h/2, w/2) grey image."""
    h, w = img.shape
    quads = img[: (h // 2) * 2, : (w // 2) * 2].reshape(h // 2, 2, w // 2, 2)
    return jnp.mean(quads, axis=(1, 3)).astype(DEFAULT_FLOAT)


def compute_grey_image(img, method):
    """Dispatch on the grey method name used by the config."""
    if method == "FFT":
        return fft_lowpass_grey(img)
    if method == "decimating":
        return decimate_to_grey(img)
    raise NotImplementedError(f"Unknown grey method {method}")
