"""Noise-model-aware robustness estimation (Algs. 6-9).

Rebuild of reference robustness.py as fused elementwise/stencil jnp — zero
custom kernels needed on TPU (the reference launches 8 CUDA kernels per
frame; XLA fuses the whole chain into a few VPU passes).

Stage chain (Alg. 6, reference robustness.py:79-170):
guide image -> 3x3 local stats -> Dodgson upscale/warp to the raw grid ->
channel distance -> noise-model correction (sigma/d LUTs) -> flow
discontinuity term S -> threshold -> 5x5 local min.

Parity notes:
- the reference marks out-of-bounds warped statistics by writing ``1/0``
  (+inf) and lets the arithmetic poison downstream values so R ~ 0
  (robustness.py:387-390 "infinity will imply R = 0"). Infs/NaNs are
  hostile to vectorized min-reductions, so we carry an explicit validity
  mask instead and force R = 0 where it is unset — same intent, defined
  numerics (interior pixels are bit-identical).
- the reference kernel hardcodes the upscale factor to 2 even in grey mode
  (robustness.py:359-360 overrides the passed ``upscale``); we use the true
  factor (2 for Bayer, 1 for grey) — the IPOL-intended behavior.
- LUT indices ``round(1000 * brightness)`` are clipped to the curve domain
  [0, 1000] (the reference reads out of bounds for invalid brightness).
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops.dogson import dogson_quadratic_kernel
from ..ops.stencils import local_stats_3x3, local_min_5x5
from ..utils.types import DEFAULT_FLOAT


class RefStats(NamedTuple):
    """Reference-frame local statistics, upscaled to the raw grid."""
    means: jnp.ndarray     # (C, H, W)
    stds: jnp.ndarray      # (C, H, W) — local *variances* sigma^2, like the ref
    valid: jnp.ndarray     # (H, W) bool — False where the warp left the grid


def compute_guide_image(raw, cfa_pattern, white_balance):
    """Bayer quad -> half-res RGB with white balance undone (Alg. 7).

    ``cfa_pattern``: static 2x2 numpy int array; ``white_balance``: length-3+
    gains (indexed by channel). Returns (3, H/2, W/2).
    """
    h, w = raw.shape
    cfa = np.asarray(cfa_pattern, dtype=np.int64)
    quads = raw[: (h // 2) * 2, : (w // 2) * 2].reshape(h // 2, 2, w // 2, 2)

    chans = [None, None, None]
    green = 0.0
    for i in range(2):
        for j in range(2):
            c = int(cfa[i, j])
            x = quads[:, i, :, j] / white_balance[c]
            if c == 1:
                green = green + x
            else:
                chans[c] = x
    chans[1] = green / 2.0
    return jnp.stack(chans, axis=0).astype(DEFAULT_FLOAT)


def upscale_warp_stats(stats, upscale, tile_size=None, flow=None):
    """Dodgson-biquadratic upscale (and optional warp) of guide-grid stats.

    ``stats``: (C, h, w) on the guide grid. Returns ``(hr_stats, valid)`` with
    ``hr_stats``: (C, h*upscale, w*upscale) and ``valid`` False where the
    source coordinate fell outside the guide grid (the reference writes +inf
    there).
    """
    c, lr_h, lr_w = stats.shape
    hr_h, hr_w = lr_h * upscale, lr_w * upscale

    y = jnp.arange(hr_h, dtype=DEFAULT_FLOAT)[:, None]
    x = jnp.arange(hr_w, dtype=DEFAULT_FLOAT)[None, :]

    if flow is not None:
        ty = (jnp.arange(hr_h) // tile_size).astype(jnp.int32)
        tx = (jnp.arange(hr_w) // tile_size).astype(jnp.int32)
        flow_x = flow[ty[:, None], tx[None, :], 0]
        flow_y = flow[ty[:, None], tx[None, :], 1]
    else:
        flow_x = 0.0
        flow_y = 0.0

    lr_y = (y + flow_y + 0.5) / upscale - 0.5
    lr_x = (x + flow_x + 0.5) / upscale - 0.5

    valid = (lr_y >= 0) & (lr_y < lr_h) & (lr_x >= 0) & (lr_x < lr_w)

    cy = jnp.round(lr_y).astype(jnp.int32)
    cx = jnp.round(lr_x).astype(jnp.int32)

    acc = jnp.zeros((c, hr_h, hr_w), DEFAULT_FLOAT)
    w_acc = jnp.zeros((hr_h, hr_w), DEFAULT_FLOAT)
    for i in (-1, 0, 1):
        yy = jnp.clip(cy + i, 0, lr_h - 1)
        wy = dogson_quadratic_kernel(yy.astype(DEFAULT_FLOAT) - lr_y)
        for j in (-1, 0, 1):
            xx = jnp.clip(cx + j, 0, lr_w - 1)
            wx = dogson_quadratic_kernel(xx.astype(DEFAULT_FLOAT) - lr_x)
            wgt = wy * wx
            acc = acc + stats[:, yy, xx] * wgt[None]
            w_acc = w_acc + wgt

    return acc / w_acc[None], valid


def init_robustness(ref_raw, cfa_pattern, white_balance, config):
    """Local statistics of the reference frame, upscaled to the raw grid."""
    if not config.robustness.enabled:
        return None

    bayer = config.mode == "bayer"
    if bayer:
        guide = compute_guide_image(ref_raw, cfa_pattern, white_balance)
        upscale = 2
    else:
        guide = ref_raw[None]
        upscale = 1

    means, stds = local_stats_3x3(guide)
    hr_means, valid_m = upscale_warp_stats(means, upscale)
    hr_stds, _ = upscale_warp_stats(stds, upscale)
    return RefStats(means=hr_means, stds=hr_stds, valid=valid_m)


def apply_noise_model(d_p, ref_means, ref_stds, std_curve, diff_curve):
    """sigma^2 and d^2 maps corrected by the calibrated noise curves."""
    idx = jnp.clip(jnp.round(1000.0 * ref_means), 0, std_curve.shape[0] - 1
                   ).astype(jnp.int32)
    d_t = diff_curve[idx]
    sigma_t = std_curve[idx]

    sigma_sq = jnp.sum(jnp.maximum(ref_stds, sigma_t * sigma_t), axis=0)
    d_p_sq = d_p * d_p
    shrink = d_p_sq / (d_p_sq + d_t * d_t)
    d_sq = jnp.sum(d_p_sq * shrink * shrink, axis=0)
    return d_sq, sigma_sq


def compute_s(flow, m_th, s1, s2):
    """Flow-discontinuity map: s1 where the 3x3 flow range exceeds Mt, else s2."""
    fx = flow[..., 0]
    fy = flow[..., 1]

    def rng3(a):
        p = jnp.pad(a, 1, mode="edge")
        hi = None
        lo = None
        h, w = a.shape
        for i in range(3):
            for j in range(3):
                v = p[i:i + h, j:j + w]
                hi = v if hi is None else jnp.maximum(hi, v)
                lo = v if lo is None else jnp.minimum(lo, v)
        return hi - lo

    d0 = rng3(fx)
    d1 = rng3(fy)
    return jnp.where(d0 * d0 + d1 * d1 > m_th * m_th, s1, s2).astype(DEFAULT_FLOAT)


def compute_robustness(comp_img, ref_stats, flow, cfa_pattern, white_balance,
                       noise_curves, config):
    """Robustness map r of the compared frame, at raw resolution (Alg. 6)."""
    if not config.robustness.enabled:
        return jnp.ones(comp_img.shape, DEFAULT_FLOAT)

    bayer = config.mode == "bayer"
    tile_size = config.block_matching.tuning.tile_size
    tun = config.robustness.tuning
    std_curve, diff_curve = noise_curves

    if bayer:
        guide = compute_guide_image(comp_img, cfa_pattern, white_balance)
        upscale = 2
    else:
        guide = comp_img[None]
        upscale = 1

    comp_means, _ = local_stats_3x3(guide)
    comp_means, comp_valid = upscale_warp_stats(comp_means, upscale,
                                                tile_size=tile_size, flow=flow)

    d_p = jnp.abs(ref_stats.means - comp_means)
    d_sq, sigma_sq = apply_noise_model(d_p, ref_stats.means, ref_stats.stds,
                                       std_curve, diff_curve)

    S = compute_s(flow, tun.Mt, tun.s1, tun.s2)

    h, w = d_sq.shape
    ty = (jnp.arange(h) // tile_size).astype(jnp.int32)
    tx = (jnp.arange(w) // tile_size).astype(jnp.int32)
    s_map = S[ty[:, None], tx[None, :]]

    R = jnp.clip(s_map * jnp.exp(-d_sq / sigma_sq) - tun.t, 0.0, 1.0)
    R = jnp.where(ref_stats.valid & comp_valid, R, 0.0)
    return local_min_5x5(R)
