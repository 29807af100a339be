"""Pallas kernel: Dodgson upscale-warp of guide-grid statistics (Alg. 6 step).

Same per-tile dense-window structure as the merge kernel
(:mod:`pallas_merge`): per alignment tile, the warped source region of the
guide grid is one contiguous window at a flow-dependent offset. The window is
DMA'd at tile-aligned offsets and realigned/up-sampled with 0/1
selection-matrix matmuls; the 3x3 Dodgson stencil then reads static slices.

Outputs the warped statistics at raw resolution (c, H, W) plus the validity
mask (1 where the warped coordinate stayed inside the guide grid — the
reference writes +inf there, robustness.py:387-390).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT
from .pallas_merge import _dot_sel, _sel_dot

_DMA_COLS = 256


def _dma_rows(win):
    return -(-(win + 8) // 8) * 8


def upscale_warp_pallas(stats, upscale, tile_size, flow, out_shape,
                        interpret=False):
    """(c, lh, lw) guide stats -> ((c, H, W) warped stats, (H, W) valid)."""
    c, lh, lw = stats.shape
    H, W = out_shape
    Ts = int(tile_size)
    u = int(upscale)
    WIN = Ts // u + 4
    PAD = WIN + 1
    SEG = Ts + 2 * u

    nty = -(-H // Ts)
    ntx = -(-W // Ts)
    assert flow.shape[0] >= nty and flow.shape[1] >= ntx, (flow.shape, nty, ntx)
    XG = max(1, 128 // int(np.gcd(Ts, 128)))
    NTXP = -(-ntx // XG) * XG

    ROWS = _dma_rows(WIN)
    stats_pad = jnp.pad(stats, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="edge")
    ph0, pw0 = stats_pad.shape[1:]
    stats_pad = jnp.pad(stats_pad,
                        ((0, 0), (0, (-ph0) % ROWS + ROWS),
                         (0, (-pw0) % _DMA_COLS + _DMA_COLS)), mode="edge")

    # per-tile params: center(Y) = (Y + m)//u with m = floor(fy + 0.5)
    fx = flow[:nty, :ntx, 0].astype(DEFAULT_FLOAT)
    fy = flow[:nty, :ntx, 1].astype(DEFAULT_FLOAT)
    ty = jnp.arange(nty, dtype=jnp.int32)[:, None]
    tx = jnp.arange(ntx, dtype=jnp.int32)[None, :]

    m_y = jnp.floor(fy + 0.5).astype(jnp.int32)
    m_x = jnp.floor(fx + 0.5).astype(jnp.int32)
    Sy = jnp.floor_divide(ty * Ts + m_y, u) - 1
    ph_y = (ty * Ts + m_y) - u * (Sy + 1)
    Sx = jnp.floor_divide(tx * Ts + m_x, u) - 1
    ph_x = (tx * Ts + m_x) - u * (Sx + 1)
    Syc = jnp.clip(Sy, -PAD, lh + PAD - WIN)
    Sxc = jnp.clip(Sx, -PAD, lw + PAD - WIN)
    ok = ((Syc == Sy) & (Sxc == Sx)).astype(jnp.int32)

    params = jnp.stack([Syc + PAD, Sxc + PAD, ph_y, ph_x,
                        Sy + 1, Sx + 1, ok, jnp.zeros_like(ok)], axis=-1)
    if NTXP != ntx:
        fill = jnp.zeros((nty, NTXP - ntx, 8), params.dtype)
        params = jnp.concatenate([params, fill], axis=1)
        fx = jnp.concatenate([fx, jnp.zeros((nty, NTXP - ntx), DEFAULT_FLOAT)], 1)
        fy = jnp.concatenate([fy, jnp.zeros((nty, NTXP - ntx), DEFAULT_FLOAT)], 1)
    params_flat = params.reshape(nty, 1, NTXP * 8)
    flow_f = jnp.stack([fx, fy], -1).reshape(nty, 1, NTXP * 2)

    kernel = functools.partial(
        _warp_kernel, u=u, Ts=Ts, XG=XG, WIN=WIN, SEG=SEG, c=c,
        lh=lh, lw=lw, H=H, W=W)

    grid_spec = pl.GridSpec(
        grid=(nty, NTXP // XG),
        in_specs=[
            pl.BlockSpec((1, 1, NTXP * 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NTXP * 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),     # stats_pad
        ],
        out_specs=[
            pl.BlockSpec((c, Ts, XG * Ts), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ts, XG * Ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, ROWS, _DMA_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    hr, valid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((c, nty * Ts, NTXP * Ts), jnp.float32),
                   jax.ShapeDtypeStruct((nty * Ts, NTXP * Ts), jnp.float32)),
        interpret=interpret,
    )(params_flat, flow_f, stats_pad)

    return hr[:, :H, :W], valid[:H, :W] > 0.5


def _warp_kernel(params_ref, flow_ref, stats_ref, hr_ref, valid_ref,
                 win_ref, sem, *, u, Ts, XG, WIN, SEG, c, lh, lw, H, W):
    i = pl.program_id(0)
    jg_ = pl.program_id(1)
    for t in range(XG):
        _warp_tile(t, i, jg_ * XG + t, params_ref, flow_ref, stats_ref,
                   hr_ref, valid_ref, win_ref, sem, u=u, Ts=Ts, WIN=WIN,
                   SEG=SEG, c=c, lh=lh, lw=lw, H=H, W=W)


def _dogson(x):
    ax = jnp.abs(x)
    near = -2.0 * ax * ax + 1.0
    mid = ax * ax - 2.5 * ax + 1.5
    return jnp.where(ax <= 0.5, near, jnp.where(ax <= 1.5, mid, 0.0))


def _warp_tile(t, i, j, params_ref, flow_ref, stats_ref, hr_ref, valid_ref,
               win_ref, sem, *, u, Ts, WIN, SEG, c, lh, lw, H, W):
    half = jnp.float32(0.5)
    p0 = j * 8
    Syp = params_ref[0, 0, p0 + 0]
    Sxp = params_ref[0, 0, p0 + 1]
    ph_y = params_ref[0, 0, p0 + 2]
    ph_x = params_ref[0, 0, p0 + 3]
    Sy1 = params_ref[0, 0, p0 + 4]
    Sx1 = params_ref[0, 0, p0 + 5]
    ok = params_ref[0, 0, p0 + 6]
    fx = flow_ref[0, 0, j * 2 + 0]
    fy = flow_ref[0, 0, j * 2 + 1]

    ry_al = (Syp // 8) * 8
    rx_al = (Sxp // 128) * 128
    dy = Syp - ry_al
    dx = Sxp - rx_al
    dma = pltpu.make_async_copy(
        stats_ref.at[:, pl.ds(ry_al, win_ref.shape[1]),
                     pl.ds(rx_al, win_ref.shape[2])], win_ref, sem)
    dma.start()

    r_loc = jax.lax.broadcasted_iota(jnp.int32, (Ts, 1), 0)
    c_loc = jax.lax.broadcasted_iota(jnp.int32, (1, Ts), 1)
    Yg = (i * Ts + r_loc).astype(jnp.float32)
    Xg = (j * Ts + c_loc).astype(jnp.float32)
    lr_y = (Yg + fy + half) / u - half                  # (Ts, 1)
    lr_x = (Xg + fx + half) / u - half                  # (1, Ts)
    valid = (((lr_y >= 0) & (lr_y < lh)) &
             ((lr_x >= 0) & (lr_x < lw)) & (ok > 0))

    center_y = Sy1 + (r_loc + ph_y) // u                # (Ts, 1) global
    center_x = Sx1 + (c_loc + ph_x) // u

    dma.wait()

    # realign + upsample: SEG = Ts + 2u rows/cols of the u-repeated window.
    # Columns first for all channels in one stacked matmul (right-to-left
    # order halves the MACs); exact bf16x3 selection matmuls (pallas_merge).
    ROWS = win_ref.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (SEG, ROWS), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (SEG, ROWS), 1)
    Rsel = (jj == dy + (ii + ph_y) // u).astype(jnp.float32)
    ii2 = jax.lax.broadcasted_iota(jnp.int32, (win_ref.shape[2], SEG), 0)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (win_ref.shape[2], SEG), 1)
    Csel = (ii2 == dx + (jj2 + ph_x) // u).astype(jnp.float32)

    acc = [jnp.zeros((Ts, Ts), jnp.float32) for _ in range(c)]
    w_acc = jnp.zeros((Ts, Ts), jnp.float32)
    Y = _dot_sel(win_ref[:].reshape(c * ROWS, win_ref.shape[2]), Csel)
    Us = [_sel_dot(Rsel, Y[ch * ROWS:(ch + 1) * ROWS]) for ch in range(c)]

    for di in (-1, 0, 1):
        yc = jnp.clip(center_y + di, 0, lh - 1).astype(jnp.float32)
        wy = _dogson(yc - lr_y)                          # (Ts, 1)
        for dj in (-1, 0, 1):
            xc = jnp.clip(center_x + dj, 0, lw - 1).astype(jnp.float32)
            wgt = wy * _dogson(xc - lr_x)                # (Ts, Ts)
            for ch in range(c):
                v = Us[ch][u * (di + 1):u * (di + 1) + Ts,
                           u * (dj + 1):u * (dj + 1) + Ts]
                acc[ch] = acc[ch] + v * wgt
            w_acc = w_acc + wgt

    inv = 1.0 / w_acc
    for ch in range(c):
        hr_ref[ch, :, t * Ts:(t + 1) * Ts] = acc[ch] * inv
    valid_ref[:, t * Ts:(t + 1) * Ts] = valid.astype(jnp.float32)
