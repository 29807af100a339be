"""Pallas kernel: ICA (inverse-compositional LK) sub-pixel flow refinement.

Per alignment tile, ``n_iter`` Gauss-Newton steps; each step bilinearly warps
the moving image at the current per-tile flow. The warp reads one contiguous
(ts+1)^2 window at offset ``tile_origin + trunc(flow)`` — DMA'd from HBM at
tile-aligned offsets and realigned with a 0/1 selection-matrix matmul
(see pallas_merge.py for the Mosaic constraints that force this shape).

Zero-fill out-of-bounds semantics are preserved exactly: the moving image is
zero-padded by ts+2 (so any partially-in-range window reads true zeros), and
fully-out-of-range windows are zeroed by the per-iteration ok flag — matching
``refine_ica``'s taps (reference ICA.py:240-243 reads 0 out of bounds, and
those zero taps DO contribute ``gradt = -ref``).

Per-tile Hessian solve terms are precomputed on the XLA side and passed via
SMEM rows; tiles with |det| < 1e-10 keep their input flow (reference
ICA.py:124-126).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT

_DMA_COLS = 256


def _dma_rows(win):
    return -(-(win + 8) // 8) * 8


def refine_ica_pallas(ref_lvl, ica_state, moving, flow, tile_size, n_iter,
                      interpret=False):
    """Drop-in for ``refine_ica`` / ``refine_ica_tiled``."""
    ny, nx, _ = flow.shape
    ts = int(tile_size)
    h, w = moving.shape
    WIN = ts + 1
    PAD = ts + 2
    ROWS = _dma_rows(WIN)

    XG = max(1, 128 // int(np.gcd(ts, 128)))
    NTXP = -(-nx // XG) * XG

    mov_pad = jnp.pad(moving, PAD)
    ph0, pw0 = mov_pad.shape
    mov_pad = jnp.pad(mov_pad, ((0, (-ph0) % ROWS + ROWS),
                                (0, (-pw0) % _DMA_COLS + _DMA_COLS)))

    def tiles(a):
        return jnp.pad(a[:ny * ts, :nx * ts],
                       ((0, 0), (0, (NTXP - nx) * ts)))

    ref_c = tiles(ref_lvl)
    gx = tiles(ica_state.gradx)
    gy = tiles(ica_state.grady)

    hs = ica_state.hessian
    a00 = hs[..., 0, 0]
    a01 = hs[..., 0, 1]
    a10 = hs[..., 1, 0]
    a11 = hs[..., 1, 1]
    det = a00 * a11 - a01 * a10
    solvable = jnp.abs(det) >= 1e-10
    det_inv = jnp.where(solvable, 1.0 / jnp.where(solvable, det, 1.0), 0.0)

    hparams = jnp.stack([det_inv, a11, a01, a10, a00,
                         flow[..., 0].astype(DEFAULT_FLOAT),
                         flow[..., 1].astype(DEFAULT_FLOAT),
                         jnp.zeros_like(det_inv)], axis=-1)
    if NTXP != nx:
        hparams = jnp.concatenate(
            [hparams, jnp.zeros((ny, NTXP - nx, 8), hparams.dtype)], axis=1)
    hparams = hparams.reshape(ny, 1, NTXP * 8).astype(DEFAULT_FLOAT)

    kernel = functools.partial(
        _ica_kernel, ts=ts, XG=XG, WIN=WIN, ROWS=ROWS, PAD=PAD,
        h=h, w=w, n_iter=int(n_iter),
        hp=mov_pad.shape[0], wp=mov_pad.shape[1])

    grid_spec = pl.GridSpec(
        grid=(ny, NTXP // XG),
        in_specs=[
            pl.BlockSpec((1, 1, NTXP * 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),    # hessian/flow params
            pl.BlockSpec(memory_space=pltpu.HBM),     # moving (padded)
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),    # ref tiles
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),    # gradx
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),    # grady
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, XG * 2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((XG, ROWS, _DMA_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((XG,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((ny, NTXP // XG, 1, XG * 2),
                                        jnp.float32),),
        interpret=interpret,
    )(hparams, mov_pad, ref_c, gx, gy)[0]

    return out.reshape(ny, NTXP, 2)[:, :nx]


def _f32_parts(x):
    """Split f32 into three exactly-bf16-representable f32 terms (h+m+l == x).

    See pallas_merge._f32_parts — lets 0/1 selection matmuls run at
    single-pass DEFAULT precision while staying bit-exact.
    """
    mask = jnp.int32(-65536)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    h = jax.lax.bitcast_convert_type(bits & mask, jnp.float32)
    r = x - h
    rbits = jax.lax.bitcast_convert_type(r, jnp.int32)
    m = jax.lax.bitcast_convert_type(rbits & mask, jnp.float32)
    return h, m, r - m


def _sel_dot(sel, x):
    h, m, l = _f32_parts(x)
    d = lambda p: jnp.dot(sel, p, preferred_element_type=jnp.float32)
    return (d(h) + d(m)) + d(l)


def _dot_sel(x, sel):
    h, m, l = _f32_parts(x)
    d = lambda p: jnp.dot(p, sel, preferred_element_type=jnp.float32)
    return (d(h) + d(m)) + d(l)


def _ica_kernel(hp_ref, mov_ref, ref_ref, gx_ref, gy_ref, out_ref,
                win_ref, sem, *, ts, XG, WIN, ROWS, PAD, h, w, n_iter, hp, wp):
    """All XG tiles advance one GN iteration together: the XG window DMAs of
    an iteration are issued back-to-back before any wait, hiding each tile's
    HBM latency behind the others' copies."""
    i = pl.program_id(0)
    jg_ = pl.program_id(1)

    # per-tile solve terms + flow state (scalar core)
    det_inv, a11, a01, a10, a00, ax, ay = [], [], [], [], [], [], []
    for t in range(XG):
        p0 = (jg_ * XG + t) * 8
        det_inv.append(hp_ref[0, 0, p0 + 0])
        a11.append(hp_ref[0, 0, p0 + 1])
        a01.append(hp_ref[0, 0, p0 + 2])
        a10.append(hp_ref[0, 0, p0 + 3])
        a00.append(hp_ref[0, 0, p0 + 4])
        ax.append(hp_ref[0, 0, p0 + 5])
        ay.append(hp_ref[0, 0, p0 + 6])

    for _ in range(n_iter):
        frac_x, frac_y, oks, dys, dxs, dmas = [], [], [], [], [], []
        for t in range(XG):
            j = jg_ * XG + t
            ix = jnp.trunc(ax[t])
            iy = jnp.trunc(ay[t])
            frac_x.append(ax[t] - ix)
            frac_y.append(ay[t] - iy)

            # window start (padded coords); clamp + ok flag for far-OOB
            Sy = i * ts + iy.astype(jnp.int32) + PAD
            Sx = j * ts + ix.astype(jnp.int32) + PAD
            Syc = jnp.clip(Sy, 0, hp - ROWS)
            Sxc = jnp.clip(Sx, 0, wp - _DMA_COLS)
            oks.append(((Syc == Sy) & (Sxc == Sx)).astype(jnp.float32))

            ry_al = (Syc // 8) * 8
            rx_al = (Sxc // 128) * 128
            dys.append(Syc - ry_al)
            dxs.append(Sxc - rx_al)
            dma = pltpu.make_async_copy(
                mov_ref.at[pl.ds(ry_al, ROWS), pl.ds(rx_al, _DMA_COLS)],
                win_ref.at[t], sem.at[t])
            dma.start()
            dmas.append(dma)

        for t in range(XG):
            dmas[t].wait()
            ii = jax.lax.broadcasted_iota(jnp.int32, (WIN, ROWS), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (WIN, ROWS), 1)
            Rsel = (jj == dys[t] + ii).astype(jnp.float32)
            ii2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, WIN), 0)
            jj2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, WIN), 1)
            Csel = (ii2 == dxs[t] + jj2).astype(jnp.float32)

            U = _sel_dot(Rsel, _dot_sel(win_ref[t], Csel)) * oks[t]

            m00 = U[:ts, :ts]
            m01 = U[:ts, 1:]
            m10 = U[1:, :ts]
            m11 = U[1:, 1:]
            top = m00 + (m01 - m00) * frac_x[t]
            bot = m10 + (m11 - m10) * frac_x[t]
            interp = top + (bot - top) * frac_y[t]

            gradt = interp - ref_ref[:, t * ts:(t + 1) * ts]
            b0 = jnp.sum(-gx_ref[:, t * ts:(t + 1) * ts] * gradt)
            b1 = jnp.sum(-gy_ref[:, t * ts:(t + 1) * ts] * gradt)

            ax[t] = ax[t] + det_inv[t] * (a11[t] * b0 - a01[t] * b1)
            ay[t] = ay[t] + det_inv[t] * (-a10[t] * b0 + a00[t] * b1)

    for t in range(XG):
        out_ref[0, 0, 0, t * 2 + 0] = ax[t]
        out_ref[0, 0, 0, t * 2 + 1] = ay[t]
