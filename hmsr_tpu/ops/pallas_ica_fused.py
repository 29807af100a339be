"""Fused single-kernel L1 block matching + ICA (finest alignment level).

One kernel instance runs the radius-1 L1 search AND all ``n_iter``
Gauss-Newton steps for its XG tiles — 1 launch per frame-level instead of
(1 + n_iter), eliminating 3x of per-program launch/DMA overhead at the
finest level (1488 programs at 12MP). Numerically verified on hardware
against the float64 scalar oracle (the in-kernel scalar update chain is
exact under the current Mosaic toolchain for THIS kernel; the multi-launch
architecture in pallas_ica.py remains the default for the L2 levels).

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
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT
from .pallas_ica import IcaPallasPrep, prep_ica_pallas, _xg

_DMA_COLS = 256

# group-window buffer: one DMA usually serves all XG tiles of a program
# (their windows are x-adjacent and post-block-matching flow is smooth)
_GROWS = 48
_GCOLS = 512



def _dma_rows(win):
    return -(-(win + 8) // 8) * 8




def match_l1_refine_ica_fused(ref_lvl, ica_state, moving, flow, tile_size,
                               n_iter, interpret=False, prep=None):
    """Fused finest-level stage: L1 block matching (radius 1) + ICA.

    Reference semantics (block_matching.py:126-154 of this repo's XLA path,
    itself matching reference block_matching.py:105-345 with the intended
    argmin): search windows at ``round(flow)``, zero-filled out of bounds,
    first-minimum tie-break; the matched integer flow then seeds the ICA
    Gauss-Newton loop — all inside one kernel, so the block-matching search
    reuses the ICA group-window DMA machinery instead of a separate 12MP
    pass.
    """
    return refine_ica_pallas(ref_lvl, ica_state, moving, flow, tile_size,
                             n_iter, interpret=interpret, prep=prep, bm=True)


def refine_ica_pallas(ref_lvl, ica_state, moving, flow, tile_size, n_iter,
                      interpret=False, prep=None, bm=False):
    """Drop-in for ``refine_ica`` / ``refine_ica_tiled``.

    Vmappable over (moving, flow): the custom-vmap rule falls back to a
    sequential ``lax.map`` per frame (this kernel serves the launch-bound
    coarse levels; a native frames-folded grid is the next step)."""
    if prep is None:
        prep = prep_ica_pallas(ref_lvl, ica_state, flow.shape, tile_size)
    fn = _fused_cv(int(tile_size), int(n_iter), bool(interpret), bool(bm))
    return fn(prep, moving, flow)


@functools.lru_cache(maxsize=None)
def _fused_cv(ts, n_iter, interpret, bm):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(prep, moving, flow):
        return _refine_fused_impl(prep, moving, flow, ts, n_iter,
                                  interpret, bm)

    @fn.def_vmap
    def rule(axis_size, in_batched, prep, moving, flow):
        from .pallas_ica import _seq_map
        return _seq_map(fn, in_batched, (prep, moving, flow)), True

    return fn


def _refine_fused_impl(prep, moving, flow, tile_size, n_iter,
                       interpret, bm):
    ny, nx, _ = flow.shape
    ts = int(tile_size)
    h, w = moving.shape
    WIN = ts + 1
    PAD = ts + 2
    ROWS = _dma_rows(WIN)

    XG = _xg(ts)
    NTXP = -(-nx // XG) * XG

    mov_pad = jnp.pad(moving,
                      ((PAD, PAD + (-(h + 2 * PAD)) % ROWS + ROWS),
                       (PAD, PAD + (-(w + 2 * PAD)) % _DMA_COLS + _DMA_COLS)))

    ref_c, gx, gy = prep.ref_c, prep.gx, prep.gy

    fpad = ((0, 0), (0, NTXP - nx), (0, 0)) if NTXP != nx else None
    fl = flow.astype(DEFAULT_FLOAT)
    fl = jnp.pad(fl, fpad) if fpad else fl
    hparams = prep.hstatic.at[..., 5].set(fl[..., 0]).at[..., 6].set(fl[..., 1])
    hparams = hparams.reshape(ny, 1, NTXP * 8)

    SWIN = ts + 3                     # BM window (ts+2) + ICA shift reach
    kernel = functools.partial(
        _ica_kernel, ts=ts, XG=XG, WIN=WIN, ROWS=ROWS, PAD=PAD,
        h=h, w=w, n_iter=int(n_iter), bm=bm, SWIN=SWIN,
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
            pltpu.VMEM((XG, ROWS, _DMA_COLS), jnp.float32),   # per-tile bufs
            pltpu.VMEM((_GROWS, _GCOLS), jnp.float32),        # group window
            pltpu.VMEM((WIN, XG * WIN), jnp.float32),         # U slab
            pltpu.VMEM((SWIN, XG * SWIN), jnp.float32),       # BM search slab
            pltpu.SemaphoreType.DMA((XG,)),
            pltpu.SemaphoreType.DMA(()),
        ] + ([pltpu.VMEM((_GROWS + 8, XG * max(WIN, SWIN)), jnp.float32)]
             if _REALIGN == "slice" else []),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((ny, NTXP // XG, 1, XG * 2),
                                        jnp.float32),),
        interpret=interpret,
    )(hparams, mov_pad, ref_c, gx, gy)[0]

    return out.reshape(ny, NTXP, 2)[:, :nx]


# exact bf16x3 selection matmuls (shared with the merge kernel), plus the
from .pallas_merge import _dot_sel, _sel_dot, _dyn_rows  # noqa: E402
from .pallas_ica import _REALIGN  # noqa: E402  (per-family knob: slice)


def _ica_kernel(hp_ref, mov_ref, ref_ref, gx_ref, gy_ref, out_ref,
                win_ref, gwin_ref, u_ref, ub_ref, sem, sem_g, *refs,
                ts, XG, WIN, ROWS, PAD, h, w, n_iter, bm, SWIN, hp, wp):
    """One GN iteration for all XG tiles of a program at a time.

    Fast path: the XG windows are x-adjacent and post-block-matching flow is
    smooth, so ONE group DMA (``_GROWS x _GCOLS``) usually covers them all;
    per-tile realignment then happens inside VMEM (one column-selection
    matmul for the whole group + either a dynamic sublane slice per tile —
    the default, see pallas_merge — or a tiny row-selection matmul).
    When the per-tile windows don't fit the group buffer (wild flow), an
    exact per-tile-DMA fallback fills the same U slab. The bilinear taps /
    Gauss-Newton updates read the slab with full-width VPU ops either way.

    With ``bm=True`` an L1 block-matching prologue (radius 1, reference
    zero-fill + first-min semantics) runs first on the same machinery.
    """
    x_ref = refs[0] if refs else None
    i = pl.program_id(0)
    jg_ = pl.program_id(1)
    SLAB = XG * WIN

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

    def realign(u_dst, Sys, Sxs, oks, VW):
        """Fill the (VW, XG*VW) slab ``u_dst`` with the per-tile windows at
        (Sys[t], Sxs[t]): group-DMA fast path + per-tile-DMA fallback."""
        SL = XG * VW
        min_y = max_y = Sys[0]
        min_x = max_x = Sxs[0]
        for t in range(1, XG):
            min_y = jnp.minimum(min_y, Sys[t])
            max_y = jnp.maximum(max_y, Sys[t])
            min_x = jnp.minimum(min_x, Sxs[t])
            max_x = jnp.maximum(max_x, Sxs[t])
        # clip-then-align keeps offsets provably 8/128-divisible for Mosaic
        gby = (jnp.clip(min_y, 0, hp - _GROWS) // 8) * 8
        gbx = (jnp.clip(min_x, 0, wp - _GCOLS) // 128) * 128
        fit = (((max_y - gby) <= _GROWS - VW) &
               ((max_x - gbx) <= _GCOLS - VW))

        # speculative group fetch (wasted only on the rare non-fit path)
        gdma = pltpu.make_async_copy(
            mov_ref.at[pl.ds(gby, _GROWS), pl.ds(gbx, _GCOLS)],
            gwin_ref, sem_g)
        gdma.start()
        gdma.wait()

        @pl.when(fit)
        def _():
            # column realignment of ALL tiles in one selection matmul
            dxv = jnp.zeros((1, SL), jnp.int32)
            dyl = []
            lv = jax.lax.broadcasted_iota(jnp.int32, (1, SL), 1) // VW
            for t in range(XG):
                dxv = dxv + (Sxs[t] - gbx) * (lv == t).astype(jnp.int32)
                dyl.append(Sys[t] - gby)
            ci = jax.lax.broadcasted_iota(jnp.int32, (_GCOLS, SL), 0)
            cj = jax.lax.broadcasted_iota(jnp.int32, (_GCOLS, SL), 1)
            Call = (ci == dxv + (cj % VW)).astype(jnp.float32)
            X = _dot_sel(gwin_ref[:], Call)               # (_GROWS, SL)
            # VW > _GROWS -> fit statically impossible; keep the shape-valid
            # matmul form for the dead branch
            if x_ref is not None and VW + 8 <= x_ref.shape[0]:
                # pure-shift row realignment: dynamic sublane slice per tile
                x_ref[:_GROWS, :SL] = X
                for t in range(XG):
                    U = _dyn_rows(x_ref, dyl[t], VW, t * VW, VW)
                    u_dst[:, t * VW:(t + 1) * VW] = (
                        U * oks[t] if oks is not None else U)
            else:
                ri = jax.lax.broadcasted_iota(jnp.int32, (VW, _GROWS), 0)
                rj = jax.lax.broadcasted_iota(jnp.int32, (VW, _GROWS), 1)
                for t in range(XG):
                    Rsel = (rj == dyl[t] + ri).astype(jnp.float32)
                    U = _sel_dot(Rsel, X[:, t * VW:(t + 1) * VW])
                    u_dst[:, t * VW:(t + 1) * VW] = (
                        U * oks[t] if oks is not None else U)

        @pl.when(jnp.logical_not(fit))
        def _():
            rys, rxs = [], []
            for t in range(XG):
                rys.append((Sys[t] // 8) * 8)
                rxs.append((Sxs[t] // 128) * 128)
                pltpu.make_async_copy(
                    mov_ref.at[pl.ds(rys[t], ROWS), pl.ds(rxs[t], _DMA_COLS)],
                    win_ref.at[t], sem.at[t]).start()
            ii = jax.lax.broadcasted_iota(jnp.int32, (VW, ROWS), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (VW, ROWS), 1)
            ii2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, VW), 0)
            jj2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, VW), 1)
            for t in range(XG):
                pltpu.make_async_copy(
                    mov_ref.at[pl.ds(rys[t], ROWS), pl.ds(rxs[t], _DMA_COLS)],
                    win_ref.at[t], sem.at[t]).wait()
                Rsel = (jj == (Sys[t] - rys[t]) + ii).astype(jnp.float32)
                Csel = (ii2 == (Sxs[t] - rxs[t]) + jj2).astype(jnp.float32)
                U = _sel_dot(Rsel, _dot_sel(win_ref[t], Csel))
                u_dst[:, t * VW:(t + 1) * VW] = (
                    U * oks[t] if oks is not None else U)

    if bm:
        # ---- L1 block-matching prologue (radius 1): search windows at
        # round(flow)-1; zero-fill OOB comes from the ts+2 zero pad, which
        # equals the reference search pad (ts+2r with r=1).
        ix0s, iy0s, Wys, Wxs = [], [], [], []
        for t in range(XG):
            j = jg_ * XG + t
            ix0 = jnp.round(ax[t])
            iy0 = jnp.round(ay[t])
            ix0s.append(ix0)
            iy0s.append(iy0)
            Tby = i * ts + iy0.astype(jnp.int32) - 1
            Tbx = j * ts + ix0.astype(jnp.int32) - 1
            Wys.append(jnp.clip(Tby, -PAD, h) + PAD)
            Wxs.append(jnp.clip(Tbx, -PAD, w) + PAD)
        realign(ub_ref, Wys, Wxs, None, SWIN)

        # the column-extraction tap depends only on sx: extract the 3
        # full-height slabs once (3 matmuls instead of 9); the sy shift is
        # then a free row slice.
        bi = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, XG * ts), 0)
        bj = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, XG * ts), 1)
        bsrc = (bj // ts) * SWIN + (bj % ts)
        cols = []
        for sx in range(3):
            tap = (bi == bsrc + sx).astype(jnp.float32)
            cols.append(_dot_sel(ub_ref[:], tap))         # (SWIN, XG*ts)
        best = [None] * XG
        bdx = [None] * XG
        bdy = [None] * XG
        for sy in range(3):
            for sx in range(3):
                D = jnp.abs(ref_ref[:] - cols[sx][sy:sy + ts])
                for t in range(XG):
                    e = jnp.sum(D[:, t * ts:(t + 1) * ts])
                    if sy == 0 and sx == 0:
                        best[t] = e
                        bdy[t] = jnp.float32(-1.0)
                        bdx[t] = jnp.float32(-1.0)
                    else:
                        u = e < best[t]                   # first-min ties
                        best[t] = jnp.where(u, e, best[t])
                        bdy[t] = jnp.where(u, jnp.float32(sy - 1), bdy[t])
                        bdx[t] = jnp.where(u, jnp.float32(sx - 1), bdx[t])
        for t in range(XG):
            ax[t] = ix0s[t] + bdx[t]
            ay[t] = iy0s[t] + bdy[t]

    # constant tap-selection matrices: slab col j of the (.., XG*ts) tap
    # plane reads U-slab col (j//ts)*WIN + j%ts (+1 for the right tap)
    ti = jax.lax.broadcasted_iota(jnp.int32, (SLAB, XG * ts), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (SLAB, XG * ts), 1)
    tsrc = (tj // ts) * WIN + (tj % ts)
    tap0 = (ti == tsrc).astype(jnp.float32)
    tap1 = (ti == tsrc + 1).astype(jnp.float32)

    # per-tile lane masks for broadcasting scalars across the tap plane
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, XG * ts), 1) // ts

    for _ in range(n_iter):
        # ---- scalar phase: per-tile window origins
        frac_x, frac_y, oks, Sys, Sxs = [], [], [], [], []
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
            Sys.append(Syc)
            Sxs.append(Sxc)

        realign(u_ref, Sys, Sxs, oks, WIN)

        # ---- shared slab phase: bilinear taps + GN right-hand sides
        fxv = jnp.zeros((1, XG * ts), jnp.float32)
        fyv = jnp.zeros((1, XG * ts), jnp.float32)
        for t in range(XG):
            m = (lane == t).astype(jnp.float32)
            fxv = fxv + frac_x[t] * m
            fyv = fyv + frac_y[t] * m

        Uslab = u_ref[:]
        m00 = _dot_sel(Uslab[:ts], tap0)
        m01 = _dot_sel(Uslab[:ts], tap1)
        m10 = _dot_sel(Uslab[1:WIN], tap0)
        m11 = _dot_sel(Uslab[1:WIN], tap1)
        top = m00 + (m01 - m00) * fxv
        bot = m10 + (m11 - m10) * fxv
        interp = top + (bot - top) * fyv                  # (ts, XG*ts)

        gradt = interp - ref_ref[:]
        P0 = -gx_ref[:] * gradt
        P1 = -gy_ref[:] * gradt
        for t in range(XG):
            b0 = jnp.sum(P0[:, t * ts:(t + 1) * ts])
            b1 = jnp.sum(P1[:, t * ts:(t + 1) * ts])
            ax[t] = ax[t] + det_inv[t] * (a11[t] * b0 - a01[t] * b1)
            ay[t] = ay[t] + det_inv[t] * (-a10[t] * b0 + a00[t] * b1)

    for t in range(XG):
        out_ref[0, 0, 0, t * 2 + 0] = ax[t]
        out_ref[0, 0, 0, t * 2 + 1] = ay[t]
