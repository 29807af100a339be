"""Pallas kernels: block matching + ICA (inverse-compositional LK) refinement.

Per alignment tile, block matching (L1 radius 1 / L2 radius r) followed by
``n_iter`` Gauss-Newton steps; each step bilinearly warps the moving image at
the current per-tile flow through one contiguous (ts+1)^2 window DMA'd from
HBM at tile-aligned offsets and realigned with 0/1 selection-matrix matmuls
(see pallas_merge.py for the Mosaic constraints that force this shape).

Architecture note (hard-won on hardware): kernels follow the merge kernel's
proven dataflow — per-tile scalars enter ONLY through SMEM *inputs*
(precomputed in XLA from the flow), and reductions leave ONLY through vector
outputs. An earlier single-kernel design updated the flow with in-kernel
scalar reductions (VPU sum -> scalar -> next window address); that chain
MISCOMPILES under the current Mosaic toolchain (wrong flows on every tile,
compiled only — interpret mode exact; store-based workarounds shift but do
not fix it). The per-iteration XLA glue (2x2 solve, trunc, window clipping)
is a few ops on (ny, nx) arrays and fuses into the surrounding program.

Zero-fill out-of-bounds semantics are preserved exactly: the moving image is
zero-padded by ts+2 (so any partially-in-range window reads true zeros), and
fully-out-of-range windows are zeroed by the per-tile ok lane mask — matching
``refine_ica``'s taps (reference ICA.py:240-243 reads 0 out of bounds, and
those zero taps DO contribute ``gradt = -ref``). Tiles with |det| < 1e-10
keep their input flow (reference ICA.py:124-126).
"""

import functools
import os as _os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT

_DMA_COLS = 256

# group-window buffer: one DMA usually serves all XG tiles of a program
# (their windows are x-adjacent and post-block-matching flow is smooth)
_GROWS = 48
_GCOLS = 512

# program width multiplier: XG = mult * (128 / gcd(ts, 128)) tiles per
# program — bigger programs amortize per-program scalar/DMA overhead over
# more tiles (lane width XG*ts stays a multiple of 128). Default 2:
# measured -6% on the in-scan align stage at 12MP with coherent flow
# (worse on adversarial random flow, where the group fallback dominates).
_XG_MULT = max(1, int(_os.environ.get("HMSR_ICA_XG", "2")))

# program HEIGHT: YG tile ROWS per program (sublane batching). The fine
# alignment levels are bound by per-program fixed cost (~3-5 us: grid
# dispatch, DMA waits, tiny-matmul latency), not by vector throughput —
# stacking tile rows into the sublane dimension amortizes that cost over
# YG x more tiles and makes every realign/tap matmul YG x taller (the MXU
# prefers tall operands). Capped at 4 (2 output rows per tile row must fit
# the (8, 128) out block) and requires the vectorized parameter planes.
_YG_MULT = max(1, int(_os.environ.get("HMSR_ICA_YG", "4")))


#: DIAGNOSTIC ONLY (tools/bisect_pipeline.py): stub out parts of the GN-step
#: kernel to attribute its per-program fixed cost. Every variant zeroes the
#: flow UPDATE (out multiplied by a runtime 0 the compiler can't fold), so
#: the flow stays frozen at its block-matching seed and all variants see
#: identical, coherent window-DMA patterns — deltas between variants are
#: then pure phase costs. Cumulative stripping:
#:   "zero"      full work, zeroed update (the diag family baseline)
#:   "notap"     + skip the tap-matmul/bilinear/residual phase
#:   "norealign" + skip the realign matmuls/slices (slab left stale)
#:   "nodma"     + skip the group-window DMA issue/wait as well
#: Output is WRONG under any non-empty value, so (like tpu.rob_trunc) it
#: refuses to run unless the profiling harness also sets HMSR_DEBUG_TRUNC=1.
def _read_diag():
    diag = _os.environ.get("HMSR_ICA_DIAG", "")
    if diag and _os.environ.get("HMSR_DEBUG_TRUNC") != "1":
        raise ValueError(
            "HMSR_ICA_DIAG is a profiling-only knob that stubs out parts "
            "of the ICA GN-step kernel (output becomes meaningless). Unset "
            "it, or set HMSR_DEBUG_TRUNC=1 if you are attributing "
            "performance.")
    return diag


_DIAG = _read_diag()


def _xg(ts):
    return _XG_MULT * max(1, 128 // int(np.gcd(int(ts), 128)))


def _yg(ts):
    if not _PARAMVEC:
        return 1
    return max(1, min(_YG_MULT, 64 // int(ts), 4))


#: tile-count threshold above which ``align`` picks these kernels over the
#: tiled XLA path. 1 == every level: the restructured kernels are correct
#: and fast at any grid size, and on the TPU backend the XLA paths' tiny
#: coarse levels were measured at ~20 ms/frame of in-scan time (per-op
#: overhead + gather lowering), dwarfing the extra Mosaic compiles.
PALLAS_ICA_MIN_TILES = 1


def _dma_rows(win):
    return -(-(win + 8) // 8) * 8


class IcaPallasPrep(NamedTuple):
    """Per-burst constants of the Pallas ICA kernels (precompute once in
    ``init_alignment`` — recomputing them per frame costs ~50ms of pad/copy
    at 12MP that XLA cannot hoist out of the per-frame program)."""
    ref_c: jnp.ndarray      # (ny*ts, NTXP*ts) reference tiles, padded
    gx: jnp.ndarray
    gy: jnp.ndarray
    hstatic: jnp.ndarray    # (ny, NTXP, 8) solve terms; slots 5,6 zero


def prep_ica_pallas(ref_lvl, ica_state, flow_shape, tile_size):
    """Precompute the flow-independent kernel operands."""
    ny, nx, _ = flow_shape
    ts = int(tile_size)
    XG = _xg(ts)
    NTXP = -(-nx // XG) * XG
    nyP = -(-ny // _yg(ts)) * _yg(ts)   # row padding for the YG row blocks

    def tiles(a):
        return jnp.pad(a[:ny * ts, :nx * ts],
                       ((0, (nyP - ny) * ts), (0, (NTXP - nx) * ts)))

    hs = ica_state.hessian
    a00 = hs[..., 0, 0]
    a01 = hs[..., 0, 1]
    a10 = hs[..., 1, 0]
    a11 = hs[..., 1, 1]
    det = a00 * a11 - a01 * a10
    solvable = jnp.abs(det) >= 1e-10
    det_inv = jnp.where(solvable, 1.0 / jnp.where(solvable, det, 1.0), 0.0)
    z = jnp.zeros_like(det_inv)
    hstatic = jnp.stack([det_inv, a11, a01, a10, a00, z, z, z], axis=-1)
    if NTXP != nx:
        hstatic = jnp.concatenate(
            [hstatic, jnp.zeros((ny, NTXP - nx, 8), hstatic.dtype)], axis=1)
    return IcaPallasPrep(ref_c=tiles(ref_lvl), gx=tiles(ica_state.gradx),
                         gy=tiles(ica_state.grady),
                         hstatic=hstatic.astype(DEFAULT_FLOAT))


def _pad_moving(moving, pad, rows, mode):
    h, w = moving.shape
    if mode == "zero":
        return jnp.pad(moving,
                       ((pad, pad + (-(h + 2 * pad)) % rows + rows),
                        (pad, pad + (-(w + 2 * pad)) % _DMA_COLS + _DMA_COLS)))
    out = jnp.pad(moving, pad, mode="edge")
    return jnp.pad(out,
                   ((0, (-(h + 2 * pad)) % rows + rows),
                    (0, (-(w + 2 * pad)) % _DMA_COLS + _DMA_COLS)),
                   mode="edge")


# exact bf16x3 selection matmuls (shared with the merge kernel) and the
# vectorized-parameter switch (HMSR_PARAMVEC, see pallas_merge)
from .pallas_merge import (_dot_sel, _sel_dot, _dyn_rows,  # noqa: E402
                           _PARAMVEC)

# row-realignment strategy is PER KERNEL FAMILY: "slice" wins for the
# ICA/warp kernels (small windows — the per-tile selection matmuls cost
# more than the dyn-slice selects: align 0.974 s vs 0.928 s at 12MP) while
# "matmul" wins for the merge kernel (2.140 s vs 2.204 s; both measured
# in-scan on hardware). HMSR_REALIGN_ICA overrides for A/B.
_REALIGN = _os.environ.get("HMSR_REALIGN_ICA", "slice")


def _pv_group_bases(Sy, Sx, XG, hps, wps, VW, grows=None, gcols=None, yg=1):
    """XLA-side twin of the kernel's ``group_base`` + fit test.

    ``Sy``/``Sx``: (ny, NTXP) clipped window corners. With ``yg`` > 1 a
    group spans a (yg, XG) tile block (ny must be a multiple of yg).
    Returns the SMEM gvec (ny//yg, 1, nj*4) [gby, gbx, fit, 0] and
    (gby, gbx) (ny//yg, nj) for building per-tile row offsets /
    column-source lanes.
    """
    grows = _GROWS if grows is None else grows
    gcols = _GCOLS if gcols is None else gcols
    ny, NTXP = Sy.shape
    nj = NTXP // XG
    nb = ny // yg
    sy = Sy.reshape(nb, yg, nj, XG)
    sx = Sx.reshape(nb, yg, nj, XG)
    gby = (jnp.clip(jnp.min(sy, (1, 3)), 0, hps - grows) // 8) * 8
    gbx = (jnp.clip(jnp.min(sx, (1, 3)), 0, wps - gcols) // 128) * 128
    fit = ((jnp.max(sy, (1, 3)) - gby <= grows - VW) &
           (jnp.max(sx, (1, 3)) - gbx <= gcols - VW)).astype(jnp.int32)
    z = jnp.zeros_like(gby)
    gvec = jnp.stack([gby, gbx, fit, z], -1).reshape(nb, 1, nj * 4)
    return gvec, gby, gbx


def _pv_csrc(Sx, gbx, XG, VW, ph=None, rep=1, yg=1):
    """Column-source lane row ``(Sx[t] - gbx) + ((l % VW) + ph[t]) // rep``
    (ny//yg, yg, nj, CW) i32, CW 128-aligned; twin of the kernels'
    ``dxv + ((cj % VW) + phv) // rep`` (``ph=None``: pure shift).
    ``gbx`` is per (row-block, group): (ny//yg, nj)."""
    ny, NTXP = Sx.shape
    nj = NTXP // XG
    nb = ny // yg
    CW = -(-(XG * VW) // 128) * 128
    c = jnp.arange(VW, dtype=jnp.int32)[None, None, None, None, :]
    if ph is not None:
        c = (c + ph.reshape(nb, yg, nj, XG, 1)) // rep
    v = (Sx.reshape(nb, yg, nj, XG, 1) - gbx[:, None, :, None, None]) + c
    v = v.reshape(nb, yg, nj, XG * VW)
    return jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, CW - XG * VW))), CW


def _pv_pack(Syc, Sxc, XG, hps, wps, VW, lane_div, ny, NTXP, lane_rows,
             yg=1, grows=None, gcols=None):
    """Build the PARAMVEC operands + specs for a realign-based kernel.

    ``lane_rows``: int32 (ny, NTXP) per-tile values, each broadcast over
    ``lane_div`` lanes (iv rows ``rb*8 + 1..``; row ``rb*8`` is row-block
    rb's column-source row; f32 values enter bitcast to int32 and are
    bitcast back in the kernel). ``ny`` must be a multiple of ``yg``.
    Returns ([gvec, offs, iv], specs, CW).
    """
    nb = ny // yg
    gvec, gby, gbx = _pv_group_bases(Syc, Sxc, XG, hps, wps, VW,
                                     grows=grows, gcols=gcols, yg=yg)
    gby_t = jnp.repeat(jnp.repeat(gby, XG, axis=1).reshape(nb, 1, NTXP),
                       yg, axis=1)
    offs = (Syc.reshape(nb, yg, NTXP) - gby_t).reshape(nb, 1, yg * NTXP)
    csrc, CW = _pv_csrc(Sxc, gbx, XG, VW, yg=yg)      # (nb, yg, nj, CW)
    nj = NTXP // XG
    L = XG * lane_div
    assert L <= CW and len(lane_rows) <= 7
    rows = [csrc]
    for v in lane_rows:
        r = jnp.repeat(v, lane_div, axis=1).reshape(nb, yg, nj, L)
        rows.append(jnp.pad(r, ((0, 0), (0, 0), (0, 0), (0, CW - L))))
    rows += [jnp.zeros_like(rows[0])] * (8 - len(rows))
    # (nb, yg, 8, nj, CW) -> (nb, yg*8, nj*CW): block (1, yg*8, CW) at
    # (i, 0, j) holds row-block rb's planes at sublanes [rb*8, rb*8+8)
    iv = jnp.stack(rows, axis=2).reshape(nb, yg * 8, nj * CW)
    return [gvec, offs, iv], _pv_specs(nj, yg, NTXP, CW), CW


def _pv_specs(nj, yg, NTXP, CW):
    """BlockSpecs for the _pv_pack operands (shape-only twin, so the
    frames-folded wrappers can build specs without materializing ops)."""
    return [
        pl.BlockSpec((1, 1, nj * 4), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, yg * NTXP), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, yg * 8, CW), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]


def _pv_cw(XG, VW):
    """CW produced by :func:`_pv_csrc` (and thus :func:`_pv_pack`)."""
    return -(-(XG * VW) // 128) * 128


class _PvRealign(NamedTuple):
    """Precomputed realignment parameters threaded into _kernel_realign."""
    gvec_ref: object      # SMEM (1, 1, nj*4): gby, gbx, fit per group
    offs_ref: object      # SMEM (1, 1, yg*NTXP): per-tile Sy - gby
    csrc_ref: object      # VMEM (1, yg*8, nj-blocked CW): col-source lanes
    csrc_row: int = 0     # which per-block csrc row holds this window
    NT: int = 0           # NTXP (offs row-block pitch); 0 = XG*nj


def _kernel_realign(src, gwin2_ref, win_ref, u_dst, sem, gsem2, pi_ref,
                    stride, Sys, Sxs, VW, XG, ROWS, hps, wps, x_ref=None,
                    pv=None, read_sxy=None, YG=1, WINP=None, fidx=None,
                    skip_dma=False, skip_realign=False):
    """Fill the (YG*WINP, XG*VW) slab ``u_dst`` with the per-tile windows
    of ``src`` at (Sys[t], Sxs[t]): group-DMA fast path with CROSS-PROGRAM
    double buffering + per-tile-DMA fallback. Row-block rb's tiles land at
    sublanes [rb*WINP, rb*WINP + VW) (WINP: VW rounded up to 8 so every
    block start is sublane-aligned).

    Program j waits on the group fetch issued by program j-1 (or its own at
    the start of a grid row) and issues j+1's speculative fetch before
    computing — the group DMA latency hides behind the previous program's
    compute. The group base is a pure function of the SMEM params row, so
    the issuing and consuming programs agree exactly.

    With ``pv`` (a :class:`_PvRealign`) the group bases / fit flag / row
    offsets / column-source lanes come precomputed from XLA (scalar-core
    SMEM load chains were the per-program bottleneck); ``Sys``/``Sxs`` may
    then be None and ``read_sxy(rb)`` lazily loads them for the rare
    per-tile-DMA fallback branch. ``YG > 1`` requires ``pv``."""
    jg = pl.program_id(1)
    nj = pl.num_programs(1)
    GROWS, GCOLS = gwin2_ref.shape[1], gwin2_ref.shape[2]
    WINP = VW if WINP is None else WINP
    assert YG == 1 or pv is not None

    def _src_at(rs, cs):
        # frames-folded grids carry the moving image as (F, hp, wp) in HBM
        # (ANY-space operands must stay full-array); fidx selects the frame
        return src.at[rs, cs] if fidx is None else src.at[fidx, rs, cs]

    if pv is not None:
        NT = pv.NT or XG * nj

        def group_base(jg2):
            # values are pre-aligned; //8*8 / //128*128 re-prove alignment
            # to Mosaic (SMEM loads carry no divisibility facts)
            return ((pv.gvec_ref[0, 0, jg2 * 4 + 0] // 8) * 8,
                    (pv.gvec_ref[0, 0, jg2 * 4 + 1] // 128) * 128)
    else:
        def group_base(jg2):
            min_y = max_y = pi_ref[0, 0, (jg2 * XG) * stride + 0]
            min_x = max_x = pi_ref[0, 0, (jg2 * XG) * stride + 1]
            for t in range(1, XG):
                p0 = (jg2 * XG + t) * stride
                min_y = jnp.minimum(min_y, pi_ref[0, 0, p0 + 0])
                max_y = jnp.maximum(max_y, pi_ref[0, 0, p0 + 0])
                min_x = jnp.minimum(min_x, pi_ref[0, 0, p0 + 1])
                max_x = jnp.maximum(max_x, pi_ref[0, 0, p0 + 1])
            # clip-then-align keeps offsets provably 8/128-divisible
            gby = (jnp.clip(min_y, 0, hps - GROWS) // 8) * 8
            gbx = (jnp.clip(min_x, 0, wps - GCOLS) // 128) * 128
            return gby, gbx, max_y, max_x

    def issue(jg2, sl):
        b = group_base(jg2)
        pltpu.make_async_copy(
            _src_at(pl.ds(b[0], GROWS), pl.ds(b[1], GCOLS)),
            gwin2_ref.at[sl], gsem2.at[sl]).start()

    if pv is not None:
        gby, gbx = group_base(jg)
        fit = pv.gvec_ref[0, 0, jg * 4 + 2] > 0
    else:
        gby, gbx, max_y, max_x = group_base(jg)
        fit = (((max_y - gby) <= GROWS - VW) &
               ((max_x - gbx) <= GCOLS - VW))

    slot = jax.lax.rem(jg, 2)

    if not skip_dma:
        @pl.when(jg == 0)
        def _():
            issue(jg, slot)

        pltpu.make_async_copy(
            _src_at(pl.ds(gby, GROWS), pl.ds(gbx, GCOLS)),
            gwin2_ref.at[slot], gsem2.at[slot]).wait()

        @pl.when(jg + 1 < nj)
        def _():
            issue(jg + 1, 1 - slot)

    if skip_realign:     # diag only: slab left stale
        return

    gwin_ref = gwin2_ref.at[slot]

    SL = XG * VW

    @pl.when(fit)
    def _():
        ci = jax.lax.broadcasted_iota(jnp.int32, (GCOLS, SL), 0)
        for rb in range(YG):
            # column realignment of row-block rb's tiles in one matmul
            if pv is not None:
                csrc = pv.csrc_ref[
                    0, rb * 8 + pv.csrc_row:rb * 8 + pv.csrc_row + 1, :SL]
                dyl = [pv.offs_ref[0, 0, rb * NT + jg * XG + t]
                       for t in range(XG)]
            else:
                dxv = jnp.zeros((1, SL), jnp.int32)
                dyl = []
                lv = jax.lax.broadcasted_iota(jnp.int32, (1, SL), 1) // VW
                for t in range(XG):
                    dxv = dxv + (Sxs[t] - gbx) * (lv == t).astype(jnp.int32)
                    dyl.append(Sys[t] - gby)
                cj = jax.lax.broadcasted_iota(jnp.int32, (GCOLS, SL), 1)
                csrc = dxv + (cj % VW)
            Call = (ci == csrc).astype(jnp.float32)
            X = _dot_sel(gwin_ref[:], Call)           # (GROWS, SL)
            # (VW > GROWS means fit is statically impossible — this branch
            # is dead then, but it still traces: keep the shape-valid form)
            if x_ref is not None and VW + 8 <= x_ref.shape[0]:
                # the row realignment is a PURE shift (no staircase): one
                # dynamic sublane slice per tile instead of a 0/1 matmul
                x_ref[:GROWS] = X
                for t in range(XG):
                    u_dst[rb * WINP:rb * WINP + VW, t * VW:(t + 1) * VW] = \
                        _dyn_rows(x_ref, dyl[t], VW, t * VW, VW)
            else:
                ri = jax.lax.broadcasted_iota(jnp.int32, (VW, GROWS), 0)
                rj = jax.lax.broadcasted_iota(jnp.int32, (VW, GROWS), 1)
                for t in range(XG):
                    Rsel = (rj == dyl[t] + ri).astype(jnp.float32)
                    u_dst[rb * WINP:rb * WINP + VW, t * VW:(t + 1) * VW] = \
                        _sel_dot(Rsel, X[:, t * VW:(t + 1) * VW])

    @pl.when(jnp.logical_not(fit))
    def _():
        ii = jax.lax.broadcasted_iota(jnp.int32, (VW, ROWS), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (VW, ROWS), 1)
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, VW), 0)
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, VW), 1)
        for rb in range(YG):
            Sysl, Sxsl = (read_sxy(rb)
                          if pv is not None and read_sxy is not None
                          else (Sys, Sxs))
            rys, rxs = [], []
            for t in range(XG):
                rys.append((Sysl[t] // 8) * 8)
                rxs.append((Sxsl[t] // 128) * 128)
                pltpu.make_async_copy(
                    _src_at(pl.ds(rys[t], ROWS), pl.ds(rxs[t], _DMA_COLS)),
                    win_ref.at[t], sem.at[t]).start()
            for t in range(XG):
                pltpu.make_async_copy(
                    _src_at(pl.ds(rys[t], ROWS), pl.ds(rxs[t], _DMA_COLS)),
                    win_ref.at[t], sem.at[t]).wait()
                Rsel = (jj == (Sysl[t] - rys[t]) + ii).astype(jnp.float32)
                Csel = (ii2 == (Sxsl[t] - rxs[t]) + jj2).astype(jnp.float32)
                u_dst[rb * WINP:rb * WINP + VW, t * VW:(t + 1) * VW] = \
                    _sel_dot(Rsel, _dot_sel(win_ref[t], Csel))


def _lane_broadcast(vals, lane_div, L, dtype=jnp.float32):
    """Broadcast XG SMEM scalars across an (1, L) lane vector."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) // lane_div
    out = jnp.zeros((1, L), dtype)
    for t, v in enumerate(vals):
        m = (lane == t).astype(dtype)
        out = out + v * m
    return out


# ---------------------------------------------------------------------------
# GN step kernel: realign + bilinear taps + per-tile (b0, b1) reductions.
# ---------------------------------------------------------------------------

def _ica_step_kernel(*args, ts, XG, WIN, ROWS, hp, wp, pv, YG, WINP,
                     F=1, NYB=0):
    if pv:
        (pi_ref, gvec_ref, offs_ref, iv_ref,
         mov_ref, ref_ref, gx_ref, gy_ref,
         out_ref, win_ref, gwin_ref, u_ref, sem, sem_g, *refs) = args
    else:
        (pi_ref, pf_ref, mov_ref, ref_ref, gx_ref, gy_ref,
         out_ref, win_ref, gwin_ref, u_ref, sem, sem_g, *refs) = args
    x_ref = refs[0] if refs else None
    # frames-folded grid: program row i covers frame i // NYB, tile-row
    # block i % NYB (all per-(frame, row) parameters arrive via the blocked
    # SMEM/VMEM specs; only the manual HBM DMA needs the frame index)
    fidx = pl.program_id(0) // NYB if F > 1 else None
    jg_ = pl.program_id(1)
    nj = pl.num_programs(1)
    NT = XG * nj
    SLAB = XG * WIN
    L = XG * ts

    skip_dma = _DIAG == "nodma"
    skip_realign = _DIAG in ("norealign", "nodma")
    skip_taps = _DIAG in ("notap", "norealign", "nodma")

    if pv:
        def read_sxy(rb):
            return ([pi_ref[0, 0, (rb * NT + jg_ * XG + t) * 4 + 0]
                     for t in range(XG)],
                    [pi_ref[0, 0, (rb * NT + jg_ * XG + t) * 4 + 1]
                     for t in range(XG)])

        _kernel_realign(mov_ref, gwin_ref, win_ref, u_ref, sem, sem_g,
                        pi_ref, 4, None, None, WIN, XG, ROWS, hp, wp,
                        x_ref=x_ref,
                        pv=_PvRealign(gvec_ref, offs_ref, iv_ref, 0, NT),
                        read_sxy=read_sxy, YG=YG, WINP=WINP, fidx=fidx,
                        skip_dma=skip_dma, skip_realign=skip_realign)
    else:
        Sys, Sxs, oks, fxs, fys = [], [], [], [], []
        for t in range(XG):
            p0 = (jg_ * XG + t) * 4
            Sys.append(pi_ref[0, 0, p0 + 0])
            Sxs.append(pi_ref[0, 0, p0 + 1])
            oks.append(pi_ref[0, 0, p0 + 2])
            fxs.append(pf_ref[0, 0, (jg_ * XG + t) * 2 + 0])
            fys.append(pf_ref[0, 0, (jg_ * XG + t) * 2 + 1])

        _kernel_realign(mov_ref, gwin_ref, win_ref, u_ref, sem, sem_g,
                        pi_ref, 4, Sys, Sxs, WIN, XG, ROWS, hp, wp,
                        x_ref=x_ref, fidx=fidx,
                        skip_dma=skip_dma, skip_realign=skip_realign)

    if skip_taps:       # diag only: zero flow update keeps iterations coherent
        out_ref[:, :] = jnp.zeros(out_ref.shape, jnp.float32)
        return

    # constant tap-selection matrices: slab col j of the (.., XG*ts) tap
    # plane reads U-slab col (j//ts)*WIN + j%ts (+1 for the right tap).
    # ONE pair of tall matmuls taps ALL row-blocks at once (rows pass
    # through); the per-block bilinear/residual phase then reads static
    # sublane slices of M0/M1.
    ti = jax.lax.broadcasted_iota(jnp.int32, (SLAB, L), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (SLAB, L), 1)
    tsrc = (tj // ts) * WIN + (tj % ts)
    tap0 = (ti == tsrc).astype(jnp.float32)
    tap1 = (ti == tsrc + 1).astype(jnp.float32)

    Uslab = u_ref[:]
    M0 = _dot_sel(Uslab, tap0)                        # (YG*WINP, L)
    M1 = _dot_sel(Uslab, tap1)

    cs = []
    for rb in range(YG):
        if pv:
            bits = lambda r: jax.lax.bitcast_convert_type(
                iv_ref[0, rb * 8 + r:rb * 8 + r + 1, :L], jnp.float32)
            fxv, fyv = bits(1), bits(2)
            okv = iv_ref[0, rb * 8 + 3:rb * 8 + 4, :L].astype(jnp.float32)
        else:
            fxv = _lane_broadcast(fxs, ts, L)
            fyv = _lane_broadcast(fys, ts, L)
            okv = _lane_broadcast([o.astype(jnp.float32) for o in oks],
                                  ts, L)
        r0 = rb * WINP
        m00 = M0[r0:r0 + ts]
        m01 = M1[r0:r0 + ts]
        m10 = M0[r0 + 1:r0 + 1 + ts]
        m11 = M1[r0 + 1:r0 + 1 + ts]
        top = m00 + (m01 - m00) * fxv
        bot = m10 + (m11 - m10) * fxv
        interp = (top + (bot - top) * fyv) * okv      # (ts, XG*ts)

        gradt = interp - ref_ref[rb * ts:(rb + 1) * ts]
        P0 = -gx_ref[rb * ts:(rb + 1) * ts] * gradt
        P1 = -gy_ref[rb * ts:(rb + 1) * ts] * gradt
        cs.append(jnp.sum(P0, axis=0, keepdims=True))     # (1, L)
        cs.append(jnp.sum(P1, axis=0, keepdims=True))
    si = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    Seg = ((si // ts) == sj).astype(jnp.float32)
    bv = _dot_sel(jnp.concatenate(cs, axis=0), Seg)       # (2*YG, 128)
    if _DIAG:           # "zero": full work, update killed by a RUNTIME zero
        # (the params row's spare slot — a literal 0.0 would let the
        # compiler fold the whole tap phase away and ruin the attribution)
        bv = bv * pi_ref[0, 0, 3].astype(jnp.float32)
    out_ref[:, :] = jnp.pad(bv, ((0, 8 - 2 * YG), (0, 0)))


def _grows(YG, ts, VW):
    """Group-window rows: the (YG, XG) block's row span + ~15 rows of
    flow-variation slack, 8-aligned (YG=1 reproduces the former _GROWS=48
    at ts=16)."""
    return -(-(YG * ts + VW + 15) // 8) * 8


def _gcols_ica(XG, ts, VW):
    """Group-window lanes: the XG tiles' column span + >=127 lanes of
    slack, 128-aligned (reproduces the former _GCOLS=512 at ts=16)."""
    return -(-(XG * ts + VW + 127) // 128) * 128


def _pad_rows_edge(a, nyP):
    """Edge-pad leading (row) axis to nyP (keeps padded tiles' windows
    adjacent to real ones so group fits aren't poisoned)."""
    ny = a.shape[0]
    if ny == nyP:
        return a
    pad = [(0, nyP - ny)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad, mode="edge")


def ica_step_pallas(prep, mov_pad, flow, tile_size, interpret=False):
    """One Gauss-Newton right-hand side: returns (b0, b1) each (ny, NTXP).

    ``flow`` must already be padded to (ny, NTXP, 2). ``jax.vmap`` over
    (mov_pad, flow) folds the frames axis into the kernel grid (ONE launch
    for the whole burst) via the custom-vmap rule below."""
    fn = _ica_step_cv(int(tile_size), bool(interpret))
    return fn(prep.ref_c, prep.gx, prep.gy, mov_pad, flow)


@functools.lru_cache(maxsize=None)
def _ica_step_cv(ts, interpret):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(ref_c, gx, gy, mov_pad, flow):
        return _ica_step_run(ref_c, gx, gy, mov_pad, flow, ts=ts,
                             interpret=interpret)

    @fn.def_vmap
    def rule(axis_size, in_batched, ref_c, gx, gy, mov_pad, flow):
        if tuple(in_batched) == (False, False, False, True, True):
            out = _ica_step_run(ref_c, gx, gy, mov_pad, flow, ts=ts,
                                interpret=interpret)
        else:   # unexpected batching pattern: sequential per-frame fallback
            out = _seq_map(fn, in_batched, (ref_c, gx, gy, mov_pad, flow))
        return out, (True, True)

    return fn


def _seq_map(fn, in_batched, args):
    """Generic ``lax.map`` fallback for a custom-vmap rule: map over the
    batched args, close over the rest."""
    idx = [i for i, b in enumerate(in_batched)
           if any(jax.tree_util.tree_leaves(b))]

    def one(bargs):
        full = list(args)
        for k, i2 in enumerate(idx):
            full[i2] = bargs[k]
        return fn(*full)

    return jax.lax.map(one, tuple(args[i] for i in idx))


def _ica_params(flow2, *, ts, XG, YG, nyP, nyB, NTXP, hp, wp, ROWS,
                GROWS, GCOLS, WIN, PAD):
    """Per-frame SMEM/VMEM parameter operands of the GN-step kernel
    (pure function of one frame's flow, vmappable over frames)."""
    ny = flow2.shape[0]
    ax = flow2[..., 0]
    ay = flow2[..., 1]
    ix = jnp.trunc(ax)
    iy = jnp.trunc(ay)
    ty = jnp.arange(ny, dtype=jnp.int32)[:, None]
    tx = jnp.arange(NTXP, dtype=jnp.int32)[None, :]
    Sy = ty * ts + iy.astype(jnp.int32) + PAD
    Sx = tx * ts + ix.astype(jnp.int32) + PAD
    Syc = _pad_rows_edge(jnp.clip(Sy, 0, hp - ROWS), nyP)
    Sxc = _pad_rows_edge(jnp.clip(Sx, 0, wp - _DMA_COLS), nyP)
    ok = _pad_rows_edge(((jnp.clip(Sy, 0, hp - ROWS) == Sy) &
                         (jnp.clip(Sx, 0, wp - _DMA_COLS) == Sx)
                         ).astype(jnp.int32), nyP)
    pi = jnp.stack([Syc, Sxc, ok, jnp.zeros_like(ok)], axis=-1)
    pi = pi.reshape(nyB, 1, YG * NTXP * 4)
    if _PARAMVEC:
        fx = _pad_rows_edge((ax - ix).astype(DEFAULT_FLOAT), nyP)
        fy = _pad_rows_edge((ay - iy).astype(DEFAULT_FLOAT), nyP)
        pvo, _, _ = _pv_pack(Syc, Sxc, XG, hp, wp, WIN, ts, nyP, NTXP,
                             [jax.lax.bitcast_convert_type(fx, jnp.int32),
                              jax.lax.bitcast_convert_type(fy, jnp.int32),
                              ok],
                             yg=YG, grows=GROWS, gcols=GCOLS)
        return [pi] + pvo
    pf = jnp.stack([ax - ix, ay - iy], axis=-1).astype(DEFAULT_FLOAT)
    return [pi, pf.reshape(ny, 1, NTXP * 2)]


def _fold_frames(params_fn, flow, batched):
    """Evaluate the per-frame params and fold frames into the block axis."""
    if not batched:
        return params_fn(flow)
    ops = jax.vmap(params_fn)(flow)
    return [o.reshape((-1,) + o.shape[2:]) for o in ops]


# jit = TRACE DEDUP (see _bm_run): the 3 GN iterations per level re-traced
# this kernel body each call (~4 s each at 12MP); one cached trace now
# serves all iterations of a level and both scan body passes. The merge
# kernel must NOT get this treatment — its pallas_call's input/output
# aliasing does not survive a nested jit boundary.
@functools.partial(jax.jit, static_argnames=("ts", "interpret"))
def _ica_step_run(ref_c, gx, gy, mov_pad, flow, *, ts, interpret):
    batched = flow.ndim == 4
    F = flow.shape[0] if batched else 1
    ny, NTXP = flow.shape[-3], flow.shape[-2]
    XG = _xg(ts)
    YG = _yg(ts)
    nyP = -(-ny // YG) * YG
    nyB = nyP // YG
    WIN = ts + 1
    WINP = -(-WIN // 8) * 8 if YG > 1 else WIN
    PAD = ts + 2
    ROWS = _dma_rows(WIN)
    GROWS = _grows(YG, ts, WIN)
    GCOLS = _gcols_ica(XG, ts, WIN)
    hp, wp = mov_pad.shape[-2:]

    head_ops = _fold_frames(
        functools.partial(_ica_params, ts=ts, XG=XG, YG=YG, nyP=nyP,
                          nyB=nyB, NTXP=NTXP, hp=hp, wp=wp, ROWS=ROWS,
                          GROWS=GROWS, GCOLS=GCOLS, WIN=WIN, PAD=PAD),
        flow, batched)
    if _PARAMVEC:
        head_specs = [pl.BlockSpec((1, 1, YG * NTXP * 4),
                                   lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.SMEM)] \
            + _pv_specs(NTXP // XG, YG, NTXP, _pv_cw(XG, WIN))
    else:
        head_specs = [
            pl.BlockSpec((1, 1, NTXP * 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NTXP * 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]

    kernel = functools.partial(_ica_step_kernel, ts=ts, XG=XG, WIN=WIN,
                               ROWS=ROWS, hp=hp, wp=wp, pv=_PARAMVEC,
                               YG=YG, WINP=WINP, F=F, NYB=nyB)
    # the ref tiles/gradients are shared across frames: the folded grid
    # re-visits block row (i % nyB) once per frame
    ref_map = (lambda i, j: (i % nyB, j)) if batched \
        else (lambda i, j: (i, j))
    grid_spec = pl.GridSpec(
        grid=(F * nyB, NTXP // XG),
        in_specs=head_specs + [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((YG * ts, XG * ts), ref_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((YG * ts, XG * ts), ref_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((YG * ts, XG * ts), ref_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((XG, ROWS, _DMA_COLS), jnp.float32),
            pltpu.VMEM((2, GROWS, GCOLS), jnp.float32),
            pltpu.VMEM((YG * WINP, XG * WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((XG,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((GROWS + 8, XG * WIN), jnp.float32)]
             if _REALIGN == "slice" else []),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((F * nyB * 8, (NTXP // XG) * 128),
                                        jnp.float32),),
        interpret=interpret,
    )(*head_ops, mov_pad, ref_c, gx, gy)[0]

    out = out.reshape(F, nyB, 8, NTXP // XG, 128)
    b0 = out[:, :, 0:2 * YG:2, :, :XG].reshape(F, nyP, NTXP)[:, :ny]
    b1 = out[:, :, 1:2 * YG:2, :, :XG].reshape(F, nyP, NTXP)[:, :ny]
    if not batched:
        return b0[0], b1[0]
    return b0, b1


# ---------------------------------------------------------------------------
# Block-matching kernel: realign search slab + vectorized candidate argmin.
# ---------------------------------------------------------------------------

def _bm_kernel(*args, ts, XG, SWIN, ROWS, hp, wp, metric, rbm, pv, YG, SWINP,
               F=1, NYB=0):
    if pv:
        (pi_ref, gvec_ref, offs_ref, iv_ref, mov_ref, ref_ref, out_ref,
         win_ref, gwin_ref, ub_ref, eacc_ref, sem, sem_g, *refs) = args
    else:
        (pi_ref, mov_ref, ref_ref, out_ref,
         win_ref, gwin_ref, ub_ref, eacc_ref, sem, sem_g, *refs) = args
    x_ref = refs[0] if refs else None
    fidx = pl.program_id(0) // NYB if F > 1 else None   # frames-folded grid
    jg_ = pl.program_id(1)
    nj = pl.num_programs(1)
    NT = XG * nj
    L = XG * ts
    n_sh = 2 * rbm + 1
    NC = n_sh * n_sh
    NCP = eacc_ref.shape[0] // YG

    if pv:
        def read_sxy(rb):
            return ([pi_ref[0, 0, (rb * NT + jg_ * XG + t) * 2 + 0]
                     for t in range(XG)],
                    [pi_ref[0, 0, (rb * NT + jg_ * XG + t) * 2 + 1]
                     for t in range(XG)])

        _kernel_realign(mov_ref, gwin_ref, win_ref, ub_ref, sem, sem_g,
                        pi_ref, 2, None, None, SWIN, XG, ROWS, hp, wp,
                        x_ref=x_ref,
                        pv=_PvRealign(gvec_ref, offs_ref, iv_ref, 0, NT),
                        read_sxy=read_sxy, YG=YG, WINP=SWINP, fidx=fidx)
    else:
        Wys, Wxs = [], []
        for t in range(XG):
            p0 = (jg_ * XG + t) * 2
            Wys.append(pi_ref[0, 0, p0 + 0])
            Wxs.append(pi_ref[0, 0, p0 + 1])

        _kernel_realign(mov_ref, gwin_ref, win_ref, ub_ref, sem, sem_g,
                        pi_ref, 2, Wys, Wxs, SWIN, XG, ROWS, hp, wp,
                        x_ref=x_ref, fidx=fidx)

    # zero the candidate-padding rows once (they enter the Seg matmul)
    if NCP > NC:
        for rb in range(YG):
            r0 = rb * NCP
            eacc_ref[r0 + NC:r0 + NCP, :] = jnp.zeros(
                (NCP - NC, eacc_ref.shape[1]), jnp.float32)

    if metric == "l1":
        # the column-extraction tap depends only on sx: extract the n_sh
        # full-height slabs once (ALL row-blocks in one tall matmul); the
        # (rb, sy) shift is then a free row slice. per-tile errors land in
        # lane t (segment sums below).
        bi = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, L), 0)
        bj = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, L), 1)
        bsrc = (bj // ts) * SWIN + (bj % ts)
        cols = []
        for sx in range(n_sh):
            tap = (bi == bsrc + sx).astype(jnp.float32)
            cols.append(_dot_sel(ub_ref[:], tap))     # (YG*SWINP, L)
        for rb in range(YG):
            rr = rb * ts
            for sy in range(n_sh):
                for sx in range(n_sh):
                    D = jnp.abs(ref_ref[rr:rr + ts] -
                                cols[sx][rb * SWINP + sy:rb * SWINP + sy + ts])
                    r0 = rb * NCP + sy * n_sh + sx
                    eacc_ref[r0:r0 + 1, :L] = jnp.sum(D, 0, keepdims=True)
        seg_w = ts
    else:
        # Same shifted-slab structure as the L1 branch: per sx, ONE exact
        # selection matmul realigns the window columns onto the ref tile
        # layout at full height (all row blocks), then each (rb, sy)
        # candidate needs just two (ts, L) column reductions:
        # e = sum(win^2) - 2 sum(ref*win), the XLA twin's formulation
        # (match_l2; the per-tile sum(ref^2) constant cancels in the
        # argmin), combined per column before the segment sum exactly like
        # the previous kernel. This replaced a G-matmul + per-(sy, sx)
        # full-array band-mask reduction (~33M VPU element-ops/program at
        # radius 4 — measured as the align stage's largest single cost in
        # the round-4 attribution sweep) with ~4M.
        bi = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, L), 0)
        bj = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, L), 1)
        bsrc = (bj // ts) * SWIN + (bj % ts)
        for sx in range(n_sh):
            tap = (bi == bsrc + sx).astype(jnp.float32)
            w = _dot_sel(ub_ref[:], tap)              # (YG*SWINP, L)
            wsq = w * w
            for rb in range(YG):
                R = ref_ref[rb * ts:rb * ts + ts]
                for sy in range(n_sh):
                    sl = slice(rb * SWINP + sy, rb * SWINP + sy + ts)
                    e1 = jnp.sum(wsq[sl], 0, keepdims=True)
                    e2 = jnp.sum(R * w[sl], 0, keepdims=True)
                    r0 = rb * NCP + sy * n_sh + sx
                    eacc_ref[r0:r0 + 1, :L] = e1 - 2.0 * e2
        seg_w = ts

    # vectorized per-tile segment sums + first-min argmin over candidates
    SL = XG * seg_w
    si = jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 1)
    Seg = ((si // seg_w) == sj).astype(jnp.float32)
    E = _dot_sel(eacc_ref[:, :SL], Seg)               # (YG*NCP, 128)
    ci = jax.lax.broadcasted_iota(jnp.int32, (NCP, 128), 0)
    outs = []
    for rb in range(YG):
        Eb = E[rb * NCP:(rb + 1) * NCP]
        Eb = jnp.where(ci < NC, Eb, jnp.float32(np.inf))
        best = jnp.min(Eb, axis=0, keepdims=True)     # (1, 128)
        idx = jnp.min(jnp.where(Eb <= best, ci, NC), axis=0, keepdims=True)
        outs.append((idx % n_sh - rbm).astype(jnp.float32))   # dx
        outs.append((idx // n_sh - rbm).astype(jnp.float32))  # dy
    out_ref[:, :] = jnp.pad(jnp.concatenate(outs, axis=0),
                            ((0, 8 - 2 * YG), (0, 0)))


def bm_pallas(prep, mov_src, flow, tile_size, radius, metric, h, w,
              interpret=False):
    """Vectorized block-matching displacement: returns (dx, dy) (ny, NTXP).

    ``mov_src = (padded_image, pad)`` must carry the metric's OOB semantics
    (zero pad for L1, edge pad for L2). ``flow`` already (ny, NTXP, 2).
    ``jax.vmap`` over (mov, flow) folds the frames axis into the kernel grid
    via the custom-vmap rule (one launch for the whole burst)."""
    mov_pad, pad = mov_src
    fn = _bm_cv(int(tile_size), int(radius), str(metric), int(h), int(w),
                int(pad), bool(interpret))
    return fn(prep.ref_c, mov_pad, flow)


@functools.lru_cache(maxsize=None)
def _bm_cv(ts, rbm, metric, h, w, pad, interpret):
    from jax import custom_batching
    kw = dict(ts=ts, rbm=rbm, metric=metric, h=h, w=w, pad=pad,
              interpret=interpret)

    @custom_batching.custom_vmap
    def fn(ref_c, mov_pad, flow):
        return _bm_run(ref_c, mov_pad, flow, **kw)

    @fn.def_vmap
    def rule(axis_size, in_batched, ref_c, mov_pad, flow):
        if tuple(in_batched) == (False, True, True):
            out = _bm_run(ref_c, mov_pad, flow, **kw)
        else:
            out = _seq_map(fn, in_batched, (ref_c, mov_pad, flow))
        return out, (True, True)

    return fn


def _bm_params(flow2, *, ts, rbm, h, w, pad, XG, YG, nyP, nyB, NTXP,
               hp, wp, ROWS, GROWS, GCOLS, SWIN):
    ny = flow2.shape[0]
    iflow = jnp.round(flow2)
    ty = jnp.arange(ny, dtype=jnp.int32)[:, None]
    tx = jnp.arange(NTXP, dtype=jnp.int32)[None, :]
    Wy = ty * ts + iflow[..., 1].astype(jnp.int32) - rbm
    Wx = tx * ts + iflow[..., 0].astype(jnp.int32) - rbm
    # Same clip bounds as the XLA extract_flow_patches (block_matching.py:64):
    # a BINDING clamp leaves every candidate window fully inside the metric's
    # pad region (all-zero for L1 / edge rows for L2), so all candidates tie
    # exactly as in the XLA path and the first-min argmin picks the same
    # displacement (test_fused_l1_bm_extreme_flow / test_fused_l2_bm_edge_clamp).
    Wyc = jnp.clip(Wy, -pad, h) + pad
    Wxc = jnp.clip(Wx, -pad, w) + pad
    # keep DMA-legal (the clip above follows the reference's semantics; the
    # pad geometry guarantees in-range, this is belt and braces)
    Wyc = _pad_rows_edge(jnp.clip(Wyc, 0, hp - ROWS), nyP)
    Wxc = _pad_rows_edge(jnp.clip(Wxc, 0, wp - _DMA_COLS), nyP)
    pi = jnp.stack([Wyc, Wxc], axis=-1)
    head_ops = [pi.reshape(nyB, 1, YG * NTXP * 2)]
    if _PARAMVEC:
        pvo, _, _ = _pv_pack(Wyc, Wxc, XG, hp, wp, SWIN, ts, nyP, NTXP,
                             [], yg=YG, grows=GROWS, gcols=GCOLS)
        head_ops += pvo
    return head_ops


# jit = TRACE DEDUP, not dispatch: Pallas kernel-body tracing dominated the
# client-side cost of the 12MP pipeline's first call (66 s of the 77 s trace,
# tools/profile_trace.py cProfile), and lax.scan traces its body twice — the
# nested jit makes every identical-(shapes, statics) call reuse one cached
# kernel trace. First call 202.5 -> 112.9 s; steady state and checksums
# unchanged (tools/probe_compile_r5b.log, finalize_split_r5.log).
@functools.partial(jax.jit,
                   static_argnames=("ts", "rbm", "metric", "h", "w", "pad",
                                    "interpret"))
def _bm_run(ref_c, mov_pad, flow, *, ts, rbm, metric, h, w, pad, interpret):
    batched = flow.ndim == 4
    F = flow.shape[0] if batched else 1
    ny, NTXP = flow.shape[-3], flow.shape[-2]
    XG = _xg(ts)
    YG = _yg(ts)
    nyP = -(-ny // YG) * YG
    nyB = nyP // YG
    SWIN = ts + 2 * rbm + 1
    SWINP = -(-SWIN // 8) * 8 if YG > 1 else SWIN
    ROWS = _dma_rows(SWIN)
    GROWS = _grows(YG, ts, SWIN)
    GCOLS = _gcols_ica(XG, ts, SWIN)
    hp, wp = mov_pad.shape[-2:]

    NC = (2 * rbm + 1) ** 2
    NCP = -(-NC // 8) * 8

    head_ops = _fold_frames(
        functools.partial(_bm_params, ts=ts, rbm=rbm, h=h, w=w, pad=pad,
                          XG=XG, YG=YG, nyP=nyP, nyB=nyB, NTXP=NTXP,
                          hp=hp, wp=wp, ROWS=ROWS, GROWS=GROWS,
                          GCOLS=GCOLS, SWIN=SWIN),
        flow, batched)
    head_specs = [pl.BlockSpec((1, 1, YG * NTXP * 2),
                               lambda i, j: (i, 0, 0),
                               memory_space=pltpu.SMEM)]
    if _PARAMVEC:
        head_specs += _pv_specs(NTXP // XG, YG, NTXP, _pv_cw(XG, SWIN))

    kernel = functools.partial(_bm_kernel, ts=ts, XG=XG, SWIN=SWIN,
                               ROWS=ROWS, hp=hp, wp=wp, metric=metric,
                               rbm=rbm, pv=_PARAMVEC, YG=YG, SWINP=SWINP,
                               F=F, NYB=nyB)
    ref_map = (lambda i, j: (i % nyB, j)) if batched \
        else (lambda i, j: (i, j))
    grid_spec = pl.GridSpec(
        grid=(F * nyB, NTXP // XG),
        in_specs=head_specs + [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((YG * ts, XG * ts), ref_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((XG, ROWS, _DMA_COLS), jnp.float32),
            pltpu.VMEM((2, GROWS, GCOLS), jnp.float32),
            pltpu.VMEM((YG * SWINP, XG * SWIN), jnp.float32),
            pltpu.VMEM((YG * NCP, max(XG * SWIN, 128)), jnp.float32),
            pltpu.SemaphoreType.DMA((XG,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((GROWS + 8, XG * SWIN), jnp.float32)]
             if _REALIGN == "slice" else []),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((F * nyB * 8, (NTXP // XG) * 128),
                                        jnp.float32),),
        interpret=interpret,
    )(*head_ops, mov_pad, ref_c)[0]

    out = out.reshape(F, nyB, 8, NTXP // XG, 128)
    dx = out[:, :, 0:2 * YG:2, :, :XG].reshape(F, nyP, NTXP)[:, :ny]
    dy = out[:, :, 1:2 * YG:2, :, :XG].reshape(F, nyP, NTXP)[:, :ny]
    if not batched:
        return dx[0], dy[0]
    return dx, dy


# ---------------------------------------------------------------------------
# Public drop-ins (XLA orchestration of the kernels above).
# ---------------------------------------------------------------------------

def _pad_flow(flow, NTXP):
    ny, nx, _ = flow.shape
    fl = flow.astype(DEFAULT_FLOAT)
    if NTXP != nx:
        fl = jnp.pad(fl, ((0, 0), (0, NTXP - nx), (0, 0)))
    return fl


#: below this many tiles a level is LAUNCH-overhead-bound (~0.4 ms per
#: in-program pallas_call) and the single-kernel fused GN wins; above it the
#: per-iteration launches win (short kernel bodies pipeline across grid
#: programs; one long serial body does not) — both measured in-scan at 12MP.
FUSED_GN_MAX_TILES = int(_os.environ.get("HMSR_ICA_FUSE_BELOW", "2000"))


def _use_fused_gn(n_tiles=None):
    if _os.environ.get("HMSR_ICA_FUSED", "") == "1":
        return True
    if _os.environ.get("HMSR_ICA_FUSED", "") == "0":
        return False
    return n_tiles is not None and n_tiles < FUSED_GN_MAX_TILES


def _gn_iterations(prep, mov_pad, flow_p, ts, n_iter, interpret):
    hs = prep.hstatic
    det_inv, a11, a01 = hs[..., 0], hs[..., 1], hs[..., 2]
    a10, a00 = hs[..., 3], hs[..., 4]
    for _ in range(int(n_iter)):
        b0, b1 = ica_step_pallas(prep, mov_pad, flow_p, ts,
                                 interpret=interpret)
        dx = det_inv * (a11 * b0 - a01 * b1)
        dy = det_inv * (-a10 * b0 + a00 * b1)
        flow_p = flow_p + jnp.stack([dx, dy], axis=-1)
    return flow_p


def refine_ica_pallas(ref_lvl, ica_state, moving, flow, tile_size, n_iter,
                      interpret=False, prep=None):
    """Drop-in for ``refine_ica`` / ``refine_ica_tiled``."""
    if _use_fused_gn(flow.shape[0] * flow.shape[1]):
        # single-kernel GN: all iterations inside one launch (in-kernel
        # scalar updates, hardware-verified vs the scalar oracle)
        from .pallas_ica_fused import refine_ica_pallas as fused
        return fused(ref_lvl, ica_state, moving, flow, tile_size, n_iter,
                     interpret=interpret, prep=prep)
    ny, nx, _ = flow.shape
    ts = int(tile_size)
    XG = _xg(ts)
    NTXP = -(-nx // XG) * XG
    if prep is None:
        prep = prep_ica_pallas(ref_lvl, ica_state, flow.shape, tile_size)

    mov_pad = _pad_moving(moving, ts + 2, _dma_rows(ts + 1), "zero")
    flow_p = _pad_flow(flow, NTXP)
    flow_p = _gn_iterations(prep, mov_pad, flow_p, ts, n_iter, interpret)
    return flow_p[:, :nx]


def match_l1_refine_ica_pallas(ref_lvl, ica_state, moving, flow, tile_size,
                               n_iter, interpret=False, prep=None):
    """Fused finest-level stage: L1 block matching (radius 1) + ICA.

    Reference semantics (this repo's XLA ``match_l1``, itself matching
    reference block_matching.py:105-345 with the intended argmin): search
    windows at ``round(flow)``, zero-filled out of bounds, first-minimum
    tie-break; displacement REPLACES the flow as ``round(flow) + d``; the
    matched integer flow then seeds the ICA Gauss-Newton steps.
    """
    ny, nx, _ = flow.shape
    ts = int(tile_size)
    h, w = moving.shape
    XG = _xg(ts)
    NTXP = -(-nx // XG) * XG
    if prep is None:
        prep = prep_ica_pallas(ref_lvl, ica_state, flow.shape, tile_size)

    SWIN = ts + 3
    rows = max(_dma_rows(ts + 1), _dma_rows(SWIN))
    PAD = ts + 2
    mov_pad = _pad_moving(moving, PAD, rows, "zero")
    flow_p = _pad_flow(flow, NTXP)

    dx, dy = bm_pallas(prep, (mov_pad, PAD), flow_p, ts, 1, "l1", h, w,
                       interpret=interpret)
    flow_p = jnp.round(flow_p) + jnp.stack([dx, dy], axis=-1)

    flow_p = _gn_iterations(prep, mov_pad, flow_p, ts, n_iter, interpret)
    return flow_p[:, :nx]


def match_l2_refine_ica_pallas(ref_lvl, ica_state, moving, flow, tile_size,
                               n_iter, radius, interpret=False, prep=None):
    """Fused L2 block matching (radius r) + ICA.

    Matches this repo's XLA ``match_l2`` exactly in intent: search windows
    gathered at ``round(flow)`` with edge-CLAMP out-of-bounds semantics
    (reference block_matching.py:348-378), error ``argmin(L2win - 2 corr)``,
    displacement ADDED to the unrounded flow.
    """
    ny, nx, _ = flow.shape
    ts = int(tile_size)
    h, w = moving.shape
    XG = _xg(ts)
    NTXP = -(-nx // XG) * XG
    if prep is None:
        prep = prep_ica_pallas(ref_lvl, ica_state, flow.shape, tile_size)

    rbm = int(radius)
    SWIN = ts + 2 * rbm + 1
    PAD_E = ts + 2 * rbm
    mov_edge = _pad_moving(moving, PAD_E, _dma_rows(SWIN), "edge")
    mov_pad = _pad_moving(moving, ts + 2, _dma_rows(ts + 1), "zero")
    flow_p = _pad_flow(flow, NTXP)

    dx, dy = bm_pallas(prep, (mov_edge, PAD_E), flow_p, ts, rbm, "l2", h, w,
                       interpret=interpret)
    flow_p = flow_p + jnp.stack([dx, dy], axis=-1)

    if _use_fused_gn(ny * NTXP):
        from .pallas_ica_fused import refine_ica_pallas as fused
        return fused(ref_lvl, ica_state, moving, flow_p[:, :nx], tile_size,
                     n_iter, interpret=interpret, prep=prep)
    flow_p = _gn_iterations(prep, mov_pad, flow_p, ts, n_iter, interpret)
    return flow_p[:, :nx]
