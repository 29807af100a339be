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


def _xg(ts):
    return _XG_MULT * max(1, 128 // int(np.gcd(int(ts), 128)))


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

    def tiles(a):
        return jnp.pad(a[:ny * ts, :nx * ts],
                       ((0, 0), (0, (NTXP - nx) * ts)))

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


def _pv_group_bases(Sy, Sx, XG, hps, wps, VW, grows=None, gcols=None):
    """XLA-side twin of the kernel's ``group_base`` + fit test.

    ``Sy``/``Sx``: (ny, NTXP) clipped window corners. Returns the SMEM
    gvec (ny, 1, nj*4) [gby, gbx, fit, 0] and (gby, gbx) (ny, nj) for
    building per-tile row offsets / column-source lanes.
    """
    grows = _GROWS if grows is None else grows
    gcols = _GCOLS if gcols is None else gcols
    ny, NTXP = Sy.shape
    nj = NTXP // XG
    sy = Sy.reshape(ny, nj, XG)
    sx = Sx.reshape(ny, nj, XG)
    gby = (jnp.clip(jnp.min(sy, 2), 0, hps - grows) // 8) * 8
    gbx = (jnp.clip(jnp.min(sx, 2), 0, wps - gcols) // 128) * 128
    fit = ((jnp.max(sy, 2) - gby <= grows - VW) &
           (jnp.max(sx, 2) - gbx <= gcols - VW)).astype(jnp.int32)
    z = jnp.zeros_like(gby)
    gvec = jnp.stack([gby, gbx, fit, z], -1).reshape(ny, 1, nj * 4)
    return gvec, gby, gbx


def _pv_csrc(Sx, gbx, XG, VW, ph=None, rep=1):
    """Column-source lane row ``(Sx[t] - gbx) + ((l % VW) + ph[t]) // rep``
    (ny, nj*CW) i32, CW 128-aligned; twin of the kernels'
    ``dxv + ((cj % VW) + phv) // rep`` (``ph=None``: pure shift)."""
    ny, NTXP = Sx.shape
    nj = NTXP // XG
    CW = -(-(XG * VW) // 128) * 128
    c = jnp.arange(VW, dtype=jnp.int32)[None, None, None, :]
    if ph is not None:
        c = (c + ph.reshape(ny, nj, XG, 1)) // rep
    v = (Sx.reshape(ny, nj, XG, 1) - gbx[:, :, None, None]) + c
    v = v.reshape(ny, nj, XG * VW)
    return jnp.pad(v, ((0, 0), (0, 0), (0, CW - XG * VW))), CW


def _pv_pack(Syc, Sxc, XG, hps, wps, VW, lane_div, ny, NTXP, lane_rows):
    """Build the PARAMVEC operands + specs for a realign-based kernel.

    ``lane_rows``: int32 (ny, NTXP) per-tile values, each broadcast over
    ``lane_div`` lanes (iv rows 1..; row 0 is the column-source row; f32
    values enter bitcast to int32 and are bitcast back in the kernel).
    Returns ([gvec, offs, iv], specs, CW).
    """
    gvec, gby, gbx = _pv_group_bases(Syc, Sxc, XG, hps, wps, VW)
    offs = (Syc - jnp.repeat(gby, XG, axis=1)).reshape(ny, 1, NTXP)
    csrc, CW = _pv_csrc(Sxc, gbx, XG, VW)
    nj = NTXP // XG
    L = XG * lane_div
    assert L <= CW and len(lane_rows) <= 7
    rows = [csrc]
    for v in lane_rows:
        r = jnp.repeat(v, lane_div, axis=1).reshape(ny, nj, L)
        rows.append(jnp.pad(r, ((0, 0), (0, 0), (0, CW - L))))
    rows += [jnp.zeros_like(rows[0])] * (8 - len(rows))
    iv = jnp.stack(rows, axis=1).reshape(ny, 8, nj * CW)
    specs = [
        pl.BlockSpec((1, 1, nj * 4), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, NTXP), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 8, CW), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    return [gvec, offs, iv], specs, CW


class _PvRealign(NamedTuple):
    """Precomputed realignment parameters threaded into _kernel_realign."""
    gvec_ref: object      # SMEM (1, 1, nj*4): gby, gbx, fit per group
    offs_ref: object      # SMEM (1, 1, NTXP): per-tile row offset Sy - gby
    csrc_ref: object      # VMEM (1, rows, nj-blocked CW): col-source lanes
    csrc_row: int = 0     # which csrc row holds this window's lanes


def _kernel_realign(src, gwin2_ref, win_ref, u_dst, sem, gsem2, pi_ref,
                    stride, Sys, Sxs, VW, XG, ROWS, hps, wps, x_ref=None,
                    pv=None, read_sxy=None):
    """Fill the (VW, XG*VW) slab ``u_dst`` with the per-tile windows of
    ``src`` at (Sys[t], Sxs[t]): group-DMA fast path with CROSS-PROGRAM
    double buffering + per-tile-DMA fallback.

    Program j waits on the group fetch issued by program j-1 (or its own at
    the start of a grid row) and issues j+1's speculative fetch before
    computing — the group DMA latency hides behind the previous program's
    compute. The group base is a pure function of the SMEM params row, so
    the issuing and consuming programs agree exactly.

    With ``pv`` (a :class:`_PvRealign`) the group bases / fit flag / row
    offsets / column-source lanes come precomputed from XLA (scalar-core
    SMEM load chains were the per-program bottleneck); ``Sys``/``Sxs`` may
    then be None and ``read_sxy()`` lazily loads them for the rare
    per-tile-DMA fallback branch."""
    jg = pl.program_id(1)
    nj = pl.num_programs(1)

    if pv is not None:
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
            gby = (jnp.clip(min_y, 0, hps - _GROWS) // 8) * 8
            gbx = (jnp.clip(min_x, 0, wps - _GCOLS) // 128) * 128
            return gby, gbx, max_y, max_x

    def issue(jg2, sl):
        b = group_base(jg2)
        pltpu.make_async_copy(
            src.at[pl.ds(b[0], _GROWS), pl.ds(b[1], _GCOLS)],
            gwin2_ref.at[sl], gsem2.at[sl]).start()

    if pv is not None:
        gby, gbx = group_base(jg)
        fit = pv.gvec_ref[0, 0, jg * 4 + 2] > 0
    else:
        gby, gbx, max_y, max_x = group_base(jg)
        fit = (((max_y - gby) <= _GROWS - VW) &
               ((max_x - gbx) <= _GCOLS - VW))

    slot = jax.lax.rem(jg, 2)

    @pl.when(jg == 0)
    def _():
        issue(jg, slot)

    pltpu.make_async_copy(
        src.at[pl.ds(gby, _GROWS), pl.ds(gbx, _GCOLS)],
        gwin2_ref.at[slot], gsem2.at[slot]).wait()

    @pl.when(jg + 1 < nj)
    def _():
        issue(jg + 1, 1 - slot)

    gwin_ref = gwin2_ref.at[slot]

    SL = XG * VW

    @pl.when(fit)
    def _():
        # column realignment of ALL tiles in one selection matmul
        if pv is not None:
            csrc = pv.csrc_ref[0, pv.csrc_row:pv.csrc_row + 1, :SL]
            dyl = [pv.offs_ref[0, 0, jg * XG + t] for t in range(XG)]
        else:
            dxv = jnp.zeros((1, SL), jnp.int32)
            dyl = []
            lv = jax.lax.broadcasted_iota(jnp.int32, (1, SL), 1) // VW
            for t in range(XG):
                dxv = dxv + (Sxs[t] - gbx) * (lv == t).astype(jnp.int32)
                dyl.append(Sys[t] - gby)
            cj = jax.lax.broadcasted_iota(jnp.int32, (_GCOLS, SL), 1)
            csrc = dxv + (cj % VW)
        ci = jax.lax.broadcasted_iota(jnp.int32, (_GCOLS, SL), 0)
        Call = (ci == csrc).astype(jnp.float32)
        X = _dot_sel(gwin_ref[:], Call)               # (_GROWS, SL)
        # (VW > _GROWS means fit is statically impossible — this branch is
        # dead then, but it still traces: keep the shape-valid matmul form)
        if x_ref is not None and VW + 8 <= x_ref.shape[0]:
            # the row realignment is a PURE shift (no staircase): one
            # dynamic sublane slice per tile instead of a 0/1 matmul
            x_ref[:_GROWS] = X
            for t in range(XG):
                u_dst[:, t * VW:(t + 1) * VW] = \
                    _dyn_rows(x_ref, dyl[t], VW, t * VW, VW)
        else:
            ri = jax.lax.broadcasted_iota(jnp.int32, (VW, _GROWS), 0)
            rj = jax.lax.broadcasted_iota(jnp.int32, (VW, _GROWS), 1)
            for t in range(XG):
                Rsel = (rj == dyl[t] + ri).astype(jnp.float32)
                u_dst[:, t * VW:(t + 1) * VW] = _sel_dot(
                    Rsel, X[:, t * VW:(t + 1) * VW])

    @pl.when(jnp.logical_not(fit))
    def _():
        Sysl, Sxsl = (read_sxy() if pv is not None and read_sxy is not None
                      else (Sys, Sxs))
        rys, rxs = [], []
        for t in range(XG):
            rys.append((Sysl[t] // 8) * 8)
            rxs.append((Sxsl[t] // 128) * 128)
            pltpu.make_async_copy(
                src.at[pl.ds(rys[t], ROWS), pl.ds(rxs[t], _DMA_COLS)],
                win_ref.at[t], sem.at[t]).start()
        ii = jax.lax.broadcasted_iota(jnp.int32, (VW, ROWS), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (VW, ROWS), 1)
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, VW), 0)
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (_DMA_COLS, VW), 1)
        for t in range(XG):
            pltpu.make_async_copy(
                src.at[pl.ds(rys[t], ROWS), pl.ds(rxs[t], _DMA_COLS)],
                win_ref.at[t], sem.at[t]).wait()
            Rsel = (jj == (Sysl[t] - rys[t]) + ii).astype(jnp.float32)
            Csel = (ii2 == (Sxsl[t] - rxs[t]) + jj2).astype(jnp.float32)
            u_dst[:, t * VW:(t + 1) * VW] = _sel_dot(
                Rsel, _dot_sel(win_ref[t], Csel))


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

def _ica_step_kernel(*args, ts, XG, WIN, ROWS, hp, wp, pv):
    if pv:
        (pi_ref, gvec_ref, offs_ref, iv_ref,
         mov_ref, ref_ref, gx_ref, gy_ref,
         out_ref, win_ref, gwin_ref, u_ref, sem, sem_g, *refs) = args
    else:
        (pi_ref, pf_ref, mov_ref, ref_ref, gx_ref, gy_ref,
         out_ref, win_ref, gwin_ref, u_ref, sem, sem_g, *refs) = args
    x_ref = refs[0] if refs else None
    jg_ = pl.program_id(1)
    SLAB = XG * WIN
    L = XG * ts

    if pv:
        def read_sxy():
            return ([pi_ref[0, 0, (jg_ * XG + t) * 4 + 0]
                     for t in range(XG)],
                    [pi_ref[0, 0, (jg_ * XG + t) * 4 + 1]
                     for t in range(XG)])

        _kernel_realign(mov_ref, gwin_ref, win_ref, u_ref, sem, sem_g,
                        pi_ref, 4, None, None, WIN, XG, ROWS, hp, wp,
                        x_ref=x_ref,
                        pv=_PvRealign(gvec_ref, offs_ref, iv_ref, 0),
                        read_sxy=read_sxy)
        bits = lambda r: jax.lax.bitcast_convert_type(
            iv_ref[0, r:r + 1, :L], jnp.float32)
        fxv, fyv = bits(1), bits(2)
        okv = iv_ref[0, 3:4, :L].astype(jnp.float32)
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
                        x_ref=x_ref)
        fxv = _lane_broadcast(fxs, ts, L)
        fyv = _lane_broadcast(fys, ts, L)
        okv = _lane_broadcast([o.astype(jnp.float32) for o in oks], ts, L)

    # constant tap-selection matrices: slab col j of the (.., XG*ts) tap
    # plane reads U-slab col (j//ts)*WIN + j%ts (+1 for the right tap)
    ti = jax.lax.broadcasted_iota(jnp.int32, (SLAB, L), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (SLAB, L), 1)
    tsrc = (tj // ts) * WIN + (tj % ts)
    tap0 = (ti == tsrc).astype(jnp.float32)
    tap1 = (ti == tsrc + 1).astype(jnp.float32)

    Uslab = u_ref[:]
    m00 = _dot_sel(Uslab[:ts], tap0)
    m01 = _dot_sel(Uslab[:ts], tap1)
    m10 = _dot_sel(Uslab[1:WIN], tap0)
    m11 = _dot_sel(Uslab[1:WIN], tap1)
    top = m00 + (m01 - m00) * fxv
    bot = m10 + (m11 - m10) * fxv
    interp = (top + (bot - top) * fyv) * okv          # (ts, XG*ts)

    gradt = interp - ref_ref[:]
    P0 = -gx_ref[:] * gradt
    P1 = -gy_ref[:] * gradt
    c0 = jnp.sum(P0, axis=0, keepdims=True)           # (1, L)
    c1 = jnp.sum(P1, axis=0, keepdims=True)
    si = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    Seg = ((si // ts) == sj).astype(jnp.float32)
    bv = _dot_sel(jnp.concatenate([c0, c1], axis=0), Seg)     # (2, 128)
    out_ref[:, :] = jnp.pad(bv, ((0, 6), (0, 0)))


def ica_step_pallas(prep, mov_pad, flow, tile_size, interpret=False):
    """One Gauss-Newton right-hand side: returns (b0, b1) each (ny, NTXP).

    ``flow`` must already be padded to (ny, NTXP, 2)."""
    ny, NTXP, _ = flow.shape
    ts = int(tile_size)
    XG = _xg(ts)
    WIN = ts + 1
    PAD = ts + 2
    ROWS = _dma_rows(WIN)

    ax = flow[..., 0]
    ay = flow[..., 1]
    ix = jnp.trunc(ax)
    iy = jnp.trunc(ay)
    ty = jnp.arange(ny, dtype=jnp.int32)[:, None]
    tx = jnp.arange(NTXP, dtype=jnp.int32)[None, :]
    Sy = ty * ts + iy.astype(jnp.int32) + PAD
    Sx = tx * ts + ix.astype(jnp.int32) + PAD
    hp, wp = mov_pad.shape
    Syc = jnp.clip(Sy, 0, hp - ROWS)
    Sxc = jnp.clip(Sx, 0, wp - _DMA_COLS)
    ok = ((Syc == Sy) & (Sxc == Sx)).astype(jnp.int32)
    pi = jnp.stack([Syc, Sxc, ok, jnp.zeros_like(ok)], axis=-1)

    kernel = functools.partial(_ica_step_kernel, ts=ts, XG=XG, WIN=WIN,
                               ROWS=ROWS, hp=hp, wp=wp, pv=_PARAMVEC)
    if _PARAMVEC:
        fx = (ax - ix).astype(DEFAULT_FLOAT)
        fy = (ay - iy).astype(DEFAULT_FLOAT)
        pvo, pvs, CW = _pv_pack(Syc, Sxc, XG, hp, wp, WIN, ts, ny, NTXP,
                                [jax.lax.bitcast_convert_type(fx, jnp.int32),
                                 jax.lax.bitcast_convert_type(fy, jnp.int32),
                                 ok])
        head_ops = [pi.reshape(ny, 1, NTXP * 4)] + pvo
        head_specs = [pl.BlockSpec((1, 1, NTXP * 4), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.SMEM)] + pvs
    else:
        pf = jnp.stack([ax - ix, ay - iy], axis=-1).astype(DEFAULT_FLOAT)
        head_ops = [pi.reshape(ny, 1, NTXP * 4), pf.reshape(ny, 1, NTXP * 2)]
        head_specs = [
            pl.BlockSpec((1, 1, NTXP * 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NTXP * 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
    grid_spec = pl.GridSpec(
        grid=(ny, NTXP // XG),
        in_specs=head_specs + [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((XG, ROWS, _DMA_COLS), jnp.float32),
            pltpu.VMEM((2, _GROWS, _GCOLS), jnp.float32),
            pltpu.VMEM((WIN, XG * WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((XG,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((_GROWS + 8, XG * WIN), jnp.float32)]
             if _REALIGN == "slice" else []),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((ny * 8, (NTXP // XG) * 128),
                                        jnp.float32),),
        interpret=interpret,
    )(*head_ops, mov_pad, prep.ref_c, prep.gx, prep.gy)[0]

    out = out.reshape(ny, 8, NTXP // XG, 128)
    b0 = out[:, 0, :, :XG].reshape(ny, NTXP)
    b1 = out[:, 1, :, :XG].reshape(ny, NTXP)
    return b0, b1


# ---------------------------------------------------------------------------
# Block-matching kernel: realign search slab + vectorized candidate argmin.
# ---------------------------------------------------------------------------

def _bm_kernel(*args, ts, XG, SWIN, ROWS, hp, wp, metric, rbm, pv):
    if pv:
        (pi_ref, gvec_ref, offs_ref, iv_ref, mov_ref, ref_ref, out_ref,
         win_ref, gwin_ref, ub_ref, eacc_ref, sem, sem_g, *refs) = args
    else:
        (pi_ref, mov_ref, ref_ref, out_ref,
         win_ref, gwin_ref, ub_ref, eacc_ref, sem, sem_g, *refs) = args
    x_ref = refs[0] if refs else None
    jg_ = pl.program_id(1)
    L = XG * ts
    n_sh = 2 * rbm + 1
    NC = n_sh * n_sh
    NCP = eacc_ref.shape[0]

    if pv:
        def read_sxy():
            return ([pi_ref[0, 0, (jg_ * XG + t) * 2 + 0]
                     for t in range(XG)],
                    [pi_ref[0, 0, (jg_ * XG + t) * 2 + 1]
                     for t in range(XG)])

        _kernel_realign(mov_ref, gwin_ref, win_ref, ub_ref, sem, sem_g,
                        pi_ref, 2, None, None, SWIN, XG, ROWS, hp, wp,
                        x_ref=x_ref,
                        pv=_PvRealign(gvec_ref, offs_ref, iv_ref, 0),
                        read_sxy=read_sxy)
    else:
        Wys, Wxs = [], []
        for t in range(XG):
            p0 = (jg_ * XG + t) * 2
            Wys.append(pi_ref[0, 0, p0 + 0])
            Wxs.append(pi_ref[0, 0, p0 + 1])

        _kernel_realign(mov_ref, gwin_ref, win_ref, ub_ref, sem, sem_g,
                        pi_ref, 2, Wys, Wxs, SWIN, XG, ROWS, hp, wp,
                        x_ref=x_ref)

    # zero the candidate-padding rows once (they enter the Seg matmul)
    if NCP > NC:
        eacc_ref[NC:NCP, :] = jnp.zeros((NCP - NC, eacc_ref.shape[1]),
                                        jnp.float32)

    if metric == "l1":
        # the column-extraction tap depends only on sx: extract the n_sh
        # full-height slabs once; the sy shift is then a free row slice.
        # per-tile errors land in lane t (segment sums below).
        bi = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, L), 0)
        bj = jax.lax.broadcasted_iota(jnp.int32, (XG * SWIN, L), 1)
        bsrc = (bj // ts) * SWIN + (bj % ts)
        cols = []
        for sx in range(n_sh):
            tap = (bi == bsrc + sx).astype(jnp.float32)
            cols.append(_dot_sel(ub_ref[:], tap))     # (SWIN, L)
        for sy in range(n_sh):
            for sx in range(n_sh):
                D = jnp.abs(ref_ref[:] - cols[sx][sy:sy + ts])
                r0 = sy * n_sh + sx
                eacc_ref[r0:r0 + 1, :L] = jnp.sum(D, axis=0, keepdims=True)
        seg_w = ts
    else:
        # O(n_sh) MXU passes: e = sum(win^2) - 2 corr (argmin-equal to
        # sum((ref - win)^2); the per-tile sum(ref^2) constant cancels).
        # Per row-shift sy, ONE cross matmul G = ref^T @ win_rows gives all
        # tiles' correlations for all sx as the diagonal band
        # G[t*ts + x, t*SWIN + x + sx]; band extraction and the win^2
        # window sums are cheap VPU mask reductions.
        SQ = ub_ref[:] * ub_ref[:]                    # (SWIN, XG*SWIN)
        pi2 = jax.lax.broadcasted_iota(jnp.int32, (L, XG * SWIN), 0)
        qi = jax.lax.broadcasted_iota(jnp.int32, (L, XG * SWIN), 1)
        same_tile = (pi2 // ts) == (qi // SWIN)
        doff = (qi % SWIN) - (pi2 % ts)               # == sx on the band
        qmod = jax.lax.broadcasted_iota(
            jnp.int32, (1, XG * SWIN), 1) % SWIN
        for sy in range(n_sh):
            G = jax.lax.dot_general(                  # (L, XG*SWIN)
                ref_ref[:], ub_ref[sy:sy + ts],
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            colsum2 = jnp.sum(SQ[sy:sy + ts], axis=0, keepdims=True)
            for sx in range(n_sh):
                band = (same_tile & (doff == sx)).astype(jnp.float32)
                drow = jnp.sum(G * band, axis=0, keepdims=True)
                valid = ((qmod >= sx) &
                         (qmod < sx + ts)).astype(jnp.float32)
                r0 = sy * n_sh + sx
                eacc_ref[r0:r0 + 1, :XG * SWIN] = \
                    (colsum2 - 2.0 * drow) * valid
        seg_w = SWIN

    # vectorized per-tile segment sums + first-min argmin over candidates
    SL = XG * seg_w
    si = jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 0)
    sj = jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 1)
    Seg = ((si // seg_w) == sj).astype(jnp.float32)
    E = _dot_sel(eacc_ref[:, :SL], Seg)               # (NCP, 128)
    ci = jax.lax.broadcasted_iota(jnp.int32, (NCP, 128), 0)
    E = jnp.where(ci < NC, E, jnp.float32(np.inf))
    best = jnp.min(E, axis=0, keepdims=True)          # (1, 128)
    idx = jnp.min(jnp.where(E <= best, ci, NC), axis=0, keepdims=True)
    dy = (idx // n_sh - rbm).astype(jnp.float32)
    dx = (idx % n_sh - rbm).astype(jnp.float32)
    out_ref[:, :] = jnp.pad(jnp.concatenate([dx, dy], axis=0),
                            ((0, 6), (0, 0)))


def bm_pallas(prep, mov_src, flow, tile_size, radius, metric, h, w,
              interpret=False):
    """Vectorized block-matching displacement: returns (dx, dy) (ny, NTXP).

    ``mov_src = (padded_image, pad)`` must carry the metric's OOB semantics
    (zero pad for L1, edge pad for L2). ``flow`` already (ny, NTXP, 2).
    """
    mov_pad, pad = mov_src
    ny, NTXP, _ = flow.shape
    ts = int(tile_size)
    XG = _xg(ts)
    rbm = int(radius)
    SWIN = ts + 2 * rbm + 1
    ROWS = _dma_rows(SWIN)
    hp, wp = mov_pad.shape

    iflow = jnp.round(flow)
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
    Wyc = jnp.clip(Wyc, 0, hp - ROWS)
    Wxc = jnp.clip(Wxc, 0, wp - _DMA_COLS)
    pi = jnp.stack([Wyc, Wxc], axis=-1)

    NC = (2 * rbm + 1) ** 2
    NCP = -(-NC // 8) * 8

    kernel = functools.partial(_bm_kernel, ts=ts, XG=XG, SWIN=SWIN,
                               ROWS=ROWS, hp=hp, wp=wp, metric=metric,
                               rbm=rbm, pv=_PARAMVEC)
    head_ops = [pi.reshape(ny, 1, NTXP * 2)]
    head_specs = [pl.BlockSpec((1, 1, NTXP * 2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.SMEM)]
    if _PARAMVEC:
        pvo, pvs, _ = _pv_pack(Wyc, Wxc, XG, hp, wp, SWIN, ts, ny, NTXP, [])
        head_ops += pvo
        head_specs += pvs
    grid_spec = pl.GridSpec(
        grid=(ny, NTXP // XG),
        in_specs=head_specs + [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((ts, XG * ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((XG, ROWS, _DMA_COLS), jnp.float32),
            pltpu.VMEM((2, _GROWS, _GCOLS), jnp.float32),
            pltpu.VMEM((SWIN, XG * SWIN), jnp.float32),
            pltpu.VMEM((NCP, max(XG * SWIN, 128)), jnp.float32),
            pltpu.SemaphoreType.DMA((XG,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((_GROWS + 8, XG * SWIN), jnp.float32)]
             if _REALIGN == "slice" else []),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((ny * 8, (NTXP // XG) * 128),
                                        jnp.float32),),
        interpret=interpret,
    )(*head_ops, mov_pad, prep.ref_c)[0]

    out = out.reshape(ny, 8, NTXP // XG, 128)
    dx = out[:, 0, :, :XG].reshape(ny, NTXP)
    dy = out[:, 1, :, :XG].reshape(ny, NTXP)
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
