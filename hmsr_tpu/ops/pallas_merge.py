"""Pallas TPU kernel for the merge accumulation hot path (Alg. 4).

Fuses the whole per-tile computation — window fetch, covariance interpolation
+ inversion, 3x3 kernel-regression accumulation — into one VMEM-resident
program per HR tile group, with flow-dependent windows fetched by async DMA
from HBM at TILE-ALIGNED offsets (Mosaic DMA slices must respect the (8, 128)
tiling) and realigned on the MXU:

    U = R_y @ dma_block @ C_x

where R_y/C_x are dynamic 0/1 selection matrices built from iota comparisons
(``R_y[i, j] = (j == rem + (i + ph_y)//s)``). One pair of small matmuls per
window simultaneously performs the sub-tile alignment shift, the s-fold
nearest upsampling, and the phase normalization — no dynamic lane indexing
anywhere (Mosaic cannot lower it).

Grid: (nty/YG, NTXP/XG) with a (YG, XG) tile block per program so every
VMEM block's lane dimension is 128-divisible and the per-program fixed cost
(grid dispatch, DMA issue/wait, scalar prologue) is amortized over YG*XG
tiles (YG row-blocking mirrors pallas_ica; HMSR_MERGE_YG). Scalar-prefetched
per-tile parameters drive the DMAs. f32 throughout (parity with the
reference).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT

_DMA_COLS = 256         # DMA block width (cols, 2 lane tiles)

# program width multiplier (see pallas_ica._XG_MULT)
import os as _os
_XG_MULT = max(1, int(_os.environ.get("HMSR_MERGE_XG", "2")))

#: program HEIGHT: YG tile ROWS per program (sublane batching, mirroring
#: pallas_ica._YG_MULT). Requires the vectorized parameter planes
#: (HMSR_PARAMVEC=1). Default 1: measured at 12MP/Ts=16 (coherent frames,
#: tools/bisect_pipeline.py, round 4), YG=4 REGRESSES the merge stage
#: 0.50 s -> 0.97 s per burst (through-merge 1.629 s -> 2.097 s, identical
#: checksums). Unlike the short-bodied ICA/BM/warp programs, the merge
#: slab phase is a LONG serial VPU body — YG-stacking serializes YG slab
#: phases inside one program and kills cross-program DMA/compute
#: pipelining (same lesson as the fused BM+GN experiment, CLAUDE.md).
#: The knob stays for re-testing on other geometries/backends.
_YG_MULT = max(1, int(_os.environ.get("HMSR_MERGE_YG", "1")))


def _yg(ts):
    if not _PARAMVEC:
        return 1
    return max(1, min(_YG_MULT, 64 // int(ts), 4))

#: row-realignment strategy: "matmul" (default) uses per-tile 0/1 selection
#: matmuls (XG small MXU ops per program x 3 bf16 passes — the MXU is idle
#: during the VPU-bound slab phase, so these are nearly free; measured 64 ms
#: faster than "slice" on the 12MP merge stage); "slice" upsamples the
#: column-aligned slab once (sublane repeat) and takes one dynamic sublane
#: slice per tile (8 masked shifted adds per tile on the VPU — the
#: contended unit).
_REALIGN = _os.environ.get("HMSR_REALIGN", "matmul")

def _gcols(span):
    """Group-window width for an XG-tile x-span: the windows' column extent
    plus one 128-lane tile of base-alignment slack, rounded to 128 lanes.
    (Comp and cov windows get their own width — the cov grid's span is g
    times narrower, so one shared constant wasted ~25% of the cov DMA.)"""
    return (-(-span // 128)) * 128 + 128

#: vectorized parameter planes (default ON; HMSR_PARAMVEC=0 reverts): every
#: per-tile quantity the slab phase needs is precomputed on the XLA side as
#: (8, XG*B) lane planes + per-GROUP DMA bases, so the kernel's scalar core
#: reads ~45 SMEM words per program instead of ~290 (the 14 x XG scalar
#: loads + XG-deep min/max chains dominated the per-program fixed cost:
#: measured ~2.5 us/program via the Ts=16 vs Ts=32 bench delta).
_PARAMVEC = _os.environ.get("HMSR_PARAMVEC", "1") != "0"

#: DIAGNOSTIC ONLY (tools/bisect_pipeline.py): stub out parts of the merge
#: kernel to attribute its per-program time. Values: "" (off, production),
#: "noexp" (replace exp with a linear ramp), "notap" (skip the 9-tap loop),
#: "nocov" (skip covariance realign/interp, use iso weights). Output is
#: WRONG under any non-empty value, so (like tpu.rob_trunc) it refuses to
#: run unless the profiling harness has also set HMSR_DEBUG_TRUNC=1 — a
#: stray env var from a diag session must not silently poison production.


def _read_diag():
    diag = _os.environ.get("HMSR_MERGE_DIAG", "")
    if diag and _os.environ.get("HMSR_DEBUG_TRUNC") != "1":
        raise ValueError(
            "HMSR_MERGE_DIAG is a profiling-only knob that stubs out parts "
            "of the merge kernel (output becomes meaningless). Unset it, or "
            "set HMSR_DEBUG_TRUNC=1 if you are attributing performance.")
    return diag


_DIAG = _read_diag()


def _dma_rows(win):
    """Rows of the aligned DMA block covering a win-row window + 8-alignment."""
    return -(-(win + 8) // 8) * 8


def _precompute_tile_params(flow, s, g, Ts, H, W, gh, gw, PAD, CPAD, WIN, CWIN):
    """Per-tile integer window offsets and phases (XLA side, tiny)."""
    B = Ts * s
    sg = s * g
    fx = flow[..., 0].astype(DEFAULT_FLOAT)
    fy = flow[..., 1].astype(DEFAULT_FLOAT)
    ny, nx = flow.shape[:2]
    ty = jnp.arange(ny, dtype=jnp.int32)[:, None]
    tx = jnp.arange(nx, dtype=jnp.int32)[None, :]

    def win_params(m, base0, n_img, pad, win_sz, rep):
        base = base0 + m
        S = jnp.floor_divide(base, rep) - 1
        ph = base - rep * (S + 1)
        Sc = jnp.clip(S, -pad, n_img + pad - win_sz)
        return S, Sc, ph

    m_y = jnp.floor(0.5 + s * fy).astype(jnp.int32)
    m_x = jnp.floor(0.5 + s * fx).astype(jnp.int32)
    Sy, Syc, ph_y = win_params(m_y, ty * B, H, PAD, WIN, s)
    Sx, Sxc, ph_x = win_params(m_x, tx * B, W, PAD, WIN, s)

    m2_y = jnp.floor(0.5 + s * fy - 0.5 * sg).astype(jnp.int32)
    m2_x = jnp.floor(0.5 + s * fx - 0.5 * sg).astype(jnp.int32)
    S2y, S2yc, ph2_y = win_params(m2_y, ty * B, gh, CPAD, CWIN, sg)
    S2x, S2xc, ph2_x = win_params(m2_x, tx * B, gw, CPAD, CWIN, sg)

    ok = ((Syc == Sy) & (Sxc == Sx)).astype(jnp.int32)
    # slot 13: the tile row's ABSOLUTE HR row base (ty*B) — the kernel reads
    # it instead of program_id so a band of tile rows can run at any offset
    # (space-sharded accumulator layout, parallel/sharded.py).
    params = jnp.stack([Syc + PAD, Sxc + PAD, ph_y, ph_x,
                        S2yc + CPAD, S2xc + CPAD, ph2_y, ph2_x,
                        Sy + 1, Sx + 1, S2y + 1, S2x + 1, ok,
                        jnp.broadcast_to(ty * B, ok.shape)], axis=-1)
    return params


def _group_bases(params, XG, GR_C, GCOLS, hpc, wpc, WIN,
                 GR_K, hpk, wpk, CWIN, iso, GCOLS_K=None, yg=1):
    """Per-(row-block, group) speculative DMA bases + fit flags, precomputed.

    Mirrors the kernel's ``bounds()`` / ``fit`` logic exactly (min/max of the
    (yg, XG) tile-block window corners, clipped and 8/128-aligned). Layout:
    (nb//yg, 1, nj*8) int32 rows of [gby_c, gbx_c, gbyk, gbxk, fit_c, fit_k,
    0, 0] per group.
    """
    nb, NTXP, _ = params.shape
    nj = NTXP // XG
    nbB = nb // yg
    p = params.reshape(nbB, yg, nj, XG, params.shape[-1])

    def base(vals, lim, align, gr):
        mn = jnp.min(vals, axis=(1, 3))
        return (jnp.clip(mn, 0, lim - gr) // align) * align, \
            jnp.max(vals, axis=(1, 3))

    gby, mxy = base(p[..., 0], hpc, 8, GR_C)
    gbx, mxx = base(p[..., 1], wpc, 128, GCOLS)
    fit_c = ((mxy - gby <= GR_C - WIN) &
             (mxx - gbx <= GCOLS - WIN)).astype(jnp.int32)
    if iso:
        gbyk = gbxk = fit_k = jnp.zeros_like(gby)
    else:
        GCOLS_K = GCOLS if GCOLS_K is None else GCOLS_K
        gbyk, mxyk = base(p[..., 4], hpk, 8, GR_K)
        gbxk, mxxk = base(p[..., 5], wpk, 128, GCOLS_K)
        fit_k = ((mxyk - gbyk <= GR_K - CWIN) &
                 (mxxk - gbxk <= GCOLS_K - CWIN)).astype(jnp.int32)
    z = jnp.zeros_like(gby)
    g8 = jnp.stack([gby, gbx, gbyk, gbxk, fit_c, fit_k, z, z], axis=-1)
    return g8.reshape(nbB, 1, nj * 8), (gby, gbx), (gbyk, gbxk)


def _csrc_planes(params, XG, SEG, CSEG, s, sg, gbx, gbxk, iso):
    """Column-source index lane planes for the group realignment.

    Row 0: ``csrc_c[l] = (Sxp[t] - gbx) + (c + phx[t]) // s`` with
    ``t = l // SEG``, ``c = l % SEG`` (exactly the kernel's previous
    ``dxv + ((cj % SEG) + phv) // s``); row 1: the covariance twin over
    CSEG/sg. (nb, 8, nj * CW) int32, CW 128-aligned.
    """
    nb, NTXP, _ = params.shape
    nj = NTXP // XG
    CW = -(-max(XG * SEG, XG * CSEG) // 128) * 128

    def one(kS, kph, seg, rep, gb):
        c = jnp.arange(seg, dtype=jnp.int32)[None, None, None, :]
        S = params[:, :, kS].reshape(nb, nj, XG, 1)
        ph = params[:, :, kph].reshape(nb, nj, XG, 1)
        v = (S - gb[:, :, None, None]) + (c + ph) // rep
        v = v.reshape(nb, nj, XG * seg)
        return jnp.pad(v, ((0, 0), (0, 0), (0, CW - XG * seg)))

    rows = [one(1, 3, SEG, s, gbx)]
    rows.append(jnp.zeros_like(rows[0]) if iso
                else one(5, 7, CSEG, sg, gbxk))
    rows += [jnp.zeros_like(rows[0])] * 6
    return jnp.stack(rows, axis=1).reshape(nb, 8, nj * CW), CW


def _lane_planes(params, flow_t, s, g, B, H, W, iso):
    """Per-lane (HR column) parameter planes, precomputed on the XLA side.

    Every formula matches the kernel's previous in-kernel scalar/lanevec
    computation bit-for-bit (same f32 ops, same int arithmetic) — this is a
    pure restructuring so the kernel's scalar core stops being the
    bottleneck. Returns (iv (nb, 8, NTXP*B) int32, fv (nb, 8, NTXP*B) f32):

    iv rows: 0 Sy1, 1 phy, 2 center_j, 3 S2y1, 4 ph2y, 5 HR row base (ty*B)
    fv rows: 0 fy, 1 lr_mov_x, 2 frac_x, 3 xok (x-in-bounds & tile-ok)
    """
    nb, NTXP, _ = params.shape
    half = jnp.float32(0.5)
    sg = s * g
    b = jnp.arange(B, dtype=jnp.int32)[None, None, :]        # lane in tile

    def tile(k):
        return params[:, :, k][..., None]                    # (nb, NTXP, 1)

    Sy1, Sx1, S2y1, S2x1 = tile(8), tile(9), tile(10), tile(11)
    phy, phx, ph2y, ph2x = tile(2), tile(3), tile(6), tile(7)
    ok = tile(12)
    center_j = Sx1 + (b + phx) // s                          # (nb, NTXP, B)
    tx = jnp.arange(NTXP, dtype=jnp.int32)[None, :, None]
    Ccol = (tx * B + b).astype(DEFAULT_FLOAT)
    fx = flow_t[:, :, 0][..., None]
    fy = flow_t[:, :, 1][..., None]
    lr_mov_x = (Ccol + half) / s + fx
    xok = ((lr_mov_x >= 0) & (lr_mov_x < W) & (ok > 0)).astype(jnp.float32)
    if iso:
        frac_x = jnp.zeros_like(lr_mov_x)
    else:
        kfloor_x = S2x1 + (b + ph2x) // sg
        frac_x = lr_mov_x / g - half - kfloor_x.astype(jnp.float32)

    def plane(rows, dtype):
        rows = [jnp.broadcast_to(r, (nb, NTXP, B)).astype(dtype)
                for r in rows]
        rows += [jnp.zeros((nb, NTXP, B), dtype)] * (8 - len(rows))
        return jnp.stack(rows, axis=1).reshape(nb, 8, NTXP * B)

    iv = plane([Sy1, phy, center_j, S2y1, ph2y, tile(13)], jnp.int32)
    fv = plane([jnp.broadcast_to(fy, (nb, NTXP, B)), lr_mov_x, frac_x, xok],
               jnp.float32)
    return iv, fv


def padded_accum_shape(config, in_shape, n_ch=None):
    """Accumulator geometry that lets :func:`merge_pallas` accumulate
    IN-PLACE (input/output aliasing): (n_ch, nty*B, NTXP*B) covering the
    (out_h, out_w) = scale * in_shape image. Carry num/den at this shape
    through the burst scan and crop once at the end."""
    s = int(config.scale)
    Ts = int(config.block_matching.tuning.tile_size)
    bayer = config.mode == "bayer"
    if n_ch is None:
        n_ch = 3 if bayer else 1
    H, W = in_shape
    out_h, out_w = s * H, s * W
    B = Ts * s
    # rows padded to a multiple of the YG row-block so the (YG, XG)-tile
    # program grid covers the accumulator exactly (excess rows have ok=0
    # params -> exactly zero contribution; cropped by the caller)
    nty = -(-(-(-out_h // B)) // _yg(Ts)) * _yg(Ts)
    ntx = -(-out_w // B)
    XG = _XG_MULT * max(1, 128 // int(np.gcd(Ts, 128)))
    NTXP = -(-ntx // XG) * XG
    return (n_ch, nty * B, NTXP * B)


def merge_pallas(comp_img, flow, covs, r, num, den, cfa_pattern, config,
                 interpret=False, row_offset=0):
    """Pallas drop-in for ``merge_tiled`` (bayer/grey, steerable/iso).

    When ``num``/``den`` arrive at :func:`padded_accum_shape` geometry the
    kernel accumulates into them in place (input/output aliasing — no val/acc
    materialization, no XLA add, ~2.3 GB less HBM traffic per frame at 48MP);
    otherwise it materializes the frame contribution and adds (legacy path).

    ``row_offset`` (python int or traced scalar, a multiple of B = Ts*s)
    supports the space-sharded accumulator layout (parallel/sharded.py):
    num/den then hold a BAND of tile rows — shape (n_ch, nb*B, NTXP*B) with
    nb*B the band height — covering global HR rows [row_offset,
    row_offset + nb*B). Tile rows beyond the image grid contribute exactly
    zero (their ok-flag is 0). Requires the padded (in-place) geometry.
    """
    return _merge_frames_pallas(
        comp_img[None], flow[None], covs[None], r[None], num, den,
        cfa_pattern, config, interpret=interpret, row_offset=row_offset)


def merge_burst_pallas(comp_stack, flows, covs_stack, r_stack, num, den,
                       cfa_pattern, config, interpret=False):
    """Burst-fused merge: accumulate EVERY frame of ``comp_stack`` (leading
    axis F) in ONE pallas_call with a (rows, groups, frames) grid, frames
    innermost.

    The output block index map ignores the frame axis, so each HR tile
    group's num/den block stays resident in VMEM across all F frames and is
    written back to HBM exactly once — the scan formulation's per-frame
    accumulator round trips (2 x ~590 MB read + write per frame at 48MP,
    ~45 GB over a 20-frame burst) collapse to one visit. Mathematically
    identical to F sequential :func:`merge_pallas` calls (same per-frame
    slab math, same f32 accumulation order).

    Requires the padded in-place accumulator geometry
    (:func:`padded_accum_shape`) and the vectorized parameter planes
    (HMSR_PARAMVEC=1, the default): the cross-program speculative DMA
    pipeline reads the NEXT program's window bases from a gvec SMEM row
    that holds all frames of a tile row.
    """
    return _merge_frames_pallas(comp_stack, flows, covs_stack, r_stack,
                                num, den, cfa_pattern, config,
                                interpret=interpret, row_offset=0)


def _merge_frames_pallas(comp_stack, flow_stack, covs_stack, r_stack,
                         num, den, cfa_pattern, config,
                         interpret=False, row_offset=0):
    s = int(config.scale)
    assert s == config.scale and s >= 1
    bayer = config.mode == "bayer"
    iso = config.merging.kernel == "iso" or _DIAG == "nocov"
    Ts = int(config.block_matching.tuning.tile_size)
    g = 2 if bayer else 1
    sg = s * g
    cfa = np.asarray(cfa_pattern, dtype=np.int32)

    F, H, W = comp_stack.shape
    if F > 1:
        assert _PARAMVEC, "the burst-fused grid requires HMSR_PARAMVEC=1 " \
            "(speculative DMA bases of the next frame live in the gvec row)"
    n_ch = num.shape[0]
    out_h, out_w = s * H, s * W          # true (unpadded) output extent
    B = Ts * s
    nty = -(-out_h // B)
    ntx = -(-out_w // B)

    WIN = Ts + 4
    CWIN = Ts // g + 4
    PAD = WIN + 1
    CPAD = CWIN + 1
    gh, gw = covs_stack.shape[2], covs_stack.shape[3]
    ROWS_C = _dma_rows(WIN)
    ROWS_K = _dma_rows(CWIN)
    assert WIN <= 128 and CWIN <= 128

    def pad_to(x, rows_to, cols_to, extra_rows=0, extra_cols=0):
        h0, w0 = x.shape[-2:]
        pr = (-h0) % rows_to + extra_rows
        pc = (-w0) % cols_to + extra_cols
        pad = [(0, 0)] * (x.ndim - 2) + [(0, pr), (0, pc)]
        return jnp.pad(x, pad)

    comp_pad = jnp.pad(comp_stack, ((0, 0), (PAD, PAD), (PAD, PAD)))
    comp_pad = pad_to(comp_pad, ROWS_C, _DMA_COLS,
                      extra_rows=ROWS_C, extra_cols=_DMA_COLS)
    cov_pad = jnp.pad(covs_stack,
                      ((0, 0), (0, 0), (CPAD, CPAD), (CPAD, CPAD)),
                      mode="edge")
    cov_pad = cov_pad.at[:, :, CPAD - 1, :].set(
        2.0 * cov_pad[:, :, CPAD, :] - cov_pad[:, :, CPAD + 1, :])
    cov_pad = cov_pad.at[:, :, :, CPAD - 1].set(
        2.0 * cov_pad[:, :, :, CPAD] - cov_pad[:, :, :, CPAD + 1])
    cov_pad = pad_to(cov_pad, ROWS_K, _DMA_COLS,
                     extra_rows=ROWS_K, extra_cols=_DMA_COLS)

    # tiles per program along x so every block's lane dim is 128-divisible
    XG = _XG_MULT * max(1, 128 // int(np.gcd(Ts, 128)))
    NTXP = -(-ntx // XG) * XG

    # band geometry: nb tile rows starting at tile row row_offset // B.
    # Full-grid callers (nb >= nty, offset 0) keep the all-static fast path.
    in_place = (num.shape[1] % B == 0 and num.shape[2] == NTXP * B
                and num.shape == den.shape)
    static_zero_off = isinstance(row_offset, int) and row_offset == 0
    nb = num.shape[1] // B if in_place else nty
    if not in_place:
        assert static_zero_off, \
            "row_offset requires the padded_accum_shape (band) geometry"
    banded = in_place and (nb < nty or not static_zero_off)
    # YG row-blocking: the grid rows must divide into YG-blocks; callers at
    # the padded_accum_shape geometry do by construction, anything else
    # (legacy row counts, odd sharded bands) falls back to YG=1
    YG = _yg(Ts)
    if in_place and nb % YG:
        YG = 1
    if banded:
        # static row bound every band fits in: ceil(nty/nb) bands of nb rows
        nty_p = -(-nty // nb) * nb
        grid_rows = nb
    else:
        grid_rows = nb if in_place else -(-nty // YG) * YG
        nty_p = grid_rows

    r_pad = jnp.pad(r_stack, ((0, 0), (0, nty_p * Ts - H),
                              (0, NTXP * Ts - W)), mode="edge")

    params = jax.vmap(lambda fl: _precompute_tile_params(
        fl, s, g, Ts, H, W, gh, gw, PAD, CPAD, WIN, CWIN))(flow_stack)
    params = params[:, :nty, :ntx]
    if NTXP != ntx:
        fill = jnp.zeros((F, nty, NTXP - ntx, 14), params.dtype)
        params = jnp.concatenate([params, fill], axis=2)
    flow_t = flow_stack[:, :nty, :ntx].astype(DEFAULT_FLOAT)
    if NTXP != ntx:
        flow_t = jnp.concatenate(
            [flow_t, jnp.zeros((F, nty, NTXP - ntx, 2), DEFAULT_FLOAT)],
            axis=2)
    if nty_p != nty:
        # zero params rows: ok-flag 0 -> zero contribution (see docstring)
        params = jnp.concatenate(
            [params, jnp.zeros((F, nty_p - nty, NTXP, 14), params.dtype)],
            axis=1)
        flow_t = jnp.concatenate(
            [flow_t, jnp.zeros((F, nty_p - nty, NTXP, 2), flow_t.dtype)],
            axis=1)
    if banded:
        t0 = jnp.asarray(row_offset, jnp.int32) // B
        params = jax.lax.dynamic_slice_in_dim(params, t0, nb, axis=1)
        flow_t = jax.lax.dynamic_slice_in_dim(flow_t, t0, nb, axis=1)
        r_pad = jax.lax.dynamic_slice_in_dim(r_pad, t0 * Ts, nb * Ts, axis=1)
    nbB = grid_rows // YG              # row-blocks in the program grid
    params_flat = params.reshape(F * nbB, 1, YG * NTXP * 14)
    flow_f = flow_t.reshape(F * nbB, 1, YG * NTXP * 2)

    GCOLS_C = _gcols(XG * Ts + WIN)
    GCOLS_K = _gcols(XG * Ts // g + CWIN)
    # group windows cover a (YG, XG) tile block: consecutive tile rows step
    # Ts (comp) / Ts//g (cov) source rows, plus the same flow-variation
    # slack margins as the YG=1 layout
    GR_C = _dma_rows((YG - 1) * Ts + WIN) + 16
    GR_K = _dma_rows((YG - 1) * (Ts // g) + CWIN) + 16
    if _PARAMVEC:
        gvec, (gby_a, gbx_a), (gbyk_a, gbxk_a) = jax.vmap(
            lambda p: _group_bases(
                p, XG, GR_C, GCOLS_C,
                comp_pad.shape[1], comp_pad.shape[2], WIN,
                GR_K, cov_pad.shape[2], cov_pad.shape[3],
                CWIN, iso, GCOLS_K=GCOLS_K, yg=YG))(params)
        # one SMEM row per ROW-BLOCK holding ALL frames' group bases — the
        # speculative DMA issue for the next grid step (same group, frame
        # n+1, or group j+1, frame 0) reads across the frame axis
        gvec = jnp.transpose(gvec, (1, 0, 2, 3)).reshape(
            nbB, 1, F * gvec.shape[-1])
        repy = lambda a: jnp.repeat(a, YG, axis=1) if YG > 1 else a
        rep = lambda a: jnp.repeat(repy(a), XG, axis=2)      # (F, rows, NTXP)
        off_c = (params[..., 0] - rep(gby_a)) * s + params[..., 2]
        off_k = (params[..., 4] - rep(gbyk_a)) * sg + params[..., 6] \
            if not iso else jnp.zeros_like(off_c)
        offs = jnp.stack([off_c, off_k], axis=-1).reshape(
            F * nbB, 1, YG * NTXP * 2)
        iv, fv = jax.vmap(lambda p, f: _lane_planes(
            p, f, s, g, B, H, W, iso))(params, flow_t)
        # row-block rb's planes at sublanes [rb*8, rb*8+8) (pallas_ica
        # _pv_pack layout)
        iv = iv.reshape(F * nbB, YG * 8, NTXP * B)
        fv = fv.reshape(F * nbB, YG * 8, NTXP * B)
        CW = -(-max(XG * (B + 2 * s), XG * (B + 2 * sg)) // 128) * 128
        cv = jax.vmap(lambda p, gx, gxk: _csrc_planes(
            p, XG, B + 2 * s, B + 2 * sg, s, sg, gx, gxk, iso)[0]
        )(params, repy(gbx_a), repy(gbxk_a))
        cv = cv.reshape(F * nbB, YG * 8, cv.shape[-1])

    rry = jnp.asarray(np.kron(np.eye(YG * Ts, dtype=np.float32),
                              np.ones((s, 1), np.float32)))
    rrx = jnp.asarray(np.kron(np.eye(XG * Ts, dtype=np.float32),
                              np.ones((1, s), np.float32)))

    # The two xup scratch slabs of the slice strategy (~0.7 MB at Ts=64)
    # push the Ts=64/x2 geometry 28 KB past the 16 MB scoped-VMEM limit
    # (measured: dark64 bench AOT OOM). Ts=64 runs few, huge programs, so
    # the per-tile matmul realignment it falls back to is launch-cheap.
    use_slice = _REALIGN == "slice" and Ts <= 32
    SEG = B + 2 * s
    CSEG = B + 2 * sg
    # row-block sublane pitch in the U / covariance slabs (8-aligned so
    # every block start is a legal static sublane offset; YG=1 keeps the
    # exact legacy slab shapes)
    SEGP = SEG if YG == 1 else -(-SEG // 8) * 8
    CSEGP = CSEG if YG == 1 else -(-CSEG // 8) * 8
    kernel = functools.partial(
        _merge_group_kernel, s=s, g=g, Ts=Ts, B=B, XG=XG, WIN=WIN, CWIN=CWIN,
        H=H, W=W, iso=iso, bayer=bayer, n_ch=n_ch, cfa=cfa,
        hpc=comp_pad.shape[1], wpc=comp_pad.shape[2],
        hpk=cov_pad.shape[2], wpk=cov_pad.shape[3], in_place=in_place,
        use_slice=use_slice, pv=_PARAMVEC, F=F,
        YG=YG, SEGP=SEGP, CSEGP=CSEGP)

    # frames innermost: the accumulator index map ignores n, so the num/den
    # block is revisited in place across all F frames (written back once)
    acc_spec = pl.BlockSpec((n_ch, YG * B, XG * B), lambda i, j, n: (0, i, j),
                            memory_space=pltpu.VMEM)
    pv_specs = [
        pl.BlockSpec((1, 1, F * (NTXP // XG) * 8), lambda i, j, n: (i, 0, 0),
                     memory_space=pltpu.SMEM),       # group bases + fits
        pl.BlockSpec((1, 1, YG * NTXP * 2), lambda i, j, n: (n * nbB + i, 0, 0),
                     memory_space=pltpu.SMEM),       # per-tile slice offsets
        pl.BlockSpec((1, YG * 8, XG * B), lambda i, j, n: (n * nbB + i, 0, j),
                     memory_space=pltpu.VMEM),       # int lane planes
        pl.BlockSpec((1, YG * 8, XG * B), lambda i, j, n: (n * nbB + i, 0, j),
                     memory_space=pltpu.VMEM),       # f32 lane planes
        pl.BlockSpec((1, YG * 8, CW), lambda i, j, n: (n * nbB + i, 0, j),
                     memory_space=pltpu.VMEM),       # column-source planes
    ] if _PARAMVEC else []
    grid_spec = pl.GridSpec(
        grid=(nbB, NTXP // XG, F),
        in_specs=[
            # per-row-block SMEM parameter blocks (full prefetch would blow
            # SMEM)
            pl.BlockSpec((1, 1, YG * NTXP * 14),
                         lambda i, j, n: (n * nbB + i, 0, 0),
                         memory_space=pltpu.SMEM),   # params rows
            pl.BlockSpec((1, 1, YG * NTXP * 2),
                         lambda i, j, n: (n * nbB + i, 0, 0),
                         memory_space=pltpu.SMEM),   # flow rows
            pl.BlockSpec(memory_space=pltpu.HBM),    # comp_pad (F, hpc, wpc)
            pl.BlockSpec(memory_space=pltpu.HBM),    # cov_pad (F, 3, ...)
            pl.BlockSpec((1, YG * Ts, XG * Ts), lambda i, j, n: (n, i, j),
                         memory_space=pltpu.VMEM),   # r tile block
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rry
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rrx
        ] + pv_specs + ([acc_spec, acc_spec] if in_place else []),
        out_specs=[acc_spec, acc_spec],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS_C, _DMA_COLS), jnp.float32),   # tile fallback
            pltpu.VMEM((2, 3, ROWS_K, _DMA_COLS), jnp.float32),
            pltpu.VMEM((2, GR_C, GCOLS_C), jnp.float32),       # comp group x2
            pltpu.VMEM((2, 3, GR_K, GCOLS_K if not iso else 128),
                       jnp.float32),                           # cov group x2
            pltpu.VMEM((YG * SEGP, XG * SEG), jnp.float32),    # U slab
            pltpu.VMEM((3, YG * CSEGP, XG * CSEG), jnp.float32),
        ] + ([
            # upsampled column-aligned slabs for the dynamic-slice row
            # realignment (comp; covariance per channel); +8 rows of slack
            # for the 8-aligned reads of _dyn_rows
            pltpu.VMEM((s * GR_C + 8, XG * SEG), jnp.float32),
            pltpu.VMEM((sg * GR_K + 8, XG * CSEG), jnp.float32),
        ] if use_slice else []) + [
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    operands = [params_flat, flow_f, comp_pad, cov_pad, r_pad, rry, rrx]
    if _PARAMVEC:
        operands += [gvec, offs, iv, fv, cv]
    n_in = len(operands)
    if in_place:
        operands += [num, den]
    # under shard_map the outputs inherit num's varying mesh axes (vma);
    # outside one jax.typeof(...).vma is the empty frozenset -> plain struct
    vma = getattr(jax.typeof(num), "vma", frozenset())
    out_struct = jax.ShapeDtypeStruct((n_ch, grid_rows * B, NTXP * B),
                                      jnp.float32, vma=vma if vma else None)
    val, acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_struct, out_struct),
        input_output_aliases={n_in: 0, n_in + 1: 1} if in_place else {},
        interpret=interpret,
    )(*operands)

    if in_place:
        return val, acc
    return (num + val[:, :out_h, :out_w], den + acc[:, :out_h, :out_w])


def _dyn_rows(src_ref, off, rows, col0, cols):
    """``src_ref[off:off+rows, col0:col0+cols]`` for an ARBITRARY dynamic
    row offset.

    Mosaic only lowers dynamic sublane indices it can prove are multiples
    of 8, so this reads an 8-aligned (rows+8)-row block at ``(off//8)*8``
    (the ``//8*8`` form is provable) and resolves the sub-8 residual
    ``r`` by a masked sum over the 8 statically shifted copies
    ``blk[r0:r0+rows]`` — all-static slices + VPU selects.
    (``pltpu.roll`` with a dynamic shift would be one op, but its
    ``tpu.dynamic_rotate`` lowering INTERNAL-errors on non-tile-aligned
    shapes on this backend, e.g. vector<28x20xf32>.)
    """
    off8 = (off // 8) * 8
    r = off - off8
    blk = src_ref[pl.ds(off8, rows + 8), col0:col0 + cols]
    out = jnp.where(r == 0, blk[:rows], 0.0)
    for r0 in range(1, 8):
        out = out + jnp.where(r == r0, blk[r0:r0 + rows], 0.0)
    return out


def _selection_rows(n_out, n_in, rem, ph, rep):
    """R[i, j] = 1.0 where j == rem + (i + ph)//rep  — (n_out, n_in) f32."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    return (jj == rem + (ii + ph) // rep).astype(jnp.float32)


def _f32_parts(x):
    """Split f32 into three exactly-bf16-representable f32 terms (h+m+l == x).

    Truncation (mask the low 16 bits of the f32 encoding) keeps each residual
    subtraction exact, so DEFAULT-precision (single-pass bf16) MXU matmuls of
    each part against a 0/1 selection matrix reconstruct the f32 values
    bit-exactly at half the cost of ``Precision.HIGHEST`` (6 passes).
    """
    mask = jnp.int32(-65536)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    h = jax.lax.bitcast_convert_type(bits & mask, jnp.float32)
    r = x - h
    rbits = jax.lax.bitcast_convert_type(r, jnp.int32)
    m = jax.lax.bitcast_convert_type(rbits & mask, jnp.float32)
    return h, m, r - m


def _sel_dot(sel, x):
    """Exact ``sel @ x`` for a 0/1 selection matrix (bf16x3 split of x)."""
    h, m, l = _f32_parts(x)
    d = lambda p: jnp.dot(sel, p, preferred_element_type=jnp.float32)
    return (d(h) + d(m)) + d(l)


def _dot_sel(x, sel):
    """Exact ``x @ sel`` for a 0/1 selection matrix (bf16x3 split of x)."""
    h, m, l = _f32_parts(x)
    d = lambda p: jnp.dot(p, sel, preferred_element_type=jnp.float32)
    return (d(h) + d(m)) + d(l)


def _merge_group_kernel(params_ref, flow_ref, comp_ref, cov_ref, r_ref,
                        rry, rrx, *refs,
                        s, g, Ts, B, XG, WIN, CWIN, H, W, iso, bayer,
                        n_ch, cfa, hpc, wpc, hpk, wpk, in_place, use_slice,
                        pv=False, F=1, YG=1, SEGP=None, CSEGP=None):
    """One output block of (YG, XG) tiles.

    Window fetches use ONE speculative group DMA per program for the
    comp image (and one for the covariance grid): the (YG, XG) tile windows
    are adjacent and flow is smooth, so they almost always fit one
    (GROWS, GCOLS) block; a per-tile-DMA fallback keeps exactness for
    wild flow. Realigned windows land in the U / covariance slabs (row-block
    rb at sublanes [rb*SEGP, ...)) and ALL remaining math (guide-grid
    bilinear covariance interpolation, 2x2 inversion, 3x3 kernel-regression
    taps) runs on (B, XG*B) slabs per row-block.
    """
    # YG>1 row-block paths read per-row-block parameters only via the
    # vectorized planes; the non-pv branches below fall back to rb=0 scalars
    # and would silently corrupt row blocks 1.. if _yg() ever allowed YG>1
    # without _PARAMVEC. Fail loudly instead.
    assert YG == 1 or pv, "YG>1 requires the vectorized parameter planes"
    refs = list(refs)
    if pv:
        gvec_ref, offs_ref, iv_ref, fv_ref, cv_ref = refs[:5]
        refs = refs[5:]
    else:
        gvec_ref = offs_ref = iv_ref = fv_ref = cv_ref = None
    if in_place:
        num_ref, den_ref = refs[:2]
        refs = refs[2:]
    else:
        num_ref = den_ref = None
    (val_ref, acc_ref,
     comp_win, cov_win, gwin_c, gwin_k, u_slab, cc_slab) = refs[:8]
    refs = refs[8:]
    if use_slice:
        xup_c, xup_k = refs[:2]
        refs = refs[2:]
    else:
        xup_c = xup_k = None
    sem_c, sem_k, gsem_c, gsem_k = refs
    jg_ = pl.program_id(1)
    n_ = pl.program_id(2)
    half = jnp.float32(0.5)
    sg = s * g
    SEG = B + 2 * s
    CSEG = B + 2 * sg
    SEGP = SEG if SEGP is None else SEGP
    CSEGP = CSEG if CSEGP is None else CSEGP
    GR_C, GCOLS = gwin_c.shape[1], gwin_c.shape[2]
    GR_K, GCOLS_K = gwin_k.shape[2], gwin_k.shape[3]
    gwin_k2 = gwin_k
    ROWS_C = comp_win.shape[1]
    ROWS_K = cov_win.shape[2]
    NT = pl.num_programs(1) * XG       # SMEM row pitch (tiles per grid row)

    # ---- per-tile scalars. With pv the slab phase reads precomputed lane
    # planes / group bases instead, so P is materialized LAZILY (scalar SMEM
    # loads only happen in the branches that still need them: the per-tile
    # DMA fallbacks and the Ts=64 matmul realignment).
    names = ["Syp", "Sxp", "phy", "phx", "S2yp", "S2xp", "ph2y", "ph2x",
             "Sy1", "Sx1", "S2y1", "S2x1", "okl"]

    def read_P(rb=0):
        P = {n: [] for n in names}
        for t in range(XG):
            p0 = (rb * NT + jg_ * XG + t) * 14
            for k, n in enumerate(names):
                P[n].append(params_ref[0, 0, p0 + k])
        return P

    P = None   # bound so nested closures' free-var cells always exist
    if not pv:
        P = read_P()
        fxl, fyl = [], []
        for t in range(XG):
            fxl.append(flow_ref[0, 0, (jg_ * XG + t) * 2 + 0])
            fyl.append(flow_ref[0, 0, (jg_ * XG + t) * 2 + 1])

    def bounds(ys, xs, GR, hp, wp, gcols):
        mny = mxy = ys[0]
        mnx = mxx = xs[0]
        for t in range(1, XG):
            mny = jnp.minimum(mny, ys[t])
            mxy = jnp.maximum(mxy, ys[t])
            mnx = jnp.minimum(mnx, xs[t])
            mxx = jnp.maximum(mxx, xs[t])
        gby = (jnp.clip(mny, 0, hp - GR) // 8) * 8
        gbx = (jnp.clip(mnx, 0, wp - gcols) // 128) * 128
        return gby, gbx, mxy, mxx

    def lanevec(vals, lane_of):
        out = jnp.zeros(lane_of.shape, jnp.int32)
        for t in range(XG):
            out = out + vals[t] * (lane_of == t).astype(jnp.int32)
        return out

    # ---- speculative group fetches with CROSS-PROGRAM double buffering:
    # program j waits on the fetches issued by program j-1 (or its own at
    # the start of a grid row) and issues j+1's before computing — the DMA
    # latency hides behind the previous program's compute. Bases are pure
    # functions of the SMEM params/gvec row, so issuer and consumer agree.
    nj = pl.num_programs(1)

    if pv:
        def bases_of(jg2, n2):
            # values are pre-aligned; the //8*8 / //128*128 forms re-prove
            # the alignment to Mosaic (SMEM loads carry no divisibility)
            b0 = (n2 * nj + jg2) * 8
            c = ((gvec_ref[0, 0, b0 + 0] // 8) * 8,
                 (gvec_ref[0, 0, b0 + 1] // 128) * 128)
            if iso:
                return c, None
            return c, ((gvec_ref[0, 0, b0 + 2] // 8) * 8,
                       (gvec_ref[0, 0, b0 + 3] // 128) * 128)
    else:
        def bases_of(jg2, n2):
            # non-pv supports F == 1 only (asserted host-side): params_ref
            # holds just the current frame's row, so n2 is always == n_
            ys = [params_ref[0, 0, (jg2 * XG + t) * 14 + 0]
                  for t in range(XG)]
            xs = [params_ref[0, 0, (jg2 * XG + t) * 14 + 1]
                  for t in range(XG)]
            gby, gbx, mxy, mxx = bounds(ys, xs, GR_C, hpc, wpc, GCOLS)
            fc = ((mxy - gby) <= GR_C - WIN) & ((mxx - gbx) <= GCOLS - WIN)
            if iso:
                return (gby, gbx, fc), None
            ys2 = [params_ref[0, 0, (jg2 * XG + t) * 14 + 4]
                   for t in range(XG)]
            xs2 = [params_ref[0, 0, (jg2 * XG + t) * 14 + 5]
                   for t in range(XG)]
            gbyk, gbxk, mxyk, mxxk = bounds(ys2, xs2, GR_K, hpk, wpk,
                                            GCOLS_K)
            fk = ((mxyk - gbyk) <= GR_K - CWIN) & \
                 ((mxxk - gbxk) <= GCOLS_K - CWIN)
            return (gby, gbx, fc), (gbyk, gbxk, fk)

    def issue(jg2, n2, sl):
        c, kk = bases_of(jg2, n2)
        pltpu.make_async_copy(
            comp_ref.at[n2, pl.ds(c[0], GR_C), pl.ds(c[1], GCOLS)],
            gwin_c.at[sl], gsem_c.at[sl]).start()
        if not iso:
            pltpu.make_async_copy(
                cov_ref.at[n2, :, pl.ds(kk[0], GR_K), pl.ds(kk[1], GCOLS_K)],
                gwin_k.at[sl], gsem_k.at[sl]).start()

    c, kk = bases_of(jg_, n_)
    if pv:
        gby, gbx = c
        fit_c = gvec_ref[0, 0, (n_ * nj + jg_) * 8 + 4] > 0
        if not iso:
            gbyk, gbxk = kk
            fit_k = gvec_ref[0, 0, (n_ * nj + jg_) * 8 + 5] > 0
    else:
        gby, gbx, fit_c = c
        if not iso:
            gbyk, gbxk, fit_k = kk

    # linear step index within a tile row: frames innermost, then groups
    lin = jg_ * F + n_
    slot = jax.lax.rem(lin, 2)

    @pl.when(lin == 0)
    def _():
        issue(jg_, n_, slot)

    @pl.when(lin + 1 < nj * F)
    def _():
        nxt = lin + 1
        issue(nxt // F, jax.lax.rem(nxt, F), 1 - slot)

    pltpu.make_async_copy(
        comp_ref.at[n_, pl.ds(gby, GR_C), pl.ds(gbx, GCOLS)],
        gwin_c.at[slot], gsem_c.at[slot]).wait()
    gwin_c = gwin_c.at[slot]

    # ---- comp realignment/upsampling into the U slab
    @pl.when(fit_c)
    def _():
        ci = jax.lax.broadcasted_iota(jnp.int32, (GCOLS, XG * SEG), 0)
        gh_, gm_, gl_ = _f32_parts(gwin_c[:])   # bf16 split hoisted over rb
        ri = jax.lax.broadcasted_iota(jnp.int32, (SEG, GR_C), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (SEG, GR_C), 1)
        for rb in range(YG):
            if pv:
                csrc = cv_ref[0, rb * 8:rb * 8 + 1, :XG * SEG]
            else:
                lC = jax.lax.broadcasted_iota(
                    jnp.int32, (1, XG * SEG), 1) // SEG
                dxv = lanevec([P["Sxp"][t] - gbx for t in range(XG)], lC)
                phv = lanevec(P["phx"], lC)
                cj = jax.lax.broadcasted_iota(jnp.int32, (GCOLS, XG * SEG), 1)
                csrc = dxv + ((cj % SEG) + phv) // s
            Call = (ci == csrc).astype(jnp.float32)
            d0 = lambda p: jnp.dot(p, Call,
                                   preferred_element_type=jnp.float32)
            X = (d0(gh_) + d0(gm_)) + d0(gl_)           # (GR_C, XG*SEG)

            def off_of(t):
                # per-tile row offset (Syp - gby)*s + phy from the offs
                # plane; rem/ph recovered by constant div (phy in [0, s))
                if pv:
                    off = offs_ref[0, 0, (rb * NT + jg_ * XG + t) * 2]
                    rem = off // s
                    return off, rem, off - rem * s
                return ((P["Syp"][t] - gby) * s + P["phy"][t],
                        P["Syp"][t] - gby, P["phy"][t])

            if xup_c is not None and SEG + 8 <= xup_c.shape[0]:
                # row realignment via ONE static s-fold sublane repeat + a
                # dynamic sublane slice per tile: Xup[k] = X[k // s], so
                # Xup[s*(Syp-gby) + phy + i] == X[(Syp-gby) + (i+phy)//s]
                # — exact, no per-tile MXU work (lane dim stays static)
                xup_c[:s * GR_C] = jnp.repeat(X, s, axis=0) if s > 1 else X
                for t in range(XG):
                    off, _, _ = off_of(t)
                    u_slab[rb * SEGP:rb * SEGP + SEG,
                           t * SEG:(t + 1) * SEG] = \
                        _dyn_rows(xup_c, off, SEG, t * SEG, SEG)
            else:
                xh, xm, xl = _f32_parts(X)      # split hoisted out of the loop
                for t in range(XG):
                    _, rem, ph = off_of(t)
                    Rsel = (rj == rem + (ri + ph) // s).astype(jnp.float32)
                    sl = slice(t * SEG, (t + 1) * SEG)
                    d = lambda p: jnp.dot(Rsel, p[:, sl],
                                          preferred_element_type=jnp.float32)
                    u_slab[rb * SEGP:rb * SEGP + SEG, sl] = \
                        (d(xh) + d(xm)) + d(xl)

    @pl.when(jnp.logical_not(fit_c))
    def _():
        for rb in range(YG):
            Pl = read_P(rb) if pv else P
            rys = [(Pl["Syp"][t] // 8) * 8 for t in range(XG)]
            rxs = [(Pl["Sxp"][t] // 128) * 128 for t in range(XG)]

            def start(t):
                pltpu.make_async_copy(
                    comp_ref.at[n_, pl.ds(rys[t], ROWS_C),
                                pl.ds(rxs[t], _DMA_COLS)],
                    comp_win.at[t % 2], sem_c.at[t % 2]).start()

            start(0)
            for t in range(XG):
                if t + 1 < XG:
                    start(t + 1)
                pltpu.make_async_copy(
                    comp_ref.at[n_, pl.ds(rys[t], ROWS_C),
                                pl.ds(rxs[t], _DMA_COLS)],
                    comp_win.at[t % 2], sem_c.at[t % 2]).wait()
                Rsel = _selection_rows(SEG, ROWS_C, Pl["Syp"][t] - rys[t],
                                       Pl["phy"][t], s)
                Csel = _selection_rows(SEG, _DMA_COLS, Pl["Sxp"][t] - rxs[t],
                                       Pl["phx"][t], s).T
                u_slab[rb * SEGP:rb * SEGP + SEG,
                       t * SEG:(t + 1) * SEG] = _sel_dot(
                    Rsel, _dot_sel(comp_win[t % 2], Csel))

    # ---- covariance realignment/upsampling into the cc slab
    if not iso:
        pltpu.make_async_copy(
            cov_ref.at[n_, :, pl.ds(gbyk, GR_K), pl.ds(gbxk, GCOLS_K)],
            gwin_k2.at[slot], gsem_k.at[slot]).wait()
        gwin_k = gwin_k2.at[slot]

        @pl.when(fit_k)
        def _():
            if _DIAG == "covfast":
                # DIAGNOSTIC: skip the whole cov realign (wrong values,
                # right DMA/taps) — isolates column+row realign cost
                for ch in range(3):
                    for rb in range(YG):
                        cc_slab[ch, rb * CSEGP:rb * CSEGP + CSEG, :] = \
                            jnp.broadcast_to(gwin_k[ch, :CSEG, :1],
                                             (CSEG, XG * CSEG)) + 1.0
                return
            ci = jax.lax.broadcasted_iota(jnp.int32, (GCOLS_K, XG * CSEG), 0)
            kh_, km_, kl_ = _f32_parts(gwin_k[:].reshape(3 * GR_K, GCOLS_K))
            ri3 = jax.lax.broadcasted_iota(
                jnp.int32, (3 * CSEG, 3 * GR_K), 0)
            rj3 = jax.lax.broadcasted_iota(
                jnp.int32, (3 * CSEG, 3 * GR_K), 1)
            samech = (ri3 // CSEG) == (rj3 // GR_K)
            i3 = ri3 % CSEG
            j3 = rj3 % GR_K
            for rb in range(YG):
                if pv:
                    ck = cv_ref[0, rb * 8 + 1:rb * 8 + 2, :XG * CSEG]
                else:
                    lK = jax.lax.broadcasted_iota(
                        jnp.int32, (1, XG * CSEG), 1) // CSEG
                    dxv = lanevec([P["S2xp"][t] - gbxk for t in range(XG)],
                                  lK)
                    phv = lanevec(P["ph2x"], lK)
                    cj = jax.lax.broadcasted_iota(
                        jnp.int32, (GCOLS_K, XG * CSEG), 1)
                    ck = dxv + ((cj % CSEG) + phv) // sg
                Ck = (ci == ck).astype(jnp.float32)
                dk = lambda p: jnp.dot(p, Ck,
                                       preferred_element_type=jnp.float32)
                Yk = (dk(kh_) + dk(km_)) + dk(kl_)    # (3*GR_K, XG*CSEG)

                def off2_of(t):
                    if pv:
                        off = offs_ref[0, 0,
                                       (rb * NT + jg_ * XG + t) * 2 + 1]
                        rem = off // sg
                        return off, rem, off - rem * sg
                    return ((P["S2yp"][t] - gbyk) * sg + P["ph2y"][t],
                            P["S2yp"][t] - gbyk, P["ph2y"][t])

                if _DIAG == "covnorow":
                    # DIAGNOSTIC: column realign only (wrong rows) —
                    # isolates the per-tile ROW realign cost
                    for ch in range(3):
                        cc_slab[ch, rb * CSEGP:rb * CSEGP + CSEG, :] = \
                            Yk[ch * GR_K:ch * GR_K + CSEG, :]
                elif xup_k is not None and CSEG + 8 <= xup_k.shape[0]:
                    # same repeat+dynamic-sublane-slice rewrite as the comp
                    # path, per covariance channel (bounds the scratch size)
                    for ch in range(3):
                        xup_k[:sg * GR_K] = jnp.repeat(
                            Yk[ch * GR_K:(ch + 1) * GR_K], sg, axis=0)
                        for t in range(XG):
                            off, _, _ = off2_of(t)
                            cc_slab[ch, rb * CSEGP:rb * CSEGP + CSEG,
                                    t * CSEG:(t + 1) * CSEG] = \
                                _dyn_rows(xup_k, off, CSEG, t * CSEG, CSEG)
                else:
                    # per-tile row realign of all 3 channels in ONE
                    # selection matmul: block-diagonal R3 = kron(I3, R2_t)
                    # applied to the channel-stacked column slice (3 MXU ops
                    # per tile instead of 9; the f32 split of Yk is hoisted
                    # out of the loop)
                    yh, ym, yl = _f32_parts(Yk)
                    for t in range(XG):
                        _, rem2, ph2 = off2_of(t)
                        R3 = (samech &
                              (j3 == rem2 +
                               (i3 + ph2) // sg)).astype(jnp.float32)
                        sl = slice(t * CSEG, (t + 1) * CSEG)
                        d = lambda p: jnp.dot(
                            R3, p[:, sl], preferred_element_type=jnp.float32)
                        out3 = (d(yh) + d(ym)) + d(yl)
                        for ch in range(3):
                            cc_slab[ch, rb * CSEGP:rb * CSEGP + CSEG, sl] = \
                                out3[ch * CSEG:(ch + 1) * CSEG]

        @pl.when(jnp.logical_not(fit_k))
        def _():
            for rb in range(YG):
                Pl = read_P(rb) if pv else P
                rys = [(Pl["S2yp"][t] // 8) * 8 for t in range(XG)]
                rxs = [(Pl["S2xp"][t] // 128) * 128 for t in range(XG)]

                def start(t):
                    pltpu.make_async_copy(
                        cov_ref.at[n_, :, pl.ds(rys[t], ROWS_K),
                                   pl.ds(rxs[t], _DMA_COLS)],
                        cov_win.at[t % 2], sem_k.at[t % 2]).start()

                start(0)
                for t in range(XG):
                    if t + 1 < XG:
                        start(t + 1)
                    pltpu.make_async_copy(
                        cov_ref.at[n_, :, pl.ds(rys[t], ROWS_K),
                                   pl.ds(rxs[t], _DMA_COLS)],
                        cov_win.at[t % 2], sem_k.at[t % 2]).wait()
                    R2 = _selection_rows(CSEG, ROWS_K,
                                         Pl["S2yp"][t] - rys[t],
                                         Pl["ph2y"][t], sg)
                    C2 = _selection_rows(CSEG, _DMA_COLS,
                                         Pl["S2xp"][t] - rxs[t],
                                         Pl["ph2x"][t], sg).T
                    Y2 = _dot_sel(
                        cov_win[t % 2].reshape(3 * ROWS_K, _DMA_COLS), C2)
                    for ch in range(3):
                        cc_slab[ch, rb * CSEGP:rb * CSEGP + CSEG,
                                t * CSEG:(t + 1) * CSEG] = _sel_dot(
                            R2, Y2[ch * ROWS_K:(ch + 1) * ROWS_K])

    # ---- shared slab phase: geometry, covariance interp/inversion, taps —
    # per row-block on (B, XG*B) planes (lane params read from the rb-th
    # sublane block of the iv/fv planes); one tall matmul upsamples the
    # whole (YG*Ts, XG*Ts) robustness block at once.
    r_loc = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, XG * B), 1)
    c_mod = lane % B
    lb = lane // B

    def lanef(vals):
        out = jnp.zeros((1, XG * B), jnp.float32)
        for t in range(XG):
            out = out + vals[t] * (lb == t).astype(jnp.float32)
        return out

    local_r_full = _sel_dot(rry[:], _dot_sel(r_ref[0], rrx[:]))

    for rb in range(YG):
        if pv:
            # all per-tile lane quantities precomputed on the XLA side (the
            # scalar-core SMEM load chains were the per-program bottleneck)
            Sy1v = iv_ref[0, rb * 8 + 0:rb * 8 + 1, :]
            phyv = iv_ref[0, rb * 8 + 1:rb * 8 + 2, :]
            center_j = iv_ref[0, rb * 8 + 2:rb * 8 + 3, :]
            fyv = fv_ref[0, rb * 8 + 0:rb * 8 + 1, :]
            # absolute HR row base (iv slot 5, == ty*B) — NOT program_id,
            # so a row band can run at any global offset (sharded path)
            Rrow = (iv_ref[0, rb * 8 + 5:rb * 8 + 6, :] +
                    r_loc).astype(jnp.float32)
        else:
            Sy1v = lanevec(P["Sy1"], lb)
            Sx1v = lanevec(P["Sx1"], lb)
            phyv = lanevec(P["phy"], lb)
            phxv = lanevec(P["phx"], lb)
            okv = lanevec(P["okl"], lb)
            fxv = lanef(fxl)
            fyv = lanef(fyl)
            center_j = Sx1v + (c_mod + phxv) // s       # (1, XG*B)
            Rrow = (params_ref[0, 0, (jg_ * XG) * 14 + 13] +
                    r_loc).astype(jnp.float32)

        center_i = Sy1v + (r_loc + phyv) // s           # (B, XG*B)
        lr_mov_y = (Rrow + half) / s + fyv
        if pv:
            lr_mov_x = fv_ref[0, rb * 8 + 1:rb * 8 + 2, :]
            inb_center = ((lr_mov_y >= 0) & (lr_mov_y < H) &
                          (fv_ref[0, rb * 8 + 3:rb * 8 + 4, :] > 0))
        else:
            Ccol = (jg_ * (XG * B) + lane).astype(jnp.float32)
            lr_mov_x = (Ccol + half) / s + fxv
            inb_center = ((lr_mov_y >= 0) & (lr_mov_y < H) &
                          (lr_mov_x >= 0) & (lr_mov_x < W) & (okv > 0))

        wr = jnp.where(inb_center, local_r_full[rb * B:(rb + 1) * B], 0.0)
        dist_ref_y = lr_mov_y - half
        dist_ref_x = lr_mov_x - half

        Uv = u_slab[:]
        U_taps = {}
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                r0 = rb * SEGP + s * (di + 1)
                U_taps[(di, dj)] = jnp.concatenate(
                    [Uv[r0:r0 + B,
                        t * SEG + s * (dj + 1):t * SEG + s * (dj + 1) + B]
                     for t in range(XG)], axis=-1)

        if not iso:
            if pv:
                S2y1v = iv_ref[0, rb * 8 + 3:rb * 8 + 4, :]
                ph2yv = iv_ref[0, rb * 8 + 4:rb * 8 + 5, :]
                frac_x = fv_ref[0, rb * 8 + 2:rb * 8 + 3, :]
            else:
                S2y1v = lanevec(P["S2y1"], lb)
                S2x1v = lanevec(P["S2x1"], lb)
                ph2yv = lanevec(P["ph2y"], lb)
                ph2xv = lanevec(P["ph2x"], lb)
                kfloor_x = S2x1v + (c_mod + ph2xv) // sg
                frac_x = lr_mov_x / g - half - kfloor_x.astype(jnp.float32)
            kfloor_y = S2y1v + (r_loc + ph2yv) // sg
            frac_y = lr_mov_y / g - half - kfloor_y.astype(jnp.float32)

            CCv = cc_slab[:]

            def ctap(ch, dyy, dxx):
                r0 = rb * CSEGP + sg * (dyy + 1)
                return jnp.concatenate(
                    [CCv[ch, r0:r0 + B,
                         t * CSEG + sg * (dxx + 1):
                         t * CSEG + sg * (dxx + 1) + B]
                     for t in range(XG)], axis=-1)

            cc = []
            for ch in range(3):
                c00 = ctap(ch, 0, 0)
                c01 = ctap(ch, 0, 1)
                c10 = ctap(ch, 1, 0)
                c11 = ctap(ch, 1, 1)
                top = c00 + frac_x * (c01 - c00)
                bot = c10 + frac_x * (c11 - c10)
                cc.append(top + frac_y * (bot - top))
            det = cc[0] * cc[2] - cc[1] * cc[1]
            inv_det = 1.0 / det
            ixx = inv_det * cc[2]
            ixy = -inv_det * cc[1]
            iyy = inv_det * cc[0]

        # hoist everything that depends on only one loop index out of the
        # 9-tap loop: the VPU is the contended unit here (measured), so the
        # di x dj body should touch only the cross terms.
        row_p = {}                       # per-di: bounds, parity, dy, dy^2
        for di in (-1, 0, 1):
            ig = center_i + di
            dist_y = ig.astype(jnp.float32) - dist_ref_y
            row_p[di] = ((ig >= 0) & (ig < H), ig % 2, dist_y,
                         dist_y * dist_y)
        col_p = {}                       # per-dj: bounds, parity, dx, dx^2
        for dj in (-1, 0, 1):
            jg2 = center_j + dj
            dist_x = jg2.astype(jnp.float32) - dist_ref_x
            col_p[dj] = ((jg2 >= 0) & (jg2 < W), jg2 % 2, dist_x,
                         dist_x * dist_x)
        if bayer:
            # CFA channel = cfa[ig%2, jg2%2]: tap (di, dj) has parities
            # (center_i + di) % 2 / (center_j + dj) % 2, so the 9 taps share
            # 4 precomputed channel-mask-plane sets keyed by (di & 1, dj & 1)
            def masks_for(pi, pj):
                ch = jnp.where(pi == 0,
                               jnp.where(pj == 0, cfa[0, 0], cfa[0, 1]),
                               jnp.where(pj == 0, cfa[1, 0], cfa[1, 1]))
                return [(ch == k).astype(jnp.float32) for k in range(n_ch)]

            pc, qc = row_p[0][1], col_p[0][1]
            ch_mask = {(p, q): masks_for((pc + p) % 2, (qc + q) % 2)
                       for p in (0, 1) for q in (0, 1)}

        vals = [jnp.zeros((B, XG * B), jnp.float32) for _ in range(n_ch)]
        accs = [jnp.zeros((B, XG * B), jnp.float32) for _ in range(n_ch)]
        taps = () if _DIAG == "notap" else (-1, 0, 1)
        if _DIAG == "notap":
            for k in range(n_ch):
                vals[k] = wr * U_taps[(0, 0)]
                accs[k] = wr + 0.0
        for di in taps:
            inb_i, _, dist_y, dy2 = row_p[di]
            for dj in taps:
                inb_j, _, dist_x, dx2 = col_p[dj]
                inb = inb_i & inb_j
                c = U_taps[(di, dj)]
                if iso:
                    z = 2.0 * (dx2 + dy2)
                else:
                    z = ixx * dx2 + 2.0 * ixy * dist_x * dist_y + iyy * dy2
                z = jnp.maximum(z, 0.0)
                if _DIAG == "noexp":
                    w = jnp.maximum(1.0 - z, 0.0) * wr * inb
                else:
                    w = jnp.exp(-0.5 * z) * wr * inb
                if bayer:
                    wc = w * c
                    for k, mask in enumerate(ch_mask[(di & 1, dj & 1)]):
                        vals[k] = vals[k] + wc * mask
                        accs[k] = accs[k] + w * mask
                else:
                    vals[0] = vals[0] + w * c
                    accs[0] = accs[0] + w

        out_rows = slice(rb * B, (rb + 1) * B)
        if F == 1:
            for k in range(n_ch):
                if in_place:
                    val_ref[k, out_rows, :] = num_ref[k, out_rows, :] + vals[k]
                    acc_ref[k, out_rows, :] = den_ref[k, out_rows, :] + accs[k]
                else:
                    val_ref[k, out_rows, :] = vals[k]
                    acc_ref[k, out_rows, :] = accs[k]
        else:
            # frames innermost + frame-independent output index map: the
            # block is revisited in VMEM — initialize at n == 0, accumulate
            @pl.when(n_ == 0)
            def _():
                for k in range(n_ch):
                    val_ref[k, out_rows, :] = \
                        (num_ref[k, out_rows, :] + vals[k]) if in_place \
                        else vals[k]
                    acc_ref[k, out_rows, :] = \
                        (den_ref[k, out_rows, :] + accs[k]) if in_place \
                        else accs[k]

            @pl.when(n_ > 0)
            def _():
                for k in range(n_ch):
                    val_ref[k, out_rows, :] = val_ref[k, out_rows, :] + vals[k]
                    acc_ref[k, out_rows, :] = acc_ref[k, out_rows, :] + accs[k]
