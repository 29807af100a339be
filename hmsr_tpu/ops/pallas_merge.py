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

Grid: (nty, NTXP/XG) with XG tiles per program so every VMEM block's lane
dimension is 128-divisible. Scalar-prefetched per-tile parameters drive the
DMAs. f32 throughout (parity with the reference).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT

_DMA_COLS = 256         # DMA block width (cols, 2 lane tiles)


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
    params = jnp.stack([Syc + PAD, Sxc + PAD, ph_y, ph_x,
                        S2yc + CPAD, S2xc + CPAD, ph2_y, ph2_x,
                        Sy + 1, Sx + 1, S2y + 1, S2x + 1, ok,
                        jnp.zeros_like(ok)], axis=-1)
    return params


def merge_pallas(comp_img, flow, covs, r, num, den, cfa_pattern, config,
                 interpret=False):
    """Pallas drop-in for ``merge_tiled`` (bayer/grey, steerable/iso)."""
    s = int(config.scale)
    assert s == config.scale and s >= 1
    bayer = config.mode == "bayer"
    iso = config.merging.kernel == "iso"
    Ts = int(config.block_matching.tuning.tile_size)
    g = 2 if bayer else 1
    sg = s * g
    cfa = np.asarray(cfa_pattern, dtype=np.int32)

    H, W = comp_img.shape
    n_ch, out_h, out_w = num.shape
    B = Ts * s
    nty = -(-out_h // B)
    ntx = -(-out_w // B)

    WIN = Ts + 4
    CWIN = Ts // g + 4
    PAD = WIN + 1
    CPAD = CWIN + 1
    gh, gw = covs.shape[1], covs.shape[2]
    ROWS_C = _dma_rows(WIN)
    ROWS_K = _dma_rows(CWIN)
    assert WIN <= 128 and CWIN <= 128

    def pad_to(x, rows_to, cols_to, extra_rows=0, extra_cols=0):
        h0, w0 = x.shape[-2:]
        pr = (-h0) % rows_to + extra_rows
        pc = (-w0) % cols_to + extra_cols
        pad = [(0, 0)] * (x.ndim - 2) + [(0, pr), (0, pc)]
        return jnp.pad(x, pad)

    comp_pad = jnp.pad(comp_img, ((PAD, PAD), (PAD, PAD)))
    comp_pad = pad_to(comp_pad, ROWS_C, _DMA_COLS,
                      extra_rows=ROWS_C, extra_cols=_DMA_COLS)
    cov_pad = jnp.pad(covs, ((0, 0), (CPAD, CPAD), (CPAD, CPAD)), mode="edge")
    cov_pad = cov_pad.at[:, CPAD - 1, :].set(
        2.0 * cov_pad[:, CPAD, :] - cov_pad[:, CPAD + 1, :])
    cov_pad = cov_pad.at[:, :, CPAD - 1].set(
        2.0 * cov_pad[:, :, CPAD] - cov_pad[:, :, CPAD + 1])
    cov_pad = pad_to(cov_pad, ROWS_K, _DMA_COLS,
                     extra_rows=ROWS_K, extra_cols=_DMA_COLS)

    # tiles per program along x so every block's lane dim is 128-divisible
    XG = max(1, 128 // int(np.gcd(Ts, 128)))
    NTXP = -(-ntx // XG) * XG
    r_pad = jnp.pad(r, ((0, nty * Ts - H), (0, NTXP * Ts - W)), mode="edge")

    params = _precompute_tile_params(flow, s, g, Ts, H, W, gh, gw,
                                     PAD, CPAD, WIN, CWIN)
    params = params[:nty, :ntx]
    if NTXP != ntx:
        fill = jnp.zeros((nty, NTXP - ntx, 14), params.dtype)
        params = jnp.concatenate([params, fill], axis=1)
    params_flat = params.reshape(nty, 1, NTXP * 14)
    flow_t = flow[:nty, :ntx].astype(DEFAULT_FLOAT)
    if NTXP != ntx:
        flow_t = jnp.concatenate(
            [flow_t, jnp.zeros((nty, NTXP - ntx, 2), DEFAULT_FLOAT)], axis=1)
    flow_f = flow_t.reshape(nty, 1, NTXP * 2)

    rry = jnp.asarray(np.kron(np.eye(Ts, dtype=np.float32),
                              np.ones((s, 1), np.float32)))
    rrx = jnp.asarray(np.kron(np.eye(Ts, dtype=np.float32),
                              np.ones((1, s), np.float32)))

    kernel = functools.partial(
        _merge_group_kernel, s=s, g=g, Ts=Ts, B=B, XG=XG, WIN=WIN, CWIN=CWIN,
        H=H, W=W, iso=iso, bayer=bayer, n_ch=n_ch, cfa=cfa)

    grid_spec = pl.GridSpec(
        grid=(nty, NTXP // XG),
        in_specs=[
            # per-row SMEM parameter blocks (full prefetch would blow SMEM)
            pl.BlockSpec((1, 1, NTXP * 14), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # params row
            pl.BlockSpec((1, 1, NTXP * 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # flow row
            pl.BlockSpec(memory_space=pltpu.HBM),    # comp_pad
            pl.BlockSpec(memory_space=pltpu.HBM),    # cov_pad
            pl.BlockSpec((Ts, XG * Ts), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),   # r tile group
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rry
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rrx
        ],
        out_specs=[
            pl.BlockSpec((n_ch, B, XG * B), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, B, XG * B), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS_C, _DMA_COLS), jnp.float32),
            pltpu.VMEM((2, 3, ROWS_K, _DMA_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    val, acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_ch, nty * B, NTXP * B), jnp.float32),
                   jax.ShapeDtypeStruct((n_ch, nty * B, NTXP * B), jnp.float32)),
        interpret=interpret,
    )(params_flat, flow_f, comp_pad, cov_pad, r_pad, rry, rrx)

    return (num + val[:, :out_h, :out_w], den + acc[:, :out_h, :out_w])


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


def _start_dmas(slot, j, params_ref, comp_ref, cov_ref, comp_win, cov_win,
                sem_c, sem_k, iso):
    """Kick off the window DMAs for tile j into buffer ``slot``."""
    p0 = j * 14
    Syp = params_ref[0, 0, p0 + 0]
    Sxp = params_ref[0, 0, p0 + 1]
    ry_al = (Syp // 8) * 8
    rx_al = (Sxp // 128) * 128
    dma_c = pltpu.make_async_copy(
        comp_ref.at[pl.ds(ry_al, comp_win.shape[1]),
                    pl.ds(rx_al, comp_win.shape[2])],
        comp_win.at[slot], sem_c.at[slot])
    dma_c.start()
    if not iso:
        S2yp = params_ref[0, 0, p0 + 4]
        S2xp = params_ref[0, 0, p0 + 5]
        r2y_al = (S2yp // 8) * 8
        r2x_al = (S2xp // 128) * 128
        dma_k = pltpu.make_async_copy(
            cov_ref.at[:, pl.ds(r2y_al, cov_win.shape[2]),
                       pl.ds(r2x_al, cov_win.shape[3])],
            cov_win.at[slot], sem_k.at[slot])
        dma_k.start()
    return dma_c


def _wait_dmas(slot, j, params_ref, comp_ref, cov_ref, comp_win, cov_win,
               sem_c, sem_k, iso):
    p0 = j * 14
    Syp = params_ref[0, 0, p0 + 0]
    Sxp = params_ref[0, 0, p0 + 1]
    ry_al = (Syp // 8) * 8
    rx_al = (Sxp // 128) * 128
    pltpu.make_async_copy(
        comp_ref.at[pl.ds(ry_al, comp_win.shape[1]),
                    pl.ds(rx_al, comp_win.shape[2])],
        comp_win.at[slot], sem_c.at[slot]).wait()
    if not iso:
        S2yp = params_ref[0, 0, p0 + 4]
        S2xp = params_ref[0, 0, p0 + 5]
        r2y_al = (S2yp // 8) * 8
        r2x_al = (S2xp // 128) * 128
        pltpu.make_async_copy(
            cov_ref.at[:, pl.ds(r2y_al, cov_win.shape[2]),
                       pl.ds(r2x_al, cov_win.shape[3])],
            cov_win.at[slot], sem_k.at[slot]).wait()


def _merge_group_kernel(params_ref, flow_ref, comp_ref, cov_ref, r_ref,
                        rry, rrx, val_ref, acc_ref, comp_win, cov_win,
                        sem_c, sem_k,
                        *, s, g, Ts, B, XG, WIN, CWIN, H, W, iso, bayer,
                        n_ch, cfa):
    i = pl.program_id(0)
    jg_ = pl.program_id(1)
    # Phase 1 (per tile, double-buffered DMA): fetch + realign windows and
    # interpolate/invert covariances. Per-tile results are kept as values.
    tiles = []
    _start_dmas(0, jg_ * XG, params_ref, comp_ref, cov_ref, comp_win, cov_win,
                sem_c, sem_k, iso)
    for t in range(XG):
        j = jg_ * XG + t
        if t + 1 < XG:
            _start_dmas((t + 1) % 2, j + 1, params_ref, comp_ref, cov_ref,
                        comp_win, cov_win, sem_c, sem_k, iso)
        _wait_dmas(t % 2, j, params_ref, comp_ref, cov_ref, comp_win, cov_win,
                   sem_c, sem_k, iso)
        tiles.append(_prep_tile(t, i, j, params_ref, flow_ref, r_ref, rry, rrx,
                                comp_win.at[t % 2], cov_win.at[t % 2],
                                s=s, g=g, Ts=Ts, B=B, WIN=WIN, CWIN=CWIN,
                                H=H, W=W, iso=iso))

    # Phase 2 (group-wide slabs): all tap math on (B, XG*B) arrays.
    def cat(key):
        return jnp.concatenate([tl[key] for tl in tiles], axis=-1)

    U_taps = {}
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            U_taps[(di, dj)] = jnp.concatenate(
                [tl["U"][s * (di + 1):s * (di + 1) + B,
                         s * (dj + 1):s * (dj + 1) + B] for tl in tiles],
                axis=-1)

    center_i = cat("center_i")
    center_j = cat("center_j")
    wr = cat("wr")
    dist_ref_y = cat("dist_ref_y")
    dist_ref_x = cat("dist_ref_x")
    if not iso:
        ixx = cat("ixx")
        ixy = cat("ixy")
        iyy = cat("iyy")

    vals = [jnp.zeros((B, XG * B), jnp.float32) for _ in range(n_ch)]
    accs = [jnp.zeros((B, XG * B), jnp.float32) for _ in range(n_ch)]
    for di in (-1, 0, 1):
        ig = center_i + di
        inb_i = (ig >= 0) & (ig < H)
        pi = ig % 2
        dist_y = ig.astype(jnp.float32) - dist_ref_y
        for dj in (-1, 0, 1):
            jg2 = center_j + dj
            inb = inb_i & (jg2 >= 0) & (jg2 < W)
            pj = jg2 % 2
            dist_x = jg2.astype(jnp.float32) - dist_ref_x
            c = U_taps[(di, dj)]
            if iso:
                z = 2.0 * (dist_x * dist_x + dist_y * dist_y)
            else:
                z = ixx * dist_x * dist_x + 2.0 * ixy * dist_x * dist_y \
                    + iyy * dist_y * dist_y
            z = jnp.maximum(z, 0.0)
            w = jnp.exp(-0.5 * z) * wr * inb
            if bayer:
                ch = jnp.where(pi == 0,
                               jnp.where(pj == 0, cfa[0, 0], cfa[0, 1]),
                               jnp.where(pj == 0, cfa[1, 0], cfa[1, 1]))
                for k in range(n_ch):
                    mask = (ch == k).astype(jnp.float32)
                    vals[k] = vals[k] + w * c * mask
                    accs[k] = accs[k] + w * mask
            else:
                vals[0] = vals[0] + w * c
                accs[0] = accs[0] + w

    for k in range(n_ch):
        val_ref[k] = vals[k]
        acc_ref[k] = accs[k]


def _prep_tile(t, i, j, params_ref, flow_ref, r_ref, rry, rrx,
               comp_win, cov_win,
               *, s, g, Ts, B, WIN, CWIN, H, W, iso):
    sg = s * g
    half = jnp.float32(0.5)
    SEG = B + 2 * s
    CSEG = B + 2 * sg

    p0 = j * 14
    Syp = params_ref[0, 0, p0 + 0]        # window start in padded coords
    Sxp = params_ref[0, 0, p0 + 1]
    ph_y = params_ref[0, 0, p0 + 2]
    ph_x = params_ref[0, 0, p0 + 3]
    S2yp = params_ref[0, 0, p0 + 4]
    S2xp = params_ref[0, 0, p0 + 5]
    ph2_y = params_ref[0, 0, p0 + 6]
    ph2_x = params_ref[0, 0, p0 + 7]
    Sy1 = params_ref[0, 0, p0 + 8]
    Sx1 = params_ref[0, 0, p0 + 9]
    S2y1 = params_ref[0, 0, p0 + 10]
    S2x1 = params_ref[0, 0, p0 + 11]
    ok = params_ref[0, 0, p0 + 12]
    fx = flow_ref[0, 0, j * 2 + 0]
    fy = flow_ref[0, 0, j * 2 + 1]

    # window DMAs were issued by the group loop (double buffered); compute
    # the in-buffer remainders
    dy = Syp - (Syp // 8) * 8
    dx = Sxp - (Sxp // 128) * 128
    if not iso:
        dy2 = S2yp - (S2yp // 8) * 8
        dx2 = S2xp - (S2xp // 128) * 128

    r_loc = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)      # (B, 1)
    c_loc = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)      # (1, B)

    # ---- geometry
    center_i = Sy1 + (r_loc + ph_y) // s
    center_j = Sx1 + (c_loc + ph_x) // s
    Rrow = (i * B + r_loc).astype(jnp.float32)
    Ccol = (j * B + c_loc).astype(jnp.float32)
    lr_y = (Rrow + half) / s
    lr_x = (Ccol + half) / s
    lr_mov_y = lr_y + fy
    lr_mov_x = lr_x + fx
    inb_center = ((lr_mov_y >= 0) & (lr_mov_y < H) &
                  (lr_mov_x >= 0) & (lr_mov_x < W) & (ok > 0))

    local_r = _sel_dot(rry[:], _dot_sel(r_ref[:, t * Ts:(t + 1) * Ts],
                                        rrx[:]))
    wr = jnp.where(inb_center, local_r, 0.0)

    # ---- selection-matmul realignment + upsampling: U = R @ (dma @ C).
    # Right-to-left order halves the MACs; the bf16x3 split in _sel_dot /
    # _dot_sel keeps the copy exact at single-pass MXU cost.
    Rsel = _selection_rows(SEG, comp_win.shape[0], dy, ph_y, s)
    Csel = _selection_rows(SEG, comp_win.shape[1], dx, ph_x, s).T
    U = _sel_dot(Rsel, _dot_sel(comp_win[:], Csel))        # (SEG, SEG)

    if not iso:
        crows = cov_win.shape[1]
        R2 = _selection_rows(CSEG, crows, dy2, ph2_y, sg)
        C2 = _selection_rows(CSEG, cov_win.shape[2], dx2, ph2_x, sg).T
        # one column matmul for all 3 cov channels (they share the selection)
        Y2 = _dot_sel(cov_win[:].reshape(3 * crows, cov_win.shape[2]), C2)
        cc_win = [_sel_dot(R2, Y2[ch * crows:(ch + 1) * crows])
                  for ch in range(3)]                      # 3 x (CSEG, CSEG)

        kfloor_y = S2y1 + (r_loc + ph2_y) // sg
        kfloor_x = S2x1 + (c_loc + ph2_x) // sg
        kmap_y = lr_mov_y / g - half
        kmap_x = lr_mov_x / g - half
        frac_y = kmap_y - kfloor_y.astype(jnp.float32)
        frac_x = kmap_x - kfloor_x.astype(jnp.float32)

        def ctap(ch, dyy, dxx):
            return cc_win[ch][sg * (dyy + 1):sg * (dyy + 1) + B,
                              sg * (dxx + 1):sg * (dxx + 1) + B]

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

    out = {
        "U": U,
        "center_i": jnp.broadcast_to(center_i, (B, B)),
        "center_j": center_j,                    # (1, B)
        "wr": wr,                                # (B, B)
        "dist_ref_y": jnp.broadcast_to(lr_mov_y - half, (B, B)),
        "dist_ref_x": lr_mov_x - half,           # (1, B)
    }
    if not iso:
        out["ixx"] = ixx
        out["ixy"] = ixy
        out["iyy"] = iyy
    return out
