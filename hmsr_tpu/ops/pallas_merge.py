"""Pallas TPU kernel for the merge accumulation hot path (Alg. 4).

Fuses the whole per-tile computation — window fetch, covariance interpolation
+ inversion, 3x3 kernel-regression accumulation — into one VMEM-resident
program per HR tile, with the flow-dependent windows fetched by explicit
async DMA from HBM (BlockSpec index maps cannot express data-dependent
offsets; scalar-prefetched per-tile parameters drive the DMA).

Mosaic constraints shaping the implementation:
- no dynamic-slice on values: windows are staged in VMEM scratch refs;
- no dynamic offsets on the LANE (minor) dimension of vector loads: the
  lane phase ``ph_x`` lives in [0, s) (and [0, s*g) for the covariance
  grid), so lane-dynamic reads are an explicit select over the s (or s*g)
  possible static slices; sublane offsets may be dynamic (pl.ds).

Grid: one program per alignment tile (nty, ntx). f32 throughout.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.types import DEFAULT_FLOAT


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

    comp_pad = jnp.pad(comp_img, ((PAD, PAD), (PAD, PAD)))
    cov_pad = jnp.pad(covs, ((0, 0), (CPAD, CPAD), (CPAD, CPAD)), mode="edge")
    cov_pad = cov_pad.at[:, CPAD - 1, :].set(
        2.0 * cov_pad[:, CPAD, :] - cov_pad[:, CPAD + 1, :])
    cov_pad = cov_pad.at[:, :, CPAD - 1].set(
        2.0 * cov_pad[:, :, CPAD] - cov_pad[:, :, CPAD + 1])
    r_pad = jnp.pad(r, ((0, nty * Ts - H), (0, ntx * Ts - W)), mode="edge")

    # tiles per program along x so every block's lane dim is 128-divisible
    XG = max(1, 128 // np.gcd(Ts, 128))
    NTXP = -(-ntx // XG) * XG

    params = _precompute_tile_params(flow, s, g, Ts, H, W, gh, gw,
                                     PAD, CPAD, WIN, CWIN)
    params = params[:nty, :ntx]
    if NTXP != ntx:
        # padding tiles: fully masked (ok=0), safe zero offsets
        fill = jnp.zeros((nty, NTXP - ntx, 14), params.dtype)
        params = jnp.concatenate([params, fill], axis=1)
    params_flat = params.reshape(nty, NTXP * 14)
    flow_t = flow[:nty, :ntx].astype(DEFAULT_FLOAT)
    if NTXP != ntx:
        flow_t = jnp.concatenate(
            [flow_t, jnp.zeros((nty, NTXP - ntx, 2), DEFAULT_FLOAT)], axis=1)
    flow_f = flow_t.reshape(nty, NTXP * 2)

    # r padded to the grouped tile grid
    r_pad = jnp.pad(r_pad, ((0, 0), (0, NTXP * Ts - r_pad.shape[1])),
                    mode="edge")

    def rep_mats(n, rep):
        ry = np.kron(np.eye(n, dtype=np.float32), np.ones((rep, 1), np.float32))
        rx = np.kron(np.eye(n, dtype=np.float32), np.ones((1, rep), np.float32))
        return jnp.asarray(ry), jnp.asarray(rx)

    rmy, rmx = rep_mats(WIN, s)        # comp window upsample
    cmy, cmx = rep_mats(CWIN, sg)      # cov window upsample
    rry, rrx = rep_mats(Ts, s)         # robustness tile upsample

    kernel = functools.partial(
        _merge_tile_kernel, s=s, g=g, Ts=Ts, B=B, XG=XG, WIN=WIN, CWIN=CWIN,
        H=H, W=W, iso=iso, bayer=bayer, n_ch=n_ch, cfa=cfa)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                       # params row, flow row
        grid=(nty, NTXP // XG),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # comp_pad (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # cov_pad (HBM)
            pl.BlockSpec((Ts, XG * Ts), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),   # r tile group
            pl.BlockSpec(memory_space=pltpu.VMEM),   # repeat matrices...
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_ch, B, XG * B), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, B, XG * B), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN), jnp.float32),
            pltpu.VMEM((3, CWIN, CWIN), jnp.float32),
            pltpu.VMEM((WIN * s, WIN * s), jnp.float32),
            pltpu.VMEM((3, CWIN * sg, CWIN * sg), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    val, acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_ch, nty * B, NTXP * B), jnp.float32),
                   jax.ShapeDtypeStruct((n_ch, nty * B, NTXP * B), jnp.float32)),
        interpret=interpret,
    )(params_flat, flow_f, comp_pad, cov_pad, r_pad,
      rmy, rmx, cmy, cmx, rry, rrx)

    return (num + val[:, :out_h, :out_w], den + acc[:, :out_h, :out_w])


def _repeat_mm(x, ry, rx):
    """Element-interleave repeat along both dims via 0/1-matrix matmuls.

    Mosaic cannot lower lane-dimension jnp.repeat (vector reshape across
    lanes); x -> Ry @ x @ Rx runs on the MXU instead. The matrices are
    kernel inputs (Pallas kernels cannot capture array constants).
    """
    y = jnp.dot(ry, x, preferred_element_type=jnp.float32)
    return jnp.dot(y, rx, preferred_element_type=jnp.float32)


def _lane_select(read_fn, phase, n_phases):
    """Select among n static lane offsets by the runtime phase scalar."""
    out = read_fn(0)
    for p in range(1, n_phases):
        out = jnp.where(phase == p, read_fn(p), out)
    return out


def _merge_tile_kernel(params_ref, flow_ref, comp_ref, cov_ref, r_ref,
                       rmy, rmx, cmy, cmx, rry, rrx,
                       val_ref, acc_ref, comp_win, cov_win, up_ref, cup_ref,
                       sem_c, sem_k,
                       *, s, g, Ts, B, XG, WIN, CWIN, H, W, iso, bayer,
                       n_ch, cfa):
    i = pl.program_id(0)
    jg_ = pl.program_id(1)
    sg = s * g
    half = jnp.float32(0.5)

    for t in range(XG):
        _one_tile(t, i, jg_ * XG + t, params_ref, flow_ref, comp_ref, cov_ref,
                  r_ref, rmy, rmx, cmy, cmx, rry, rrx,
                  val_ref, acc_ref, comp_win, cov_win, up_ref, cup_ref,
                  sem_c, sem_k, s=s, g=g, Ts=Ts, B=B, WIN=WIN, CWIN=CWIN,
                  H=H, W=W, iso=iso, bayer=bayer, n_ch=n_ch, cfa=cfa)


def _one_tile(t, i, j, params_ref, flow_ref, comp_ref, cov_ref, r_ref,
              rmy, rmx, cmy, cmx, rry, rrx,
              val_ref, acc_ref, comp_win, cov_win, up_ref, cup_ref,
              sem_c, sem_k,
              *, s, g, Ts, B, WIN, CWIN, H, W, iso, bayer, n_ch, cfa):
    sg = s * g
    half = jnp.float32(0.5)

    p0 = j * 14
    Syc = params_ref[i, p0 + 0]
    Sxc = params_ref[i, p0 + 1]
    ph_y = params_ref[i, p0 + 2]
    ph_x = params_ref[i, p0 + 3]
    S2yc = params_ref[i, p0 + 4]
    S2xc = params_ref[i, p0 + 5]
    ph2_y = params_ref[i, p0 + 6]
    ph2_x = params_ref[i, p0 + 7]
    Sy1 = params_ref[i, p0 + 8]
    Sx1 = params_ref[i, p0 + 9]
    S2y1 = params_ref[i, p0 + 10]
    S2x1 = params_ref[i, p0 + 11]
    ok = params_ref[i, p0 + 12]
    fx = flow_ref[i, j * 2 + 0]
    fy = flow_ref[i, j * 2 + 1]

    r_loc = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)      # (B, 1)
    c_loc = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)      # (1, B)

    # ---- DMA the comp / cov windows for this tile into VMEM
    dma_c = pltpu.make_async_copy(
        comp_ref.at[pl.ds(Syc, WIN), pl.ds(Sxc, WIN)], comp_win, sem_c)
    dma_c.start()
    if not iso:
        dma_k = pltpu.make_async_copy(
            cov_ref.at[:, pl.ds(S2yc, CWIN), pl.ds(S2xc, CWIN)],
            cov_win, sem_k)
        dma_k.start()
    dma_c.wait()
    if not iso:
        dma_k.wait()

    # ---- geometry
    center_i = Sy1 + (r_loc + ph_y) // s                     # (B, 1) global
    center_j = Sx1 + (c_loc + ph_x) // s                     # (1, B)
    Rrow = (i * B + r_loc).astype(jnp.float32)
    Ccol = (j * B + c_loc).astype(jnp.float32)
    lr_y = (Rrow + half) / s
    lr_x = (Ccol + half) / s
    lr_mov_y = lr_y + fy
    lr_mov_x = lr_x + fx
    inb_center = ((lr_mov_y >= 0) & (lr_mov_y < H) &
                  (lr_mov_x >= 0) & (lr_mov_x < W) & (ok > 0))

    local_r = _repeat_mm(r_ref[:, t * Ts:(t + 1) * Ts], rry[:], rrx[:])
    wr = jnp.where(inb_center, local_r, 0.0)

    # ---- covariance interpolation (phase-enumerated lane reads)
    if not iso:
        for ch in range(3):
            cup_ref[ch] = _repeat_mm(cov_win[ch], cmy[:], cmx[:])
        kfloor_y = S2y1 + (r_loc + ph2_y) // sg
        kfloor_x = S2x1 + (c_loc + ph2_x) // sg
        kmap_y = lr_mov_y / g - half
        kmap_x = lr_mov_x / g - half
        frac_y = kmap_y - kfloor_y.astype(jnp.float32)
        frac_x = kmap_x - kfloor_x.astype(jnp.float32)

        def ctap(dy, dx):
            return _lane_select(
                lambda p: cup_ref[:, pl.ds(ph2_y + sg * (dy + 1), B),
                                  p + sg * (dx + 1):p + sg * (dx + 1) + B],
                ph2_x, sg)

        c00 = ctap(0, 0)
        c01 = ctap(0, 1)
        c10 = ctap(1, 0)
        c11 = ctap(1, 1)
        top = c00 + frac_x[None] * (c01 - c00)
        bot = c10 + frac_x[None] * (c11 - c10)
        cc = top + frac_y[None] * (bot - top)
        det = cc[0] * cc[2] - cc[1] * cc[1]
        inv_det = 1.0 / det
        ixx = inv_det * cc[2]
        ixy = -inv_det * cc[1]
        iyy = inv_det * cc[0]

    up_ref[:] = _repeat_mm(comp_win[:], rmy[:], rmx[:])

    dist_ref_y = lr_mov_y - half
    dist_ref_x = lr_mov_x - half

    vals = [jnp.zeros((B, B), jnp.float32) for _ in range(n_ch)]
    accs = [jnp.zeros((B, B), jnp.float32) for _ in range(n_ch)]
    for di in (-1, 0, 1):
        ig = center_i + di
        inb_i = (ig >= 0) & (ig < H)
        pi = ig % 2
        dist_y = ig.astype(jnp.float32) - dist_ref_y
        for dj in (-1, 0, 1):
            jg = center_j + dj
            inb = inb_i & (jg >= 0) & (jg < W)
            pj = jg % 2
            dist_x = jg.astype(jnp.float32) - dist_ref_x

            c = _lane_select(
                lambda p: up_ref[pl.ds(ph_y + s * (di + 1), B),
                                 p + s * (dj + 1):p + s * (dj + 1) + B],
                ph_x, s)

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
        val_ref[k, :, t * B:(t + 1) * B] = vals[k]
        acc_ref[k, :, t * B:(t + 1) * B] = accs[k]
