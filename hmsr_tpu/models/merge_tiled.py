"""Tile-restructured merge accumulation — the TPU-native hot path.

Same math as :mod:`hmsr_tpu.models.merge` (Alg. 4 / Alg. 11), restructured
around the key observation that the optical flow is constant within each
alignment tile: every "random" gather of the per-output-pixel formulation is
actually a **dense window at a per-tile dynamic offset**. Each HR tile
(Ts*s x Ts*s output block) reads:

- a (Ts+4)^2 window of the comp frame at offset ``tile_origin + int(flow)``,
- a (Ts/g+4)^2 window of the covariance grid (g = 2 for Bayer),
- a static Ts^2 window of the robustness map,

and everything else is closed-form elementwise math. The per-row staircase
``center(R) = floor((R + 0.5)/s + flow) = (R + m) // s`` (m = floor(0.5 +
s*flow), exact for integer s) turns the 3x3 neighborhood gather into **static
shifts of an s-times-repeated window slice** — no gather ops at all, just
dynamic_slice + repeat + shifted slices, which XLA/Mosaic map onto dense VPU
passes over VMEM-resident tiles.

Requires an integer scale s >= 1 (the pipeline falls back to the exact
gather path otherwise); output matches the gather path bit-for-bit up to fp
reassociation, including the negative-fraction covariance extrapolation at
the frame border (handled by a linear-extrapolation pad row/column).

Memory: processed in bands of tile rows (lax.map), so peak temporaries are
O(band) not O(48MP) — this is what lets the 20-frame 12MP burst pipeline fit
and fuse on one chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.types import DEFAULT_FLOAT

_BAND_TILE_ROWS = 8      # tile rows per lax.map band


def _cfa_lut(cfa_pattern):
    cfa = np.asarray(cfa_pattern, dtype=np.int32)
    return cfa


def _channel_from_parity(pi, pj, cfa):
    return jnp.where(pi == 0,
                     jnp.where(pj == 0, cfa[0, 0], cfa[0, 1]),
                     jnp.where(pj == 0, cfa[1, 0], cfa[1, 1]))


def merge_tiled(comp_img, flow, covs, r, num, den, cfa_pattern, config):
    """Drop-in replacement for ``merge`` (non-ref accumulation, Alg. 4)."""
    s = int(config.scale)
    assert s == config.scale and s >= 1
    bayer = config.mode == "bayer"
    iso = config.merging.kernel == "iso"
    Ts = int(config.block_matching.tuning.tile_size)
    g = 2 if bayer else 1
    cfa = _cfa_lut(cfa_pattern)

    H, W = comp_img.shape
    out_h, out_w, n_ch = num.shape
    B = Ts * s
    nty = -(-out_h // B)
    ntx = -(-out_w // B)
    assert flow.shape[0] >= nty and flow.shape[1] >= ntx, (flow.shape, nty, ntx)

    WIN = Ts + 4                    # comp window side
    CWIN = Ts // g + 4              # cov window side
    PAD = WIN + 1
    gh, gw = covs.shape[0], covs.shape[1]

    comp_pad = jnp.pad(comp_img, ((PAD, PAD), (PAD, PAD)))
    # Edge padding implements the reference's index clamping on the cov grid.
    # Index -1 additionally holds the LINEAR EXTRAPOLATION of the first cell:
    # for warped positions in the first half-pixel the reference evaluates the
    # cell-[0,1] bilinear patch at a negative modf fraction (merge.py:357-361);
    # interpolating our cell [-1,0] with extrapolated corners reproduces that
    # patch exactly (a bilinear patch is determined by its corners).
    CPAD = CWIN + 1
    cov_comp = jnp.stack([covs[..., 0, 0], covs[..., 0, 1], covs[..., 1, 1]])
    cov_pad = jnp.pad(cov_comp, ((0, 0), (CPAD, CPAD), (CPAD, CPAD)), mode="edge")
    cov_pad = cov_pad.at[:, CPAD - 1, :].set(
        2.0 * cov_pad[:, CPAD, :] - cov_pad[:, CPAD + 1, :])
    cov_pad = cov_pad.at[:, :, CPAD - 1].set(
        2.0 * cov_pad[:, :, CPAD] - cov_pad[:, :, CPAD + 1])
    # robustness, padded to the tile grid with edge values (clamped lookup)
    r_pad = jnp.pad(r, ((0, nty * Ts - H), (0, ntx * Ts - W)), mode="edge")

    r_loc = jnp.arange(B, dtype=jnp.int32)          # in-tile HR offsets
    half = jnp.float32(0.5)

    def one_tile(ty, tx):
        fx = flow[ty, tx, 0].astype(DEFAULT_FLOAT)
        fy = flow[ty, tx, 1].astype(DEFAULT_FLOAT)

        # ---- comp window bookkeeping (rows) ----
        m_y = jnp.floor(half + s * fy).astype(jnp.int32)
        base_y = ty * B + m_y
        Sy = jnp.floor_divide(base_y, s) - 1        # first LR row of window
        ph_y = base_y - s * (Sy + 1)                # == base_y mod s
        m_x = jnp.floor(half + s * fx).astype(jnp.int32)
        base_x = tx * B + m_x
        Sx = jnp.floor_divide(base_x, s) - 1
        ph_x = base_x - s * (Sx + 1)

        Syc = jnp.clip(Sy, -PAD, H + PAD - WIN)
        Sxc = jnp.clip(Sx, -PAD, W + PAD - WIN)
        ok_tile = (Syc == Sy) & (Sxc == Sx)         # else fully out of frame

        win = jax.lax.dynamic_slice(comp_pad, (Syc + PAD, Sxc + PAD), (WIN, WIN))
        up = jnp.repeat(jnp.repeat(win, s, axis=0), s, axis=1)
        U = jax.lax.dynamic_slice(up, (ph_y, ph_x), (B + 2 * s, B + 2 * s))

        # global center indices (unclamped — used for masks and parities)
        center_i = (Sy + 1) + (r_loc + ph_y) // s       # (B,)
        center_j = (Sx + 1) + (r_loc + ph_x) // s

        # ---- positions and per-pixel weights ----
        Rrow = (ty * B + r_loc).astype(DEFAULT_FLOAT)
        Ccol = (tx * B + r_loc).astype(DEFAULT_FLOAT)
        lr_y = (Rrow + half) / s                        # (B,)
        lr_x = (Ccol + half) / s
        lr_mov_y = lr_y + fy
        lr_mov_x = lr_x + fx
        inb_center = ((lr_mov_y >= 0) & (lr_mov_y < H))[:, None] & \
                     ((lr_mov_x >= 0) & (lr_mov_x < W))[None, :]
        inb_center = inb_center & ok_tile

        # robustness: NN at (min(int(lr_y), H-1), ...) == tile-static window
        r_tile = jax.lax.dynamic_slice(r_pad, (ty * Ts, tx * Ts), (Ts, Ts))
        local_r = jnp.repeat(jnp.repeat(r_tile, s, axis=0), s, axis=1)

        # ---- covariance interpolation ----
        if not iso:
            sg = s * g
            m2_y = jnp.floor(half + s * fy - half * sg).astype(jnp.int32)
            base2_y = ty * B + m2_y
            S2y = jnp.floor_divide(base2_y, sg) - 1
            ph2_y = base2_y - sg * (S2y + 1)
            m2_x = jnp.floor(half + s * fx - half * sg).astype(jnp.int32)
            base2_x = tx * B + m2_x
            S2x = jnp.floor_divide(base2_x, sg) - 1
            ph2_x = base2_x - sg * (S2x + 1)

            S2yc = jnp.clip(S2y, -CPAD, gh + CPAD - CWIN)
            S2xc = jnp.clip(S2x, -CPAD, gw + CPAD - CWIN)

            cwin = jax.lax.dynamic_slice(cov_pad, (0, S2yc + CPAD, S2xc + CPAD),
                                         (3, CWIN, CWIN))
            cup = jnp.repeat(jnp.repeat(cwin, sg, axis=1), sg, axis=2)
            CU = jax.lax.dynamic_slice(cup, (0, ph2_y, ph2_x),
                                       (3, B + 2 * sg, B + 2 * sg))

            kmap_y = lr_mov_y / g - half                 # (B,)
            kmap_x = lr_mov_x / g - half
            kfloor_y = (S2y + 1) + (r_loc + ph2_y) // sg
            kfloor_x = (S2x + 1) + (r_loc + ph2_x) // sg
            frac_y = (kmap_y - kfloor_y.astype(DEFAULT_FLOAT))[:, None]
            frac_x = (kmap_x - kfloor_x.astype(DEFAULT_FLOAT))[None, :]

            def ctap(dy, dx):
                # window row kfloor_local + dy with kfloor_local = (r+ph2)//sg + 1
                return CU[:, sg * (dy + 1):sg * (dy + 1) + B,
                          sg * (dx + 1):sg * (dx + 1) + B]

            c00 = ctap(0, 0)
            c01 = ctap(0, 1)
            c10 = ctap(1, 0)
            c11 = ctap(1, 1)
            top = c00 + frac_x * (c01 - c00)
            bot = c10 + frac_x * (c11 - c10)
            cc = top + frac_y * (bot - top)              # (3, B, B)
            det = cc[0] * cc[2] - cc[1] * cc[1]
            inv_det = 1.0 / det
            ixx = inv_det * cc[2]
            ixy = -inv_det * cc[1]
            iyy = inv_det * cc[0]

        # ---- 3x3 accumulation ----
        dist_ref_y = (lr_mov_y - half)[:, None]
        dist_ref_x = (lr_mov_x - half)[None, :]
        wr = jnp.where(inb_center, local_r, 0.0)

        vals = [0.0] * n_ch
        accs = [0.0] * n_ch
        for di in (-1, 0, 1):
            i_g = center_i + di                          # (B,) global LR rows
            inb_i = (i_g >= 0) & (i_g < H)
            pi = (i_g % 2)[:, None]
            dist_y = (i_g.astype(DEFAULT_FLOAT))[:, None] - dist_ref_y
            for dj in (-1, 0, 1):
                j_g = center_j + dj
                inb = inb_i[:, None] & ((j_g >= 0) & (j_g < W))[None, :]
                pj = (j_g % 2)[None, :]
                dist_x = (j_g.astype(DEFAULT_FLOAT))[None, :] - dist_ref_x

                c = U[s * (di + 1):s * (di + 1) + B,
                      s * (dj + 1):s * (dj + 1) + B]

                if iso:
                    z = 2.0 * (dist_x * dist_x + dist_y * dist_y)
                else:
                    z = ixx * dist_x * dist_x + 2.0 * ixy * dist_x * dist_y \
                        + iyy * dist_y * dist_y
                z = jnp.maximum(z, 0.0)
                w = jnp.exp(-0.5 * z) * wr * inb

                if bayer:
                    ch = _channel_from_parity(pi, pj, cfa)
                    for k in range(n_ch):
                        mask = (ch == k).astype(DEFAULT_FLOAT)
                        vals[k] = vals[k] + w * c * mask
                        accs[k] = accs[k] + w * mask
                else:
                    vals[0] = vals[0] + w * c
                    accs[0] = accs[0] + w

        return jnp.stack(vals, -1), jnp.stack(accs, -1)   # (B, B, n_ch)

    tile_cols = jnp.arange(ntx, dtype=jnp.int32)

    def tile_row(ty):
        v, a = jax.vmap(lambda tx: one_tile(ty, tx))(tile_cols)
        # (ntx, B, B, c) -> (B, ntx*B, c)
        v = jnp.transpose(v, (1, 0, 2, 3)).reshape(B, ntx * B, n_ch)
        a = jnp.transpose(a, (1, 0, 2, 3)).reshape(B, ntx * B, n_ch)
        return v, a

    def band(ty0):
        tys = ty0 + jnp.arange(_BAND_TILE_ROWS, dtype=jnp.int32)
        v, a = jax.vmap(tile_row)(tys)
        return v.reshape(_BAND_TILE_ROWS * B, ntx * B, n_ch), \
            a.reshape(_BAND_TILE_ROWS * B, ntx * B, n_ch)

    n_bands = -(-nty // _BAND_TILE_ROWS)
    band_starts = jnp.arange(n_bands, dtype=jnp.int32) * _BAND_TILE_ROWS
    v, a = jax.lax.map(band, band_starts)
    v = v.reshape(n_bands * _BAND_TILE_ROWS * B, ntx * B, n_ch)
    a = a.reshape(n_bands * _BAND_TILE_ROWS * B, ntx * B, n_ch)
    return num + v[:out_h, :out_w], den + a[:out_h, :out_w]
