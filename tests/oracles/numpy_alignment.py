"""Scalar NumPy oracle for the full alignment chain (pyramid descent).

Mirrors hmsr_tpu/models/{alignment,block_matching,ica}.py semantics (which in
turn document their parity vs reference alignment.py / block_matching.py /
ICA.py), in float64 with per-tile Python loops — slow, unambiguous, and
independent of jax.

Conventions replicated exactly:
- reference grey wrap-padded to a tile_size multiple; moving image unpadded;
- search windows gathered at round(flow) (banker's rounding);
- L2: edge-clamped windows, error = windowed_L2 - 2*corr, argmin row-major
  first-min, displacement ADDED to the unrounded flow;
- L1: zero-filled windows, displacement REPLACES flow as round(flow) + d;
- ICA: trunc-toward-zero int/frac split, zero-fill out-of-bounds bilinear
  taps, [-1,0,1]x smoothing sobel gradients, per-tile 2x2 Hessian solve,
  |det| < 1e-10 tiles keep their flow;
- flow upscaling: re-tile by factor // (ts_new // ts_prev) (nearest repeat),
  scale by factor, bottom/right zero-pad to the finer tile count.
"""

import numpy as np

from . import numpy_ops as ops


def build_pyramid(img, factors):
    """Coarse-first pyramid list (reference alignment.py:74-82)."""
    levels = [ops.gaussian_downsample(img, factors[0])]
    for f in factors[1:]:
        levels.append(ops.gaussian_downsample(levels[-1], f))
    return levels[::-1]


def _round(x):
    """Banker's rounding (numpy/torch round-half-to-even)."""
    return np.round(x)


def _window(moving, top, left, size, fill):
    """size x size window at (top, left); fill=None -> edge clamp."""
    h, w = moving.shape
    out = np.zeros((size, size), np.float64)
    for i in range(size):
        for j in range(size):
            y, x = top + i, left + j
            if fill is None:
                out[i, j] = moving[min(max(y, 0), h - 1),
                                   min(max(x, 0), w - 1)]
            elif 0 <= y < h and 0 <= x < w:
                out[i, j] = moving[y, x]
            else:
                out[i, j] = fill
    return out


def match_l2(ref_lvl, moving, flow, ts, radius):
    ny, nx, _ = flow.shape
    out = flow.copy()
    n_sh = 2 * radius + 1
    for ty in range(ny):
        for tx in range(nx):
            ref_t = ref_lvl[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            ix = int(_round(flow[ty, tx, 0]))
            iy = int(_round(flow[ty, tx, 1]))
            win = _window(moving, ty * ts + iy - radius, tx * ts + ix - radius,
                          ts + 2 * radius, fill=None)
            best, bdy, bdx = None, 0, 0
            for sy in range(n_sh):
                for sx in range(n_sh):
                    sub = win[sy:sy + ts, sx:sx + ts]
                    e = np.sum(sub * sub) - 2.0 * np.sum(ref_t * sub)
                    if best is None or e < best:
                        best, bdy, bdx = e, sy - radius, sx - radius
            out[ty, tx, 0] = flow[ty, tx, 0] + bdx
            out[ty, tx, 1] = flow[ty, tx, 1] + bdy
    return out


def match_l1(ref_lvl, moving, flow, ts, radius):
    ny, nx, _ = flow.shape
    out = np.zeros_like(flow)
    n_sh = 2 * radius + 1
    for ty in range(ny):
        for tx in range(nx):
            ref_t = ref_lvl[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            ix = int(_round(flow[ty, tx, 0]))
            iy = int(_round(flow[ty, tx, 1]))
            win = _window(moving, ty * ts + iy - radius, tx * ts + ix - radius,
                          ts + 2 * radius, fill=0.0)
            best, bdy, bdx = None, 0, 0
            for sy in range(n_sh):
                for sx in range(n_sh):
                    e = np.sum(np.abs(ref_t - win[sy:sy + ts, sx:sx + ts]))
                    if best is None or e < best:
                        best, bdy, bdx = e, sy - radius, sx - radius
            out[ty, tx, 0] = ix + bdx
            out[ty, tx, 1] = iy + bdy
    return out


def refine_ica(ref_lvl, moving, flow, ts, n_iter):
    ny, nx, _ = flow.shape
    h, w = moving.shape
    gx, gy = ops.sobel_gradients(ref_lvl)
    out = flow.astype(np.float64).copy()

    def tap(y, x):
        if 0 <= y < h and 0 <= x < w:
            return moving[y, x]
        return 0.0

    for ty in range(ny):
        for tx in range(nx):
            gxt = gx[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            gyt = gy[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            ref_t = ref_lvl[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            a00 = np.sum(gxt * gxt)
            a01 = np.sum(gxt * gyt)
            a11 = np.sum(gyt * gyt)
            det = a00 * a11 - a01 * a01
            if abs(det) < 1e-10:
                continue
            ax, ay = out[ty, tx, 0], out[ty, tx, 1]
            for _ in range(n_iter):
                ix, iy = np.trunc(ax), np.trunc(ay)
                fx, fy = ax - ix, ay - iy
                b0 = b1 = 0.0
                for i in range(ts):
                    for j in range(ts):
                        yy = ty * ts + i + int(iy)
                        xx = tx * ts + j + int(ix)
                        m00 = tap(yy, xx)
                        m01 = tap(yy, xx + 1)
                        m10 = tap(yy + 1, xx)
                        m11 = tap(yy + 1, xx + 1)
                        top = m00 + (m01 - m00) * fx
                        bot = m10 + (m11 - m10) * fx
                        interp = top + (bot - top) * fy
                        gradt = interp - ref_t[i, j]
                        b0 += -gxt[i, j] * gradt
                        b1 += -gyt[i, j] * gradt
                ax = ax + (a11 * b0 - a01 * b1) / det
                ay = ay + (-a01 * b0 + a00 * b1) / det
            out[ty, tx, 0] = ax
            out[ty, tx, 1] = ay
    return out


def upscale_flow(flow, npatches, list_id, tile_sizes, factors):
    new_ts = tile_sizes[list_id]
    prev_ts = tile_sizes[list_id + 1]
    factor = factors[list_id + 1]
    repeat = factor // (new_ts // prev_ts)
    up = np.repeat(np.repeat(flow, repeat, axis=0), repeat, axis=1) \
        if repeat != 1 else flow.copy()
    up = up * float(factor)
    ny, nx = npatches
    if up.shape[0] < ny or up.shape[1] < nx:
        up = np.pad(up, ((0, ny - up.shape[0]), (0, nx - up.shape[1]), (0, 0)))
    return up[:ny, :nx]


def align(ref_grey, moving_grey, config):
    """Full pyramid-descent alignment; returns (ny, nx, 2) float64 flow."""
    t = config.block_matching.tuning
    factors = list(t.factors)
    tile_sizes = list(t.tile_sizes)
    radii = list(t.search_radii)
    metrics = list(t.metrics)
    n_iter = int(config.ica.tuning.n_iter)
    assert t.flow_upscale_mode == "nearest", "oracle supports nearest only"

    Ts = t.tile_size
    h, w = ref_grey.shape
    pad_b = (Ts - h % Ts) % Ts
    pad_r = (Ts - w % Ts) % Ts
    ref_padded = np.pad(ref_grey, ((0, pad_b), (0, pad_r)), mode="wrap")

    ref_pyr = build_pyramid(ref_padded, factors)
    mov_pyr = build_pyramid(moving_grey, factors)
    n_lvls = len(factors)

    flow = None
    for l in range(n_lvls):
        list_id = n_lvls - l - 1
        ts = tile_sizes[list_id]
        radius = radii[list_id]
        metric = metrics[list_id]
        ref_lvl = ref_pyr[l].astype(np.float64)
        mov_lvl = mov_pyr[l].astype(np.float64)
        ny, nx = ref_lvl.shape[0] // ts, ref_lvl.shape[1] // ts

        if flow is None:
            flow = np.zeros((ny, nx, 2), np.float64)
        else:
            flow = upscale_flow(flow, (ny, nx), list_id, tile_sizes, factors)

        if metric == "L2":
            flow = match_l2(ref_lvl, mov_lvl, flow, ts, radius)
        elif metric == "L1":
            flow = match_l1(ref_lvl, mov_lvl, flow, ts, radius)
        else:
            raise ValueError(metric)
        flow = refine_ica(ref_lvl, mov_lvl, flow, ts, n_iter)
    return flow
