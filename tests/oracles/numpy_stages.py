"""Scalar NumPy oracles for the algorithm stages (robustness, kernels, merge).

Direct per-pixel transcriptions of the math (Algs. 4-9, 11 of the IPOL paper
as surveyed in SURVEY.md), used to validate the vectorized jax stages.
Out-of-bounds statistics are tracked with an explicit valid mask (the
jax implementation's semantics for the reference's "write inf" convention).
"""

import numpy as np

from . import numpy_ops


def guide_image(raw, cfa, wb):
    h, w = raw.shape
    gh, gw = h // 2, w // 2
    out = np.zeros((3, gh, gw))
    for y in range(gh):
        for x in range(gw):
            g = 0.0
            for i in range(2):
                for j in range(2):
                    c = int(cfa[i, j])
                    v = raw[2 * y + i, 2 * x + j] / wb[c]
                    if c == 1:
                        g += v
                    else:
                        out[c, y, x] = v
            out[1, y, x] = g / 2
    return out


def upscale_warp_stats(stats, upscale, tile_size=None, flow=None):
    nc, lh, lw = stats.shape
    hh, hw = lh * upscale, lw * upscale
    hr = np.zeros((nc, hh, hw))
    valid = np.ones((hh, hw), bool)
    for y in range(hh):
        for x in range(hw):
            if flow is None:
                fx = fy = 0.0
            else:
                fx = flow[y // tile_size, x // tile_size, 0]
                fy = flow[y // tile_size, x // tile_size, 1]
            ly = (y + fy + 0.5) / upscale - 0.5
            lx = (x + fx + 0.5) / upscale - 0.5
            if not (0 <= ly < lh and 0 <= lx < lw):
                valid[y, x] = False
                continue
            cy, cx = round(ly), round(lx)
            w_acc = 0.0
            buf = np.zeros(nc)
            for i in range(-1, 2):
                yy = min(max(cy + i, 0), lh - 1)
                wy = numpy_ops.dogson_quadratic(yy - ly)
                for j in range(-1, 2):
                    xx = min(max(cx + j, 0), lw - 1)
                    wgt = wy * numpy_ops.dogson_quadratic(xx - lx)
                    buf += stats[:, yy, xx] * wgt
                    w_acc += wgt
            hr[:, y, x] = buf / w_acc
    return hr, valid


def apply_noise_model(d_p, ref_means, ref_stds, std_curve, diff_curve):
    nc, h, w = ref_means.shape
    d_sq = np.zeros((h, w))
    sigma_sq = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                b = ref_means[c, y, x]
                idx = min(max(int(round(1000 * b)), 0), len(std_curve) - 1)
                d_t = diff_curve[idx]
                s_t = std_curve[idx]
                sigma_sq[y, x] += max(ref_stds[c, y, x], s_t * s_t)
                dp = d_p[c, y, x]
                shrink = dp * dp / (dp * dp + d_t * d_t)
                d_sq[y, x] += dp * dp * shrink * shrink
    return d_sq, sigma_sq


def compute_s(flow, m_th, s1, s2):
    ny, nx, _ = flow.shape
    S = np.zeros((ny, nx))
    for py in range(ny):
        for px in range(nx):
            mins = [np.inf, np.inf]
            maxs = [-np.inf, -np.inf]
            for i in range(-1, 2):
                for j in range(-1, 2):
                    y, x = py + i, px + j
                    if 0 <= y < ny and 0 <= x < nx:
                        for k in range(2):
                            mins[k] = min(mins[k], flow[y, x, k])
                            maxs[k] = max(maxs[k], flow[y, x, k])
            d0 = maxs[0] - mins[0]
            d1 = maxs[1] - mins[1]
            S[py, px] = s1 if d0 * d0 + d1 * d1 > m_th * m_th else s2
    return S


def compute_robustness(comp_img, ref_means, ref_stds, ref_valid, flow, cfa, wb,
                       std_curve, diff_curve, tile_size, t, s1, s2, Mt,
                       bayer=True):
    if bayer:
        guide = guide_image(comp_img, cfa, wb)
        upscale = 2
    else:
        guide = comp_img[None]
        upscale = 1
    means, _ = numpy_ops.local_stats_3x3(guide)
    means, comp_valid = upscale_warp_stats(means, upscale, tile_size, flow)
    d_p = np.abs(ref_means - means)
    d_sq, sigma_sq = apply_noise_model(d_p, ref_means, ref_stds, std_curve, diff_curve)
    S = compute_s(flow, Mt, s1, s2)
    h, w = d_sq.shape
    R = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            if ref_valid[y, x] and comp_valid[y, x]:
                s = S[y // tile_size, x // tile_size]
                R[y, x] = min(max(s * np.exp(-d_sq[y, x] / sigma_sq[y, x]) - t, 0), 1)
    return numpy_ops.local_min_5x5(R)


def compute_k(l1, l2, k_detail, k_denoise, d_th, d_tr, k_stretch, k_shrink, law):
    tr = l1 + l2
    A = 1 + np.sqrt(max(l1 - l2, 0) / tr) if tr > 0 else 1.0
    D = min(max(1 - np.sqrt(max(l1, 0)) / d_tr + d_th, 0), 1)
    if law == "hard_threshold":
        k1, k2 = (1 / k_shrink, k_stretch) if A > 1.95 else (1.0, 1.0)
    else:
        k1 = 1 + A / 2 * (1 / k_shrink - 1)
        k2 = 1 + A / 2 * (k_stretch - 1)
    return k_detail * ((1 - D) * k1 + D * k_denoise), \
        k_detail * ((1 - D) * k2 + D * k_denoise)


def estimate_kernels(raw, alpha, beta, mt, law, bayer=True):
    vst = 2 / alpha * np.sqrt(np.maximum(alpha * raw + 3 / 8 * alpha ** 2 + beta, 0))
    if bayer:
        h, w = vst.shape
        grey = vst.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    else:
        grey = vst
    grads = numpy_ops.halfpixel_gradients(grey)
    gh, gw = grey.shape
    covs = np.zeros((gh, gw, 2, 2))
    for y in range(gh):
        for x in range(gw):
            st = np.zeros((2, 2))
            for i in range(2):
                for j in range(2):
                    a, b = y - 1 + i, x - 1 + j
                    if 0 <= a < grads.shape[0] and 0 <= b < grads.shape[1]:
                        gx, gy = grads[a, b]
                        st += np.array([[gx * gx, gx * gy], [gx * gy, gy * gy]])
            (l1, l2), e1, e2 = numpy_ops.eig_2x2(st[0, 0], st[0, 1], st[1, 0], st[1, 1])
            k1, k2 = compute_k(l1, l2, mt["k_detail"], mt["k_denoise"],
                               mt["D_th"], mt["D_tr"], mt["k_stretch"],
                               mt["k_shrink"], law)
            covs[y, x] = k1 ** 2 * np.outer(e1, e1) + k2 ** 2 * np.outer(e2, e2)
    return covs


def _interp_cov(covs, ky, kx):
    gh, gw = covs.shape[:2]
    fy_f = np.modf(ky)[0]
    fx_f = np.modf(kx)[0]
    fy = max(int(ky), 0)
    fx = max(int(kx), 0)
    cy = min(fy + 1, gh - 1)
    cx = min(fx + 1, gw - 1)
    out = np.zeros((2, 2))
    for a in range(2):
        for b in range(2):
            tr = covs[fy, fx, a, b]
            tl = covs[fy, cx, a, b]
            br = covs[cy, fx, a, b]
            bl = covs[cy, cx, a, b]
            top = tr + fx_f * (tl - tr)
            bot = br + fx_f * (bl - br)
            out[a, b] = top + fy_f * (bot - top)
    return out


def merge(comp, flow, covs, r, num, den, cfa, scale, tile_size, bayer=True,
          iso=False):
    num = num.copy()
    den = den.copy()
    lh, lw = comp.shape
    hh, hw, _ = num.shape
    for hi in range(hh):
        for hj in range(hw):
            lx = (hj + 0.5) / scale
            ly = (hi + 0.5) / scale
            px = int(lx // tile_size)
            py = int(ly // tile_size)
            fx = flow[py, px, 0]
            fy = flow[py, px, 1]
            local_r = r[min(int(ly), lh - 1), min(int(lx), lw - 1)]
            mx = lx + fx
            my = ly + fy
            if not (0 <= mx < lw and 0 <= my < lh):
                continue
            if not iso:
                ky = my / 2 - 0.5 if bayer else my - 0.5
                kx = mx / 2 - 0.5 if bayer else mx - 0.5
                cov = _interp_cov(covs, ky, kx)
                det = cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[0, 1]
                ci = np.array([[cov[1, 1], -cov[0, 1]],
                               [-cov[0, 1], cov[0, 0]]]) / det
            ci_j = int(mx)
            ci_i = int(my)
            mj = mx - 0.5
            mi = my - 0.5
            for di in range(-1, 2):
                for dj in range(-1, 2):
                    i, j = ci_i + di, ci_j + dj
                    if not (0 <= i < lh and 0 <= j < lw):
                        continue
                    ch = int(cfa[i % 2, j % 2]) if bayer else 0
                    c = comp[i, j]
                    dx, dy = j - mj, i - mi
                    if iso:
                        z = 2 * (dx * dx + dy * dy)
                    else:
                        z = ci[0, 0] * dx * dx + 2 * ci[0, 1] * dx * dy + ci[1, 1] * dy * dy
                    z = max(0, z)
                    w = np.exp(-0.5 * z)
                    num[hi, hj, ch] += w * local_r * c
                    den[hi, hj, ch] += w * local_r
    return num, den


def merge_ref(ref, covs, num, den, cfa, scale, bayer=True, iso=False,
              acc_rob=None, rad_max=1, max_multiplier=1.0, max_frame_count=0.0):
    num = num.copy()
    den = den.copy()
    robustness_denoise = acc_rob is not None
    lh, lw = ref.shape
    hh, hw, nch = num.shape
    for hi in range(hh):
        for hj in range(hw):
            py = hi / scale
            px = hj / scale
            if not iso:
                gy = (py - 0.5) / 2 if bayer else py
                gx = (px - 0.5) / 2 if bayer else px
                fy = int(max(np.floor(gy), 0))
                fx = int(max(np.floor(gx), 0))
                cy = min(fy + 1, covs.shape[0] - 1)
                cx = min(fx + 1, covs.shape[1] - 1)
                ry = np.modf(gy)[0]
                rx = np.modf(gx)[0]
                cov = np.zeros((2, 2))
                for a in range(2):
                    for b in range(2):
                        cov[a, b] = (covs[fy, fx, a, b] * (1 - rx) * (1 - ry) +
                                     covs[fy, cx, a, b] * rx * (1 - ry) +
                                     covs[cy, fx, a, b] * (1 - rx) * ry +
                                     covs[cy, cx, a, b] * rx * ry)
                det = cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[1, 0]
                if abs(det) > 1e-10:
                    ci = np.array([[cov[1, 1], -cov[0, 1]],
                                   [-cov[1, 0], cov[0, 0]]]) / det
                else:
                    ci = np.eye(2)
            if robustness_denoise:
                lar = acc_rob[min(round(py), acc_rob.shape[0] - 1),
                              min(round(px), acc_rob.shape[1] - 1)]
                power = max_multiplier if lar <= max_frame_count else 1.0
                rad = rad_max if lar <= max_frame_count else 1
            else:
                power = 1.0
                rad = 1
            cx_i = round(px)
            cy_i = round(py)
            val = np.zeros(nch)
            acc = np.zeros(nch)
            for i in range(-rad, rad + 1):
                for j in range(-rad, rad + 1):
                    pi, pj = cy_i + i, cx_i + j
                    if not (0 <= pi < lh and 0 <= pj < lw):
                        continue
                    ch = int(cfa[pi % 2, pj % 2]) if bayer else 0
                    c = ref[pi, pj]
                    dx, dy = pj - px, pi - py
                    if iso:
                        z = max(0, 2 * (dx * dx + dy * dy))
                    else:
                        z = max(0, ci[0, 0] * dx * dx + (ci[0, 1] + ci[1, 0]) * dx * dy
                                + ci[1, 1] * dy * dy)
                    z /= power
                    w = np.exp(-0.5 * z)
                    val[ch] += w * c
                    acc[ch] += w
            if robustness_denoise and lar < max_frame_count:
                num[hi, hj] = val
                den[hi, hj] = acc
            else:
                num[hi, hj] += val
                den[hi, hj] += acc
    return num, den
