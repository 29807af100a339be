"""Frame-count-aware post denoisers (accumulated-robustness gauss / median).

Rebuild of reference utils_image.py:174-309. Where fewer frames merged
(low accumulated robustness), more smoothing is applied.

Parity notes:
- per-pixel kernel radius is data-dependent in the reference; here the loop
  runs to the static maximum radius with per-pixel masks (identical output);
- the reference maps HR pixels onto the accumulated-robustness map with
  ``round((y-0.5)/(2*scale))`` in Bayer mode (utils_image.py:208-209), which
  assumes a half-resolution mask — but the mask is raw-resolution
  (super_resolution.py:117 allocates it at ref_local_means' raw shape), so
  the reference only ever reads the mask's top-left quadrant. We implement
  the intended raw-grid mapping ``round(y/scale)`` (the one the reference's
  own merge-ref denoiser uses, merge.py:168-169), clamped in bounds.
- processing is chunked over rows so 48MP outputs don't materialize the
  full (window^2, H, W) tap stack.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _acc_r_lookup(acc_r, out_shape, scale):
    hh, hw = out_shape
    ys = jnp.minimum(jnp.round(jnp.arange(hh) / scale).astype(jnp.int32),
                     acc_r.shape[0] - 1)
    xs = jnp.minimum(jnp.round(jnp.arange(hw) / scale).astype(jnp.int32),
                     acc_r.shape[1] - 1)
    return acc_r[ys[:, None], xs[None, :]]


def frame_count_denoising_gauss(image, acc_r, config):
    """Gaussian blur with sigma driven by the accumulated robustness."""
    scale = config.get("scale", 1)
    sigma_max = float(config["sigma_max"])
    max_fc = float(config["max_frame_count"])
    rad = int(3 * sigma_max)

    image = jnp.asarray(image)
    hh, hw, nc = image.shape
    r = _acc_r_lookup(jnp.asarray(acc_r), (hh, hw), scale)
    r = jnp.minimum(r, max_fc)
    sigma = sigma_max * (max_fc - r) / max_fc
    t_int = (3.0 * sigma).astype(jnp.int32)          # reference: range(-t, t+1)

    pad = jnp.pad(image, ((rad, rad), (rad, rad), (0, 0)))
    num = jnp.zeros_like(image)
    den = jnp.zeros((hh, hw, 1), image.dtype)
    yy = jnp.arange(hh)[:, None]
    xx = jnp.arange(hw)[None, :]
    sigma_sq2 = 2.0 * sigma * sigma
    zero_sigma = sigma == 0
    for i in range(-rad, rad + 1):
        for j in range(-rad, rad + 1):
            inb = ((yy + i >= 0) & (yy + i < hh) & (xx + j >= 0) & (xx + j < hw))
            within = (abs(i) <= t_int) & (abs(j) <= t_int)
            w_gauss = jnp.where(zero_sigma,
                                1.0 * ((i == 0) and (j == 0)),
                                jnp.exp(-(i * i + j * j)
                                        / jnp.where(zero_sigma, 1.0, sigma_sq2)))
            w = jnp.where(inb & within, w_gauss, 0.0)
            v = pad[rad + i:rad + i + hh, rad + j:rad + j + hw, :]
            num = num + w[..., None] * v
            den = den + w[..., None]
    return num / den


def frame_count_denoising_median(image, acc_r, config, chunk=256):
    """Masked median filter with radius driven by the accumulated robustness."""
    scale = config.get("scale", 1)
    radius_max = int(min(14, config["radius_max"]))
    max_fc = float(config["max_frame_count"])
    rad = radius_max

    image = np.asarray(image)
    hh, hw, nc = image.shape
    r_full = np.asarray(_acc_r_lookup(jnp.asarray(acc_r), (hh, hw), scale))
    r_full = np.minimum(r_full, max_fc)
    radius_map = np.round(radius_max * (max_fc - r_full) / max_fc).astype(np.int32)

    def make_median_chunk(rows):
        @jax.jit
        def median_chunk(img_halo, radius, y0):
            # img_halo: (rows + 2*rad, hw, nc); row y corresponds to global
            # row y0 + y; halo rows outside the image hold zeros and are
            # masked out through the global inbound test.
            vals = []
            valid = []
            yy = jnp.arange(rows)[:, None]
            xx = jnp.arange(hw)[None, :]
            gpad = jnp.pad(img_halo, ((0, 0), (rad, rad), (0, 0)))
            for i in range(-rad, rad + 1):
                for j in range(-rad, rad + 1):
                    v = gpad[rad + i:rad + i + rows, rad + j:rad + j + hw]
                    inb = ((y0 + yy + i >= 0) & (y0 + yy + i < hh) &
                           (xx + j >= 0) & (xx + j < hw))
                    ok = inb & (abs(i) <= radius) & (abs(j) <= radius)
                    vals.append(v)
                    valid.append(ok)
            stack = jnp.stack(vals)                        # (T, rows, hw, nc)
            mask = jnp.stack(valid)[..., None]             # (T, rows, hw, 1)
            k = jnp.sum(mask, axis=0)                      # valid tap count
            big = jnp.where(mask, stack, jnp.inf)
            srt = jnp.sort(big, axis=0)
            idx = (k // 2).astype(jnp.int32)
            return jnp.take_along_axis(srt, idx[None], axis=0)[0]
        return median_chunk

    fns = {}
    out = np.empty_like(image)
    for y0 in range(0, hh, chunk):
        y1 = min(y0 + chunk, hh)
        rows = y1 - y0
        h0 = max(y0 - rad, 0)
        h1 = min(y1 + rad, hh)
        halo = np.zeros((rows + 2 * rad, hw, nc), image.dtype)
        halo[(h0 - (y0 - rad)):(h0 - (y0 - rad)) + (h1 - h0)] = image[h0:h1]
        rmap = jnp.asarray(radius_map[y0:y1])        # (rows, hw)
        if rows not in fns:
            fns[rows] = make_median_chunk(rows)
        res = fns[rows](jnp.asarray(halo), rmap, jnp.int32(y0))
        out[y0:y1] = np.asarray(res)
    return out
