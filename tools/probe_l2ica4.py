#!/usr/bin/env python
"""Probe 4: conv-free gaussian downsample feeding pallas ICA."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, perturb_idx=0, n=3, name=""):
    t0 = time.perf_counter()
    v = float(np.asarray(fn(*args)))
    print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s val={v:.6g}",
          file=sys.stderr, flush=True)
    ts = []
    for i in range(n):
        args2 = list(args)
        args2[perturb_idx] = args2[perturb_idx] + jnp.float32(1e-7 * (i + 1))
        _ = float(np.asarray(jnp.sum(args2[perturb_idx].ravel()[:3])))
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args2)))
        ts.append(time.perf_counter() - t0)
    print(f"  [{name}] best {min(ts)*1000:.1f} ms (all "
          f"{[round(x*1000,1) for x in ts]})", file=sys.stderr, flush=True)
    return min(ts)


def downsample_nc(img, factor):
    """Conv-free gaussian downsample: per-tap strided slices + weighted sum."""
    from hmsr_tpu.ops.pyramid import gaussian_kernel1d
    if factor == 1:
        return img
    radius = int(4 * factor * 0.5 + 0.5)
    taps = gaussian_kernel1d(sigma=factor * 0.5, radius=radius)
    k = len(taps)
    h, w = img.shape
    fh, fw = h - 2 * radius, w - 2 * radius
    h2, w2 = fh // factor, fw // factor

    # axis 0
    out = None
    for t in range(k):
        v = jax.lax.slice(img, (t, 0), (t + (h2 - 1) * factor + 1, w),
                          (factor, 1))
        out = taps[t] * v if out is None else out + taps[t] * v
    # axis 1
    out2 = None
    for t in range(k):
        v = jax.lax.slice(out, (0, t), (h2, t + (w2 - 1) * factor + 1),
                          (1, factor))
        out2 = taps[t] * v if out2 is None else out2 + taps[t] * v
    return out2


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import init_alignment
    from hmsr_tpu.ops.pallas_ica import refine_ica_pallas
    from hmsr_tpu.ops.grey import fft_lowpass_grey
    from hmsr_tpu.ops.pyramid import build_gaussian_pyramid, downsample

    H, W = 3000, 4000
    rng = np.random.RandomState(0)
    config = default_config()
    config.scale = 2
    config.noise_model.alpha = 1.8e-4
    config.noise_model.beta = 3.0e-6
    update_snr_config(config, 25.0)
    sanitize_config(config, (H, W))
    t = config.block_matching.tuning
    n_iter = config.ica.tuning.n_iter
    ts_ = t.tile_size
    L = 2

    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(jnp.asarray(rng.rand(H, W).astype(np.float32)))
    comp_grey = grey_fn(jnp.asarray(rng.rand(H, W).astype(np.float32)))
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    ref_lvl = astate.pyramid[L]
    prep = astate.ica_pallas[L]
    ica_state = astate.ica[L]
    ny, nx = astate.tiles[L].shape[:2]
    flow0 = jnp.asarray((rng.rand(ny, nx, 2) * 4 - 2).astype(np.float32))

    ica = functools.partial(refine_ica_pallas, prep=prep)

    def pyr_nc(g):
        # factors [1,2,4,4] coarse-first build: lvl fine->coarse
        p = [downsample_nc(g, t.factors[0])]
        for f in t.factors[1:]:
            p.append(downsample_nc(p[-1], f))
        return p[::-1][L]

    # parity check on CPU-ish small scale: compare with conv version
    a = np.asarray(jax.jit(lambda g: build_gaussian_pyramid(g, t.factors)[L])(comp_grey))
    b = np.asarray(jax.jit(pyr_nc)(comp_grey))
    print(f"parity: shapes {a.shape} {b.shape} maxdiff "
          f"{np.abs(a-b).max():.3e}", file=sys.stderr)

    timeit(jax.jit(lambda x: jnp.sum(x[::512, ::512])), [comp_grey], name="noop")

    timeit(jax.jit(lambda g: jnp.sum(pyr_nc(g)[::16, ::16])),
           args=[comp_grey], name="pyr_noconv_sum")

    timeit(jax.jit(lambda g, f: jnp.sum(
        ica(ref_lvl, ica_state, pyr_nc(g), f, ts_, n_iter))),
        args=[comp_grey, flow0], name="B_noconv_ica")


if __name__ == "__main__":
    main()
