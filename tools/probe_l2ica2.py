#!/usr/bin/env python
"""Probe 2: localize the pyramid->pallas interaction pathology."""

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


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import init_alignment
    from hmsr_tpu.ops.pallas_ica import refine_ica_pallas
    from hmsr_tpu.ops.grey import fft_lowpass_grey
    from hmsr_tpu.ops.pyramid import build_gaussian_pyramid

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
    pyr = lambda g: build_gaussian_pyramid(g, t.factors)[L]

    timeit(jax.jit(lambda x: jnp.sum(x[::512, ::512])), [comp_grey], name="noop")

    # B: pyramid -> ICA (the pathology)
    timeit(jax.jit(lambda g, f: jnp.sum(
        ica(ref_lvl, ica_state, pyr(g), f, ts_, n_iter))),
        args=[comp_grey, flow0], name="B_pyramid_ica")

    # B2: pyramid -> optimization_barrier -> ICA
    timeit(jax.jit(lambda g, f: jnp.sum(
        ica(ref_lvl, ica_state,
            jax.lax.optimization_barrier(pyr(g)), f, ts_, n_iter))),
        args=[comp_grey, flow0], name="B2_barrier")

    # B3: pyramid -> pad -> sum (no pallas at all)
    def b3(g):
        m = pyr(g)
        mp = jnp.pad(m, ((18, 30), (18, 300)))
        return jnp.sum(mp[::16, ::16])
    timeit(jax.jit(b3), args=[comp_grey], name="B3_pad_sum")

    # B4: pyramid alone -> sum
    timeit(jax.jit(lambda g: jnp.sum(pyr(g)[::16, ::16])),
           args=[comp_grey], name="B4_pyr_sum")


if __name__ == "__main__":
    main()
