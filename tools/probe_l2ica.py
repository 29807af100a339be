#!/usr/bin/env python
"""Probe: why is refine_ica_pallas at L2 cheap isolated but ~114ms in-program?"""

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
    from hmsr_tpu.models.block_matching import match_l2
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
    pyr_fn = jax.jit(lambda g: build_gaussian_pyramid(g, t.factors))
    moving_lvl = pyr_fn(comp_grey)[L]
    flow0 = jnp.asarray((rng.rand(ny, nx, 2) * 4 - 2).astype(np.float32))

    ica = functools.partial(refine_ica_pallas, prep=prep)

    timeit(jax.jit(lambda x: jnp.sum(x[::512, ::512])), [comp_grey], name="noop")

    # A: raw device inputs (baseline isolated)
    timeit(jax.jit(lambda m, f: jnp.sum(
        ica(ref_lvl, ica_state, m, f, ts_, n_iter))),
        args=[moving_lvl, flow0], name="A_raw_inputs")

    # B: moving from in-program pyramid
    timeit(jax.jit(lambda g, f: jnp.sum(
        ica(ref_lvl, ica_state, build_gaussian_pyramid(g, t.factors)[L],
            f, ts_, n_iter))),
        args=[comp_grey, flow0], name="B_pyramid_input")

    # C: flow from in-program match_l2 (moving raw)
    timeit(jax.jit(lambda m, f: jnp.sum(
        ica(ref_lvl, ica_state, m,
            match_l2(astate.tiles[L], m, f, ts_, 4), ts_, n_iter))),
        args=[moving_lvl, flow0], name="C_match_flow")

    # D: both in-program (pyramid + match + ica) — the prefix situation
    def d(g, f):
        m = build_gaussian_pyramid(g, t.factors)[L]
        fl = match_l2(astate.tiles[L], m, f, ts_, 4)
        return jnp.sum(ica(ref_lvl, ica_state, m, fl, ts_, n_iter))
    timeit(jax.jit(d), args=[comp_grey, flow0], name="D_both")

    # E: D but ICA replaced by a cheap consumer (materialize both)
    def e(g, f):
        m = build_gaussian_pyramid(g, t.factors)[L]
        fl = match_l2(astate.tiles[L], m, f, ts_, 4)
        return jnp.sum(fl) + jnp.sum(m[::16, ::16])
    timeit(jax.jit(e), args=[comp_grey, flow0], name="E_no_ica")


if __name__ == "__main__":
    main()
