#!/usr/bin/env python
"""Prefix profiling of align(): time jit(pyramid + levels[0..k]) for each k.

Deltas between consecutive prefixes = in-program per-level cost, capturing
layout conversions and scheduling effects the isolated timings miss.
"""

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
    print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s val={v:.4g}",
          file=sys.stderr, flush=True)
    ts = []
    for i in range(n):
        args2 = list(args)
        args2[perturb_idx] = args2[perturb_idx] + jnp.float32(1e-7 * (i + 1))
        _ = float(np.asarray(jnp.sum(args2[perturb_idx].ravel()[:3])))
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args2)))
        ts.append(time.perf_counter() - t0)
    print(f"  [{name}] best {min(ts)*1000:.1f} ms", file=sys.stderr, flush=True)
    return min(ts)


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import (
        init_alignment, _level_tile_sizes, upscale_flow)
    from hmsr_tpu.models.block_matching import match_l1, match_l2
    from hmsr_tpu.models.ica import refine_ica_tiled
    from hmsr_tpu.ops.pallas_ica import (
        PALLAS_ICA_MIN_TILES, refine_ica_pallas, match_l1_refine_ica_pallas)
    from hmsr_tpu.ops.grey import fft_lowpass_grey
    from hmsr_tpu.ops.pyramid import build_gaussian_pyramid
    import functools

    H, W = (3000, 4000) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
    rng = np.random.RandomState(0)
    ref = rng.rand(H, W).astype(np.float32)
    comp = rng.rand(H, W).astype(np.float32)

    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = 1.8e-4
    config.noise_model.beta = 3.0e-6
    update_snr_config(config, 25.0)
    sanitize_config(config, ref.shape)
    t = config.block_matching.tuning
    n_iter = config.ica.tuning.n_iter
    print(f"image {H}x{W}, tile {t.tile_size}", file=sys.stderr)

    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(jnp.asarray(ref))
    comp_grey = grey_fn(jnp.asarray(comp))
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    levels = _level_tile_sizes(config)
    n_lvls = len(levels)

    def align_prefix(moving_grey, n_steps):
        """n_steps counts half-levels: pyramid=0, then (match, ica) pairs."""
        moving_pyramid = build_gaussian_pyramid(moving_grey, t.factors)
        if n_steps == 0:
            return sum(jnp.sum(p[::16, ::16]) for p in moving_pyramid)
        step = 0
        flow = None
        for l in range(n_lvls):
            list_id = n_lvls - l - 1
            _, ts, radius, metric = levels[l]
            ref_lvl = astate.pyramid[l]
            npatches = astate.tiles[l].shape[:2]
            n_tiles = npatches[0] * npatches[1]
            if flow is None:
                flow = jnp.zeros((*npatches, 2), jnp.float32)
            else:
                flow = upscale_flow(flow, npatches, list_id, config)
            moving_lvl = moving_pyramid[l]
            prep = astate.ica_pallas[l] if astate.ica_pallas else None
            use_pallas = n_tiles >= PALLAS_ICA_MIN_TILES and prep is not None

            if metric == "L1" and radius == 1 and use_pallas:
                flow = match_l1_refine_ica_pallas(
                    ref_lvl, astate.ica[l], moving_lvl, flow, ts, n_iter,
                    prep=prep)
                step += 2
                if step >= n_steps:
                    return jnp.sum(flow)
                continue
            if metric == "L2":
                flow = match_l2(astate.tiles[l], moving_lvl, flow, ts, radius)
            else:
                flow = match_l1(ref_lvl, moving_lvl, flow, ts, radius)
            step += 1
            if step >= n_steps:
                return jnp.sum(flow)
            if use_pallas:
                flow = refine_ica_pallas(ref_lvl, astate.ica[l], moving_lvl,
                                         flow, ts, n_iter, prep=prep)
            else:
                flow = refine_ica_tiled(ref_lvl, astate.ica[l], moving_lvl,
                                        flow, ts, n_iter)
            step += 1
            if step >= n_steps:
                return jnp.sum(flow)
        return jnp.sum(flow)

    names = ["pyramid"]
    for l in range(n_lvls):
        nm = f"L{l}"
        names += [f"{nm}_match", f"{nm}_ica"]

    results = []
    for k in range(len(names)):
        fn = jax.jit(functools.partial(align_prefix, n_steps=k))
        results.append(timeit(fn, [comp_grey], name=f"prefix<={names[k]}"))

    print("\n--- in-program per-step deltas (ms) ---", file=sys.stderr)
    prev = 0.0
    for nm, v in zip(names, results):
        print(f"{nm:12s} cum {v*1000:8.1f}  delta {(v-prev)*1000:8.1f}",
              file=sys.stderr)
        prev = v


if __name__ == "__main__":
    main()
