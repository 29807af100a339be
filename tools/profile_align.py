#!/usr/bin/env python
"""Per-level alignment profiling at 12MP (mirrors models/alignment.align)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(make_fn, args, perturb_idx=0, n=3, name=""):
    t0 = time.perf_counter()
    fn = make_fn()
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
    print(f"  [{name}] best {min(ts)*1000:.1f} ms  (all: "
          f"{[round(t*1000,1) for t in ts]})", file=sys.stderr, flush=True)
    return min(ts)


def chk(x):
    if isinstance(x, (tuple, list)):
        return sum(chk(v) for v in jax.tree.leaves(x))
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.float32)
    x = x if x.ndim <= 2 else x[..., ::17, ::19]
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


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

    H, W = (3000, 4000) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
    ALPHA, BETA = 1.8e-4, 3.0e-6

    rng = np.random.RandomState(0)
    ref = rng.rand(H, W).astype(np.float32)
    comp = rng.rand(H, W).astype(np.float32)

    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    update_snr_config(config, 25.0)
    sanitize_config(config, ref.shape)
    t = config.block_matching.tuning
    n_iter = config.ica.tuning.n_iter
    print(f"image {H}x{W}, tile {t.tile_size}, device {jax.devices()[0]}",
          file=sys.stderr)

    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(jnp.asarray(ref))
    comp_grey = grey_fn(jnp.asarray(comp))
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    results = {}
    results["noop"] = timeit(
        name="noop", make_fn=lambda: jax.jit(lambda x: jnp.sum(x[::512, ::512])),
        args=[comp_grey])

    results["pyramid"] = timeit(
        name="pyramid",
        make_fn=lambda: jax.jit(lambda g: chk(list(
            build_gaussian_pyramid(g, t.factors)))), args=[comp_grey])

    pyr_fn = jax.jit(lambda g: build_gaussian_pyramid(g, t.factors))
    moving_pyr = pyr_fn(comp_grey)

    levels = _level_tile_sizes(config)
    n_lvls = len(levels)
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
            flow = jax.jit(lambda f: upscale_flow(f, npatches, list_id, config))(flow)
        moving_lvl = moving_pyr[l]
        prep = astate.ica_pallas[l] if astate.ica_pallas else None
        use_pallas = n_tiles >= PALLAS_ICA_MIN_TILES and prep is not None
        tag = f"L{l}_{moving_lvl.shape[0]}x{moving_lvl.shape[1]}_ts{ts}_r{radius}_{metric}"

        if metric == "L1" and radius == 1 and use_pallas:
            results[f"{tag}_fusedL1ICA"] = timeit(
                name=f"{tag}_fusedL1ICA",
                make_fn=lambda: jax.jit(lambda m, f: chk(
                    match_l1_refine_ica_pallas(ref_lvl, astate.ica[l], m, f,
                                               ts, n_iter, prep=prep))),
                args=[moving_lvl, flow])
            flow = jax.jit(lambda m, f: match_l1_refine_ica_pallas(
                ref_lvl, astate.ica[l], m, f, ts, n_iter, prep=prep))(
                    moving_lvl, flow)
            continue

        if metric == "L2":
            results[f"{tag}_matchL2"] = timeit(
                name=f"{tag}_matchL2",
                make_fn=lambda: jax.jit(lambda m, f: chk(
                    match_l2(astate.tiles[l], m, f, ts, radius))),
                args=[moving_lvl, flow])
            flow = jax.jit(lambda m, f: match_l2(
                astate.tiles[l], m, f, ts, radius))(moving_lvl, flow)
        else:
            results[f"{tag}_matchL1"] = timeit(
                name=f"{tag}_matchL1",
                make_fn=lambda: jax.jit(lambda m, f: chk(
                    match_l1(ref_lvl, m, f, ts, radius))),
                args=[moving_lvl, flow])
            flow = jax.jit(lambda m, f: match_l1(
                ref_lvl, m, f, ts, radius))(moving_lvl, flow)

        if use_pallas:
            ica_fn = functools.partial(refine_ica_pallas, prep=prep)
            nm = f"{tag}_icaPallas"
        else:
            ica_fn = refine_ica_tiled
            nm = f"{tag}_icaTiled"
        results[nm] = timeit(
            name=nm,
            make_fn=lambda: jax.jit(lambda m, f: chk(
                ica_fn(ref_lvl, astate.ica[l], m, f, ts, n_iter))),
            args=[moving_lvl, flow])
        flow = jax.jit(lambda m, f: ica_fn(
            ref_lvl, astate.ica[l], m, f, ts, n_iter))(moving_lvl, flow)

    floor = results["noop"]
    print(f"\n--- align per-level (best of 3, ms; floor {floor*1000:.1f}) ---",
          file=sys.stderr)
    tot = 0.0
    for k, v in results.items():
        real = max(0.0, v - floor)
        if k != "noop":
            tot += real
        print(f"{k:42s} {v*1000:9.1f} ms   real ~{real*1000:8.1f} ms",
              file=sys.stderr)
    print(f"{'TOTAL (sum of reals)':42s} {tot*1000:9.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
