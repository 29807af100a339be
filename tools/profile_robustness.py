#!/usr/bin/env python
"""Fine-grained robustness-chain profiling at 12MP (honest methodology).

Each sub-stage is timed as its own jitted program with a scalar-checksum
readback (see CLAUDE.md tunnel gotchas). Inputs perturbed per run.
"""

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
    from hmsr_tpu.models.robustness import (
        compute_guide_image, compute_robustness, init_robustness, compute_s)
    from hmsr_tpu.ops.stencils import local_stats_3x3, local_min_5x5
    from hmsr_tpu.ops.pallas_warp import upscale_warp_pallas

    H, W = (3000, 4000) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
    ALPHA, BETA = 1.8e-4, 3.0e-6
    CFA = np.array([[0, 1], [1, 2]])
    WB = [1.0, 1.0, 1.0]

    rng = np.random.RandomState(0)
    ref = rng.rand(H, W).astype(np.float32)
    comp = rng.rand(H, W).astype(np.float32)

    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 25.0)
    sanitize_config(config, ref.shape)
    Ts = config.block_matching.tuning.tile_size
    print(f"image {H}x{W}, tile {Ts}, device {jax.devices()[0]}", file=sys.stderr)

    ref_d = jnp.asarray(ref)
    comp_d = jnp.asarray(comp)
    b = np.arange(1001) / 1000
    std_d = jnp.asarray(np.sqrt(ALPHA * b + BETA).astype(np.float32))
    diff_d = jnp.asarray((np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9)).astype(np.float32))

    ny, nx = -(-H // Ts), -(-W // Ts)
    flow = jnp.asarray((rng.rand(ny, nx, 2) * 4 - 2).astype(np.float32))

    results = {}

    # floor: trivial readback
    results["noop_readback"] = timeit(
        name="noop", make_fn=lambda: jax.jit(lambda x: jnp.sum(x[::512, ::512])),
        args=[comp_d])

    # 1. guide image
    results["guide"] = timeit(
        name="guide",
        make_fn=lambda: jax.jit(lambda x: chk(compute_guide_image(x, CFA, WB))),
        args=[comp_d])

    guide = jax.jit(lambda x: compute_guide_image(x, CFA, WB))(comp_d)

    # 2. local stats on (3, H/2, W/2)
    results["local_stats"] = timeit(
        name="local_stats",
        make_fn=lambda: jax.jit(lambda g: chk(list(local_stats_3x3(g)))),
        args=[guide])

    means = jax.jit(lambda g: local_stats_3x3(g)[0])(guide)

    # 3. pallas warp (3, H/2, W/2) -> (3, H, W)
    results["warp_pallas"] = timeit(
        name="warp_pallas",
        make_fn=lambda: jax.jit(lambda m, f: chk(list(
            upscale_warp_pallas(m, 2, Ts, f, (H, W))))),
        args=[means, flow])

    # 4. elementwise post (d_p -> d_sq -> R) given warped stats
    hr_means = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    d_t = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 0.01)
    sigma_sq = jnp.asarray(rng.rand(H, W).astype(np.float32) * 1e-4 + 1e-5)

    def post(comp_means, d_t, sigma_sq, flow):
        d_p = jnp.abs(hr_means - comp_means)
        d_p_sq = d_p * d_p
        shrink = d_p_sq / (d_p_sq + d_t * d_t)
        d_sq = jnp.sum(d_p_sq * shrink * shrink, axis=0)
        S = compute_s(flow, 0.8, 2.0, 12.0)
        s_map = jnp.repeat(jnp.repeat(S, Ts, axis=0), Ts, axis=1)[:H, :W]
        R = jnp.clip(s_map * jnp.exp(-d_sq / sigma_sq) - 0.12, 0.0, 1.0)
        return R

    results["post_elemwise"] = timeit(
        name="post",
        make_fn=lambda: jax.jit(lambda m, dt, ss, f: chk(post(m, dt, ss, f))),
        args=[hr_means, d_t, sigma_sq, flow])

    # 5. local min 5x5 at (H, W)
    Rmap = jnp.asarray(rng.rand(H, W).astype(np.float32))
    results["local_min_5x5"] = timeit(
        name="local_min",
        make_fn=lambda: jax.jit(lambda r: chk(local_min_5x5(r))),
        args=[Rmap])

    # 6. LUT gather at (3, H, W) (init_robustness cost)
    results["lut_gather_3xHW"] = timeit(
        name="lut",
        make_fn=lambda: jax.jit(lambda m: chk(
            std_d[jnp.clip(jnp.round(1000.0 * m), 0, 1000).astype(jnp.int32)])),
        args=[hr_means])

    # full compute_robustness
    rstats = jax.jit(lambda im: init_robustness(im, CFA, WB, (std_d, diff_d),
                                                config))(ref_d)
    results["compute_robustness"] = timeit(
        name="compute_robustness",
        make_fn=lambda: jax.jit(lambda im, st, fl: chk(compute_robustness(
            im, st, fl, CFA, WB, config))), args=[comp_d, rstats, flow])

    # full init_robustness
    results["init_robustness"] = timeit(
        name="init_robustness",
        make_fn=lambda: jax.jit(lambda im: chk(list(init_robustness(
            im, CFA, WB, (std_d, diff_d), config)))), args=[ref_d])

    print("\n--- robustness sub-stage timings (best of 3, ms) ---",
          file=sys.stderr)
    for k, v in results.items():
        print(f"{k:22s} {v*1000:9.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
