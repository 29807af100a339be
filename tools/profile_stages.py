#!/usr/bin/env python
"""Per-stage wall-clock profiling at 12MP scale (honest methodology).

Timing rules (CLAUDE.md): perturb inputs every run (backend memoizes),
observe completion via a scalar-checksum readback, report best of N.
Run ONE instance at a time (single-tenant chip).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(make_fn, args, perturb_idx=0, n=2, name=""):
    """make_fn -> jitted fn returning a scalar; args perturbed per run."""
    t0 = time.perf_counter()
    fn = make_fn()
    v = float(np.asarray(fn(*args)))        # compile + warm
    print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    ts = []
    for i in range(n):
        args2 = list(args)
        args2[perturb_idx] = args2[perturb_idx] + jnp.float32(1e-7 * (i + 1))
        jax.block_until_ready(args2[perturb_idx])
        _ = float(np.asarray(jnp.sum(args2[perturb_idx].ravel()[:3])))
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args2)))
        ts.append(time.perf_counter() - t0)
    return min(ts), v


def chk(x):
    if isinstance(x, (tuple, list)):
        return sum(chk(v) for v in jax.tree.leaves(x))
    x = x if x.ndim <= 2 else x[..., ::17, ::19]
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import init_alignment, align
    from hmsr_tpu.models.robustness import init_robustness, compute_robustness
    from hmsr_tpu.models.kernels import estimate_kernels
    from hmsr_tpu.models.merge_slab import merge_burst_slab as merge_burst_tiled
    from hmsr_tpu.ops.grey import fft_lowpass_grey
    from hmsr_tpu.ops.pyramid import build_gaussian_pyramid

    H, W = (3000, 4000) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
    NF = 4   # frames for the fused-merge timing (keep runs quick)
    SCALE = 2
    ALPHA, BETA = 1.8e-4, 3.0e-6
    CFA = np.array([[0, 1], [1, 2]])
    WB = [1.0, 1.0, 1.0]

    rng = np.random.RandomState(0)
    ref = rng.rand(H, W).astype(np.float32)
    comp = rng.rand(H, W).astype(np.float32)

    config = default_config()
    config.scale = SCALE
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

    results = {}

    results["grey_fft"], _ = timeit(
        name="grey_fft",
        make_fn=lambda: jax.jit(lambda x: chk(fft_lowpass_grey(x))), args=[comp_d])

    results["pyramid"], _ = timeit(
        name="pyramid",
        make_fn=lambda: jax.jit(lambda x: chk(list(build_gaussian_pyramid(
            x, config.block_matching.tuning.factors)))), args=[comp_d])

    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(ref_d)
    comp_grey = grey_fn(comp_d)
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    results["align_full"], _ = timeit(
        name="align_full",
        make_fn=lambda: jax.jit(lambda g, st: chk(align(st, g, config))),
        args=[comp_grey, astate])

    rstats = jax.jit(lambda im: init_robustness(im, CFA, WB, (std_d, diff_d),
                                                config))(ref_d)
    flow = jax.jit(lambda g: align(astate, g, config))(comp_grey)

    results["robustness"], _ = timeit(
        name="robustness",
        make_fn=lambda: jax.jit(lambda im, st, fl: chk(compute_robustness(
            im, st, fl, CFA, WB, config))), args=[comp_d, rstats, flow])

    results["kernels"], _ = timeit(
        name="kernels",
        make_fn=lambda: jax.jit(lambda im: chk(estimate_kernels(im, config))), args=[comp_d])

    # fused merge over NF frames
    comps = jnp.asarray(rng.rand(NF, H, W).astype(np.float32))
    ny, nx = -(-H // Ts), -(-W // Ts)
    flows = jnp.asarray((rng.rand(NF, ny, nx, 2) * 4 - 2).astype(np.float32))
    rmaps = jnp.asarray(rng.rand(NF, H, W).astype(np.float32))
    g2 = rng.rand(NF, H // 2, W // 2, 2).astype(np.float32) + 0.3
    covs = jnp.asarray(np.stack([g2[..., 0], 0.2 * g2[..., 0], g2[..., 1]],
                                axis=1))
    ref_covs = covs[0]

    results[f"merge_fused_{NF}f"], _ = timeit(
        name="merge_fused",
        make_fn=lambda: jax.jit(lambda cs, fl, cv, rm, rf, rc: chk(merge_burst_tiled(
            cs, fl, cv, rm, rf, rc, CFA, config))),
        args=[comps, flows, covs, rmaps, ref_d, ref_covs])

    print("\n--- honest stage timings (best of 2, ms) ---", file=sys.stderr)
    for k, v in results.items():
        print(f"{k:20s} {v*1000:9.1f} ms", file=sys.stderr)
    per_frame = (results["grey_fft"] + results["align_full"]
                 + results["robustness"] + results["kernels"])
    merge_pf = results[f"merge_fused_{NF}f"] / NF
    print(f"analysis per frame   {per_frame*1000:9.1f} ms", file=sys.stderr)
    print(f"merge per frame      {merge_pf*1000:9.1f} ms", file=sys.stderr)
    print(f"19-frame estimate    {19*(per_frame+merge_pf):9.2f} s", file=sys.stderr)


if __name__ == "__main__":
    main()
