#!/usr/bin/env python
"""Per-stage wall-clock profiling at 12MP scale on the current backend.

Times each pipeline stage as its own jitted program (steady-state, best of N)
to rank optimization targets. Run on the TPU; writes a summary to stderr.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import init_alignment, align
    from hmsr_tpu.models.robustness import init_robustness, compute_robustness
    from hmsr_tpu.models.kernels import estimate_kernels
    from hmsr_tpu.models.merge import merge, merge_ref
    from hmsr_tpu.models.pipeline import select_merge, merge_ref_banded
    from hmsr_tpu.ops.grey import fft_lowpass_grey

    H, W = (3000, 4000) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
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
    update_snr_config(config, 25.0)     # Ts = 16 like a bright burst
    sanitize_config(config, ref.shape)
    Ts = config.block_matching.tuning.tile_size
    print(f"image {H}x{W}, tile {Ts}, device {jax.devices()[0]}", file=sys.stderr)

    ref_d = jnp.asarray(ref)
    comp_d = jnp.asarray(comp)
    b = np.arange(1001) / 1000
    std_d = jnp.asarray(np.sqrt(ALPHA * b + BETA).astype(np.float32))
    diff_d = jnp.asarray((np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9)).astype(np.float32))

    results = {}

    grey_fn = jax.jit(fft_lowpass_grey)
    results["grey_fft"] = timeit(grey_fn, comp_d)
    ref_grey = grey_fn(ref_d)
    comp_grey = grey_fn(comp_d)

    init_align_fn = jax.jit(lambda g: init_alignment(g, config))
    results["init_alignment"] = timeit(init_align_fn, ref_grey)
    astate = init_align_fn(ref_grey)

    align_fn = jax.jit(lambda st, g: align(st, g, config))
    results["align"] = timeit(align_fn, astate, comp_grey)
    flow = align_fn(astate, comp_grey)

    init_rob_fn = jax.jit(lambda im: init_robustness(im, CFA, WB, (std_d, diff_d), config))
    results["init_robustness"] = timeit(init_rob_fn, ref_d)
    rstats = init_rob_fn(ref_d)

    rob_fn = jax.jit(lambda im, st, fl: compute_robustness(
        im, st, fl, CFA, WB, config))
    results["robustness"] = timeit(rob_fn, comp_d, rstats, flow)
    r = rob_fn(comp_d, rstats, flow)

    kern_fn = jax.jit(lambda im: estimate_kernels(im, config))
    results["kernels"] = timeit(kern_fn, comp_d)
    covs = kern_fn(comp_d)

    out_h, out_w = SCALE * H, SCALE * W
    num = jnp.zeros((3, out_h, out_w), jnp.float32)
    den = jnp.zeros((3, out_h, out_w), jnp.float32)
    mi = select_merge(config)
    merge_fn = jax.jit(lambda c, f, cv, rr, n, d: mi(c, f, cv, rr, n, d, CFA, config))
    results["merge"] = timeit(merge_fn, comp_d, flow, covs, r, num, den)

    from hmsr_tpu.models.pipeline import select_merge_ref
    mr = select_merge_ref(config)
    mref_fn = jax.jit(lambda c, cv, n, d: mr(c, cv, n, d, CFA, config))
    results["merge_ref"] = timeit(mref_fn, ref_d, covs, num, den)

    per_frame = (results["grey_fft"] + results["align"] + results["robustness"]
                 + results["kernels"] + results["merge"])
    print("\n--- stage timings (best of 3, s) ---", file=sys.stderr)
    for k, v in results.items():
        print(f"{k:20s} {v*1000:9.2f} ms", file=sys.stderr)
    print(f"{'per-frame total':20s} {per_frame*1000:9.2f} ms", file=sys.stderr)
    print(f"{'20-frame estimate':20s} {(results['init_alignment'] + results['init_robustness'] + 19*per_frame + results['merge_ref']):9.3f} s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
