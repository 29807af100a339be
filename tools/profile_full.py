#!/usr/bin/env python
"""Full per-stage profile at 12MP with readback-floor subtraction."""

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
    from hmsr_tpu.models.alignment import init_alignment, align
    from hmsr_tpu.models.robustness import init_robustness, compute_robustness
    from hmsr_tpu.models.kernels import estimate_kernels
    from hmsr_tpu.models.merge_tiled import merge_ref_tiled
    from hmsr_tpu.ops.pallas_merge import merge_pallas
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
    results["noop"] = timeit(
        name="noop", make_fn=lambda: jax.jit(lambda x: jnp.sum(x[::512, ::512])),
        args=[comp_d])

    results["grey_fft"] = timeit(
        name="grey_fft",
        make_fn=lambda: jax.jit(lambda x: chk(fft_lowpass_grey(x))), args=[comp_d])

    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(ref_d)
    comp_grey = grey_fn(comp_d)
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    results["init_alignment"] = timeit(
        name="init_alignment",
        make_fn=lambda: jax.jit(lambda g: chk(list(jax.tree.leaves(
            init_alignment(g, config))))), args=[ref_grey])

    results["align_full"] = timeit(
        name="align_full",
        make_fn=lambda: jax.jit(lambda g: chk(align(astate, g, config))),
        args=[comp_grey])

    flow = jax.jit(lambda g: align(astate, g, config))(comp_grey)
    rstats = jax.jit(lambda im: init_robustness(im, CFA, WB, (std_d, diff_d),
                                                config))(ref_d)

    results["robustness"] = timeit(
        name="robustness",
        make_fn=lambda: jax.jit(lambda im, st, fl: chk(compute_robustness(
            im, st, fl, CFA, WB, config))), args=[comp_d, rstats, flow])

    results["kernels"] = timeit(
        name="kernels",
        make_fn=lambda: jax.jit(lambda im: chk(estimate_kernels(im, config))),
        args=[comp_d])

    covs = jax.jit(lambda im: estimate_kernels(im, config))(comp_d)
    r = jax.jit(lambda im, st, fl: compute_robustness(im, st, fl, CFA, WB,
                                                      config))(comp_d, rstats, flow)
    num = jnp.zeros((3, H * SCALE, W * SCALE), jnp.float32)
    den = jnp.zeros((3, H * SCALE, W * SCALE), jnp.float32)

    results["merge_pallas"] = timeit(
        name="merge_pallas",
        make_fn=lambda: jax.jit(lambda im, fl, cv, rr, n, d: chk(list(merge_pallas(
            im, fl, cv, rr, n, d, CFA, config)))),
        args=[comp_d, flow, covs, r, num, den])

    results["merge_ref_tiled"] = timeit(
        name="merge_ref",
        make_fn=lambda: jax.jit(lambda im, cv, n, d: chk(list(merge_ref_tiled(
            im, cv, n, d, CFA, config)))),
        args=[ref_d, covs, num, den])

    floor = results["noop"]
    print("\n--- stage timings (best of 3, ms; minus readback floor "
          f"{floor*1000:.1f} ms) ---", file=sys.stderr)
    for k, v in results.items():
        print(f"{k:20s} {v*1000:9.1f} ms   real ~{(v-floor)*1000:8.1f} ms",
              file=sys.stderr)
    pf = sum(max(0.0, results[k] - floor) for k in
             ("grey_fft", "align_full", "robustness", "kernels", "merge_pallas"))
    print(f"per-frame sum ~{pf*1000:.1f} ms -> 19 frames ~{19*pf:.2f} s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
