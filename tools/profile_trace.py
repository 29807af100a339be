#!/usr/bin/env python
"""Profile the CLIENT-SIDE trace phase of the full 12MP pipeline on CPU.

The round-5 compile probe (tools/probe_compile_r5.log) puts first-call
latency at 202.5 s = trace 95.2 + lower 60.4 + remote compile 46.9 — 77%
client-side. Tracing is backend-independent Python work, so cProfile on
the CPU backend attributes it without touching the (single-tenant) TPU.

Usage: python tools/profile_trace.py [HxW] [N] [topk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.pipeline import make_pipeline

    H, W = map(int, (sys.argv[1] if len(sys.argv) > 1 else "3000x4000").split("x"))
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    CFA = np.array([[0, 1], [1, 2]])
    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = 1.8e-4
    config.noise_model.beta = 3.0e-6
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 56.0)
    # force the TPU production routing even on the CPU backend: tracing is
    # backend-independent, and the point is to profile the PRODUCTION trace
    config.tpu.pipeline = "scan"
    config.tpu.grey_impl = "matmul"
    config.tpu.ica_impl = "pallas"
    config.tpu.robustness_impl = "pallas"
    config.tpu.merge_impl = "pallas"
    sanitize_config(config, (H, W))

    pipe = make_pipeline(config, CFA, [1.0, 1.0, 1.0], jit=False)
    from hmsr_tpu.ops.grey import grey_consts_for
    gc_real = grey_consts_for(config, (H, W))
    gc = None if gc_real is None else tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in gc_real)

    def run(ref, comps, std, diff, gc):
        img, _ = pipe(ref, comps, std, diff, grey_consts=gc)
        sub = img[::31, ::37]
        return jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0))

    ref = jax.ShapeDtypeStruct((H, W), jnp.float32)
    comps = jax.ShapeDtypeStruct((N - 1, H, W), jnp.float32)
    std = jax.ShapeDtypeStruct((1001,), jnp.float32)
    diff = jax.ShapeDtypeStruct((1001,), jnp.float32)

    fn = jax.jit(run)

    import cProfile
    import pstats

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    traced = fn.trace(ref, comps, std, diff, gc)
    prof.disable()
    t_trace = time.perf_counter() - t0
    print(f"trace: {t_trace:8.1f}s", flush=True)

    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(topk)
    print("=" * 70)
    st.sort_stats("tottime").print_stats(topk)

    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    print(f"lower: {t_lower:8.1f}s (CPU backend — TPU/Mosaic lowering differs)",
          flush=True)


if __name__ == "__main__":
    main()
