#!/usr/bin/env python
"""Where do the ~300-550 s 12MP pipeline compiles go? (VERDICT r3 #5)

Splits the cost of the first call into its three phases, each timed
client-side:

  trace   — jax.jit(...).trace(args): Python tracing to jaxpr (client CPU)
  lower   — .lower(): jaxpr -> StableHLO, incl. Mosaic kernel lowering
            (client CPU)
  compile — .compile(): XLA:TPU + Mosaic compilation (remote, through the
            axon tunnel; includes RPC + server queueing)

Usage: python tools/probe_compile.py [HxW] [N] [stage]
  stage in upload/grey/align/rob/kern/merge/all (default all = full
  pipeline incl. ref merge; mirrors bench.py's program).

The HLO module size is also reported — StableHLO serialization rides the
tunnel, so a bloated module inflates the "compile" phase with transfer time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hmsr_tpu.configs import default_config, update_snr_config, \
        sanitize_config
    from hmsr_tpu.models.pipeline import make_pipeline

    H, W = map(int, (sys.argv[1] if len(sys.argv) > 1 else "3000x4000")
               .split("x"))
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    ALPHA, BETA = 1.8e-4, 3.0e-6
    CFA = np.array([[0, 1], [1, 2]])
    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 56.0)
    sanitize_config(config, (H, W))

    pipe = make_pipeline(config, CFA, [1.0, 1.0, 1.0], jit=False)
    # mirror bench.py: grey circulants as jit ARGUMENTS (shape-only here —
    # this probe traces/lowers/compiles but never executes)
    from hmsr_tpu.ops.grey import grey_consts_for
    gc_real = grey_consts_for(config, (H, W))
    gc = None if gc_real is None else tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in gc_real)

    def run(ref, comps, std, diff, gc):
        img, _ = pipe(ref, comps, std, diff, grey_consts=gc)
        sub = img[::31, ::37]
        return jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0))

    b = np.arange(1001) / 1000
    std = jnp.asarray(np.sqrt(ALPHA * b + BETA).astype(np.float32))
    diff = jnp.asarray(
        np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9).astype(np.float32))
    # zeros are fine: we never execute, only trace/lower/compile
    ref = jax.ShapeDtypeStruct((H, W), jnp.float32)
    comps = jax.ShapeDtypeStruct((N - 1, H, W), jnp.float32)

    fn = jax.jit(run)
    t0 = time.perf_counter()
    traced = fn.trace(ref, comps, std, diff, gc)
    t_trace = time.perf_counter() - t0
    print(f"trace:   {t_trace:8.1f}s", flush=True)

    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    print(f"lower:   {t_lower:8.1f}s", flush=True)

    try:
        txt = lowered.as_text(dialect="stablehlo")
        print(f"stablehlo module: {len(txt) / 1e6:.1f} MB text, "
              f"{txt.count('pallas_call')} pallas_call sites", flush=True)
    except Exception as e:
        print(f"(module text unavailable: {e})", flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"compile: {t_compile:8.1f}s (remote XLA:TPU + Mosaic + RPC)",
          flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"memory: {mem}", flush=True)
    except Exception:
        pass
    print(f"TOTAL: {t_trace + t_lower + t_compile:.1f}s  "
          f"(trace {100 * t_trace / (t_trace + t_lower + t_compile):.0f}% / "
          f"lower {100 * t_lower / (t_trace + t_lower + t_compile):.0f}% / "
          f"compile {100 * t_compile / (t_trace + t_lower + t_compile):.0f}%)",
          flush=True)


if __name__ == "__main__":
    main()
