#!/usr/bin/env python
"""A/B the full jitted pipeline at size with a given tpu.pipeline mode.

Usage: python tools/ab_pipeline_mode.py <mode> [HxW] [N]
  mode in scan / vmapped / fused / chunked.

Same coherent-burst methodology as tools/bisect_pipeline.py (perturbed
inputs between runs, checksum readback as the honest barrier).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from hmsr_tpu.configs import (default_config, update_snr_config,
                                  sanitize_config)
    from hmsr_tpu.models.pipeline import make_pipeline

    mode = sys.argv[1] if len(sys.argv) > 1 else "vmapped"
    H, W = map(int, (sys.argv[2] if len(sys.argv) > 2 else "3000x4000")
               .split("x"))
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    CFA = np.array([[0, 1], [1, 2]])
    WB = [1.0, 1.0, 1.0]
    ALPHA, BETA = 1.8e-4, 3.0e-6

    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 56.0)
    config.tpu.pipeline = mode
    sanitize_config(config, (H, W))

    rng = np.random.RandomState(5)
    scene = rng.rand(H + 8, W + 8).astype(np.float32) * 0.5 + 0.25
    ref = scene[4:4 + H, 4:4 + W]
    comps = np.stack([np.roll(scene, (dy, dx), (0, 1))[4:4 + H, 4:4 + W]
                      for dy, dx in zip(rng.randint(-3, 4, N - 1),
                                        rng.randint(-3, 4, N - 1))])
    b = np.arange(1001) / 1000
    std = jnp.asarray(np.sqrt(ALPHA * b + BETA).astype(np.float32))
    diff = jnp.asarray(
        np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9).astype(np.float32))

    pipe = make_pipeline(config, CFA, WB, jit=False)

    # in-graph scalar checksum (bench.py methodology): fetching the full
    # 48MP output through the tunnel costs ~45 s and swamps the compute
    def run_with_checksum(ref, comps, std_c, diff_c):
        img, _ = pipe(ref, comps, std_c, diff_c)
        sub = img[::31, ::37]
        return jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0))

    fn = jax.jit(run_with_checksum)
    ref_d = jnp.asarray(ref)
    comps_d = jnp.asarray(comps)

    t0 = time.time()
    v = float(np.asarray(fn(ref_d, comps_d, std, diff)))
    print(f"mode={mode} {H}x{W} N={N}: compile+run {time.time()-t0:.1f}s "
          f"checksum={v:.4f}", flush=True)

    times = []
    for i in range(3):
        # perturb between runs: the backend memoizes identical
        # (executable, inputs) executions (CLAUDE.md)
        comps_d = comps_d + jnp.float32(1e-6 * (i + 1))
        _ = float(np.asarray(jnp.sum(comps_d[0, ::512, ::512])))  # settle
        t0 = time.time()
        v = float(np.asarray(fn(ref_d, comps_d, std, diff)))
        times.append(time.time() - t0)
        print(f"mode={mode} run {i}: {times[-1]:.3f}s checksum={v:.4f}",
              flush=True)
    print(f"mode={mode} steady: {min(times):.3f}s (all "
          f"{[round(t, 3) for t in times]})", flush=True)


if __name__ == "__main__":
    main()
