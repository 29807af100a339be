#!/usr/bin/env python
"""Retest jax_compilation_cache_dir through the axon tunnel.

Round-2 note: enabling the persistent compilation cache "appeared to wedge
remote compiles (unconfirmed — possibly queueing behind another process)".
This probe settles it: one process compiles a mid-size pipeline program with
the cache enabled and reports timings; run it TWICE (same cache dir) — the
second process should hit the cache (compile ~0 s) if the axon PJRT client
supports executable serialization, or fall back to a normal compile with a
warning if not. Either way, "wedge" vs "works" is answered.

Usage: python tools/probe_compile_cache.py [cache_dir] [HxW] [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxcache_probe"
    H, W = map(int, (sys.argv[2] if len(sys.argv) > 2 else "752x1008").split("x"))
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # record cache hits/misses explicitly
    jax.config.update("jax_explain_cache_misses", True)

    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.pipeline import make_pipeline
    from hmsr_tpu.io.synthetic import make_synthetic_burst

    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = 1.8e-4
    config.noise_model.beta = 3.0e-6
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 56.0)
    sanitize_config(config, (H, W))

    ref, comps, _, _ = make_synthetic_burst(H, W, n_frames=N,
                                            alpha=1.8e-4, beta=3.0e-6, seed=0)
    b = np.arange(1001) / 1000.0
    std = np.sqrt(np.maximum(1.8e-4 * b + 3.0e-6, 0)).astype(np.float32)
    diff = np.sqrt(2 / np.pi * 2 * (1.8e-4 * b + 3.0e-6) / 9).astype(np.float32)

    from hmsr_tpu.io.synthetic import DEFAULT_CFA
    fn = make_pipeline(config, DEFAULT_CFA, [1.0, 1.0, 1.0])
    dev = jax.devices()[0]
    print(f"device: {dev.platform} cache_dir={cache_dir}", flush=True)

    import jax.numpy as jnp
    args = [jnp.asarray(x) for x in (ref, comps, std, diff)]
    for a in args:
        a.block_until_ready()

    t0 = time.perf_counter()
    out, _ = fn(*args)
    chk = float(np.asarray(out).sum())
    t1 = time.perf_counter()
    print(f"first call (compile+run): {t1 - t0:.1f}s checksum={chk:.3f}",
          flush=True)

    t0 = time.perf_counter()
    out, _ = fn(*args)
    _ = np.asarray(out)
    t1 = time.perf_counter()
    print(f"second call (cached in-process): {t1 - t0:.3f}s", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
