#!/usr/bin/env python
"""e2e numerics parity: the SAME small pipeline on the TPU backend vs CPU.

Usage:
    python tools/verify_e2e_parity.py cpu   # run on CPU, save reference
    python tools/verify_e2e_parity.py tpu   # run on TPU, compare

The CPU run uses the XLA tiled paths; the TPU run uses the production Pallas
paths (both parity-tested against oracles in CI) — this catches
backend-specific miscompiles of ANYTHING in the jitted program (e.g. the
axon fori_loop bug found 2026-08: see models/ica.py). Scan pipeline forced on
both so the program structure matches.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_PATH = "/tmp/hmsr_e2e_cpu.npz"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    import jax
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hmsr_tpu.configs import default_config, update_snr_config, \
        sanitize_config
    from hmsr_tpu.io.synthetic import make_synthetic_burst, DEFAULT_CFA
    from hmsr_tpu.models.pipeline import make_pipeline

    ALPHA, BETA = 1.8e-4, 3.0e-6
    ref, comps, _, _ = make_synthetic_burst(128, 128, n_frames=4,
                                            alpha=ALPHA, beta=BETA, seed=11)
    c = default_config()
    c.scale = 2
    c.debug = True
    c.block_matching.tuning.tile_size = 16
    c.block_matching.tuning.factors = [1, 2]
    c.block_matching.tuning.tile_size_factors = [1, 1]
    c.block_matching.tuning.search_radii = [1, 4]
    c.block_matching.tuning.metrics = ["L1", "L2"]
    update_snr_config(c, 20)
    c.block_matching.tuning.tile_size = 16
    c.block_matching.tuning.tile_sizes = [16, 16]
    c.noise_model.alpha = ALPHA
    c.noise_model.beta = BETA
    c.accumulated_robustness_denoiser.enabled = False
    c.tpu.pipeline = "scan"
    sanitize_config(c, (128, 128))

    b = np.arange(1001) / 1000.0
    std = jnp.asarray(np.sqrt(np.maximum(ALPHA * b + BETA, 0)).astype(np.float32))
    diff = jnp.asarray((np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9)
                        ).astype(np.float32))

    pipe = make_pipeline(c, DEFAULT_CFA, [1.0, 1.0, 1.0])
    img, debug = pipe(jnp.asarray(ref), jnp.asarray(comps), std, diff)
    img = np.nan_to_num(np.asarray(img))
    flow = np.asarray(debug["flow"])
    print(f"[{mode}] device={jax.devices()[0]} img_sum={img.sum():.4f}",
          flush=True)

    if mode == "cpu":
        np.savez(REF_PATH, img=img, flow=flow)
        print("saved", REF_PATH, flush=True)
        return

    want = np.load(REF_PATH)
    d_img = np.abs(img - want["img"])[8:-8, 8:-8]
    d_flow = np.abs(flow - want["flow"])
    print(f"flow  max|d| = {d_flow.max():.3e}", flush=True)
    print(f"image max|d| = {d_img.max():.3e}  mean = {d_img.mean():.3e}",
          flush=True)
    ok = d_flow.max() < 1e-2 and d_img.mean() < 1e-4
    print("E2E PARITY:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
