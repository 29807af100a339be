#!/usr/bin/env python
"""e2e numerics parity: the SAME small pipeline on the TPU backend vs CPU.

Usage:
    python tools/verify_e2e_parity.py cpu   # run on CPU, save references
    python tools/verify_e2e_parity.py tpu   # run on TPU, compare + write
                                            # E2E_PARITY.json at the repo root

Covers every SNR tile-size tier (Ts = 16 / 32 / 64 — reference
params.py:62-67) on a small synthetic burst. The CPU run uses the XLA tiled
paths; the TPU run uses the production Pallas paths (both parity-tested
against oracles in CI) — this catches backend-specific miscompiles of
ANYTHING in the jitted program (e.g. the axon fori_loop bug found 2026-08:
see models/ica.py). Scan pipeline forced on both so the program structure
matches.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_PATH = "/tmp/hmsr_e2e_cpu.npz"
OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "E2E_PARITY.json")

#: (name, image size, tile size) — one per SNR tier. The coarse level uses
#: ts/2 like the production schedule; sizes keep >= 3x3 tiles at the coarse
#: level so block matching + group DMAs are exercised, not degenerate.
CONFIGS = [
    ("ts16", 128, 16),
    ("ts32", 256, 32),
    ("ts64", 512, 64),
]


def run_one(size, ts):
    import jax
    import jax.numpy as jnp
    from hmsr_tpu.configs import default_config, update_snr_config, \
        sanitize_config
    from hmsr_tpu.io.synthetic import make_synthetic_burst, DEFAULT_CFA
    from hmsr_tpu.models.pipeline import make_pipeline

    ALPHA, BETA = 1.8e-4, 3.0e-6
    ref, comps, _, _ = make_synthetic_burst(size, size, n_frames=4,
                                            alpha=ALPHA, beta=BETA, seed=11)
    c = default_config()
    c.scale = 2
    c.debug = True
    c.block_matching.tuning.factors = [1, 2]
    c.block_matching.tuning.tile_size_factors = [1, 1]
    c.block_matching.tuning.search_radii = [1, 4]
    c.block_matching.tuning.metrics = ["L1", "L2"]
    update_snr_config(c, 20)
    c.block_matching.tuning.tile_size = ts
    c.block_matching.tuning.tile_sizes = [ts, ts]
    c.noise_model.alpha = ALPHA
    c.noise_model.beta = BETA
    c.accumulated_robustness_denoiser.enabled = False
    c.tpu.pipeline = "scan"
    sanitize_config(c, (size, size))

    b = np.arange(1001) / 1000.0
    std = jnp.asarray(np.sqrt(np.maximum(ALPHA * b + BETA, 0)
                              ).astype(np.float32))
    diff = jnp.asarray((np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9)
                        ).astype(np.float32))

    pipe = make_pipeline(c, DEFAULT_CFA, [1.0, 1.0, 1.0])
    img, debug = pipe(jnp.asarray(ref), jnp.asarray(comps), std, diff)
    img = np.nan_to_num(np.asarray(img))
    flow = np.asarray(debug["flow"])
    return img, flow


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    import jax
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")

    configs = [c for c in CONFIGS if only is None or c[0] == only]
    if mode == "cpu":
        out = {}
        for name, size, ts in configs:
            img, flow = run_one(size, ts)
            out[f"{name}_img"] = img
            out[f"{name}_flow"] = flow
            print(f"[cpu {name}] img_sum={img.sum():.4f}", flush=True)
        np.savez(REF_PATH, **out)
        print("saved", REF_PATH, flush=True)
        return

    want = np.load(REF_PATH)
    results = {}
    ok_all = True
    for name, size, ts in configs:
        img, flow = run_one(size, ts)
        print(f"[tpu {name}] device={jax.devices()[0]} "
              f"img_sum={img.sum():.4f}", flush=True)
        d_img = np.abs(img - want[f"{name}_img"])[8:-8, 8:-8]
        d_flow = np.abs(flow - want[f"{name}_flow"])
        # max-abs gate (round-5): f32 accumulation-order noise between the
        # Pallas and XLA formulations is ~1e-6 relative, but near-starved
        # pixels divide by tiny kernel mass and amplify it — 1e-3 bounds
        # that worst pixel while staying 3 decades above true divergence
        # (round-4 recorded worst case: 3.7e-4 at ts32).
        ok = bool(d_flow.max() < 1e-2 and d_img.mean() < 1e-4
                  and d_img.max() < 1e-3)
        ok_all &= ok
        results[name] = {
            "image_size": size, "tile_size": ts,
            "flow_max_abs_diff": float(d_flow.max()),
            "img_max_abs_diff": float(d_img.max()),
            "img_mean_abs_diff": float(d_img.mean()),
            "pass": ok,
        }
        print(f"  flow max|d| = {d_flow.max():.3e}   "
              f"image max|d| = {d_img.max():.3e}  mean = {d_img.mean():.3e} "
              f"-> {'PASS' if ok else 'FAIL'}", flush=True)

    if only is None:
        import datetime
        results["_meta"] = {
            "device": str(jax.devices()[0]),
            "date": datetime.date.today().isoformat(),
            "criteria": "flow max|d| < 1e-2, image mean|d| < 1e-4, "
                        "image max|d| < 1e-3",
        }
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", OUT_PATH, flush=True)
    print("E2E PARITY:", "PASS" if ok_all else "FAIL", flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
