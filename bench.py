#!/usr/bin/env python
"""Benchmark: 20-frame 12MP raw burst -> 48MP x2 super-resolution.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": <seconds>, "unit": "s", "vs_baseline": <x>}

Baseline: the reference processes the same workload in < 4 s on an RTX 3090
(reference README.md:10, see BASELINE.md); ``vs_baseline`` is the speedup
factor 4.0 / ours (>1 means faster than the reference's published number).

Timing methodology mirrors the reference's "excluding Numba JIT warmup": the
pipeline is compiled + warmed once, then the steady-state wall-clock of the
full burst merge (device compute, block_until_ready) is reported, best of 3.
Secondary diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_burst(h, w, n_frames, alpha, beta, seed=0):
    """Cheap 12MP-scale synthetic burst: integer-rolled + noisy mosaics."""
    rng = np.random.RandomState(seed)
    base = rng.rand(h // 16 + 1, w // 16 + 1).astype(np.float32)
    img = np.kron(base, np.ones((16, 16), np.float32))[:h, :w]
    try:
        from scipy.ndimage import gaussian_filter
        img = gaussian_filter(img, 4.0)
    except ImportError:
        pass
    img = 0.1 + 0.8 * (img - img.min()) / (np.ptp(img) + 1e-9)

    frames = np.empty((n_frames, h, w), np.float32)
    for n in range(n_frames):
        dy, dx = (0, 0) if n == 0 else rng.randint(-3, 4, 2)
        shifted = np.roll(img, (dy, dx), axis=(0, 1))
        noise = np.sqrt(np.maximum(alpha * shifted + beta, 0)) * \
            rng.randn(h, w).astype(np.float32)
        frames[n] = np.clip(shifted + noise, 0, 1)
    return frames


def main():
    import jax
    # NOTE: do not enable the persistent compilation cache here — it wedges
    # the axon remote-compile backend (hangs on executable serialization).
    import jax.numpy as jnp
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.pipeline import make_pipeline
    from hmsr_tpu.noise import run_fast_MC

    H, W = 3000, 4000           # 12MP sensor
    N_FRAMES = 20
    SCALE = 2
    ALPHA, BETA = 1.8e-4, 3.0e-6
    CFA = np.array([[0, 1], [1, 2]])

    log(f"devices: {jax.devices()}")
    log(f"building synthetic burst {N_FRAMES}x{H}x{W} ...")
    frames = make_burst(H, W, N_FRAMES, ALPHA, BETA)
    ref, comps = frames[0], frames[1:]

    config = default_config()
    config.scale = SCALE
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    config.accumulated_robustness_denoiser.enabled = False

    log("calibrating noise curves ...")
    t0 = time.perf_counter()
    std_curve, diff_curve = run_fast_MC(ALPHA, BETA)
    log(f"noise curves: {time.perf_counter() - t0:.2f}s")

    brightness = float(ref.mean())
    snr = brightness / std_curve[int(round(1000 * brightness))]
    update_snr_config(config, snr)
    sanitize_config(config, ref.shape)
    log(f"SNR {snr:.1f} -> tile size {config.block_matching.tuning.tile_size}")

    pipe = make_pipeline(config, CFA, [1.0, 1.0, 1.0])
    ref_d = jnp.asarray(ref)
    comps_d = jnp.asarray(comps)
    std_d = jnp.asarray(std_curve.astype(np.float32))
    diff_d = jnp.asarray(diff_curve.astype(np.float32))

    log("compiling + warmup ...")
    t0 = time.perf_counter()
    img, _ = pipe(ref_d, comps_d, std_d, diff_d)
    jax.block_until_ready(img)
    log(f"first call (compile+run): {time.perf_counter() - t0:.2f}s")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        img, _ = pipe(ref_d, comps_d, std_d, diff_d)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.3f}s")

    best = min(times)
    out = np.asarray(img)
    log(f"output {out.shape}, finite interior: "
        f"{bool(np.isfinite(out[8:-8, 8:-8]).all())}")

    print(json.dumps({
        "metric": "e2e_20x12MP_burst_x2SR_wallclock",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(4.0 / best, 3),
    }))


if __name__ == "__main__":
    main()
