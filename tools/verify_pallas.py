#!/usr/bin/env python
"""On-TPU compiled (Mosaic, NOT interpret-mode) Pallas parity verification.

For Ts in {16, 32, 64}: each Pallas kernel vs its tiled XLA twin, allclose at
1e-4 (VERDICT round-1 item 4 — CI only exercises interpret mode; this runs
the real Mosaic lowering: DMA alignment, semaphores, bf16x3 under MXU
rounding). Prints one PASS/FAIL line per (kernel, Ts); exits nonzero on any
FAIL. Run it on the TPU after touching any kernel; results go in the round
notes (PALLAS_VERIFY.json).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def check(name, got, want, atol=1e-4):
    got = np.asarray(got)
    want = np.asarray(want)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = np.isfinite(err) and err <= atol and got.shape == want.shape
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|d|={err:.3e}", flush=True)
    return {"name": name, "ok": bool(ok), "max_err": err}


def main():
    from hmsr_tpu.configs import default_config, update_snr_config
    from hmsr_tpu.models.alignment import _unfold_tiles
    from hmsr_tpu.models.block_matching import match_l1, match_l2
    from hmsr_tpu.models.ica import init_ica, refine_ica_tiled
    from hmsr_tpu.models.merge_tiled import merge_tiled
    from hmsr_tpu.models.robustness import upscale_warp_stats_tiled
    from hmsr_tpu.ops.pallas_ica import (refine_ica_pallas,
                                         match_l1_refine_ica_pallas,
                                         match_l2_refine_ica_pallas)
    from hmsr_tpu.ops.pallas_merge import merge_pallas
    from hmsr_tpu.ops.pallas_warp import upscale_warp_pallas

    results = []
    rng = np.random.RandomState(0)
    CFA = np.array([[0, 1], [1, 2]])

    skip_ica = bool(os.environ.get("SKIP_ICA"))
    # ts=8 is the production coarsest-level geometry (tile_size_factors 0.5)
    # and exercises XG = 2 * 16 tiles/program — ICA kernels only.
    for ts in (8, 16, 32, 64):
        # tile grid: a handful of tiles in each direction
        ny, nx = 6, 8
        h, w = ny * ts, nx * ts
        img = rng.rand(h, w).astype(np.float32)
        mov = rng.rand(h, w).astype(np.float32)
        # smooth both so ICA converges similarly (argmin ties need contrast)
        k = np.ones((5, 5), np.float32) / 25
        try:
            from scipy.signal import convolve2d
            img = convolve2d(img, k, mode="same").astype(np.float32)
            mov = convolve2d(mov, k, mode="same").astype(np.float32)
        except ImportError:
            pass
        img = np.round(img * 256) / 256
        mov = np.round(mov * 256) / 256
        flow0 = (rng.rand(ny, nx, 2) * 6 - 3).astype(np.float32)

        img_j = jnp.asarray(img)
        mov_j = jnp.asarray(mov)
        flow_j = jnp.asarray(flow0)
        state = jax.jit(lambda g: init_ica(g, ts))(img_j)

        # ---- ICA refine (pallas vs tiled) ----
        if skip_ica:
            do_ica = False
        else:
            do_ica = True
        if do_ica:
            want = jax.jit(lambda m, f: refine_ica_tiled(
                img_j, state, m, f, ts, 3))(mov_j, flow_j)
            got = jax.jit(lambda m, f: refine_ica_pallas(
                img_j, state, m, f, ts, 3))(mov_j, flow_j)
            results.append(check(f"refine_ica ts={ts}", got, want))

            # ---- fused L1 BM + ICA ----
            want = jax.jit(lambda m, f: refine_ica_tiled(
                img_j, state, m, match_l1(img_j, m, f, ts, 1), ts, 3))(
                    mov_j, flow_j)
            got = jax.jit(lambda m, f: match_l1_refine_ica_pallas(
                img_j, state, m, f, ts, 3))(mov_j, flow_j)
            results.append(check(f"fused_l1_ica ts={ts}", got, want))

            # ---- fused L2 BM + ICA (radius 4) ----
            tiles = _unfold_tiles(img_j, ts)
            want = jax.jit(lambda m, f: refine_ica_tiled(
                img_j, state, m, match_l2(tiles, m, f, ts, 4), ts, 3))(
                    mov_j, flow_j)
            got = jax.jit(lambda m, f: match_l2_refine_ica_pallas(
                img_j, state, m, f, ts, 3, 4))(mov_j, flow_j)
            results.append(check(f"fused_l2_ica ts={ts}", got, want))

        # ---- upscale/warp stats (robustness Dodgson) ----
        if ts == 8:
            continue          # warp/merge never run at ts=8 in the pipeline
        g = 2
        stats = rng.rand(3, h // g, w // g).astype(np.float32)
        stats_j = jnp.asarray(stats)
        want = jax.jit(lambda s, f: upscale_warp_stats_tiled(
            s, g, ts, f, (h, w)))(stats_j, flow_j)
        got = jax.jit(lambda s, f: upscale_warp_pallas(
            s, g, ts, f, (h, w)))(stats_j, flow_j)
        # stats are defined only where valid (invalid pixels may hold NaN
        # from a 0/0 Dodgson weight sum on both sides)
        m = np.asarray(want[1])
        results.append(check(f"upscale_warp[stats] ts={ts}",
                             np.asarray(got[0])[:, m],
                             np.asarray(want[0])[:, m]))
        results.append(check(f"upscale_warp[valid] ts={ts}",
                             np.asarray(got[1], np.float32),
                             np.asarray(want[1], np.float32)))

        # ---- merge (pallas vs tiled), steerable bayer x2 ----
        config = default_config()
        config.scale = 2
        config.noise_model.alpha = 1.8e-4
        config.noise_model.beta = 3.0e-6
        config.accumulated_robustness_denoiser.enabled = False
        update_snr_config(config, 25.0)
        config.block_matching.tuning.tile_size = ts
        s = 2
        covs = (0.5 + rng.rand(3, h // 2, w // 2)).astype(np.float32)
        covs[1] *= 0.1                      # keep det positive
        r = rng.rand(h, w).astype(np.float32)
        num0 = jnp.zeros((3, s * h, s * w), jnp.float32)
        den0 = jnp.zeros((3, s * h, s * w), jnp.float32)
        want = jax.jit(lambda m, f: merge_tiled(
            m, f, jnp.asarray(covs), jnp.asarray(r), num0, den0, CFA,
            config))(mov_j, flow_j)
        from hmsr_tpu.ops.pallas_merge import padded_accum_shape
        pshape = padded_accum_shape(config, (h, w), 3)
        nump = jnp.zeros(pshape, jnp.float32)
        denp = jnp.zeros(pshape, jnp.float32)
        got = jax.jit(lambda m, f: merge_pallas(
            m, f, jnp.asarray(covs), jnp.asarray(r), nump, denp, CFA,
            config))(mov_j, flow_j)
        results.append(check(f"merge[num] ts={ts}",
                             got[0][:, :s * h, :s * w], want[0]))
        results.append(check(f"merge[den] ts={ts}",
                             got[1][:, :s * h, :s * w], want[1]))

        # ---- burst-fused merge (frames-innermost grid) vs per-frame ----
        from hmsr_tpu.ops.pallas_merge import merge_burst_pallas
        F = 3
        movs = rng.rand(F, h, w).astype(np.float32)
        flows = (rng.rand(F, ny, nx, 2).astype(np.float32) - 0.5) * 4
        covsF = (0.5 + rng.rand(F, 3, h // 2, w // 2)).astype(np.float32)
        covsF[:, 1] *= 0.1
        rF = rng.rand(F, h, w).astype(np.float32)

        def seq(m, f, k, rr):
            n, d = nump, denp
            for i in range(F):
                n, d = merge_pallas(m[i], f[i], k[i], rr[i], n, d, CFA,
                                    config)
            return n, d

        want = jax.jit(seq)(jnp.asarray(movs), jnp.asarray(flows),
                            jnp.asarray(covsF), jnp.asarray(rF))
        got = jax.jit(lambda m, f, k, rr: merge_burst_pallas(
            m, f, k, rr, nump, denp, CFA, config))(
            jnp.asarray(movs), jnp.asarray(flows), jnp.asarray(covsF),
            jnp.asarray(rF))
        results.append(check(f"merge_burst[num] ts={ts}", got[0], want[0]))
        results.append(check(f"merge_burst[den] ts={ts}", got[1], want[1]))

    ok = all(r["ok"] for r in results)
    out = {"ok": ok, "device": str(jax.devices()[0]), "results": results}
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PALLAS_VERIFY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": ok, "n": len(results)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
