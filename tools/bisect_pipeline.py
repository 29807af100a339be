#!/usr/bin/env python
"""Bisect which pipeline stage crashes the TPU worker at full scale.

Usage: python tools/bisect_pipeline.py <stage>[,<stage>...] [HxW] [N]
  stage in: upload, grey, align, rob, kern, merge, mergeref, all
A comma-separated list sweeps several stages in ONE process (shared device
init + burst upload) — each stage still compiles its own program.
Each invocation builds a reduced pipeline that runs stages up to <stage>
inside the scan and fetches a small checksum (sum) as the honest readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import align, init_alignment
    from hmsr_tpu.models.robustness import compute_robustness, init_robustness
    from hmsr_tpu.models.kernels import estimate_kernels
    from hmsr_tpu.models.pipeline import select_merge, select_merge_ref
    from hmsr_tpu.ops.grey import compute_grey_image
    from hmsr_tpu.utils.types import DEFAULT_FLOAT

    stages = (sys.argv[1] if len(sys.argv) > 1 else "all").split(",")
    H, W = map(int, (sys.argv[2] if len(sys.argv) > 2 else "3000x4000").split("x"))
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    CFA = np.array([[0, 1], [1, 2]])
    WB = [1.0, 1.0, 1.0]
    ALPHA, BETA = 1.8e-4, 3.0e-6

    import os
    # this harness is the one place the truncation knobs are legitimate
    os.environ["HMSR_DEBUG_TRUNC"] = "1"
    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 56.0)
    if os.environ.get("HMSR_ALIGN_LEVELS"):
        config.tpu.align_levels = int(os.environ["HMSR_ALIGN_LEVELS"])
    if os.environ.get("HMSR_ICA_IMPL"):
        config.tpu.ica_impl = os.environ["HMSR_ICA_IMPL"]
    if os.environ.get("HMSR_ROBUSTNESS_IMPL"):
        config.tpu.robustness_impl = os.environ["HMSR_ROBUSTNESS_IMPL"]
    if os.environ.get("HMSR_ROB_TRUNC"):
        config.tpu.rob_trunc = int(os.environ["HMSR_ROB_TRUNC"])
    sanitize_config(config, (H, W))

    # coherent burst (shifted copies of one scene + noise): independent
    # random frames give garbage flow, putting every group-DMA fast path
    # permanently on its worst-case fallback — unrepresentative timings.
    # Disk-cached: sweep harnesses (tools/diag_merge_sweep.sh) run one
    # process per variant and regeneration costs ~3 min at 12MP on this box.
    # _g1s0: generator version 1, seed 0 — bump when the recipe (seed,
    # blur, shift range, noise) changes so stale /tmp files from an older
    # generator can't silently change measurement inputs across rounds.
    cache = f"/tmp/hmsr_bisect_burst_g1s0_{H}x{W}_n{N}.npy"
    frames = None
    if os.path.exists(cache):
        try:
            frames = np.load(cache)
        except Exception:
            frames = None
    if frames is None:
        rng = np.random.RandomState(0)
        base = rng.rand(H, W).astype(np.float32) * 0.8 + 0.1
        try:
            from scipy.ndimage import gaussian_filter
            base = gaussian_filter(base, 2.0)
        except ImportError:
            pass
        frames = np.empty((N, H, W), np.float32)
        for n in range(N):
            dy, dx = (0, 0) if n == 0 else rng.randint(-3, 4, 2)
            sh = np.roll(base, (dy, dx), (0, 1))
            frames[n] = np.clip(
                sh + 0.02 * rng.randn(H, W).astype(np.float32), 0, 1)
        try:
            np.save(cache, frames)
        except Exception:
            pass
    b = np.arange(1001) / 1000
    std = jnp.asarray(np.sqrt(ALPHA * b + BETA).astype(np.float32))
    diff = jnp.asarray((np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9)).astype(np.float32))

    merge_fn = select_merge(config)
    merge_ref_fn = select_merge_ref(config)

    # grey circulants as jit ARGUMENTS (mirrors bench.py / make_pipeline):
    # keeps the measured program free of both the 400 MB literal payload and
    # the ~54 ms/call in-trace expansion, so stage budgets stay comparable
    # with the r4 logs (whose modules embedded the matrices as literals)
    from hmsr_tpu.ops.grey import grey_consts_for
    gc = grey_consts_for(config, (H, W))

    ref_d = jnp.asarray(frames[0])
    comps_d = jnp.asarray(frames[1:])
    for stage in stages:
        measure(stage, ref_d, comps_d, frames, config, CFA, WB, std, diff,
                merge_fn, merge_ref_fn, H, W, gc)


def measure(stage, ref_d, comps_d, frames, config, CFA, WB, std, diff,
            merge_fn, merge_ref_fn, H, W, gc=None):
    from hmsr_tpu.models.alignment import align, init_alignment
    from hmsr_tpu.models.robustness import compute_robustness, init_robustness
    from hmsr_tpu.models.kernels import estimate_kernels
    from hmsr_tpu.ops.grey import compute_grey_image
    from hmsr_tpu.utils.types import DEFAULT_FLOAT
    N = comps_d.shape[0] + 1

    def run(ref_img, comps, gc):
        ref_grey = compute_grey_image(ref_img, "FFT", consts=gc)
        astate = init_alignment(ref_grey, config) if stage not in ("upload", "grey") else None
        rstats = init_robustness(ref_img, CFA, WB, (std, diff), config) \
            if stage in ("rob", "kern", "merge", "mergeref", "norm", "all") \
            else None

        out_h, out_w = 2 * H, 2 * W
        # mirror run_pipeline: the Pallas merge accumulates IN PLACE only at
        # its padded geometry — a raw (3, out_h, out_w) carry silently routes
        # the legacy materialize+add path (~6 GB/frame extra HBM traffic),
        # overstating the merge stage
        accum_shape = (3, out_h, out_w)
        if getattr(merge_fn, "__name__", "") == "merge_pallas":
            from hmsr_tpu.ops.pallas_merge import padded_accum_shape
            accum_shape = padded_accum_shape(config, (H, W), 3)
        num = jnp.zeros(accum_shape, DEFAULT_FLOAT)
        den = jnp.zeros(accum_shape, DEFAULT_FLOAT)

        def step(carry, frame):
            # every checksum accumulates ALL prior stages' sums so XLA cannot
            # dead-code-eliminate the earlier stages out of the measurement
            num, den = carry
            acc = jnp.sum(frame[::97, ::101])
            if stage == "upload":
                return (num, den), acc
            grey = compute_grey_image(frame, "FFT", consts=gc)
            acc = acc + jnp.sum(grey[::97, ::101])
            if stage == "grey":
                return (num, den), acc
            flow = align(astate, grey, config)
            acc = acc + jnp.sum(flow)
            if stage == "align":
                return (num, den), acc
            r = compute_robustness(frame, rstats, flow, CFA, WB, config)
            acc = acc + jnp.sum(r[::97, ::101])
            if stage == "rob":
                return (num, den), acc
            covs = estimate_kernels(frame, config)
            acc = acc + jnp.sum(covs[:, ::97, ::101])
            if stage == "kern":
                return (num, den), acc
            num, den = merge_fn(frame, flow, covs, r, num, den, CFA, config)
            return (num, den), acc

        (num, den), ys = jax.lax.scan(step, (num, den), comps)
        if stage in ("merge", "all", "mergeref", "norm"):
            num = num[:, :out_h, :out_w]
            den = den[:, :out_h, :out_w]
            if stage != "merge":
                ref_covs = estimate_kernels(ref_img, config)
                num, den = merge_ref_fn(ref_img, ref_covs, num, den, CFA, config)
            if stage == "norm":
                # finalize-tail split: full-image starved-pixel normalize
                # WITHOUT the channel-last transpose (all - norm = transpose
                # + HWC-subsample cost; norm - mergeref = normalize cost —
                # mergeref's divide fuses into its subsample so it computes
                # only the sampled points)
                from hmsr_tpu.ops.accumfix import normalize_accum
                image = normalize_accum(num, den)
                sub = image[:, ::97, ::101]
                return jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0)) \
                    + jnp.sum(ys)
            if stage == "all":
                # the TRUE pipeline tail (run_pipeline): starved-pixel
                # normalize + channel-last transpose (mergeref used to alias
                # this, hiding the finalize cost)
                from hmsr_tpu.ops.accumfix import (REFILL_BORDER,
                                                   normalize_accum)
                image = jnp.transpose(
                    normalize_accum(num, den, refill_border=REFILL_BORDER),
                    (1, 2, 0))
                sub = image[::97, ::101]
                return jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0)) \
                    + jnp.sum(ys)
            return jnp.sum((num / jnp.maximum(den, 1e-6))[:, ::97, ::101]) + jnp.sum(ys)
        return jnp.sum(ys)

    fn = jax.jit(run)
    perturb = jax.jit(lambda x, e: x + e)
    t0 = time.time()
    out = fn(ref_d, comps_d, gc)
    v = float(np.asarray(out))
    print(f"stage={stage} {H}x{W} N={N}: OK {time.time()-t0:.1f}s checksum={v:.4f}",
          flush=True)
    # steady-state: inputs pre-resident + perturbed on device (the backend
    # memoizes identical executions); reuse of fn's donated... keep simple
    ts_ = []
    for i in range(3):
        c2 = perturb(comps_d, jnp.float32(1e-7 * (i + 1)))
        _ = float(np.asarray(jnp.sum(c2[0].ravel()[:3])))
        t0 = time.time()
        out = fn(ref_d, c2, gc)
        v = float(np.asarray(out))
        ts_.append(time.time() - t0)
    print(f"stage={stage} steady: {min(ts_):.3f}s "
          f"(all {[round(t, 3) for t in ts_]}) checksum={v:.4f}", flush=True)


if __name__ == "__main__":
    main()
