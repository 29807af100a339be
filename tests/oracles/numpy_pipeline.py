"""Scalar float64 oracle of the FULL Alg.-1 pipeline.

Composes the stage oracles (numpy_ops / numpy_stages / numpy_alignment) into
the complete burst pipeline exactly as hmsr_tpu/models/pipeline.run_pipeline
wires them: FFT grey -> pyramid alignment -> robustness -> kernel estimation
-> merge (per frame) -> reference merge -> num/den. This is the stand-in for
the cross-implementation parity target (BASELINE.md): every wiring convention
(position offsets, level ordering, flow scaling, channel layout) is exercised
end-to-end, independent of jax.
"""

import numpy as np

from . import numpy_ops
from . import numpy_stages as stages
from . import numpy_alignment as alignment


def run_pipeline(ref_raw, comp_raws, std_curve, diff_curve, config, cfa, wb):
    """Returns the merged (H*s, W*s, n_ch) image (before finishing ISP)."""
    bayer = config.mode == "bayer"
    scale = float(config.scale)
    ts = int(config.block_matching.tuning.tile_size)
    iso_kernel = config.merging.kernel == "iso"
    law = config.merging.selection_law
    mt = {k: float(config.merging.tuning[k]) for k in
          ("k_detail", "k_denoise", "D_th", "D_tr", "k_stretch", "k_shrink")}
    rt = config.robustness.tuning
    alpha = float(config.noise_model.alpha)
    beta = float(config.noise_model.beta)

    ref_raw = ref_raw.astype(np.float64)
    comp_raws = comp_raws.astype(np.float64)
    h, w = ref_raw.shape
    out_h, out_w = round(scale * h), round(scale * w)
    n_ch = 3 if bayer else 1

    # ---- reference init
    ref_grey = numpy_ops.fft_lowpass_grey(ref_raw) if bayer else ref_raw
    if bayer:
        ref_guide = stages.guide_image(ref_raw, cfa, wb)
        upscale = 2
    else:
        ref_guide = ref_raw[None]
        upscale = 1
    rm, rs = numpy_ops.local_stats_3x3(ref_guide)
    ref_means, ref_valid = stages.upscale_warp_stats(rm, upscale)
    ref_stds, _ = stages.upscale_warp_stats(rs, upscale)

    num = np.zeros((out_h, out_w, n_ch))
    den = np.zeros((out_h, out_w, n_ch))

    flows, rmaps = [], []
    for comp in comp_raws:
        grey = numpy_ops.fft_lowpass_grey(comp) if bayer else comp
        flow = alignment.align(ref_grey, grey, config)
        if config.robustness.enabled:
            r = stages.compute_robustness(
                comp, ref_means, ref_stds, ref_valid, flow, cfa, wb,
                std_curve, diff_curve, ts, rt.t, rt.s1, rt.s2, rt.Mt,
                bayer=bayer)
        else:
            r = np.ones((h, w))
        covs = stages.estimate_kernels(comp, alpha, beta, mt, law, bayer=bayer)
        num, den = stages.merge(comp, flow, covs, r, num, den, cfa, scale, ts,
                                bayer=bayer, iso=iso_kernel)
        flows.append(flow)
        rmaps.append(r)

    ref_covs = stages.estimate_kernels(ref_raw, alpha, beta, mt, law,
                                       bayer=bayer)
    num, den = stages.merge_ref(ref_raw, ref_covs, num, den, cfa, scale,
                                bayer=bayer, iso=iso_kernel)
    # starved-pixel refill mirrors hmsr_tpu.ops.accumfix (deliberate
    # deviation from the reference's bare divide; see its docstring)
    from hmsr_tpu.ops.accumfix import normalize_accum_np
    image = normalize_accum_np(num.transpose(2, 0, 1),
                               den.transpose(2, 0, 1)).transpose(1, 2, 0)
    return image, flows, rmaps
