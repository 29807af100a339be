"""Robustness earns its runtime: local-motion scene, robustness on vs off.

The reference validates its robustness model (Algs. 6-9) only via the IPOL
demo on real handheld bursts; the synthetic local-motion scene
(io/synthetic.make_occlusion_burst) makes the same property measurable:
merging WITHOUT robustness ghosts a moving object along its trajectory,
merging WITH robustness must not.
"""

import numpy as np

import jax.numpy as jnp

from hmsr_tpu.configs import default_config, update_snr_config
from hmsr_tpu.io.synthetic import make_occlusion_burst, DEFAULT_CFA
from hmsr_tpu.models.pipeline import make_pipeline

ALPHA, BETA = 1.8e-4, 3.0e-6


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / mse)


def _config(enabled):
    c = default_config()
    c.scale = 2
    c.verbose = 0
    c.noise_model.alpha = ALPHA
    c.noise_model.beta = BETA
    c.accumulated_robustness_denoiser.enabled = False
    c.block_matching.tuning.factors = [1, 2]
    c.block_matching.tuning.tile_size_factors = [1, 1]
    c.block_matching.tuning.search_radii = [1, 4]
    c.block_matching.tuning.metrics = ["L1", "L2"]
    update_snr_config(c, 56.0)
    c.block_matching.tuning.tile_size = 16
    c.block_matching.tuning.tile_sizes = [16, 16]
    c.robustness.enabled = enabled
    if not enabled:
        c.robustness.save_mask = False
    return c


def _curves():
    b = np.arange(1001) / 1000.0
    std = np.sqrt(np.maximum(ALPHA * b + BETA, 0)).astype(np.float32)
    diff = (np.sqrt(2 / np.pi) *
            np.sqrt(2 * (ALPHA * b + BETA) / 9)).astype(np.float32)
    return jnp.asarray(std), jnp.asarray(diff)


def test_robustness_suppresses_ghosting():
    ref, comps, truth, ghost = make_occlusion_burst(
        64, 64, n_frames=4, alpha=ALPHA, beta=BETA, seed=21)
    std, diff = _curves()

    crop = 24
    inner = np.zeros(ghost.shape, bool)
    inner[crop:-crop, crop:-crop] = True
    g = inner & ghost
    assert g.mean() > 0.01, "scene must actually contain a ghost region"

    scores = {}
    for enabled in (True, False):
        pipe = make_pipeline(_config(enabled), DEFAULT_CFA, [1.0, 1.0, 1.0])
        img, _ = pipe(jnp.asarray(ref), jnp.asarray(comps), std, diff)
        img = np.nan_to_num(np.asarray(img), nan=0.0)
        scores[enabled] = (_psnr(img[g], truth[g]),
                           _psnr(img[inner], truth[inner]))

    ghost_on, global_on = scores[True]
    ghost_off, global_off = scores[False]
    # robustness must clearly win on the ghost region and not lose globally
    assert ghost_on > ghost_off + 2.0, (scores,)
    assert global_on > global_off - 0.5, (scores,)
