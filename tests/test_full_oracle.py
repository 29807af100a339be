"""Full-chain parity: the jitted pipeline vs the composed scalar oracle.

The only credible stand-in for the >=50 dB-vs-reference parity target
(BASELINE.md) without CUDA hardware: every stage oracle is composed into the
complete Alg.-1 pipeline (tests/oracles/numpy_pipeline.py) and the ONE jitted
XLA program must match it end-to-end — wiring conventions (position offsets,
level ordering, flow scaling, channel layout) included.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
from hmsr_tpu.io.synthetic import make_synthetic_burst, DEFAULT_CFA
from hmsr_tpu.models.pipeline import make_pipeline
from oracles import numpy_pipeline

WB = [1.0, 1.0, 1.0]
ALPHA, BETA = 1.8e-4, 3.0e-6


def flat_curves():
    b = np.arange(1001) / 1000.0
    std = np.sqrt(np.maximum(ALPHA * b + BETA, 0)).astype(np.float32)
    diff = (np.sqrt(2 / np.pi) *
            np.sqrt(2 * (ALPHA * b + BETA) / 9)).astype(np.float32)
    return std, diff


def oracle_config(h, w, iso=False, law="linear"):
    c = default_config()
    c.scale = 2
    c.mode = "bayer"
    c.debug = True
    c.block_matching.tuning.tile_size = 16
    c.block_matching.tuning.factors = [1, 2]
    c.block_matching.tuning.tile_size_factors = [1, 1]
    c.block_matching.tuning.search_radii = [1, 4]
    c.block_matching.tuning.metrics = ["L1", "L2"]
    c.block_matching.tuning.tile_sizes = [16, 16]
    c.merging.kernel = "iso" if iso else "steerable"
    c.merging.selection_law = law
    c.robustness.save_mask = False
    c.accumulated_robustness_denoiser.enabled = False
    c.noise_model.alpha = ALPHA
    c.noise_model.beta = BETA
    update_snr_config(c, 20)
    c.block_matching.tuning.tile_sizes = [16, 16]
    sanitize_config(c, (h, w))
    return c


class TestFullChainOracle:
    @pytest.mark.parametrize("iso", [False, True])
    def test_pipeline_matches_composed_oracle(self, iso):
        h = w = 96
        ref, comps, _, _ = make_synthetic_burst(
            h, w, n_frames=3, alpha=ALPHA, beta=BETA, seed=13, max_shift=1.5)
        c = oracle_config(h, w, iso=iso)
        std, diff = flat_curves()

        pipe = make_pipeline(c, DEFAULT_CFA, WB)
        img, debug = pipe(jnp.asarray(ref), jnp.asarray(comps),
                          jnp.asarray(std), jnp.asarray(diff))
        img = np.asarray(img)
        got_flows = np.asarray(debug["flow"])

        want_img, want_flows, want_r = numpy_pipeline.run_pipeline(
            ref, comps, std.astype(np.float64), diff.astype(np.float64),
            c, DEFAULT_CFA, WB)

        # flows first: a block-matching argmin flip would poison everything
        # downstream with a misleading image-level diff
        np.testing.assert_allclose(got_flows, np.stack(want_flows),
                                   atol=1e-3, rtol=1e-4)
        rmaps = np.asarray(debug["robustness"])
        np.testing.assert_allclose(rmaps, np.stack(want_r), atol=2e-3)
        assert img.shape == want_img.shape
        # border pixels can have den ~ e^{-large}: f32 underflows to 0/NaN
        # where f64 keeps a denormal (and vice versa) — NaNs must stay on a
        # 2-px frame and everything else must match tightly.
        finite = np.isfinite(img) & np.isfinite(want_img)
        inner = np.zeros_like(finite)
        inner[2:-2, 2:-2] = True
        assert finite[inner].all(), "NaNs off the border frame"
        np.testing.assert_allclose(img[finite], want_img[finite], atol=2e-3)
        # tight aggregate: mean abs error ~1e-7 when the wiring is right
        assert np.mean(np.abs(img[finite] - want_img[finite])) < 2e-5
