"""Tests: noise calibration, finishing, denoisers, and the public process API."""

import numpy as np
import pytest

import jax.numpy as jnp

from hmsr_tpu.configs import default_config, merge
from hmsr_tpu.finishing import (apply_orientation, frame_count_denoising_gauss,
                                frame_count_denoising_median, postprocess)
from hmsr_tpu.io.burst import save_npz_burst, load_burst
from hmsr_tpu.io.synthetic import make_synthetic_burst, DEFAULT_CFA
from hmsr_tpu.models.process import process_arrays, process
from hmsr_tpu.noise import run_fast_MC, get_non_linearity_bound

ALPHA, BETA = 1.8e-4, 3.0e-6


class TestNoiseCalibration:
    def test_curves_match_affine_model_in_linear_zone(self):
        std, diff = run_fast_MC(ALPHA, BETA)
        assert std.shape == (1001,) and diff.shape == (1001,)
        b = np.arange(1001) / 1000
        # the estimator is the mean 9-sample ddof=0 std, which is biased:
        # E[s] = sigma * sqrt(2/9) * gamma(4.5)/gamma(4)  (~0.9137 sigma)
        from scipy.special import gamma as G
        c9 = np.sqrt(2 / 9) * G(4.5) / G(4.0)
        expected = c9 * np.sqrt(ALPHA * b + BETA)
        mid = slice(100, 900)
        np.testing.assert_allclose(std[mid], expected[mid], rtol=0.05)
        # diff of two 9-px means: E|d| = sqrt(2/pi) * sqrt(2 var / 9)
        exp_diff = np.sqrt(2 / np.pi) * np.sqrt(2 * (ALPHA * b + BETA) / 9)
        np.testing.assert_allclose(diff[mid], exp_diff[mid], rtol=0.05)

    def test_clipping_reduces_std_at_edges(self):
        std, _ = run_fast_MC(ALPHA, BETA)
        assert std[0] < np.sqrt(BETA)              # clipped at 0
        assert std[1000] < np.sqrt(ALPHA + BETA)   # clipped at 1

    def test_cache(self):
        a = run_fast_MC(ALPHA, BETA)
        b = run_fast_MC(ALPHA, BETA)
        assert a[0] is b[0]

    def test_bounds(self):
        xmin, xmax = get_non_linearity_bound(ALPHA, BETA, 3)
        assert 0 < xmin < 0.05
        assert 0.95 < xmax < 1


class TestFinishing:
    def test_orientation_roundtrip(self):
        img = np.random.rand(6, 8, 3)
        for ori in range(1, 9):
            out = apply_orientation(img, ori)
            assert out.size == img.size

    def test_postprocess_runs(self):
        img = np.random.rand(32, 32, 3).astype(np.float32)
        sharp = {"enabled": True, "radius": 3, "amount": 1.5}
        out = postprocess(img, do_color_correction=True, do_tonemapping=False,
                          do_gamma=True, sharpening_config=sharp,
                          xyz2cam=np.eye(3))
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 1

    def test_gauss_denoiser_identity_when_fully_merged(self):
        img = np.random.rand(16, 16, 3).astype(np.float32)
        acc = np.full((8, 8), 10.0, np.float32)   # >= max_frame_count
        cfg = {"scale": 2, "sigma_max": 1.5, "max_frame_count": 8}
        out = np.asarray(frame_count_denoising_gauss(img, acc, cfg))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_gauss_denoiser_blurs_when_unmerged(self):
        img = np.random.rand(16, 16, 3).astype(np.float32)
        acc = np.zeros((8, 8), np.float32)
        cfg = {"scale": 2, "sigma_max": 1.5, "max_frame_count": 8}
        out = np.asarray(frame_count_denoising_gauss(img, acc, cfg))
        assert out.std() < img.std()

    def test_median_denoiser(self):
        img = np.random.rand(20, 16, 3).astype(np.float32)
        acc = np.zeros((10, 8), np.float32)
        cfg = {"scale": 2, "radius_max": 2, "max_frame_count": 8}
        out = frame_count_denoising_median(img, acc, cfg, chunk=8)
        assert out.shape == img.shape
        # interior pixel: exact median of the 5x5 window
        want = np.median(img[2:7, 2:7, 0])
        np.testing.assert_allclose(out[4, 4, 0], want, atol=1e-6)
        # identity when fully merged
        acc_hi = np.full((10, 8), 10.0, np.float32)
        out2 = frame_count_denoising_median(img, acc_hi, cfg, chunk=8)
        np.testing.assert_allclose(out2, img, atol=1e-6)


def small_burst_config():
    return merge(default_config(), {
        "scale": 2,
        "verbose": 0,
        "noise_model": {"alpha": ALPHA, "beta": BETA},
        "block_matching": {"tuning": {
            "factors": [1, 2], "tile_size_factors": [1, 1],
            "search_radii": [1, 4], "metrics": ["L1", "L2"]}},
        "postprocessing": {"enabled": True, "do_tonemapping": False,
                           "do_color_correction": False},
    })


class TestProcessAPI:
    def test_process_arrays_e2e(self):
        ref, comps, truth, _ = make_synthetic_burst(128, 128, n_frames=5,
                                                    alpha=ALPHA, beta=BETA, seed=2)
        img, debug = process_arrays(ref, comps, small_burst_config(),
                                    cfa=DEFAULT_CFA)
        assert img.shape == (256, 256, 3)
        assert np.isfinite(np.nan_to_num(img)).all()
        assert "accumulated_robustness" in debug

    def test_verbose_stage_trace(self, capsys):
        """verbose>=3 prints the per-stage device trace (reference
        super_resolution.py:72-81 semantics) without altering the output."""
        ref, comps, _, _ = make_synthetic_burst(128, 128, n_frames=3,
                                                alpha=ALPHA, beta=BETA, seed=7)
        c = small_burst_config()
        c.verbose = 3
        img, _ = process_arrays(ref, comps, c, cfa=DEFAULT_CFA)
        out = capsys.readouterr().out
        assert "Stage trace" in out
        assert "Alignment (BM + ICA)" in out
        assert "Merge (one frame)" in out
        assert "Device pipeline" in out
        assert img.shape == (256, 256, 3)

    def test_iso_keyed_noise_curves(self):
        """Without alpha/beta or an EXIF profile, curves load from the
        shipped ISO-keyed data/ files (the reference's intended path,
        super_resolution.py:243-251) and (alpha, beta) are re-fit for GAT."""
        ref, comps, _, _ = make_synthetic_burst(128, 128, n_frames=3,
                                                alpha=ALPHA, beta=BETA, seed=9)
        c = small_burst_config()
        c.noise_model.alpha = None
        c.noise_model.beta = None
        img, _ = process_arrays(ref, comps, c, cfa=DEFAULT_CFA, iso=250)
        assert img.shape == (256, 256, 3)
        assert np.isfinite(np.nan_to_num(img)).all()
        # round_iso(250) -> 200: fitted alpha must match the generator's law
        assert abs(c.noise_model.alpha - 2 * 1.80710882e-4) < 5e-5

    def test_process_npz_path(self, tmp_path):
        ref, comps, _, _ = make_synthetic_burst(128, 128, n_frames=4,
                                                alpha=ALPHA, beta=BETA, seed=4)
        frames = np.concatenate([ref[None], comps])
        p = tmp_path / "burst.npz"
        save_npz_burst(p, frames, DEFAULT_CFA, [1, 1, 1], iso=200,
                       alpha=ALPHA, beta=BETA)
        burst = load_burst(p)
        assert burst.iso == 200
        img, _ = process(str(p), small_burst_config())
        assert img.shape == (256, 256, 3)

    def test_snr_based_defaults_resolve(self):
        ref, comps, _, _ = make_synthetic_burst(256, 256, n_frames=3,
                                                alpha=ALPHA, beta=BETA, seed=5)
        c = merge(default_config(), {
            "verbose": 0,
            "noise_model": {"alpha": ALPHA, "beta": BETA},
            "postprocessing": {"enabled": False}})
        img, _ = process_arrays(ref, comps, c, cfa=DEFAULT_CFA)
        assert img.shape == (256, 256, 3)
        assert c.block_matching.tuning.tile_size in (16, 32, 64)


class TestUnprocessISP:
    def test_roundtrip_structure(self):
        from hmsr_tpu.finishing.unprocess import unprocess_isp, apply_gains, \
            invert_smoothstep, gamma_expansion
        rng = np.random.RandomState(0)
        jpg = rng.rand(16, 16, 3).astype(np.float32) * 0.8 + 0.1
        raw, meta = unprocess_isp(jpg)
        assert raw.shape == jpg.shape
        assert np.isfinite(raw).all()
        for k in ("rgb2cam", "cam2rgb", "rgb_gain", "lambda_shot", "lambda_read"):
            assert k in meta
        # smoothstep inverse is a true inverse on [0, 1]
        x = np.linspace(0.01, 0.99, 50)
        y = invert_smoothstep(3 * x ** 2 - 2 * x ** 3)
        np.testing.assert_allclose(y, x, atol=1e-5)
        g = apply_gains(jpg, 2.0, 1.5, 1.0)
        assert g.shape == jpg.shape

    def test_ccm_rows_normalized(self):
        from hmsr_tpu.finishing.unprocess import get_random_ccm
        ccm = get_random_ccm(np.random.RandomState(1))
        np.testing.assert_allclose(ccm.sum(axis=-1), 1.0, atol=1e-9)


class TestNoiseCurveFiles:
    def test_round_iso(self):
        from hmsr_tpu.noise.fast_monte_carlo import round_iso
        assert round_iso(100) == 100
        assert round_iso(130) == 100
        assert round_iso(150) == 200
        assert round_iso(820) == 800
        assert round_iso(3200) == 3200

    def test_save_and_load(self, tmp_path):
        from hmsr_tpu.noise.fast_monte_carlo import load_noise_curves
        std = np.linspace(0, 1, 1001)
        diff = np.linspace(1, 2, 1001)
        np.save(tmp_path / "noise_model_std_ISO_800.npy", std)
        np.save(tmp_path / "noise_model_diff_ISO_800.npy", diff)
        s, d = load_noise_curves(820, str(tmp_path))
        np.testing.assert_array_equal(s, std)
        np.testing.assert_array_equal(d, diff)
