"""Stage tests: robustness / kernels / merge vs scalar NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from hmsr_tpu.configs import default_config, update_snr_config
from hmsr_tpu.models import robustness as rob
from hmsr_tpu.models.kernels import estimate_kernels
from hmsr_tpu.models.merge import merge, merge_ref
from oracles import numpy_stages as oracle

CFA = np.array([[0, 1], [1, 2]])          # RGGB
WB = [2.0, 1.0, 1.6]


def make_config(scale=2, ts=16, bayer=True, iso=False, law="linear"):
    c = default_config()
    c.scale = scale
    c.mode = "bayer" if bayer else "grey"
    c.block_matching.tuning.tile_size = ts
    c.merging.kernel = "iso" if iso else "steerable"
    c.merging.selection_law = law
    update_snr_config(c, 20)
    c.block_matching.tuning.tile_size = ts
    c.noise_model.alpha = 1.8e-4
    c.noise_model.beta = 3.19e-6
    c.accumulated_robustness_denoiser.enabled = False
    return c


def rand_curves(rng):
    std = (0.01 + 0.05 * rng.rand(1001)).astype(np.float32)
    diff = (0.01 + 0.05 * rng.rand(1001)).astype(np.float32)
    return std, diff


class TestGuideImage:
    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        raw = rng.rand(12, 16).astype(np.float32)
        got = np.asarray(rob.compute_guide_image(jnp.asarray(raw), CFA, WB))
        want = oracle.guide_image(raw, CFA, WB)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestUpscaleWarp:
    def test_ref_path(self):
        rng = np.random.RandomState(1)
        stats = rng.rand(3, 8, 10).astype(np.float32)
        got, valid = rob.upscale_warp_stats(jnp.asarray(stats), 2)
        want, ovalid = oracle.upscale_warp_stats(stats.astype(np.float64), 2)
        np.testing.assert_array_equal(np.asarray(valid), ovalid)
        np.testing.assert_allclose(np.asarray(got)[:, ovalid], want[:, ovalid],
                                   atol=1e-5)

    def test_warped_path(self):
        rng = np.random.RandomState(2)
        stats = rng.rand(3, 8, 8).astype(np.float32)
        flow = (rng.rand(1, 1, 2) * 4 - 2).astype(np.float32)
        got, valid = rob.upscale_warp_stats(jnp.asarray(stats), 2, tile_size=16,
                                            flow=jnp.asarray(flow))
        want, ovalid = oracle.upscale_warp_stats(stats.astype(np.float64), 2,
                                                 16, flow)
        np.testing.assert_array_equal(np.asarray(valid), ovalid)
        np.testing.assert_allclose(np.asarray(got)[:, ovalid], want[:, ovalid],
                                   atol=1e-5)


class TestRobustness:
    def test_full_stage_matches_oracle(self):
        rng = np.random.RandomState(3)
        h = w = 32
        ts = 16
        ref_raw = rng.rand(h, w).astype(np.float32)
        comp_raw = rng.rand(h, w).astype(np.float32)
        flow = (rng.rand(2, 2, 2) * 3 - 1.5).astype(np.float32)
        std, diff = rand_curves(rng)

        c = make_config(scale=1, ts=ts)
        stats = rob.init_robustness(jnp.asarray(ref_raw), CFA, WB,
                                    (jnp.asarray(std), jnp.asarray(diff)), c)
        got = np.asarray(rob.compute_robustness(
            jnp.asarray(comp_raw), stats, jnp.asarray(flow), CFA, WB, c))

        ref_guide = oracle.guide_image(ref_raw, CFA, WB)
        from oracles import numpy_ops
        rm, rs = numpy_ops.local_stats_3x3(ref_guide)
        rm, rvalid = oracle.upscale_warp_stats(rm, 2)
        rs, _ = oracle.upscale_warp_stats(rs, 2)
        tun = c.robustness.tuning
        want = oracle.compute_robustness(
            comp_raw, rm, rs, rvalid, flow, CFA, WB, std, diff, ts,
            tun.t, tun.s1, tun.s2, tun.Mt, bayer=True)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_disabled_returns_ones(self):
        c = make_config()
        c.robustness.enabled = False
        c.robustness.save_mask = False
        out = rob.compute_robustness(jnp.zeros((8, 8)), None, None, CFA, WB, c)
        np.testing.assert_array_equal(np.asarray(out), 1.0)


class TestKernels:
    @pytest.mark.parametrize("law", ["linear", "hard_threshold"])
    def test_matches_oracle(self, law):
        rng = np.random.RandomState(4)
        raw = rng.rand(16, 16).astype(np.float32)
        c = make_config(law=law)
        comp = np.asarray(estimate_kernels(jnp.asarray(raw), c))
        got = np.stack([np.stack([comp[0], comp[1]], -1),
                        np.stack([comp[1], comp[2]], -1)], -2)
        mt = {k: c.merging.tuning[k] for k in
              ("k_detail", "k_denoise", "D_th", "D_tr", "k_stretch", "k_shrink")}
        want = oracle.estimate_kernels(raw.astype(np.float64),
                                       c.noise_model.alpha, c.noise_model.beta,
                                       mt, law)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_flat_image_is_finite_isotropic(self):
        c = make_config()
        covs = np.asarray(estimate_kernels(jnp.full((16, 16), 0.5), c))
        assert np.all(np.isfinite(covs))
        np.testing.assert_allclose(covs[0], covs[2], rtol=1e-5)
        np.testing.assert_allclose(covs[1], 0.0, atol=1e-6)




def to_components(covs_np):
    """(h, w, 2, 2) -> component-stacked (3, h, w)."""
    return np.stack([covs_np[..., 0, 0], covs_np[..., 0, 1], covs_np[..., 1, 1]])

class TestMerge:
    @pytest.mark.parametrize("iso", [False, True])
    @pytest.mark.parametrize("scale", [1, 2])
    def test_matches_oracle(self, iso, scale):
        rng = np.random.RandomState(5)
        h = w = 32
        ts = 16
        c = make_config(scale=scale, ts=ts, iso=iso)
        comp = rng.rand(h, w).astype(np.float32)
        flow = (rng.rand(2, 2, 2) * 4 - 2).astype(np.float32)
        r = rng.rand(h, w).astype(np.float32)
        covs_np = np.zeros((h // 2, w // 2, 2, 2), np.float32)
        g = rng.rand(h // 2, w // 2, 2) + 0.3
        covs_np[..., 0, 0] = g[..., 0]
        covs_np[..., 1, 1] = g[..., 1]
        covs_np[..., 0, 1] = covs_np[..., 1, 0] = 0.2 * np.sqrt(g[..., 0] * g[..., 1])

        hh, hw = round(scale * h), round(scale * w)
        num0 = rng.rand(hh, hw, 3).astype(np.float32)
        den0 = rng.rand(hh, hw, 3).astype(np.float32)

        got_n, got_d = merge(jnp.asarray(comp), jnp.asarray(flow),
                             jnp.asarray(to_components(covs_np)), jnp.asarray(r),
                             jnp.asarray(num0.transpose(2, 0, 1)),
                             jnp.asarray(den0.transpose(2, 0, 1)), CFA, c)
        got_n = np.transpose(np.asarray(got_n), (1, 2, 0))
        got_d = np.transpose(np.asarray(got_d), (1, 2, 0))
        want_n, want_d = oracle.merge(comp.astype(np.float64), flow, covs_np,
                                      r, num0.astype(np.float64),
                                      den0.astype(np.float64), CFA, scale, ts,
                                      bayer=True, iso=iso)
        np.testing.assert_allclose(np.asarray(got_n), want_n, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-4)

    @pytest.mark.parametrize("iso", [False, True])
    def test_ref_matches_oracle(self, iso):
        rng = np.random.RandomState(6)
        h = w = 32
        scale = 2
        c = make_config(scale=scale, iso=iso)
        ref = rng.rand(h, w).astype(np.float32)
        covs_np = np.zeros((h // 2, w // 2, 2, 2), np.float32)
        g = rng.rand(h // 2, w // 2, 2) + 0.3
        covs_np[..., 0, 0] = g[..., 0]
        covs_np[..., 1, 1] = g[..., 1]
        covs_np[..., 0, 1] = covs_np[..., 1, 0] = 0.1

        hh, hw = scale * h, scale * w
        num0 = rng.rand(hh, hw, 3).astype(np.float32)
        den0 = rng.rand(hh, hw, 3).astype(np.float32)

        got_n, got_d = merge_ref(jnp.asarray(ref), jnp.asarray(to_components(covs_np)),
                                 jnp.asarray(num0.transpose(2, 0, 1)),
                                 jnp.asarray(den0.transpose(2, 0, 1)), CFA, c)
        got_n = np.transpose(np.asarray(got_n), (1, 2, 0))
        got_d = np.transpose(np.asarray(got_d), (1, 2, 0))
        want_n, want_d = oracle.merge_ref(ref.astype(np.float64), covs_np,
                                          num0.astype(np.float64),
                                          den0.astype(np.float64), CFA, scale,
                                          bayer=True, iso=iso)
        np.testing.assert_allclose(np.asarray(got_n), want_n, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-4)

    def test_ref_acc_rob_override(self):
        rng = np.random.RandomState(7)
        h = w = 16
        scale = 2
        c = make_config(scale=scale, iso=True)
        c.accumulated_robustness_denoiser.enabled = True
        c.accumulated_robustness_denoiser.merge.enabled = True
        ref = rng.rand(h, w).astype(np.float32)
        acc_rob = (rng.rand(h, w) * 4).astype(np.float32)
        covs_np = np.tile(np.eye(2, dtype=np.float32), (h // 2, w // 2, 1, 1))

        hh, hw = scale * h, scale * w
        num0 = rng.rand(hh, hw, 3).astype(np.float32)
        den0 = rng.rand(hh, hw, 3).astype(np.float32)
        mcfg = c.accumulated_robustness_denoiser.merge

        got_n, got_d = merge_ref(jnp.asarray(ref), jnp.asarray(to_components(covs_np)),
                                 jnp.asarray(num0.transpose(2, 0, 1)),
                                 jnp.asarray(den0.transpose(2, 0, 1)), CFA, c,
                                 acc_rob=jnp.asarray(acc_rob))
        got_n = np.transpose(np.asarray(got_n), (1, 2, 0))
        got_d = np.transpose(np.asarray(got_d), (1, 2, 0))
        want_n, want_d = oracle.merge_ref(
            ref.astype(np.float64), covs_np, num0.astype(np.float64),
            den0.astype(np.float64), CFA, scale, bayer=True, iso=True,
            acc_rob=acc_rob, rad_max=mcfg.rad_max,
            max_multiplier=mcfg.max_multiplier,
            max_frame_count=mcfg.max_frame_count)
        np.testing.assert_allclose(np.asarray(got_n), want_n, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-4)
