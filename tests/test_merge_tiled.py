"""Tiled merge must match the reference-semantics gather merge exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from hmsr_tpu.configs import default_config, update_snr_config
from hmsr_tpu.models.merge import merge
from hmsr_tpu.models.merge_tiled import merge_tiled

CFA = np.array([[0, 1], [1, 2]])


def make_config(scale, ts=16, bayer=True, iso=False):
    c = default_config()
    c.scale = scale
    c.mode = "bayer" if bayer else "grey"
    c.merging.kernel = "iso" if iso else "steerable"
    update_snr_config(c, 20)
    c.block_matching.tuning.tile_size = ts
    return c


def run_both(scale, ts, bayer, iso, seed, h=64, w=80, flow_scale=5.0):
    rng = np.random.RandomState(seed)
    c = make_config(scale, ts, bayer, iso)
    comp = rng.rand(h, w).astype(np.float32)
    g = 2 if bayer else 1
    ny, nx = -(-h // ts), -(-w // ts)
    flow = (rng.rand(ny, nx, 2) * 2 - 1).astype(np.float32) * flow_scale
    r = rng.rand(h, w).astype(np.float32)
    gg = rng.rand(h // g, w // g, 2).astype(np.float32) + 0.3
    covs = np.zeros((h // g, w // g, 2, 2), np.float32)
    covs[..., 0, 0] = gg[..., 0]
    covs[..., 1, 1] = gg[..., 1]
    covs[..., 0, 1] = covs[..., 1, 0] = 0.2 * np.sqrt(gg[..., 0] * gg[..., 1])

    n_ch = 3 if bayer else 1
    hh, hw = scale * h, scale * w
    num0 = jnp.asarray(rng.rand(n_ch, hh, hw).astype(np.float32))
    den0 = jnp.asarray(rng.rand(n_ch, hh, hw).astype(np.float32))
    cov_c = jnp.asarray(np.stack([covs[..., 0, 0], covs[..., 0, 1],
                                  covs[..., 1, 1]]))

    args = (jnp.asarray(comp), jnp.asarray(flow), cov_c,
            jnp.asarray(r), num0, den0, CFA, c)
    want_n, want_d = merge(*args)
    got_n, got_d = merge_tiled(*args)
    return np.asarray(got_n), np.asarray(got_d), np.asarray(want_n), np.asarray(want_d)


@pytest.mark.parametrize("scale", [1, 2, 3])
@pytest.mark.parametrize("iso", [False, True])
def test_matches_gather_merge(scale, iso):
    gn, gd, wn, wd = run_both(scale, 16, bayer=True, iso=iso, seed=scale * 10 + iso)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_grey_mode():
    gn, gd, wn, wd = run_both(2, 16, bayer=False, iso=False, seed=3)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_large_flow_out_of_frame():
    # flows large enough to push whole tiles out of the frame
    gn, gd, wn, wd = run_both(2, 16, bayer=True, iso=False, seed=5,
                              flow_scale=200.0)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_nondivisible_image():
    gn, gd, wn, wd = run_both(2, 16, bayer=True, iso=False, seed=7, h=50, w=70)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_interior_is_exact_including_borders_when_flow_zero():
    rng = np.random.RandomState(11)
    c = make_config(2, 16, True, False)
    h = w = 32
    comp = rng.rand(h, w).astype(np.float32)
    flow = np.zeros((2, 2, 2), np.float32)
    r = np.ones((h, w), np.float32)
    cov_c = jnp.asarray(np.stack([np.full((16, 16), 0.8, np.float32),
                                  np.zeros((16, 16), np.float32),
                                  np.full((16, 16), 0.8, np.float32)]))
    num0 = jnp.zeros((3, 64, 64))
    den0 = jnp.zeros((3, 64, 64))
    args = (jnp.asarray(comp), jnp.asarray(flow), cov_c,
            jnp.asarray(r), num0, den0, CFA, c)
    wn, wd = merge(*args)
    gn, gd = merge_tiled(*args)
    np.testing.assert_allclose(np.asarray(gn)[:, 2:, 2:], np.asarray(wn)[:, 2:, 2:],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd)[:, 2:, 2:], np.asarray(wd)[:, 2:, 2:],
                               atol=1e-5)


# ---------------------------------------------------------------------------
# merge_ref_tiled
# ---------------------------------------------------------------------------

from hmsr_tpu.models.merge import merge_ref
from hmsr_tpu.models.merge_tiled import merge_ref_tiled


def run_both_ref(scale, bayer, iso, seed, h=64, w=80, acc=False):
    rng = np.random.RandomState(seed)
    c = make_config(scale, 16, bayer, iso)
    if acc:
        c.accumulated_robustness_denoiser.enabled = True
        c.accumulated_robustness_denoiser.merge.enabled = True
    ref = rng.rand(h, w).astype(np.float32)
    g = 2 if bayer else 1
    gg = rng.rand(h // g, w // g, 2).astype(np.float32) + 0.3
    covs = np.zeros((h // g, w // g, 2, 2), np.float32)
    covs[..., 0, 0] = gg[..., 0]
    covs[..., 1, 1] = gg[..., 1]
    covs[..., 0, 1] = covs[..., 1, 0] = 0.2 * np.sqrt(gg[..., 0] * gg[..., 1])

    n_ch = 3 if bayer else 1
    hh, hw = scale * h, scale * w
    num0 = jnp.asarray(rng.rand(n_ch, hh, hw).astype(np.float32))
    den0 = jnp.asarray(rng.rand(n_ch, hh, hw).astype(np.float32))
    acc_rob = jnp.asarray((rng.rand(h, w) * 4).astype(np.float32)) if acc else None
    cov_c = jnp.asarray(np.stack([covs[..., 0, 0], covs[..., 0, 1],
                                  covs[..., 1, 1]]))

    args = (jnp.asarray(ref), cov_c, num0, den0, CFA, c)
    wn, wd = merge_ref(*args, acc_rob=acc_rob)
    gn, gd = merge_ref_tiled(*args, acc_rob=acc_rob)
    return map(np.asarray, (gn, gd, wn, wd))


@pytest.mark.parametrize("scale", [1, 2, 3])
@pytest.mark.parametrize("iso", [False, True])
def test_ref_matches(scale, iso):
    gn, gd, wn, wd = run_both_ref(scale, True, iso, seed=scale * 7 + iso)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_ref_grey():
    gn, gd, wn, wd = run_both_ref(2, False, False, seed=21)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("scale", [1, 2])
def test_ref_acc_rob(scale):
    gn, gd, wn, wd = run_both_ref(scale, True, False, seed=31 + scale, acc=True)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_ref_nondivisible():
    gn, gd, wn, wd = run_both_ref(2, True, False, seed=41, h=50, w=70)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)
