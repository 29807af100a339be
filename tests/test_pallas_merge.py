"""Pallas merge kernel (interpret mode) vs the tiled XLA merge."""

import numpy as np
import pytest

import jax.numpy as jnp

from hmsr_tpu.configs import default_config, update_snr_config
from hmsr_tpu.models.merge_tiled import merge_tiled
from hmsr_tpu.ops.pallas_merge import merge_pallas

CFA = np.array([[0, 1], [1, 2]])


def make_config(scale, ts=16, bayer=True, iso=False):
    c = default_config()
    c.scale = scale
    c.mode = "bayer" if bayer else "grey"
    c.merging.kernel = "iso" if iso else "steerable"
    update_snr_config(c, 20)
    c.block_matching.tuning.tile_size = ts
    return c


def run_both(scale, ts, bayer, iso, seed, h=64, w=128, flow_scale=5.0):
    rng = np.random.RandomState(seed)
    c = make_config(scale, ts, bayer, iso)
    comp = rng.rand(h, w).astype(np.float32)
    g = 2 if bayer else 1
    ny, nx = -(-h // ts), -(-w // ts)
    flow = (rng.rand(ny, nx, 2) * 2 - 1).astype(np.float32) * flow_scale
    r = rng.rand(h, w).astype(np.float32)
    gg = rng.rand(h // g, w // g, 2).astype(np.float32) + 0.3
    cov_c = np.stack([gg[..., 0],
                      0.2 * np.sqrt(gg[..., 0] * gg[..., 1]),
                      gg[..., 1]]).astype(np.float32)

    n_ch = 3 if bayer else 1
    hh, hw = scale * h, scale * w
    num0 = jnp.asarray(rng.rand(n_ch, hh, hw).astype(np.float32))
    den0 = jnp.asarray(rng.rand(n_ch, hh, hw).astype(np.float32))

    args = (jnp.asarray(comp), jnp.asarray(flow), jnp.asarray(cov_c),
            jnp.asarray(r), num0, den0, CFA, c)
    want_n, want_d = merge_tiled(*args)
    got_n, got_d = merge_pallas(*args, interpret=True)
    return map(np.asarray, (got_n, got_d, want_n, want_d))


@pytest.mark.parametrize("scale", [1, 2])
@pytest.mark.parametrize("iso", [False, True])
def test_matches_tiled(scale, iso):
    gn, gd, wn, wd = run_both(scale, 16, True, iso, seed=scale * 5 + iso)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_grey(seed=9):
    gn, gd, wn, wd = run_both(2, 16, False, False, seed)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_large_flow(seed=11):
    gn, gd, wn, wd = run_both(2, 16, True, False, seed, flow_scale=300.0)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def test_in_place_accumulation(seed=13):
    """Padded-geometry num/den -> input/output-aliased in-kernel accumulate."""
    from hmsr_tpu.ops.pallas_merge import padded_accum_shape
    rng = np.random.RandomState(seed)
    h, w, ts, scale = 64, 128, 16, 2
    c = make_config(scale, ts, True, False)
    comp = rng.rand(h, w).astype(np.float32)
    ny, nx = -(-h // ts), -(-w // ts)
    flow = (rng.rand(ny, nx, 2) * 2 - 1).astype(np.float32) * 5.0
    r = rng.rand(h, w).astype(np.float32)
    gg = rng.rand(h // 2, w // 2, 2).astype(np.float32) + 0.3
    cov_c = np.stack([gg[..., 0], 0.2 * np.sqrt(gg[..., 0] * gg[..., 1]),
                      gg[..., 1]]).astype(np.float32)

    pad_shape = padded_accum_shape(c, (h, w))
    nump = jnp.asarray(rng.rand(*pad_shape).astype(np.float32))
    denp = jnp.asarray(rng.rand(*pad_shape).astype(np.float32))
    hh, hw = scale * h, scale * w

    args = (jnp.asarray(comp), jnp.asarray(flow), jnp.asarray(cov_c),
            jnp.asarray(r))
    want_n, want_d = merge_tiled(*args, nump[:, :hh, :hw], denp[:, :hh, :hw],
                                 CFA, c)
    got_n, got_d = merge_pallas(*args, nump, denp, CFA, c, interpret=True)
    assert got_n.shape == pad_shape
    np.testing.assert_allclose(np.asarray(got_n)[:, :hh, :hw], np.asarray(want_n),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_d)[:, :hh, :hw], np.asarray(want_d),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("ts", [32, 64])
def test_large_tile_sizes(ts):
    """Low-light SNR-adaptive geometries (Ts=32/64) hit different XG/window
    layouts in the kernel; compiled-on-TPU coverage lives in
    tools/verify_pallas.py — this is the interpret-mode CI twin."""
    gn, gd, wn, wd = run_both(2, ts, True, False, seed=ts, h=2 * ts, w=4 * ts)
    np.testing.assert_allclose(gn, wn, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(gd, wd, atol=2e-4, rtol=1e-4)


def _burst_inputs(seed, F, h=64, w=128, ts=16, bayer=True, flow_scale=5.0):
    rng = np.random.RandomState(seed)
    g = 2 if bayer else 1
    ny, nx = -(-h // ts), -(-w // ts)
    comp = rng.rand(F, h, w).astype(np.float32)
    flow = (rng.rand(F, ny, nx, 2) * 2 - 1).astype(np.float32) * flow_scale
    r = rng.rand(F, h, w).astype(np.float32)
    gg = rng.rand(F, h // g, w // g, 2).astype(np.float32) + 0.3
    cov = np.stack([gg[..., 0], 0.2 * np.sqrt(gg[..., 0] * gg[..., 1]),
                    gg[..., 1]], axis=1).astype(np.float32)
    return comp, flow, cov, r


@pytest.mark.parametrize("bayer,iso", [(True, False), (True, True),
                                       (False, False)])
def test_burst_fused_matches_sequential(bayer, iso, seed=23, F=4):
    """merge_burst_pallas (frames-innermost grid, VMEM-resident accumulator
    blocks) must be BIT-EXACT vs F sequential merge_pallas calls — same slab
    math, same f32 accumulation order."""
    from hmsr_tpu.ops.pallas_merge import merge_burst_pallas, \
        padded_accum_shape
    rng = np.random.RandomState(seed)
    h, w, ts, scale = 32, 128, 16, 2
    c = make_config(scale, ts, bayer, iso)
    comp, flow, cov, r = _burst_inputs(seed, F, h, w, ts, bayer)
    n_ch = 3 if bayer else 1
    pad_shape = padded_accum_shape(c, (h, w), n_ch)
    num0 = jnp.asarray(rng.rand(*pad_shape).astype(np.float32))
    den0 = jnp.asarray(rng.rand(*pad_shape).astype(np.float32))

    num, den = num0, den0
    for n in range(F):
        num, den = merge_pallas(
            jnp.asarray(comp[n]), jnp.asarray(flow[n]), jnp.asarray(cov[n]),
            jnp.asarray(r[n]), num, den, CFA, c, interpret=True)
    got_n, got_d = merge_burst_pallas(
        jnp.asarray(comp), jnp.asarray(flow), jnp.asarray(cov),
        jnp.asarray(r), num0, den0, CFA, c, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(num))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(den))


def test_burst_chunked_padding(seed=29, F=5, fc=3):
    """_merge_burst_chunked pads the burst to a chunk multiple with
    zero-robustness frames — the result must equal the unpadded sequential
    accumulation exactly."""
    from hmsr_tpu.models.pipeline import _merge_burst_chunked
    from hmsr_tpu.ops.pallas_merge import padded_accum_shape
    rng = np.random.RandomState(seed)
    h, w, ts, scale = 32, 128, 16, 2
    c = make_config(scale, ts, True, False)
    c.tpu.merge_chunk = fc
    c.tpu.pallas_interpret = True
    comp, flow, cov, r = _burst_inputs(seed, F, h, w, ts, True)
    pad_shape = padded_accum_shape(c, (h, w), 3)
    num0 = jnp.asarray(rng.rand(*pad_shape).astype(np.float32))
    den0 = jnp.asarray(rng.rand(*pad_shape).astype(np.float32))

    num, den = num0, den0
    for n in range(F):
        num, den = merge_pallas(
            jnp.asarray(comp[n]), jnp.asarray(flow[n]), jnp.asarray(cov[n]),
            jnp.asarray(r[n]), num, den, CFA, c, interpret=True)
    got_n, got_d = _merge_burst_chunked(
        jnp.asarray(comp), jnp.asarray(flow), jnp.asarray(cov),
        jnp.asarray(r), num0, den0, CFA, c)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(num))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(den))


@pytest.mark.parametrize("nb", [2, 3])
def test_banded_row_offset(nb, seed=17):
    """Band-of-tile-rows accumulation (the space-sharded layout): running
    each band with its row_offset must reproduce the full-grid kernel, and
    beyond-grid pad rows (nb=3: nty=4 -> bands of 3) must accumulate
    exactly zero."""
    import jax
    from hmsr_tpu.ops.pallas_merge import padded_accum_shape
    rng = np.random.RandomState(seed)
    h, w, ts, scale = 64, 128, 16, 2
    c = make_config(scale, ts, True, False)
    comp = rng.rand(h, w).astype(np.float32)
    ny, nx = -(-h // ts), -(-w // ts)
    flow = (rng.rand(ny, nx, 2) * 2 - 1).astype(np.float32) * 5.0
    r = rng.rand(h, w).astype(np.float32)
    gg = rng.rand(h // 2, w // 2, 2).astype(np.float32) + 0.3
    cov_c = np.stack([gg[..., 0], 0.2 * np.sqrt(gg[..., 0] * gg[..., 1]),
                      gg[..., 1]]).astype(np.float32)

    pad_shape = padded_accum_shape(c, (h, w))
    n_ch, acc_h, acc_w = pad_shape
    B = ts * scale
    nty = acc_h // B
    nty_p = -(-nty // nb) * nb
    nump = rng.rand(n_ch, nty_p * B, acc_w).astype(np.float32)
    denp = rng.rand(n_ch, nty_p * B, acc_w).astype(np.float32)

    args = (jnp.asarray(comp), jnp.asarray(flow), jnp.asarray(cov_c),
            jnp.asarray(r))
    want_n, want_d = merge_pallas(*args, jnp.asarray(nump[:, :acc_h]),
                                  jnp.asarray(denp[:, :acc_h]), CFA, c,
                                  interpret=True)

    bands_n, bands_d = [], []
    for k in range(nty_p // nb):
        off = k * nb * B
        bn, bd = merge_pallas(
            *args, jnp.asarray(nump[:, off:off + nb * B]),
            jnp.asarray(denp[:, off:off + nb * B]), CFA, c,
            interpret=True, row_offset=jnp.int32(off))
        bands_n.append(np.asarray(bn))
        bands_d.append(np.asarray(bd))
    got_n = np.concatenate(bands_n, axis=1)
    got_d = np.concatenate(bands_d, axis=1)

    np.testing.assert_allclose(got_n[:, :acc_h], np.asarray(want_n),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(got_d[:, :acc_h], np.asarray(want_d),
                               atol=2e-4, rtol=1e-4)
    # beyond-grid pad rows: zero contribution, initial values preserved
    np.testing.assert_allclose(got_n[:, acc_h:], nump[:, acc_h:], atol=0)
    np.testing.assert_allclose(got_d[:, acc_h:], denp[:, acc_h:], atol=0)
