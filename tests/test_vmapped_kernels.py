"""Frames-folded Pallas kernels under ``jax.vmap`` (interpret mode).

The vmapped pipeline (tpu.pipeline=vmapped, pipeline.py) batches the
analysis stages over frames with ``jax.vmap``; the Pallas entry points
carry custom-vmap rules that fold the frames axis into the kernel grid
(pallas_ica._bm_run / _ica_step_run, pallas_warp._warp_impl) — Mosaic
rejects the default vmap batching of HBM-space operands. These tests pin
the folded grids to the single-frame kernels exactly (same kernel code,
F=1 vs F>1 differs only in the grid fold and frame-indexed DMA).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmsr_tpu.models.ica import init_ica
from hmsr_tpu.ops.pallas_ica import (prep_ica_pallas, bm_pallas,
                                     ica_step_pallas, _pad_moving,
                                     _pad_flow, _dma_rows, _xg)

TS = 16
F = 3


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(7)
    H, W = 48, 128
    ref = rng.rand(H, W).astype(np.float32)
    movs = np.stack([
        np.roll(ref, (rng.randint(-2, 3), rng.randint(-2, 3)), (0, 1))
        + 0.02 * rng.randn(H, W).astype(np.float32) for _ in range(F)])
    ny, nx = H // TS, W // TS
    flows = (rng.randn(F, ny, nx, 2) * 1.5).astype(np.float32)
    state = init_ica(jnp.asarray(ref), TS)
    prep = prep_ica_pallas(jnp.asarray(ref), state, (ny, nx, 2), TS)
    return ref, movs, flows, prep, (H, W, ny, nx)


def test_bm_vmap_matches_per_frame(scene):
    ref, movs, flows, prep, (H, W, ny, nx) = scene
    XG = _xg(TS)
    NTXP = -(-nx // XG) * XG
    rbm = 1
    SWIN = TS + 2 * rbm + 1
    PAD_E = TS + 2 * rbm

    def one(mov, flow):
        mov_edge = _pad_moving(mov, PAD_E, _dma_rows(SWIN), "edge")
        fp = _pad_flow(flow, NTXP)
        dx, dy = bm_pallas(prep, (mov_edge, PAD_E), fp, TS, rbm, "l2",
                           H, W, interpret=True)
        return dx, dy

    want = [one(jnp.asarray(movs[i]), jnp.asarray(flows[i]))
            for i in range(F)]
    want = tuple(np.stack([np.asarray(w[k]) for w in want]) for k in (0, 1))
    got = jax.vmap(one)(jnp.asarray(movs), jnp.asarray(flows))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_ica_step_vmap_matches_per_frame(scene):
    ref, movs, flows, prep, (H, W, ny, nx) = scene
    XG = _xg(TS)
    NTXP = -(-nx // XG) * XG

    def one(mov, flow):
        mov_pad = _pad_moving(mov, TS + 2, _dma_rows(TS + 1), "zero")
        fp = _pad_flow(flow, NTXP)
        return ica_step_pallas(prep, mov_pad, fp, TS, interpret=True)

    want = [one(jnp.asarray(movs[i]), jnp.asarray(flows[i]))
            for i in range(F)]
    want = tuple(np.stack([np.asarray(w[k]) for w in want]) for k in (0, 1))
    got = jax.vmap(one)(jnp.asarray(movs), jnp.asarray(flows))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_warp_vmap_matches_per_frame():
    from hmsr_tpu.ops.pallas_warp import upscale_warp_pallas
    rng = np.random.RandomState(3)
    Ts, u = 16, 2
    H, W = 48, 128
    nty, ntx = H // Ts, W // Ts
    lh, lw = H // u, W // u
    stats = rng.rand(F, 2, lh, lw).astype(np.float32)
    flows = (rng.randn(F, nty, ntx, 2) * 2).astype(np.float32)

    def one(st, flow):
        return upscale_warp_pallas(st, u, Ts, flow, (H, W), interpret=True)

    want = [one(jnp.asarray(stats[i]), jnp.asarray(flows[i]))
            for i in range(F)]
    want = tuple(np.stack([np.asarray(w[k]) for w in want]) for k in (0, 1))
    got = jax.vmap(one)(jnp.asarray(stats), jnp.asarray(flows))
    # hr: the float parameter planes (lr_x, Dodgson weights) compile to
    # slightly different fused arithmetic under the vmapped trace — 1-ulp
    # (~2.4e-7) value noise; the fold itself is exact (BM/ICA, whose
    # parameter planes are integers, match bit-exactly above)
    np.testing.assert_allclose(np.asarray(got[0]), want[0],
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[1]), want[1])   # valid


def test_fused_gn_vmap_fallback(scene):
    """The fused BM+GN kernel's custom-vmap rule (sequential lax.map
    fallback) must equal the per-frame calls exactly."""
    from hmsr_tpu.ops.pallas_ica_fused import refine_ica_pallas as fused
    ref, movs, flows, prep, (H, W, ny, nx) = scene

    def one(mov, flow):
        return fused(jnp.asarray(ref), None, mov, flow, TS, 2,
                     interpret=True, prep=prep)

    want = np.stack([np.asarray(one(jnp.asarray(movs[i]),
                                    jnp.asarray(flows[i])))
                     for i in range(F)])
    got = np.asarray(jax.vmap(one)(jnp.asarray(movs), jnp.asarray(flows)))
    np.testing.assert_array_equal(got, want)
