"""Final accumulator normalization (ops/accumfix).

The reference divides bare (``merge.py:290-434`` + ``utils.py:62-90``) and
ships garbage at starved border pixels; we refill them from neighborhood
accumulator sums (deliberate deviation, README "Parity notes").
"""

import numpy as np
import jax.numpy as jnp

from hmsr_tpu.ops.accumfix import (STARVED_DEN, normalize_accum,
                                   normalize_accum_np)


def test_wellfed_is_exact_divide():
    rng = np.random.RandomState(0)
    num = rng.rand(3, 16, 24).astype(np.float32)
    den = (rng.rand(3, 16, 24) + 0.5).astype(np.float32)
    out = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    np.testing.assert_array_equal(out, num / den)


def test_starved_pixel_refilled_from_neighbors():
    num = np.full((1, 11, 11), 0.25, np.float32)
    den = np.ones((1, 11, 11), np.float32)
    num[0, 5, 5] = 1e-7          # garbage ratio 0.5 at a starved pixel
    den[0, 5, 5] = 2e-7
    out = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    # refill = box5(num*valid)/box5(den*valid) = 24*0.25 / 24 = 0.25
    assert abs(out[0, 5, 5] - 0.25) < 1e-6
    # neighbours untouched
    assert abs(out[0, 5, 4] - 0.25) < 1e-6


def test_zero_den_corner_cluster_finite_and_in_range():
    rng = np.random.RandomState(1)
    vals = rng.rand(3, 32, 32).astype(np.float32) * 0.6 + 0.2
    den = (rng.rand(3, 32, 32) + 0.5).astype(np.float32)
    num = (vals * den).astype(np.float32)
    num[:, :3, :3] = 0.0          # 3x3 corner with zero accumulation
    den[:, :3, :3] = 0.0
    out = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    assert np.isfinite(out).all()
    assert (out[:, :3, :3] >= 0.2 - 1e-3).all()
    assert (out[:, :3, :3] <= 0.8 + 1e-3).all()


def test_np_mirror_matches_jnp():
    rng = np.random.RandomState(2)
    num = rng.rand(3, 20, 28).astype(np.float32)
    den = (rng.rand(3, 20, 28) * 2).astype(np.float32)
    starve = rng.rand(3, 20, 28) < 0.1
    den[starve] *= 1e-9
    num[starve] *= 1e-9
    got = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    want = normalize_accum_np(num.astype(np.float64), den.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_threshold_classifies_tiny_weights_as_starved():
    assert STARVED_DEN <= 1e-3   # genuine contributions are >> this
