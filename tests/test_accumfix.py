"""Final accumulator normalization (ops/accumfix).

The reference divides bare (``merge.py:290-434`` + ``utils.py:62-90``) and
ships garbage at starved border pixels; we refill them from neighborhood
accumulator sums (deliberate deviation, README "Parity notes").
"""

import numpy as np
import jax.numpy as jnp

from hmsr_tpu.ops.accumfix import (REFILL_BORDER, STARVED_DEN,
                                   normalize_accum, normalize_accum_np)


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


def _border_starved_case(seed, h, w, depth):
    """Accumulators with starved clusters ONLY within ``depth`` px of the
    border (the physical regime — see accumfix.REFILL_BORDER)."""
    rng = np.random.RandomState(seed)
    vals = rng.rand(3, h, w).astype(np.float32) * 0.6 + 0.2
    den = (rng.rand(3, h, w) + 0.5).astype(np.float32)
    num = (vals * den).astype(np.float32)
    mask = np.zeros((h, w), bool)
    for _ in range(40):
        side = rng.randint(4)
        d = rng.randint(depth)
        if side == 0:
            mask[d, rng.randint(w)] = True
        elif side == 1:
            mask[h - 1 - d, rng.randint(w)] = True
        elif side == 2:
            mask[rng.randint(h), d] = True
        else:
            mask[rng.randint(h), w - 1 - d] = True
    mask[:3, :3] = True              # corner cluster (all-starved 3x3)
    mask[h - 2:, w - 2:] = True
    num[:, mask] *= 1e-9
    den[:, mask] *= 1e-9
    return num, den


def test_border_refill_bitexact_vs_full_when_starvation_is_border_only():
    """refill_border=B must be BIT-identical to the full-image refill when
    every starved pixel lies within B of the border (the production regime:
    interior HR pixels always receive the reference-merge weight)."""
    h, w = 100, 120                      # > 2*(B+8) on both axes for B=32
    num, den = _border_starved_case(3, h, w, depth=REFILL_BORDER - 4)
    full = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    strip = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den),
                                       refill_border=REFILL_BORDER))
    np.testing.assert_array_equal(strip, full)


def test_border_refill_small_shape_falls_back_to_full():
    """Below 2*(B+8) on either axis the strips overlap — the full refill
    runs instead (identical output, no shape errors)."""
    num, den = _border_starved_case(4, 40, 200, depth=8)
    full = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    strip = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den),
                                       refill_border=REFILL_BORDER))
    np.testing.assert_array_equal(strip, full)


def test_border_refill_interior_starved_pixel_is_left_as_divide():
    """DOCUMENTED LIMIT of refill_border: a starved pixel deeper than B
    gets the plain guarded divide, not a refill. Physically unreachable in
    production (interior pixels always accumulate reference weight); this
    test pins the behavior so the deviation stays deliberate."""
    h, w = 100, 120
    num = np.full((1, h, w), 0.25, np.float32)
    den = np.ones((1, h, w), np.float32)
    num[0, 50, 60] = 1e-7
    den[0, 50, 60] = 2e-7
    out = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den),
                                     refill_border=REFILL_BORDER))
    assert abs(out[0, 50, 60] - 0.5) < 1e-6      # bare 1e-7/2e-7 ratio
    full = np.asarray(normalize_accum(jnp.asarray(num), jnp.asarray(den)))
    assert abs(full[0, 50, 60] - 0.25) < 1e-6    # full refill fixes it
