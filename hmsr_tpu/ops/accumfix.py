"""Final accumulator normalization: guarded divide + starved-pixel refill.

The merge accumulation (reference ``merge.py:290-434`` / ``merge.py:82-233``)
can leave border HR pixels where one channel's total kernel weight
underflows: no same-CFA sample inside the bounded gather window receives a
non-negligible ``exp(-0.5 d^T Omega^-1 d)`` weight, so ``den`` is 0 or a
denormal and ``num/den`` is numeric garbage (a ratio of two rounded-to-zero
f32 values) that post-sharpening amplifies into saturated blocks. The
reference ships this artifact and scrubs NaNs at the CLI
(``run_handheld.py:133``); interior pixels are immune because the 3x3 gather
always contains a same-channel sample at a sane distance.

We deliberately deviate (listed in README "Parity notes"): *starved* pixels
-- ``den < STARVED_DEN`` -- are re-normalized from the 5x5 neighborhood sums
of well-fed ``(num, den)``, twice, which is exactly the merge's weighted
average restricted to the surviving neighbors (weights are kept, so the
refill is the same kernel regression with the starved taps dropped). Only
pixels the reference renders as garbage are affected.
"""

import jax
import jax.numpy as jnp

from ..utils.types import EPSILON_DIV

#: below this total accumulated weight a pixel's ratio is numeric noise:
#: genuine contributions are O(robustness * exp(-small)) >> 1e-4, while the
#: failure mode produces exponents of  -(few px)^2 / (tiny k^2)  ~ e^-100.
STARVED_DEN = 1e-4

_ITERS = 2  # 2 passes of a 5x5 box reach 4 px -- covers every observed case

#: production border-strip width for ``refill_border``: starvation is a
#: border phenomenon (every interior HR pixel receives the reference-merge
#: kernel weight of its own LR neighborhood, exp(-0.5 d^T O^-1 d) with
#: d <= ~1 px -- merge.py:176-266), observed within a few pixels of the
#: image edge; 32 is a ~10x margin over every observed case.
REFILL_BORDER = 32

#: extraction margin past the written-back strip: 2 iterations of a 5x5 box
#: have an influence radius of 4 px, so 8 makes the strip refill BIT-exact
#: vs the full-image refill for every written-back pixel (the cut edge's
#: zero padding reaches 4 px inward from depth B+8, never into [0, B)).
_REFILL_MARGIN = 8


def _box5(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                 (1, 5, 5), (1, 1, 1), "SAME")


def _refill(n, d, good):
    """The iterative neighborhood refill on pre-masked accumulators."""
    for _ in range(_ITERS):
        bn = _box5(n)
        bd = _box5(d)
        n = jnp.where(good, n, bn)
        d = jnp.where(good, d, bd)
        good = d > STARVED_DEN
    return n, d


def normalize_accum(num, den, refill_border=None):
    """``(c, H, W)`` accumulators -> ``(c, H, W)`` image.

    Well-fed pixels divide exactly as the reference does; starved pixels are
    refilled from neighborhood accumulator sums before the divide, so the
    output is always finite and in the convex hull of the contributing
    samples. Works on full accumulators and on row bands (the fused merge
    paths): a band sees zero context past its rows, which only matters for
    pixels that are starved AND at a band edge AND at the image border --
    they still pick up the in-band half of their neighborhood.

    ``refill_border``: if an int B, run the refill only on the four B-wide
    border strips (extracted with an 8-px exactness margin) and leave the
    interior as the plain guarded divide. Bit-exact vs the full refill at
    every border pixel AND at every interior pixel that is not starved --
    i.e. everywhere, since starvation is border-only (see REFILL_BORDER).
    The full-image refill materializes 4 reduce_windows + gates at the HR
    size: 0.257 s of the 1.76 s e2e at 20x12MP/x2 (measured round 5,
    tools/bisect_r5_stage_budget.log all-vs-mergeref + norm split), while
    the strips cover ~2% of the area and the interior divide fuses into
    consumers. Falls back to the full refill when the array is too small
    for the strips to be distinct.
    """
    if refill_border is not None:
        B = int(refill_border)
        M = B + _REFILL_MARGIN
        h, w = num.shape[-2:]
        if h > 2 * M and w > 2 * M:
            return _normalize_border(num, den, B, M)
    good = den > STARVED_DEN
    n = jnp.where(good, num, 0.0)
    d = jnp.where(good, den, 0.0)
    n, d = _refill(n, d, good)
    return n / jnp.maximum(d, EPSILON_DIV)


def _strip_image(num, den):
    """Full refill + divide of one extracted strip."""
    good = den > STARVED_DEN
    n = jnp.where(good, num, 0.0)
    d = jnp.where(good, den, 0.0)
    n, d = _refill(n, d, good)
    return n / jnp.maximum(d, EPSILON_DIV)


def _normalize_border(num, den, B, M):
    h, w = num.shape[-2:]
    # interior: the plain guarded divide (identical to the refill path at
    # every well-fed pixel -- the iteration only rewrites starved ones)
    img = num / jnp.maximum(den, EPSILON_DIV)
    # top / bottom strips span the full width, left / right the full height,
    # so every strip sees complete context along its long axis and an 8-px
    # margin across it; corners are written twice with identical values
    img = img.at[..., :B, :].set(
        _strip_image(num[..., :M, :], den[..., :M, :])[..., :B, :])
    img = img.at[..., h - B:, :].set(
        _strip_image(num[..., h - M:, :], den[..., h - M:, :])[..., M - B:, :])
    img = img.at[..., :, :B].set(
        _strip_image(num[..., :, :M], den[..., :, :M])[..., :, :B])
    img = img.at[..., :, w - B:].set(
        _strip_image(num[..., :, w - M:], den[..., :, w - M:])[..., :, M - B:])
    return img


def normalize_accum_np(num, den, starved=STARVED_DEN, iters=_ITERS):
    """Float64 NumPy mirror of :func:`normalize_accum` for the test oracles."""
    import numpy as np

    def box5(x):
        out = np.zeros_like(x)
        h, w = x.shape[-2:]
        for dy in range(-2, 3):
            ys = slice(max(dy, 0), min(h + dy, h))
            yd = slice(max(-dy, 0), min(h - dy, h))
            for dx in range(-2, 3):
                xs = slice(max(dx, 0), min(w + dx, w))
                xd = slice(max(-dx, 0), min(w - dx, w))
                out[..., yd, xd] += x[..., ys, xs]
        return out

    good = den > starved
    n = np.where(good, num, 0.0)
    d = np.where(good, den, 0.0)
    for _ in range(iters):
        bn = box5(n)
        bd = box5(d)
        n = np.where(good, n, bn)
        d = np.where(good, d, bd)
        good = d > starved
    return n / np.maximum(d, 1e-300)
