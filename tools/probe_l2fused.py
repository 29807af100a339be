#!/usr/bin/env python
"""Compiled-on-TPU check + timing for the fused L2 BM + ICA Pallas kernel.

Compares match_l2 -> refine_ica_pallas (two dispatches, XLA gather BM)
against match_l2_refine_ica_pallas (one kernel) at 12MP level-2 geometry.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, n=3, name=""):
    t0 = time.perf_counter()
    v = np.asarray(fn(*args))
    print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s "
          f"chk={float(np.sum(v)):.4f}", file=sys.stderr, flush=True)
    ts = []
    for i in range(n):
        args2 = list(args)
        args2[2] = args2[2] + jnp.float32(1e-7 * (i + 1))
        _ = float(np.asarray(jnp.sum(args2[2].ravel()[:3])))
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args2))
        ts.append(time.perf_counter() - t0)
    print(f"  [{name}] best {min(ts)*1000:.1f} ms  "
          f"(all {[round(t*1000,1) for t in ts]})", file=sys.stderr, flush=True)
    return v


def main():
    from hmsr_tpu.models.block_matching import match_l2
    from hmsr_tpu.models.ica import init_ica
    from hmsr_tpu.models.alignment import _unfold_tiles
    from hmsr_tpu.ops.pallas_ica import (
        refine_ica_pallas, match_l2_refine_ica_pallas, prep_ica_pallas)

    # 12MP level-2 geometry: grey 1500x2000, pyramid /2 -> 750x1000, ts=16
    H, W, ts, radius, n_iter = 750, 1000, 16, 4, 3
    rng = np.random.RandomState(0)
    base = rng.rand(H + 8, W + 8).astype(np.float32)
    # smooth a bit so ICA has gradients to chew on
    k = np.ones(5, np.float32) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    ref = base[4:4 + H, 4:4 + W].copy()
    mov = base[2:2 + H, 3:3 + W].copy()

    ny, nx = H // ts, W // ts
    flow0 = (rng.rand(ny, nx, 2) * 6 - 3).astype(np.float32)

    ref_j = jnp.asarray(ref)
    mov_j = jnp.asarray(mov)
    flow_j = jnp.asarray(flow0)
    state = jax.jit(lambda g: init_ica(g, ts))(ref_j)
    tiles = _unfold_tiles(ref_j, ts)
    prep = prep_ica_pallas(ref_j, state, (ny, nx, 2), ts)
    jax.block_until_ready(prep.ref_c)

    def sep(ref_t, state_in, mov, flow):
        bm = match_l2(ref_t, mov, flow, ts, radius)
        return refine_ica_pallas(ref_j, state_in, mov, bm, ts, n_iter,
                                 prep=prep)

    def fused(ref_img, state_in, mov, flow):
        return match_l2_refine_ica_pallas(ref_img, state_in, mov, flow, ts,
                                          n_iter, radius, prep=prep)

    sep_j = jax.jit(lambda mov, flow: sep(tiles, state, mov, flow))
    fus_j = jax.jit(lambda mov, flow: fused(ref_j, state, mov, flow))

    # Correctness first
    want = np.asarray(sep_j(mov_j, flow_j))
    got = np.asarray(fus_j(mov_j, flow_j))
    err = np.max(np.abs(want - got))
    print(f"max |sep - fused| = {err:.3e}", flush=True)
    assert err < 1e-3, "MISMATCH"

    # Timing: perturb mov each round
    for name, fn in [("sep", sep_j), ("fused", fus_j)]:
        ts_ = []
        for i in range(4):
            m2 = mov_j + jnp.float32(1e-7 * (i + 1))
            _ = float(np.asarray(jnp.sum(m2.ravel()[:3])))
            t0 = time.perf_counter()
            _ = np.asarray(fn(m2, flow_j))
            ts_.append(time.perf_counter() - t0)
        print(f"[{name}] best {min(ts_)*1000:.1f} ms "
              f"(all {[round(t*1000,1) for t in ts_]})", flush=True)


if __name__ == "__main__":
    main()
