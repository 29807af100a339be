#!/usr/bin/env python
"""Probe 3: coexistence vs dataflow; trivial pallas consumer of conv output."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args, perturb_idx=0, n=3, name=""):
    t0 = time.perf_counter()
    v = float(np.asarray(fn(*args)))
    print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s val={v:.6g}",
          file=sys.stderr, flush=True)
    ts = []
    for i in range(n):
        args2 = list(args)
        args2[perturb_idx] = args2[perturb_idx] + jnp.float32(1e-7 * (i + 1))
        _ = float(np.asarray(jnp.sum(args2[perturb_idx].ravel()[:3])))
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args2)))
        ts.append(time.perf_counter() - t0)
    print(f"  [{name}] best {min(ts)*1000:.1f} ms (all "
          f"{[round(x*1000,1) for x in ts]})", file=sys.stderr, flush=True)
    return min(ts)


def trivial_pallas_sum(x):
    """Row-block sum via a minimal pallas kernel."""
    h, w = x.shape
    BH = 8
    hp = -(-h // BH) * BH
    xp = jnp.pad(x, ((0, hp - h), (0, (-w) % 128)))

    def kern(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(x_ref[:])

    out = pl.pallas_call(
        kern,
        grid=(hp // BH,),
        in_specs=[pl.BlockSpec((BH, xp.shape[1]), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp // BH, 1), jnp.float32),
    )(xp)
    return jnp.sum(out)


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import init_alignment
    from hmsr_tpu.ops.pallas_ica import refine_ica_pallas
    from hmsr_tpu.ops.grey import fft_lowpass_grey
    from hmsr_tpu.ops.pyramid import build_gaussian_pyramid

    H, W = 3000, 4000
    rng = np.random.RandomState(0)
    config = default_config()
    config.scale = 2
    config.noise_model.alpha = 1.8e-4
    config.noise_model.beta = 3.0e-6
    update_snr_config(config, 25.0)
    sanitize_config(config, (H, W))
    t = config.block_matching.tuning
    n_iter = config.ica.tuning.n_iter
    ts_ = t.tile_size
    L = 2

    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(jnp.asarray(rng.rand(H, W).astype(np.float32)))
    comp_grey = grey_fn(jnp.asarray(rng.rand(H, W).astype(np.float32)))
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    ref_lvl = astate.pyramid[L]
    prep = astate.ica_pallas[L]
    ica_state = astate.ica[L]
    ny, nx = astate.tiles[L].shape[:2]
    pyr_fn = jax.jit(lambda g: build_gaussian_pyramid(g, t.factors))
    moving_lvl = pyr_fn(comp_grey)[L]
    flow0 = jnp.asarray((rng.rand(ny, nx, 2) * 4 - 2).astype(np.float32))

    ica = functools.partial(refine_ica_pallas, prep=prep)
    pyr = lambda g: build_gaussian_pyramid(g, t.factors)[L]

    timeit(jax.jit(lambda x: jnp.sum(x[::512, ::512])), [comp_grey], name="noop")

    # F: coexistence, no dataflow (pyramid on g; ICA on raw moving_lvl)
    timeit(jax.jit(lambda g, m, f: jnp.sum(pyr(g)[::16, ::16]) + jnp.sum(
        ica(ref_lvl, ica_state, m, f, ts_, n_iter))),
        args=[comp_grey, moving_lvl, flow0], name="F_coexist")

    # G: trivial pallas consumer of conv output
    timeit(jax.jit(lambda g: trivial_pallas_sum(pyr(g))),
           args=[comp_grey], name="G_trivial_pallas")

    # H: trivial pallas consumer of raw input
    timeit(jax.jit(lambda m: trivial_pallas_sum(m)),
           args=[moving_lvl], name="H_trivial_raw")


if __name__ == "__main__":
    main()
