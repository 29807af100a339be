#!/usr/bin/env python
"""Probe 5: full align after the conv-free pyramid fix; FFT-in-program test."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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


def main():
    from hmsr_tpu.configs import default_config, update_snr_config, sanitize_config
    from hmsr_tpu.models.alignment import init_alignment, align
    from hmsr_tpu.ops.grey import fft_lowpass_grey
    import hmsr_tpu.models.alignment as AL

    H, W = 3000, 4000
    rng = np.random.RandomState(0)
    config = default_config()
    config.scale = 2
    config.noise_model.alpha = 1.8e-4
    config.noise_model.beta = 3.0e-6
    update_snr_config(config, 25.0)
    sanitize_config(config, (H, W))

    raw = jnp.asarray(rng.rand(H, W).astype(np.float32))
    grey_fn = jax.jit(fft_lowpass_grey)
    ref_grey = grey_fn(jnp.asarray(rng.rand(H, W).astype(np.float32)))
    comp_grey = grey_fn(raw)
    astate = jax.jit(lambda g: init_alignment(g, config))(ref_grey)

    timeit(jax.jit(lambda x: jnp.sum(x[::512, ::512])), [comp_grey], name="noop")

    # 1. full align from precomputed grey (post-fix)
    timeit(jax.jit(lambda g: jnp.sum(align(astate, g, config))),
           args=[comp_grey], name="align_grey_input")

    # 2. FFT grey alone
    timeit(jax.jit(lambda x: jnp.sum(fft_lowpass_grey(x)[::16, ::16])),
           args=[raw], name="fft_grey_alone")

    # 3. full align from raw (FFT inside the program)
    timeit(jax.jit(lambda x: jnp.sum(align(astate, fft_lowpass_grey(x),
                                           config))),
           args=[raw], name="align_fft_in_program")


if __name__ == "__main__":
    main()
