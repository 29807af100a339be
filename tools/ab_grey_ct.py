#!/usr/bin/env python
"""A/B the grey low-pass implementations on the real chip at 12MP.

Usage: python tools/ab_grey_ct.py [matmul,ct[,fft]] [N]

One jitted program per impl: lax.scan over N 12MP frames computing the
grey image and accumulating a strided checksum (one dispatch per timing
run — the only trustworthy shape through the tunnel, CLAUDE.md). Inputs
are perturbed between runs to defeat the backend's execution memoization;
the scalar checksum is read back. Differential methodology: both variants
run in the SAME process on the SAME device arrays.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from hmsr_tpu.ops.grey import (fft_lowpass_grey, fft_lowpass_grey_ct,
                               fft_lowpass_grey_matmul, grey_matmul_consts)


def main():
    impls = (sys.argv[1] if len(sys.argv) > 1 else "matmul,ct").split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    h, w = 3000, 4000
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(n, h, w).astype(np.float32))
    frames.block_until_ready()
    gc = grey_matmul_consts((h, w))

    def make(impl):
        def grey(f):
            if impl == "matmul":
                return fft_lowpass_grey_matmul(f, consts=gc)
            if impl == "ct":
                return fft_lowpass_grey_ct(f)
            return fft_lowpass_grey(f)

        def prog(fr):
            def body(c, f):
                return c + jnp.sum(grey(f)[::97, ::101]), None
            return lax.scan(body, jnp.float32(0.0), fr)[0]
        return jax.jit(prog)

    for impl in impls:
        fn = make(impl)
        t0 = time.perf_counter()
        out = float(np.asarray(fn(frames)))
        print(f"[{impl}] compile+run {time.perf_counter()-t0:.1f}s "
              f"checksum={out:.3f}", flush=True)
        best = 1e9
        for i in range(3):
            fr = frames + jnp.float32(1e-6 * (i + 1))
            fr.block_until_ready()
            t0 = time.perf_counter()
            out = float(np.asarray(fn(fr)))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"[{impl}] run {i}: {dt:.3f}s checksum={out:.3f}",
                  flush=True)
        print(f"RESULT {impl} best={best:.3f}s for {n} frames "
              f"({1e3*best/n:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
