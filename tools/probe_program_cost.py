#!/usr/bin/env python
"""Measure the per-program fixed cost of Pallas TPU kernels on this backend.

Hypothesis (from the Ts=16 vs Ts=32 bench delta): ~2.5 us/program of fixed
overhead dominates the bright-path pipeline (~20k programs/frame). This
probe times grids of N programs whose kernels vary ONLY in
  (a) the number of SMEM scalar reads per program,
  (b) the number of blocked VMEM operands,
  (c) nothing (empty body) - the floor.
Each variant runs as ONE dispatch (one jit call, one readback), so the
~30 ms tunnel floor amortizes over 16k programs (2 us/program resolution
at N=16k: 16k * 2us = 32 ms >> noise).

Usage: python tools/probe_program_cost.py [n_programs]
"""

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


def probe(n_prog, n_scalar, n_blocks, body_vpu):
    """Build a pallas_call with the given per-program profile."""
    NS = max(n_scalar, 1)

    def kernel(smem_ref, *refs):
        out_ref = refs[-1]
        acc = jnp.float32(0.0)
        for k in range(n_scalar):
            acc = acc + smem_ref[0, k]
        x = refs[0][:] if n_blocks else jnp.zeros((8, 128), jnp.float32)
        for _ in range(1, n_blocks):
            pass  # extra blocks are fetched by the pipeline, not read
        for _ in range(body_vpu):
            x = x * 1.000001 + 0.000001
        out_ref[:] = x + acc

    in_specs = [pl.BlockSpec((1, NS), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    operands = [jnp.zeros((1, NS), jnp.float32)]
    for b in range(n_blocks):
        in_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.zeros((n_prog * 8, 128), jnp.float32))

    fn = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_prog * 8, 128), jnp.float32),
    )
    return jax.jit(lambda *a: fn(*a).sum()), operands


def time_one(name, n_prog, n_scalar, n_blocks, body_vpu, reps=3):
    fn, operands = probe(n_prog, n_scalar, n_blocks, body_vpu)
    t0 = time.time()
    v = float(np.asarray(fn(*operands)))
    compile_s = time.time() - t0
    best = 1e9
    for i in range(reps):
        # perturb to defeat the backend execution memoizer
        operands[0] = operands[0] + 1e-9 * (i + 1)
        t0 = time.time()
        v = float(np.asarray(fn(*operands)))
        best = min(best, time.time() - t0)
    print(f"{name:42s} n={n_prog:6d} total={best*1e3:8.2f} ms "
          f"-> {best/n_prog*1e9:8.1f} ns/program  (compile {compile_s:.1f}s, "
          f"v={v:.3f})", flush=True)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    print(f"device: {jax.devices()[0]}", flush=True)
    base = time_one("empty body, 1 block, 0 scalars", n, 0, 1, 0)
    time_one("empty body, 1 block, 16 scalars", n, 16, 1, 0)
    time_one("empty body, 1 block, 64 scalars", n, 64, 1, 0)
    time_one("empty body, 1 block, 224 scalars", n, 224, 1, 0)
    time_one("empty body, 4 blocks, 0 scalars", n, 0, 4, 0)
    time_one("empty body, 8 blocks, 0 scalars", n, 0, 8, 0)
    time_one("100 VPU ops, 1 block, 0 scalars", n, 0, 1, 100)
    # half the programs, double the scalar+vpu work: does time halve?
    time_one("2x work/program, n/2 programs", n // 2, 128, 1, 200)


if __name__ == "__main__":
    main()
