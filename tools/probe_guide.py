#!/usr/bin/env python
"""Micro-probe: where do the ~8 ms/frame of guide+stats go at 12MP?

Times a scan over 19 frames (one dispatch, one checksum readback) of
variants of the robustness guide-image + local-stats chain. Usage:
    python tools/probe_guide.py [HxW]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from hmsr_tpu.models.robustness import compute_guide_image
    from hmsr_tpu.ops.stencils import local_stats_3x3

    H, W = map(int, (sys.argv[1] if len(sys.argv) > 1 else "3000x4000")
               .split("x"))
    N = 19
    CFA = np.array([[0, 1], [1, 2]])
    WB = [1.9, 1.0, 1.7]
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(N, H, W).astype(np.float32))

    def run(fn, name):
        def step(acc, fr):
            return acc + fn(fr), None
        f = jax.jit(lambda x: jax.lax.scan(step, jnp.float32(0.0), x)[0])
        t0 = time.time()
        v = float(np.asarray(f(frames)))
        print(f"[{name}] compile+run {time.time()-t0:.1f}s v={v:.4f}",
              flush=True)
        ts = []
        for i in range(3):
            fr2 = frames + jnp.float32(1e-7 * (i + 1))
            _ = float(np.asarray(jnp.sum(fr2[0, ::511, ::511])))
            t0 = time.time()
            v = float(np.asarray(f(fr2)))
            ts.append(time.time() - t0)
        print(f"[{name}] steady {min(ts)*1e3:.1f} ms "
              f"({[round(t*1e3) for t in ts]})", flush=True)

    run(lambda fr: jnp.sum(fr[::97, ::101]), "baseline (floor)")
    run(lambda fr: jnp.sum(
        compute_guide_image(fr, CFA, WB, impl="slices")[:, ::97, ::101]),
        "guide slices")
    run(lambda fr: jnp.sum(
        compute_guide_image(fr, CFA, WB, impl="matmul")[:, ::97, ::101]),
        "guide matmul")

    def gs(fr, impl):
        g = compute_guide_image(fr, CFA, WB, impl=impl)
        m, v = local_stats_3x3(g)
        return jnp.sum(m[:, ::97, ::101]) + jnp.sum(v[:, ::97, ::101])

    run(lambda fr: gs(fr, "slices"), "guide+stats slices")
    run(lambda fr: gs(fr, "matmul"), "guide+stats matmul")


if __name__ == "__main__":
    main()
