#!/usr/bin/env python
"""Measure one remaining BASELINE.json config at 12MP (x1 / x3 / grey).

Usage: python tools/bench_variants_r5.py {x1|x3|grey}

Reuses bench.bench_size (identical methodology: perturbed inputs, checksum
readback, min-of-3). One variant per PROCESS so a wedged remote compile
(the round-5 x1 attempt sat >35 min — tunnel-variance class, see CLAUDE.md)
can be bounded with `timeout` without losing the other variants, and so
each program compiles in a clean backend state.

Appends a JSON line {"variant":..., "value":...} to tools/bench_variants_r5.log
via stdout redirection by the caller.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def mut_x1(c):
    c.scale = 1
    c.robustness.enabled = False
    c.robustness.save_mask = False


def mut_x3(c):
    c.scale = 3
    c.accumulated_robustness_denoiser.enabled = True


def mut_grey(c):
    c.mode = "grey"


MUTS = {"x1": mut_x1, "x3": mut_x3, "grey": mut_grey}


def main():
    variant = sys.argv[1]
    mutate = MUTS[variant]
    from hmsr_tpu.noise import run_fast_MC
    ALPHA, BETA = 1.8e-4, 3.0e-6
    t0 = time.perf_counter()
    std_curve, diff_curve = run_fast_MC(ALPHA, BETA)
    bench.log(f"noise curves: {time.perf_counter()-t0:.1f}s")
    h, w = 3000, 4000
    try:
        v = bench.bench_size(h, w, 20, std_curve, diff_curve,
                             tag=f" {variant}", mutate=mutate)
        print(json.dumps({"variant": variant, "value": round(v, 4)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"variant": variant,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
