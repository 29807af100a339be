#!/usr/bin/env python
"""Run a single bench variant standalone (validating a fix without the
full bench matrix). Usage: python tools/run_variant.py [brightness] [h w]."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import bench
    brightness = float(sys.argv[1]) if len(sys.argv) > 1 else None
    h = int(sys.argv[2]) if len(sys.argv) > 3 else 3000
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
    from hmsr_tpu.noise import run_fast_MC
    std_curve, diff_curve = run_fast_MC(1.8e-4, 3.0e-6)
    best = bench.bench_size(h, w, 20, std_curve, diff_curve,
                            brightness=brightness, tag=" variant")
    print(f"best={best:.4f}s")


if __name__ == "__main__":
    main()
