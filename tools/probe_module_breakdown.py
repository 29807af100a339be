#!/usr/bin/env python
"""What is the 408 MB 12MP StableHLO module made of? (VERDICT r04 #5)

Traces + lowers bench.py's full-pipeline program (client-side only — never
touches the TPU, safe to run while a measurement owns the chip) and breaks
the serialized module text down by

  - func.func block (scan bodies, cond branches, the main fn), and
  - constant payloads (dense<...> literals — selection matrices & friends
    serialize as text and can dwarf the actual program).

Usage: python tools/probe_module_breakdown.py [HxW] [N] [out.txt]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hmsr_tpu.configs import default_config, update_snr_config, \
        sanitize_config
    from hmsr_tpu.models.pipeline import make_pipeline

    H, W = map(int, (sys.argv[1] if len(sys.argv) > 1 else "3000x4000")
               .split("x"))
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    ALPHA, BETA = 1.8e-4, 3.0e-6
    CFA = np.array([[0, 1], [1, 2]])
    config = default_config()
    config.scale = 2
    config.verbose = 0
    config.noise_model.alpha = ALPHA
    config.noise_model.beta = BETA
    config.accumulated_robustness_denoiser.enabled = False
    update_snr_config(config, 56.0)
    sanitize_config(config, (H, W))

    pipe = make_pipeline(config, CFA, [1.0, 1.0, 1.0], jit=False)

    def run(ref, comps, std, diff):
        img, _ = pipe(ref, comps, std, diff)
        sub = img[::31, ::37]
        return jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0))

    b = np.arange(1001) / 1000
    std = jnp.asarray(np.sqrt(ALPHA * b + BETA).astype(np.float32))
    diff = jnp.asarray(
        np.sqrt(2 / np.pi * 2 * (ALPHA * b + BETA) / 9).astype(np.float32))
    ref = jax.ShapeDtypeStruct((H, W), jnp.float32)
    comps = jax.ShapeDtypeStruct((N - 1, H, W), jnp.float32)

    fn = jax.jit(run)
    t0 = time.perf_counter()
    traced = fn.trace(ref, comps, std, diff)
    print(f"trace: {time.perf_counter() - t0:8.1f}s", flush=True)
    t0 = time.perf_counter()
    lowered = traced.lower()
    print(f"lower: {time.perf_counter() - t0:8.1f}s", flush=True)

    txt = lowered.as_text(dialect="stablehlo")
    total = len(txt)
    print(f"module: {total / 1e6:.1f} MB text", flush=True)

    # --- per-function block sizes -----------------------------------------
    starts = [(m.start(), m.group(1))
              for m in re.finditer(r'func\.func[^@]*@([\w.$-]+)', txt)]
    starts.append((total, '<end>'))
    sizes = {}
    for (s, name), (e, _) in zip(starts, starts[1:]):
        sizes[name] = sizes.get(name, 0) + (e - s)
    print("\n--- top 25 func.func blocks by size ---")
    for name, sz in sorted(sizes.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{sz / 1e6:9.2f} MB  {name}")

    # --- constant payloads -------------------------------------------------
    # dense<...> literals; also dense_resource refs (payload in the blob).
    const_total = 0
    buckets = {}
    for m in re.finditer(r'stablehlo\.constant dense<', txt):
        s = m.end()
        e = txt.find('>', s)
        if e < 0:
            continue
        n = e - s
        const_total += n
        if n >= 4096:
            # attribute to the enclosing function
            fname = '<main>'
            for fs, fn_name in reversed(starts[:-1]):
                if fs < m.start():
                    fname = fn_name
                    break
            buckets[fname] = buckets.get(fname, 0) + n
    print(f"\nconstant literal payload total: {const_total / 1e6:.1f} MB "
          f"({100.0 * const_total / total:.0f}% of module)")
    print("--- >=4KB constant payload by enclosing function ---")
    for name, sz in sorted(buckets.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{sz / 1e6:9.2f} MB  {name}")

    # --- op histogram (top 20 by total text length) ------------------------
    ops = {}
    for m in re.finditer(r'(\w[\w.]*)\s*=?\s*"?([a-z_]+\.[a-z_0-9]+)', txt):
        pass  # too slow/noisy; use simple opcode count instead
    for m in re.finditer(r'= ([a-z_]+\.[a-z_0-9]+)', txt):
        ops[m.group(1)] = ops.get(m.group(1), 0) + 1
    print("\n--- top 20 ops by count ---")
    for name, n in sorted(ops.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{n:9d}  {name}")

    if len(sys.argv) > 3:
        with open(sys.argv[3], 'w') as f:
            f.write(txt)
        print(f"\nmodule text written to {sys.argv[3]}")


if __name__ == "__main__":
    main()
