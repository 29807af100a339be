"""Algorithm stages (the reference's L5/L6): alignment, robustness, kernels,
merge, and the end-to-end pipeline. Everything here is functional JAX,
trace-time-static in shapes and config, and composes into one jitted program.
"""
