"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize registers the TPU backend and overrides JAX_PLATFORMS,
so the platform must be forced through jax.config *after* importing jax.
Tests must run anywhere (no TPU needed); the multi-chip sharding tests use the
virtual device mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hmsr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# ---------------------------------------------------------------------------
# slow-test selection: the full suite is ~37 min on this machine (dominated
# by interpret-mode Pallas parity tests); the default run skips the tests
# listed in slow_manifest.txt (measured >= 10 s each, ~28 min total) to stay
# under ~5 min. Run everything with ``--runslow`` (or HMSR_SLOW=1) — CI
# convention documented in CLAUDE.md. The manifest is regenerated from
# ``pytest --durations=0`` output, not hand-curated.
# ---------------------------------------------------------------------------

_MANIFEST = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests listed in tests/slow_manifest.txt")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: measured >= 10 s; skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    import pytest
    if config.getoption("--runslow") or os.environ.get("HMSR_SLOW"):
        return
    try:
        with open(_MANIFEST) as f:
            slow_ids = {ln.strip() for ln in f if ln.strip()}
    except OSError:
        return
    skip = pytest.mark.skip(reason="slow (see tests/slow_manifest.txt); "
                                   "use --runslow")
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
            item.add_marker(skip)
