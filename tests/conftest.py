"""Test session setup.

Forces CPU with 8 virtual devices (sharding tests exercise the data-parallel
path without a TPU pod) and enables float64 so oracle-parity tolerances of
1e-6..1e-9 are meaningful (SURVEY.md §7 "Hard parts").

Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel);
# override at config level so tests run on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on a 1-core CI
# host (~6 min cold); repeat runs reuse compiled programs from disk.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("HETMOGP_JAX_CACHE",
                                     "/tmp/hetmogp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs: cold-compile every run
    pass


def pytest_collection_modifyitems(config, items):
    """Apply the two-tier markers from tests/tiers.py (VERDICT r4 #3).

    Keys are "<file basename>::<base test name>" so parameterized variants
    inherit their base test's tier and the mapping is invocation-directory
    independent."""
    import pytest

    from tests.tiers import FAST, SLOW

    for item in items:
        key = f"{item.fspath.basename}::{item.name.split('[')[0]}"
        if key in FAST:
            item.add_marker(pytest.mark.fast)
        elif key in SLOW:
            item.add_marker(pytest.mark.slow)
