"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on simulated host devices
(``--xla_force_host_platform_device_count``), per the driver contract. Real
TPU benchmarking happens in ``bench.py``, not in the test suite.
"""

import os

# The harness sets JAX_PLATFORMS=axon (one real TPU); tests run on a virtual
# 8-device CPU mesh, so force-override. jax internals are pre-imported by a
# sitecustomize hook, so the env var alone is too late — also update config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the test box has ONE core, so XLA compile
# time dominates the suite. Cache compiled executables across runs/files.
_CACHE_DIR = os.environ.get(
    "TACP_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)

# XLA's CPU backend spends most of the suite's wall time in compilation;
# skipping the expensive optimization passes roughly halves compile time
# and tests assert numerics, not performance. Opt out (e.g. to chase a
# fusion-dependent numeric) with TACP_TEST_FULL_OPT=1.
if not os.environ.get("TACP_TEST_FULL_OPT"):
    jax.config.update("jax_disable_most_optimizations", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
