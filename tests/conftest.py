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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
