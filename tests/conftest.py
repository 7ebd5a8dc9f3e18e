"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard way to exercise pjit/shard_map/Mesh code without real
multi-chip hardware (see SURVEY.md §4). Must run before jax is imported
anywhere, hence the environment mutation at module import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
