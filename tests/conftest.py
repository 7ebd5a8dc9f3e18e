"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard way to exercise pjit/shard_map/Mesh code without real
multi-chip hardware (see SURVEY.md §4). Must run before jax is imported
anywhere, hence the environment mutation at module import time.
"""

import os

# Force CPU even when the session presets JAX_PLATFORMS (e.g. 'axon' for the
# real TPU tunnel): tests must run on the virtual 8-device CPU mesh. A pytest
# plugin may import jax before this conftest, so set the config directly too
# (backends initialize lazily, so this still lands in time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
