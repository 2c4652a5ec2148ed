"""Test configuration: force JAX onto CPU with 8 fake devices.

Multi-device sharding logic (data parallel, spatial halo) is tested on a
virtual CPU mesh via --xla_force_host_platform_device_count, the
standard JAX trick (SURVEY.md §4). Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
