"""Test configuration: force JAX onto CPU with 8 fake devices.

Multi-device sharding logic (data parallel, spatial halo) is tested on a
virtual CPU mesh via --xla_force_host_platform_device_count, the
standard JAX trick (SURVEY.md §4).

NOTE: this environment tunnels a real TPU through the 'axon' platform
plugin, which overrides the JAX_PLATFORMS *environment variable* — the
only reliable override is `jax.config.update("jax_platforms", "cpu")`
before any backend is touched. Must run before jax initializes a
backend.
"""

import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r1 #9): the default loop stays fast; compile-heavy
# parity suites are marked `slow` and run with --runslow (full CI-style
# run: `python -m pytest tests/ --runslow`; durations in CLAUDE.md).
# ---------------------------------------------------------------------------

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (compile-heavy parity suites)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy parity test, excluded from the default loop")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
