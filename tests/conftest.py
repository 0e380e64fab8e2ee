"""Test configuration: force an 8-device virtual CPU platform so sharding
and multi-chip code paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS at interpreter start; a post-import config update
# wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

from kmc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # CPU compiles cache too: faster re-runs of the suite

import pytest  # noqa: E402

import kmc_tpu  # noqa: E402
from kmc_tpu.config import SimConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg() -> SimConfig:
    """A reduced system for fast tests: same physics, fewer molecules."""
    return SimConfig(n_a=24, n_b=8, cell_range_x=2000.0, cell_range_y=2000.0,
                     cell_range_z=600.0, out_every=50)


@pytest.fixture(scope="session")
def ref_cfg() -> SimConfig:
    """The reference default parameter set (main.cpp:39-99)."""
    return SimConfig()
