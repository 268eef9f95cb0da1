"""Test configuration: force a pure-CPU JAX backend with an 8-device virtual
mesh so sharding tests run without TPU hardware (the driver validates the
multi-chip path the same way via __graft_entry__.dryrun_multichip).

Note: this environment ships an `axon` PJRT plugin registered from
sitecustomize that routes to a remote TPU and overrides JAX_PLATFORMS from
the environment; `jax.config.update` before first backend use wins over it.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
