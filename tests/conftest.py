"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices so every sharding
test runs a real 8-way Mesh without TPU hardware (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

NOTE: in this environment the ``jax`` module may already be imported when
conftest runs, so JAX_PLATFORMS in os.environ is too late — we must go
through jax.config.update. XLA_FLAGS is still read at (lazy) backend
initialization, which has not happened yet at conftest time.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(20260817)
