"""Test configuration: force CPU backend with 8 virtual devices.

Tests never touch the real TPU (slow tunnel init); multi-chip sharding is
validated on a simulated 8-device CPU mesh, per SURVEY.md §4's test plan.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via jax.config at
# interpreter start (config beats the env var), so override the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
