"""Test harness config: force an 8-virtual-device CPU platform.

Multi-device sharding tests run on a simulated mesh
(`--xla_force_host_platform_device_count=8`), the JAX-native replacement for a
fake distributed backend (SURVEY.md §4). The environment pins
JAX_PLATFORMS=axon,cpu, so platform selection must happen through
jax.config before any backend is initialised.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
