"""Test configuration: force an 8-virtual-device CPU platform.

Tests never touch the real TPU: the axon plugin forces JAX_PLATFORMS=axon at
interpreter start, so we override via jax.config *before* backends
initialize. 8 host devices let the sharding/collective tests exercise the
data-parallel mesh exactly as SURVEY.md §4 prescribes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
