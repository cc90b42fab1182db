"""Test configuration.

All tests run on CPU with a virtual 8-device mesh so multi-chip sharding
logic is exercised without TPU hardware (the idiomatic JAX fake backend;
the reference has no distributed tests at all — see SURVEY.md §4).
These env vars must be set before jax initializes its backends, which is
why they live at the top of conftest rather than in a fixture.
"""

import os

# Force-override: the shell environment pins JAX_PLATFORMS=axon (TPU), but
# the unit suite must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# If a pytest plugin imported jax before this conftest ran, the env var is
# already baked into jax.config — update it explicitly as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    # Reference seeds every test with 42 (tests/conftest.py:1-29).
    np.random.seed(42)
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
