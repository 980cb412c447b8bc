"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding tests run against a fake 8-device CPU mesh; real-TPU
benchmarking lives in ``bench.py``, not in the test suite.

Note: in this environment the axon TPU plugin overrides ``JAX_PLATFORMS`` env
vars, so we must use ``jax.config.update`` before the backend initializes.
``import torch`` is done here, before JAX's backend spins up, to avoid a
runtime-library init deadlock between the two frameworks.
"""

import torch  # noqa: F401  (import order: torch before jax backend init)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
