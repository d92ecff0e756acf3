"""Test configuration: force CPU with 8 virtual devices so sharding/collective
tests run without TPU hardware (SURVEY §4: the TPU-native analogue of a fake
backend).

NOTE: this environment's sitecustomize imports jax at interpreter startup and
pins ``JAX_PLATFORMS=axon`` (TPU tunnel), so mutating ``os.environ`` here is
too late — ``jax.config.update`` is the reliable override as long as no
backend has been initialized yet.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
