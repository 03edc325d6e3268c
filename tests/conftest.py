"""Test config: force CPU with 8 virtual devices.

SURVEY.md §4: multi-device tests run on a simulated mesh. NOTE: this image's
sitecustomize imports jax at interpreter startup (axon TPU plugin), so env
vars are too late here — use jax.config, which takes effect before the lazily
initialized backends are created.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
