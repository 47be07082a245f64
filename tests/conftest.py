import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# paths are exercised without TPU hardware. The axon sitecustomize pins
# JAX_PLATFORMS=axon at interpreter start, so the env var alone is not
# enough — override through jax.config before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from medicalimageanalysis_tpu.data import Data


@pytest.fixture(autouse=True)
def clear_registry():
    Data.clear()
    yield
    Data.clear()


@pytest.fixture
def rng():
    return np.random.default_rng(seed=1234)
