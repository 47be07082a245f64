import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# paths are exercised without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
