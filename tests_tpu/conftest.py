"""Hardware re-certification lane (VERDICT r4 #4).

The main suite (tests/) forces an 8-device CPU mesh, which is blind to
the hardware-only Pallas composition failures round 2 shipped
(shard_map vma validation, vmapped ANY-space operands). This lane runs
on the REAL chip — the axon sitecustomize pins JAX_PLATFORMS=axon, so
plain `python -m pytest tests_tpu -q` (equivalently `-m tpu`) claims
the tunneled TPU. Every test auto-carries the `tpu` marker and the
whole lane skips cleanly when no accelerator is attached.

Serialize with anything else touching the chip (bench.py,
__graft_entry__.py): two concurrent processes deadlock on the tunnel
claim (CLAUDE.md operational rules).
"""

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires real TPU hardware (tunneled chip)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session")
def tpu_backend():
    import jax
    backend = jax.default_backend()
    if backend not in ("tpu",):
        pytest.skip(f"no TPU attached (backend={backend}); the "
                    "hardware lane only certifies the real chip")
    from medicalimageanalysis_tpu import runtime
    runtime.setup_jax_cache()
    return backend


@pytest.fixture
def rng():
    return np.random.default_rng(seed=20260820)
