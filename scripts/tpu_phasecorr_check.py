"""On-chip validation of the FFT phase-correlation initializer
(device rfftn/irfftn path). Serialized: one TPU process at a time.

    python -u scripts/tpu_phasecorr_check.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

from medicalimageanalysis_tpu import runtime  # noqa: E402

runtime.setup_jax_cache()

from medicalimageanalysis_tpu.ops.filters import gaussian_filter  # noqa: E402
from medicalimageanalysis_tpu.ops.registration.phase_correlation import (  # noqa: E402
    phase_correlation)

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
fixed = np.asarray(gaussian_filter(
    rng.normal(0, 100, (64, 128, 128)).astype(np.float32), 2.0))
moving = np.roll(fixed, (9, -17, 23), axis=(0, 1, 2))
t0 = time.time()
shift, resp = phase_correlation(fixed, moving)
t1 = time.time()
print("shift:", shift, "resp:", round(resp, 4),
      "first-call s:", round(t1 - t0, 2), flush=True)
ok = np.allclose(shift, (9, -17, 23), atol=0.05)
t0 = time.time()
s2, _ = phase_correlation(fixed + 0.001, moving)
t1 = time.time()
print("second-call s:", round(t1 - t0, 3), "shift2:", s2, flush=True)
ok = ok and np.allclose(s2, (9, -17, 23), atol=0.1)
print("PHASECORR_TPU_OK" if ok else "PHASECORR_TPU_FAIL", flush=True)
