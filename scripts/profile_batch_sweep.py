"""Why does the bench B-sweep decline? (75.8k -> 24.8k series/s, B=8->64)

Probes the marginal preprocess cost at B = 8/16/32/64 with two
CSE-blocking perturbations:
  A. raw + (i % 2)        — the bench's current form: a full int16
                            batch-sized elementwise add per iteration
                            (335 MB intermediate at B=64 if XLA ever
                            materializes it)
  B. sl + (i % 2)         — perturb the f32 rescale slope instead:
                            B floats, zero extra HBM traffic
and enough reps that the timing delta is >= 200 ms.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu import runtime
from medicalimageanalysis_tpu.parallel.batch import make_preprocess_fn

runtime.setup_jax_cache()

N_SLICES, SIZE = 40, 256
OUT_SHAPE = (N_SLICES, SIZE // 2, SIZE // 2)

pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE, ffs_op="none")
rng = np.random.default_rng(0)


def probe(B, variant, reps_lo, reps_hi):
    raw = rng.integers(0, 3000, size=(B, N_SLICES, SIZE, SIZE)
                       ).astype(np.int16)
    bd = jax.device_put(raw)
    ones = jax.device_put(np.ones(B, np.float32))
    zeros = jax.device_put(np.zeros(B, np.float32))

    def make_loop(reps):
        @jax.jit
        def loop(raw, sl, ic):
            def body(i, acc):
                if variant == "raw":
                    out = pre(raw + (i % 2).astype(raw.dtype), sl, ic)
                else:
                    out = pre(raw, sl + (i % 2).astype(sl.dtype), ic)
                return acc + jnp.sum(out[0]) + jnp.sum(out[1])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return loop

    t = {}
    for reps in (reps_lo, reps_hi):
        lp = make_loop(reps)
        float(lp(bd, ones, zeros))          # compile + warm
        t0 = time.perf_counter()
        float(lp(bd, ones, zeros))
        t[reps] = time.perf_counter() - t0
    per_rep = (t[reps_hi] - t[reps_lo]) / (reps_hi - reps_lo)
    us_per_series = per_rep / B * 1e6
    print(f"B={B:3d} {variant:4s} reps=({reps_lo},{reps_hi}) "
          f"t_lo={t[reps_lo]*1e3:8.1f}ms t_hi={t[reps_hi]*1e3:8.1f}ms "
          f"per_rep={per_rep*1e3:7.2f}ms  {us_per_series:6.1f} us/series "
          f"({B/per_rep:9.0f} series/s)", flush=True)
    del bd


for B in (8, 16, 32, 64):
    # reps sized so delta >= ~100 reps' worth of work at B=8 scale
    hi = max(10, 1600 // B)
    for variant in ("raw", "sl"):
        probe(B, variant, 2, hi)
