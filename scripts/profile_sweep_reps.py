"""Is the B=64 sweep decline real device cost or estimator artifact?

Measures the int16 chunk=auto preprocess marginal at B=64 with
reps_hi in {6, 14, 52, 102} (bench used 800//B+2 = 14), plus B=8 at
102 for reference. If us/series falls as reps grow, the 'decline' is
loop-amortization noise in the estimator, not HBM physics.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from medicalimageanalysis_tpu import runtime

runtime.setup_jax_cache()

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu.parallel.batch import make_preprocess_fn

N_SLICES, SIZE = 40, 256
OUT_SHAPE = (40, 128, 128)

rng = np.random.default_rng(0)
batch8 = rng.integers(0, 3000, (8, N_SLICES, SIZE, SIZE)).astype(
    np.int16)


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure(B, reps_hi, reps_lo=2):
    big = np.concatenate([batch8] * (B // 8))[:B]
    bd = jax.device_put(big)
    ones = jax.device_put(np.ones(B, np.float32))
    zeros = jax.device_put(np.zeros(B, np.float32))
    pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                             ffs_op="none")

    def make_loop(reps):
        @jax.jit
        def loop(raw, sl, ic):
            def body(i, acc):
                out = pre(raw, sl + (i % 2).astype(sl.dtype), ic)
                return acc + jnp.sum(out[0]) + jnp.sum(out[1])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return loop

    t = {}
    for r in (reps_lo, reps_hi):
        lp = make_loop(r)
        pull(lp(bd, ones, zeros))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pull(lp(bd, ones, zeros))
            best = min(best, time.perf_counter() - t0)
        t[r] = best
    per_rep = max((t[reps_hi] - t[reps_lo]) / (reps_hi - reps_lo),
                  1e-9)
    return per_rep / B * 1e6, t


us, t = measure(8, 102)
print(f"B= 8 reps 2->102: {us:6.1f} us/series  "
      f"(t2={t[2]*1e3:.1f} ms t102={t[102]*1e3:.1f} ms)", flush=True)
for reps_hi in (6, 14, 52, 102):
    us, t = measure(64, reps_hi)
    print(f"B=64 reps 2->{reps_hi:3d}: {us:6.1f} us/series  "
          f"(t2={t[2]*1e3:.1f} ms thi={t[reps_hi]*1e3:.1f} ms)",
          flush=True)
