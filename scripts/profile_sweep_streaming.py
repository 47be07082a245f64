"""Streaming-regime sweep: does the B=8 advantage vanish when every
iteration reads FRESH series from HBM (like a real cohort pass)?

The bench's marginal loop re-reads the SAME resident batch each rep;
at B<=32 XLA can keep that loop-invariant input VMEM/cache-resident,
flattering small B. Here each rep dynamic-slices a different window
of a 640 MB resident pool, so every B streams from HBM equally.
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
POOL = 128   # pool series count: 128 * 5.24 MB = 671 MB resident

rng = np.random.default_rng(0)
pool = rng.integers(0, 3000, (POOL, N_SLICES, SIZE, SIZE)).astype(
    np.int16)
pd = jax.device_put(pool)


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure(B, reps_hi=102):
    ones = jax.device_put(np.ones(B, np.float32))
    zeros = jax.device_put(np.zeros(B, np.float32))
    pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                             ffs_op="none")
    nwin = POOL // B

    def make_loop(reps):
        @jax.jit
        def loop(p, sl, ic):
            def body(i, acc):
                raw = jax.lax.dynamic_slice(
                    p, ((i % nwin) * B, 0, 0, 0),
                    (B, N_SLICES, SIZE, SIZE))
                out = pre(raw, sl + (i % 2).astype(sl.dtype), ic)
                return acc + jnp.sum(out[0]) + jnp.sum(out[1])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return loop

    t = {}
    for r in (2, reps_hi):
        lp = make_loop(r)
        pull(lp(pd, ones, zeros))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pull(lp(pd, ones, zeros))
            best = min(best, time.perf_counter() - t0)
        t[r] = best
    return max((t[reps_hi] - t[2]) / (reps_hi - 2), 1e-9) / B * 1e6


for B in (8, 16, 32, 64):
    us = measure(B)
    print(f"B={B:3d} streaming: {us:6.1f} us/series "
          f"({1e6/us:.0f} series/s)", flush=True)
