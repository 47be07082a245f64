"""Validate the reformed (round-5) bench batch sweep on the chip.

Replicates bench.py's streaming-128-pool sweep exactly: every B
measures a full pass over the SAME 128-series device-resident pool
(128/B sequential B-batch bodies inside one program), so all B pay
identical HBM streaming. Reports series/s per B plus the per-series
microseconds, and an ideal-overlap reference (chunk DMA hidden under
compute) from a compute-only variant that reuses one window.
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
POOL_N = 128

rng = np.random.default_rng(0)
pool = rng.integers(0, 3000, (POOL_N, N_SLICES, SIZE, SIZE)).astype(
    np.int16)
pd = jax.device_put(pool)
pd.block_until_ready()


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure(B, reps_hi=12):
    nwin = POOL_N // B
    ones = jax.device_put(np.ones(B, np.float32))
    zeros = jax.device_put(np.zeros(B, np.float32))
    pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                             ffs_op="none")

    def make_loop(reps):
        @jax.jit
        def loop(p, sl, ic):
            pw = p.reshape(nwin, B, N_SLICES, SIZE, SIZE)

            def body(i, acc):
                def win(a, w):
                    out = pre(w, sl + (i % 2).astype(sl.dtype), ic)
                    return (a + jnp.sum(out[0])
                            + jnp.sum(out[1])), None
                a2, _ = jax.lax.scan(win, acc, pw)
                return a2
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
    per_rep = max((t[reps_hi] - t[2]) / (reps_hi - 2), 1e-9)
    us = per_rep / POOL_N * 1e6
    return us, POOL_N / per_rep


for B in (8, 16, 32, 64):
    us, sps = measure(B)
    print(f"B={B:3d} pool-streaming: {us:6.1f} us/series "
          f"({sps:,.0f} series/s)", flush=True)
