"""Constant-window streaming sweep: pool = 4*B for every B.

The round-5 probes showed the apparent B-dependence of the streaming
sweep is harness structure, not pipeline scaling:

  - fixed 128-pool, windows = 128/B (profile_sweep_bodysum_r5.py):
    B=8 24.4, B=32 36.2, B=64 37.8, B=128 20.8 us/series — the
    FASTEST point is the largest batch, and the slow middle is where
    the scan-over-windows nesting is deepest.
  - loop-invariant B-batch (profile_sweep_reps.py): B=8 8.9 us/series
    because XLA keeps the 42 MB input VMEM-resident across reps —
    not a regime any one-pass cohort ever sees.

Here every B runs the SAME program shape — lax.scan over exactly 4
windows of B series, chunk-4 lax.map inside, reduction inside the
chunk body — and the pool (4B >= 134 MB for B >= 8... actually
4*8*5.24 MB = 168 MB at B=8) always exceeds VMEM, forcing the
streaming regime uniformly. If this is flat across B, the bench
sweep adopts it and VERDICT r4 #2 closes as measured-uniform.
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
NWIN = 4
CH = 4

rng = np.random.default_rng(0)


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure(B, reps_hi=12):
    pool_n = NWIN * B
    pool = rng.integers(0, 3000,
                        (pool_n, N_SLICES, SIZE, SIZE)).astype(np.int16)
    pd = jax.device_put(pool)
    pd.block_until_ready()
    ones = jax.device_put(np.ones(CH, np.float32))
    zeros = jax.device_put(np.zeros(CH, np.float32))
    pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                             ffs_op="none", chunk=None)

    def make_loop(reps):
        @jax.jit
        def loop(p, sl, ic):
            pw = p.reshape(NWIN, B // CH, CH, N_SLICES, SIZE, SIZE)

            def body(i, acc):
                sli = sl + (i % 2).astype(sl.dtype)

                def win(a, w):
                    def ch(a2, c):
                        out = pre(c, sli, ic)
                        return (a2 + jnp.sum(out[0])
                                + jnp.sum(out[1])), None
                    a3, _ = jax.lax.scan(ch, a, w)
                    return a3, None
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
    del pd
    return per_rep / pool_n * 1e6


for B in (8, 16, 32, 64):
    us = measure(B)
    print(f"B={B:3d} const-win streaming: {us:6.1f} us/series "
          f"({1e6 / us:,.0f} series/s)", flush=True)
