"""Sub-batch-of-8 nesting probe: can B=64 buy B=8's per-series cost?

Across the round-5 probes the per-series streaming cost is NOT
monotone in B — it tracks program shape: B=8-shaped bodies measure
14.7-24 us/series while B=32/64-shaped bodies measure 36-38, and a
flat 32-chunk map (B=128) 20.8. Hypothesis: the inner scan length
over chunk-4 bodies is the lever, and a large batch expressed as
`scan over sub-batches of 8 (each an inner 2x4 chunk scan)` should
inherit the B=8 cost.

Every B here streams a 4-window pool (pool = 4B >= 168 MB, beyond
VMEM residency) with the reduction inside the chunk body, exactly
like profile_sweep_constwin_r5.py, but the window body is the nested
(sub8 -> 2 x chunk4) shape instead of a flat (B/4 x chunk4) scan.
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
SUB = 8

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
            pw = p.reshape(NWIN, B // SUB, SUB // CH, CH,
                           N_SLICES, SIZE, SIZE)

            def body(i, acc):
                sli = sl + (i % 2).astype(sl.dtype)

                def ch(a3, c):
                    out = pre(c, sli, ic)
                    return (a3 + jnp.sum(out[0])
                            + jnp.sum(out[1])), None

                def sub(a2, s):
                    a3, _ = jax.lax.scan(ch, a2, s)
                    return a3, None

                def win(a, w):
                    a2, _ = jax.lax.scan(sub, a, w)
                    return a2, None
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
    print(f"B={B:3d} sub8-nested streaming: {us:6.1f} us/series "
          f"({1e6 / us:,.0f} series/s)", flush=True)
