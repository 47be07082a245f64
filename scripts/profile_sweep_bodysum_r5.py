"""Sweep-decline bisect: is the residual B-dependence the harness's
OWN reduction, not the pipeline?

The pool-streaming sweep still declines 23->41 us/series (B=8->64)
even though every B does identical chunk-4 work over the same 671 MB
pool. Hypothesis: `jnp.sum(out[0])` over the lax.map-stacked output
fuses into the loop at small B (vols 21 MB stays VMEM-resident) but
at B=64 the (64,40,128,128) f32 stack (167 MB) must round-trip HBM
before the sum reads it back.

Variant A (status quo): reduction outside pre(), chunk='auto'.
Variant B: chunk map in the harness, reduction INSIDE each chunk
body — nothing batch-sized ever materializes, uniform at every B.
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
CH = 4

rng = np.random.default_rng(0)
pool = rng.integers(0, 3000, (POOL_N, N_SLICES, SIZE, SIZE)).astype(
    np.int16)
pd = jax.device_put(pool)
pd.block_until_ready()

pre_flat = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                              ffs_op="none", chunk=None)


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure(B, reps_hi=12):
    nwin = POOL_N // B
    ones = jax.device_put(np.ones(B, np.float32))
    zeros = jax.device_put(np.zeros(B, np.float32))

    def make_loop(reps):
        @jax.jit
        def loop(p, sl, ic):
            pw = p.reshape(nwin, B // CH, CH, N_SLICES, SIZE, SIZE)
            slw = sl.reshape(B // CH, CH)
            icw = ic.reshape(B // CH, CH)

            def body(i, acc):
                slp = slw + (i % 2).astype(slw.dtype)

                def win(a, w):
                    def chunkbody(t):
                        out = pre_flat(t[0], t[1], t[2])
                        return (jnp.sum(out[0])
                                + jnp.sum(out[1].astype(jnp.float32)))
                    s = jax.lax.map(chunkbody, (w, slp, icw))
                    return a + jnp.sum(s), None
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


for B in (8, 16, 32, 64, 128):
    us, sps = measure(B)
    print(f"B={B:3d} body-sum streaming: {us:6.1f} us/series "
          f"({sps:,.0f} series/s)", flush=True)
