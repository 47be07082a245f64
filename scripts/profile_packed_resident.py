"""Round-5 VERDICT #2 probe: does a 12-bit-packed HBM-resident cohort
close the B=64 preprocess sweep decline?

Measures marginal us/series at B in {8, 64} for:
  - int16 resident (round-4 status quo), chunk auto(4)
  - packed uint32 resident, chunk in {4, 8, None}
using the bench's own marginal discipline (fori_loop reps, slope
perturbation, full-output reduction, forced pull).
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
from medicalimageanalysis_tpu.ops.bitpack import (pack12,
                                                  unpack12_device)

N_SLICES, SIZE = 40, 256
OUT_SHAPE = (40, 128, 128)          # bench's OUT_SHAPE

rng = np.random.default_rng(0)
batch8 = rng.integers(0, 3000, (8, N_SLICES, SIZE, SIZE)).astype(
    np.int16)


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def marginal_us_per_series(step_fn, args, B, reps_hi):
    def make_loop(reps):
        @jax.jit
        def loop(raw, sl, ic):
            def body(i, acc):
                out = step_fn(raw, sl + (i % 2).astype(sl.dtype), ic)
                return acc + jnp.sum(out[0]) + jnp.sum(out[1])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return loop

    t = {}
    for r in (2, reps_hi):
        lp = make_loop(r)
        pull(lp(*args))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pull(lp(*args))
            best = min(best, time.perf_counter() - t0)
        t[r] = best
    per_rep = max((t[reps_hi] - t[2]) / (reps_hi - 2), 1e-9)
    return per_rep / B * 1e6


for B in (8, 64):
    big = np.concatenate([batch8] * (B // 8))[:B]
    reps_hi = max(14, 800 // B + 2)
    bd = jax.device_put(big)
    ones = jax.device_put(np.ones(B, np.float32))
    zeros = jax.device_put(np.zeros(B, np.float32))

    pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                             ffs_op="none")
    us = marginal_us_per_series(pre, (bd, ones, zeros), B, reps_hi)
    print(f"B={B:3d} int16 chunk=auto : {us:7.1f} us/series "
          f"({1e6/us*1:.0f}/s... {B/(us*B/1e6):.0f} series/s)",
          flush=True)

    words, lo, tail = pack12(big)
    wd = jax.device_put(words)
    # lo folds into the intercept: value = (u + lo)*slope + intercept
    zeros_lo = jax.device_put(np.full(B, lo, np.float32))
    del big
    for chunk in (4, 8, None):
        pre_p = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE,
                                   ffs_op="none", chunk=chunk,
                                   packed=True)
        us = marginal_us_per_series(pre_p, (wd, ones, zeros_lo),
                                    B, reps_hi)
        print(f"B={B:3d} packed chunk={str(chunk):4s}: {us:7.1f} "
              f"us/series ({1e6/us:.0f} series/s)", flush=True)
