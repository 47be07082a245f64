"""Does sub-batch chunking restore B=8-class per-series cost at B=64?

Hypothesis from profile_batch_sweep.py: at B=8 the preprocess runs
ABOVE the HBM roofline (VMEM-resident fusion of the separable
einsums); at B=64 XLA materializes intermediates in HBM and lands on
the ~700 GB/s roofline (16 -> 40 us/series). If so, lax.map over
sub-batches of c inside ONE program should hold the B=8 figure flat.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu import runtime
from medicalimageanalysis_tpu.parallel.batch import make_preprocess_fn

runtime.setup_jax_cache()

N_SLICES, SIZE = 40, 256
OUT_SHAPE = (N_SLICES, SIZE // 2, SIZE // 2)
B = int(os.environ.get("CHUNK_B", 64))

pre = make_preprocess_fn((N_SLICES, SIZE, SIZE), OUT_SHAPE, ffs_op="none")
rng = np.random.default_rng(0)

raw = rng.integers(0, 3000, size=(B, N_SLICES, SIZE, SIZE)).astype(np.int16)
bd = jax.device_put(raw)
ones = jax.device_put(np.ones(B, np.float32))
zeros = jax.device_put(np.zeros(B, np.float32))


def probe(chunk, reps_lo, reps_hi):
    n_chunks = B // chunk

    def make_loop(reps):
        @jax.jit
        def loop(raw, sl, ic):
            def body(i, acc):
                slp = sl + (i % 2).astype(sl.dtype)
                rc = raw.reshape(n_chunks, chunk, *raw.shape[1:])
                sc = slp.reshape(n_chunks, chunk)
                icc = ic.reshape(n_chunks, chunk)
                outs = jax.lax.map(
                    lambda t: jax.tree_util.tree_map(
                        jnp.sum, pre(t[0], t[1], t[2])),
                    (rc, sc, icc))
                return acc + outs[0].sum() + outs[1].sum()
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return loop

    t = {}
    for reps in (reps_lo, reps_hi):
        lp = make_loop(reps)
        float(lp(bd, ones, zeros))
        t0 = time.perf_counter()
        float(lp(bd, ones, zeros))
        t[reps] = time.perf_counter() - t0
    per_rep = (t[reps_hi] - t[reps_lo]) / (reps_hi - reps_lo)
    us_per_series = per_rep / B * 1e6
    print(f"B={B} chunk={chunk:3d} per_rep={per_rep*1e3:7.2f}ms "
          f"{us_per_series:6.1f} us/series ({B/per_rep:9.0f} series/s)",
          flush=True)


cfg = os.environ.get("CHUNK_PROBE", "64,16,8,4")
for chunk in (int(c) for c in cfg.split(",")):
    if not (0 < chunk <= B and B % chunk == 0):
        print(f"chunk={chunk}: skipped (not a divisor of B={B})",
              flush=True)
        continue
    probe(chunk, 2, max(25, 1600 // B))
