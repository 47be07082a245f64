"""B=64 preprocess: can scan-unroll overlap the chunk DMA with compute?

At B=64 the resident int16 batch (335 MB) streams from HBM each rep
and the lax.map chunk loop serializes DMA with einsum compute
(~212 GB/s effective, scripts/profile_sweep_reps.py). lax.scan with
unroll=k exposes k chunk bodies to XLA's scheduler, which can overlap
chunk i+1's input DMA with chunk i's MXU work.

Sweeps chunk x unroll at B=64, reps 2->102.
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

from medicalimageanalysis_tpu.ops.filters import _gauss_kernel_matrix
from medicalimageanalysis_tpu.ops.resample import _interp_matrix

N_SLICES, SIZE = 40, 256
OUT_SHAPE = (40, 128, 128)
B = 64

rng = np.random.default_rng(0)
big = np.concatenate(
    [rng.integers(0, 3000, (8, N_SLICES, SIZE, SIZE)).astype(np.int16)]
    * (B // 8))
bd = jax.device_put(big)
ones = jax.device_put(np.ones(B, np.float32))
zeros = jax.device_put(np.zeros(B, np.float32))

Z, Y, X = N_SLICES, SIZE, SIZE
oz, oy, ox = OUT_SHAPE
mz = jnp.asarray(_interp_matrix(oz, Z, Z / oz))
my = jnp.asarray(_interp_matrix(oy, Y, Y / oy))
mx = jnp.asarray(_interp_matrix(ox, X, X / ox))
gz = jnp.asarray(_gauss_kernel_matrix(oz, 1.0))
gy = jnp.asarray(_gauss_kernel_matrix(oy, 1.0))
gx = jnp.asarray(_gauss_kernel_matrix(ox, 1.0))


def _flat(raw, slope, intercept):
    vol = raw.astype(jnp.float32) * slope[:, None, None, None] \
        + intercept[:, None, None, None]
    out = jnp.einsum("ij,bjyx->biyx", mz, vol,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("kj,bzjx->bzkx", my, out,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("lj,bzyj->bzyl", mx, out,
                     preferred_element_type=jnp.float32)
    blurred = jnp.einsum("ij,bjyx->biyx", gz, out,
                         preferred_element_type=jnp.float32)
    blurred = jnp.einsum("kj,bzjx->bzkx", gy, blurred,
                         preferred_element_type=jnp.float32)
    blurred = jnp.einsum("lj,bzyj->bzyl", gx, blurred,
                         preferred_element_type=jnp.float32)
    mask = (blurred > -250.0).astype(jnp.uint8)
    return out, mask


def make_step(chunk, unroll):
    def step(raw, slope, intercept):
        if chunk is None:
            return _flat(raw, slope, intercept)
        n = B // chunk
        xs = (raw.reshape(n, chunk, Z, Y, X),
              slope.reshape(n, chunk), intercept.reshape(n, chunk))
        if unroll == "map":
            vols, masks = jax.lax.map(lambda t: _flat(*t), xs)
        else:
            def body(carry, t):
                return carry, _flat(*t)
            _, (vols, masks) = jax.lax.scan(body, 0, xs,
                                            unroll=unroll)
        return (vols.reshape(B, oz, oy, ox),
                masks.reshape(B, oz, oy, ox))
    return step


def pull(x):
    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def measure(step):
    def make_loop(reps):
        @jax.jit
        def loop(raw, sl, ic):
            def body(i, acc):
                out = step(raw, sl + (i % 2).astype(sl.dtype), ic)
                return acc + jnp.sum(out[0]) + jnp.sum(out[1])
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return loop

    t = {}
    for r in (2, 102):
        lp = make_loop(r)
        pull(lp(bd, ones, zeros))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pull(lp(bd, ones, zeros))
            best = min(best, time.perf_counter() - t0)
        t[r] = best
    return max((t[102] - t[2]) / 100.0, 1e-9) / B * 1e6


for chunk, unroll in ((4, "map"), (4, 1), (4, 2), (4, 4),
                      (8, 2), (8, 4), (2, 4), (16, 2)):
    us = measure(make_step(chunk, unroll))
    print(f"B=64 chunk={chunk:2d} unroll={str(unroll):3s}: "
          f"{us:6.1f} us/series ({1e6/us:.0f} series/s)", flush=True)
