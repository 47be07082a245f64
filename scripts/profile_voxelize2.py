"""Parity-histogram dtype experiment: int32 vs uint8 accumulation.

Parity only needs mod-2, and mod-256 arithmetic preserves mod-2, so
the scatter-add histogram AND the reverse cumsum can run entirely in
uint8 — 4x less HBM traffic on the (HW, S+1) counts buffer. Verify
bit-equality and measure marginal cost on the chip.
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu import runtime

runtime.setup_jax_cache()

S, H, W = 120, 512, 512
hw = H * W

# synthetic keys with the bench profile: ~1M valid crossing keys
rng = np.random.default_rng(0)
N = 1 << 20
cols = rng.integers(0, hw, N)
ks = rng.integers(0, S, N)
keys_np = (cols * (S + 1) + ks).astype(np.int32)
keys_np[rng.random(N) < 0.15] = -1  # misses
keys = jnp.asarray(keys_np)


def parity_i32(keys):
    sent = jnp.int32(hw * (S + 1))
    k = jnp.where(keys < 0, sent, keys)
    counts = jnp.zeros(hw * (S + 1) + 1, jnp.int32).at[k].add(1)
    per_col = counts[: hw * (S + 1)].reshape(hw, S + 1)
    suffix = jnp.cumsum(per_col[:, ::-1], axis=1)[:, ::-1]
    mask = (suffix[:, :S] & 1).astype(jnp.uint8)
    return mask.T.reshape(S, H, W)


def parity_u8(keys):
    sent = jnp.int32(hw * (S + 1))
    k = jnp.where(keys < 0, sent, keys)
    counts = jnp.zeros(hw * (S + 1) + 1, jnp.uint8).at[k].add(
        jnp.uint8(1))
    per_col = counts[: hw * (S + 1)].reshape(hw, S + 1)
    suffix = jnp.cumsum(per_col[:, ::-1], axis=1,
                        dtype=jnp.uint8)[:, ::-1]
    mask = suffix[:, :S] & 1
    return mask.T.reshape(S, H, W)


def parity_u16(keys):
    sent = jnp.int32(hw * (S + 1))
    k = jnp.where(keys < 0, sent, keys)
    counts = jnp.zeros(hw * (S + 1) + 1, jnp.uint16).at[k].add(
        jnp.uint16(1))
    per_col = counts[: hw * (S + 1)].reshape(hw, S + 1)
    suffix = jnp.cumsum(per_col[:, ::-1], axis=1,
                        dtype=jnp.uint16)[:, ::-1]
    mask = (suffix[:, :S] & 1).astype(jnp.uint8)
    return mask.T.reshape(S, H, W)


ref = np.asarray(jax.jit(parity_i32)(keys))
for name, fn in (("u8", parity_u8), ("u16", parity_u16)):
    got = np.asarray(jax.jit(fn)(keys))
    print(f"{name} equal: {bool((got == ref).all())}", flush=True)


def marginal(fn, label):
    @partial(jax.jit, static_argnames=("reps",))
    def scan(k0, reps):
        def body(acc, i):
            kk = jnp.where(k0 >= 0, k0 ^ (i & 1), k0)
            m = fn(kk)
            return acc + jnp.sum(m, dtype=jnp.int32), 0

        acc, _ = jax.lax.scan(body, jnp.int32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    for reps in (2, 8):
        float(scan(keys, reps))
    t = {}
    for reps in (2, 8):
        t0 = time.perf_counter()
        float(scan(keys, reps))
        t[reps] = time.perf_counter() - t0
    print(f"{label}_marginal_ms {(t[8]-t[2])/6*1e3:.2f}", flush=True)


marginal(parity_i32, "i32")
marginal(parity_u8, "u8")
marginal(parity_u16, "u16")
