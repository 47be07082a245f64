"""Ablation profile of the demons / invert_dvf iteration cost.

Round-3 question (CLAUDE.md): demons per-iteration ~39 ms @128^3 B=4 is
~2x the raw kernel rate; invert_dvf ~4x (83 ms/iter B=3). Where does
the fori_loop body lose it — transposes, coordinate adds, smoothing?

Each case runs ITERS iterations inside ONE jitted fori_loop, so the
tunnel RPC floor is amortized; report ms/iter. Run on the TPU
(serialize with other tunnel jobs!).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from medicalimageanalysis_tpu import runtime

runtime.setup_jax_cache()

SHAPE = (128, 128, 128)
ITERS = 20


def pull(x):
    # block_until_ready can return early through the axon relay
    # (docs/PERF.md); a 1-element host pull forces completion
    float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(name, fn, *args):
    pull(fn(*args))
    t0 = time.perf_counter()
    out = fn(*args)
    pull(out)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{name:46s} {dt:8.1f} ms  ({dt / ITERS:6.2f} ms/iter)")
    return dt


def main():
    from medicalimageanalysis_tpu.ops.pallas_warp import warp_jit
    from medicalimageanalysis_tpu.ops.registration.dvf import _base_coords
    from medicalimageanalysis_tpu.ops.registration.demons import (
        _smooth_field)
    from medicalimageanalysis_tpu.ops.filters import _gauss_kernel_matrix

    print(f"backend={jax.default_backend()} shape={SHAPE} iters={ITERS}")
    rng = np.random.default_rng(0)
    Z, Y, X = SHAPE
    vol4 = jnp.asarray(rng.normal(size=(4,) + SHAPE).astype(np.float32))
    vol3 = vol4[:3]
    u_last = jnp.asarray(
        rng.normal(scale=0.5, size=SHAPE + (3,)).astype(np.float32))
    u_plan = jnp.moveaxis(u_last, -1, 0)
    Xg, Yg, Zg = _base_coords(SHAPE)

    # 1. raw kernel, fixed coords (no per-iter coord math), B=4
    @jax.jit
    def raw_fixed(v, cz, cy, cx):
        def body(_, acc):
            return acc + warp_jit(v, cz, cy, cx, 0.0)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros_like(v))
    timeit("raw warp B=4, fixed coords", raw_fixed, vol4,
           Zg + 0.3, Yg + 0.2, Xg + 0.1)

    # 2. + coordinate adds from channel-LAST field each iter
    @jax.jit
    def coords_last(v, u):
        def body(_, acc):
            w = warp_jit(v, Zg + u[..., 2], Yg + u[..., 1],
                         Xg + u[..., 0], 0.0)
            return acc + w
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(v))
    timeit("+ coord adds (channel-last u)", coords_last, vol4, u_last)

    # 3. + coordinate adds from PLANAR field each iter
    @jax.jit
    def coords_planar(v, u):
        def body(_, acc):
            w = warp_jit(v, Zg + u[2], Yg + u[1], Xg + u[0], 0.0)
            return acc + w
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros_like(v))
    timeit("+ coord adds (planar u)", coords_planar, vol4, u_plan)

    # 4. invert-style body, channel-last (current _invert)
    @jax.jit
    def invert_last(fb, u):
        def body(_, v):
            out = warp_jit(fb, Zg + v[..., 2], Yg + v[..., 1],
                           Xg + v[..., 0], 0.0)
            return -jnp.moveaxis(out, 0, -1)
        return jax.lax.fori_loop(0, ITERS, body, jnp.moveaxis(u, 0, -1))
    timeit("invert body channel-last (moveaxis/iter)", invert_last,
           vol3, u_plan)

    # 5. invert-style body, planar (no transposes)
    @jax.jit
    def invert_planar(fb, v0):
        def body(_, v):
            out = warp_jit(fb, Zg + v[2], Yg + v[1], Xg + v[0], 0.0)
            return -out
        return jax.lax.fori_loop(0, ITERS, body, v0)
    timeit("invert body planar", invert_planar, vol3, -u_plan)

    # 6. smoothing alone, channel-last (per-channel einsums)
    mz = jnp.asarray(_gauss_kernel_matrix(Z, 1.0))
    my = jnp.asarray(_gauss_kernel_matrix(Y, 1.0))
    mx = jnp.asarray(_gauss_kernel_matrix(X, 1.0))

    @jax.jit
    def smooth_last(u):
        def one(uu, c):
            o = jnp.einsum("ij,jyx->iyx", mz, uu[..., c],
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("kj,zjx->zkx", my, o,
                           preferred_element_type=jnp.float32)
            return jnp.einsum("lj,zyj->zyl", mx, o,
                              preferred_element_type=jnp.float32)

        def body(_, uu):
            # chain the CARRY so the loop body is not loop-invariant
            return jnp.stack([one(uu, 0), one(uu, 1), one(uu, 2)],
                             axis=-1)
        return jax.lax.fori_loop(0, ITERS, body, u)
    timeit("smooth alone (channel-last)", smooth_last, u_last)

    # 7. smoothing alone, planar batched (the shipped _smooth_field)
    @jax.jit
    def smooth_planar(u):
        def body(_, uu):
            return _smooth_field(uu, mz, my, mx)
        return jax.lax.fori_loop(0, ITERS, body, u)
    timeit("smooth alone (planar batched)", smooth_planar, u_plan)

    # 8. full current demons fast body via public API
    from medicalimageanalysis_tpu.ops.registration.demons import (
        demons_registration)
    fixed = np.asarray(vol4[0])
    moving = np.asarray(vol4[1])
    t0 = time.perf_counter()
    demons_registration(fixed, moving, method="fast", iterations=ITERS)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    demons_registration(fixed, moving, method="fast", iterations=ITERS)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"{'full fast demons (public, incl transfers)':46s} "
          f"{dt:8.1f} ms  ({dt / ITERS:6.2f} ms/iter)  first={warm:.1f}s")


if __name__ == "__main__":
    main()
