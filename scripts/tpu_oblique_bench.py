"""On-chip validation + marginal-cost bench of the oblique shear path.

Run alone (the tunnel serializes TPU jobs):  python -u scripts/tpu_oblique_bench.py

Methodology (CLAUDE.md): marginal cost from K vs 4K scanned warps inside
ONE program, counter-perturbed matrices so XLA cannot CSE, full-output
reduction so it cannot DCE; single-dispatch timings are ~90% relay RPC
floor through the tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial
from scipy.spatial.transform import Rotation

from medicalimageanalysis_tpu import runtime
runtime.setup_jax_cache()

from medicalimageanalysis_tpu.ops.pallas_warp import (
    affine_coords, affine_warp_oblique, field_warp_xla, oblique_plan,
    _oblique_call, _warp_call)
from medicalimageanalysis_tpu.ops.resample import _axis_align_input

SIZE = int(__import__("os").environ.get("MIA_OBL_SIZE", "256"))
rng = np.random.default_rng(0)
Z = Y = X = SIZE
vol = rng.normal(size=(Z, Y, X)).astype(np.float32)
volj = jnp.asarray(vol)


def mat(deg, axis):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    R = Rotation.from_rotvec(np.deg2rad(deg) * axis).as_matrix()
    A = np.eye(4)
    A[:3, :3] = R
    c = np.array([X / 2, Y / 2, Z / 2])
    A[:3, 3] = c - R @ c
    return A


# ---- exactness on hardware (small volume keeps the gather check fast)
sz, sy, sx = 64, 80, 96
svol = rng.normal(size=(sz, sy, sx)).astype(np.float32)
print("== hardware exactness ==", flush=True)
for deg, axis in [(45, (0, 0, 1)), (45, (1, 1, 1)), (60, (0, 0, 1)),
                  (33, (1, 2, 0.5))]:
    A = np.eye(4)
    R = Rotation.from_rotvec(
        np.deg2rad(deg) * np.asarray(axis, float)
        / np.linalg.norm(axis)).as_matrix()
    A[:3, :3] = R
    c = np.array([sx / 2, sy / 2, sz / 2])
    A[:3, 3] = c - R @ c
    al = _axis_align_input(A, svol.shape)
    if al is not None:
        perm, flips, A2 = al
        shp = tuple(svol.shape[p] for p in perm)
    else:
        perm, flips, A2 = None, (), A
        shp = svol.shape
    plan = oblique_plan(A2, shp)
    assert plan is not None, (deg, axis)
    out, ovf = affine_warp_oblique(svol, A2, 0.0, svol.shape, plan,
                                   perm=perm, flips=flips)
    cz, cy, cx = affine_coords(A, svol.shape)
    ref = np.asarray(field_warp_xla(svol, cz, cy, cx, 0.0))
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"  {deg} deg {axis}: ovf={float(ovf):.0f} maxerr={err:.3g}",
          flush=True)
    assert float(ovf) == 0.0 and err < 1e-4


# ---- marginal throughput at SIZE^3
def bench(fn, label):
    for K in (2, 8):   # compile BOTH K variants before timing
        jax.block_until_ready(fn(K))
    reps = {}
    for K in (2, 8):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(K))
        reps[K] = time.perf_counter() - t0
    marg = (reps[8] - reps[2]) / 6.0
    pts = Z * Y * X / marg / 1e6
    print(f"  {label}: {marg*1e3:.2f} ms/warp marginal "
          f"({pts:.1f} M pts/s)", flush=True)
    return marg


print(f"== marginal throughput @ {SIZE}^3 ==", flush=True)
A = mat(45, (0, 0, 1))
plan = oblique_plan(A, vol.shape)
print("  plan:", plan, flush=True)


@partial(jax.jit, static_argnames=("K",))
def obl_scan(K, volj=volj):
    kap = jnp.asarray([plan["ky"], plan["kz"], plan["oy"], plan["oz"]],
                      jnp.float32)
    A12 = jnp.asarray(A, jnp.float32)[:3, :].reshape(12)

    def body(acc, i):
        a = A12.at[3].add(jnp.float32(i) * 1e-3)  # defeat CSE
        out, ovf = _oblique_call(
            volj, a, kap, jnp.float32(0.0), (Z, Y, X),
            (plan["Z2"], plan["Y2"]), plan["window"], None, (), False)
        return acc + jnp.sum(out) + ovf, None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return acc


@partial(jax.jit, static_argnames=("K",))
def gather_scan(K, volj=volj):
    cz, cy, cx = affine_coords(A, (Z, Y, X))

    def body(acc, i):
        out = field_warp_xla(volj, cz + jnp.float32(i) * 1e-3, cy, cx,
                             0.0)
        return acc + jnp.sum(out), None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return acc


obl = bench(lambda K: obl_scan(K, volj), "oblique 45z shear-kernel")
gat = bench(lambda K: gather_scan(K, volj), "XLA gather twin")
print(f"  speedup: {gat/obl:.1f}x", flush=True)

# 3D-oblique case too
A3 = mat(45, (1, 1, 1))
plan3 = oblique_plan(A3, vol.shape)
print("  plan 45(1,1,1):", plan3, flush=True)


@partial(jax.jit, static_argnames=("K",))
def obl3_scan(K, volj=volj):
    kap = jnp.asarray([plan3["ky"], plan3["kz"], plan3["oy"],
                       plan3["oz"]], jnp.float32)
    A12 = jnp.asarray(A3, jnp.float32)[:3, :].reshape(12)

    def body(acc, i):
        a = A12.at[3].add(jnp.float32(i) * 1e-3)
        out, ovf = _oblique_call(
            volj, a, kap, jnp.float32(0.0), (Z, Y, X),
            (plan3["Z2"], plan3["Y2"]), plan3["window"], None, (), False)
        return acc + jnp.sum(out) + ovf, None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return acc


obl3 = bench(lambda K: obl3_scan(K, volj), "oblique 45(1,1,1) shear-kernel")
print(f"  speedup vs gather: {gat/obl3:.1f}x", flush=True)
print("DONE", flush=True)
