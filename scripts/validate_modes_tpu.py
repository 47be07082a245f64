"""On-hardware validation + timing of the fused-coordinate warp modes
(disp / affine) added after the round-3 profile."""

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


def pull(x):
    float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(fn, *args):
    pull(fn(*args))
    t0 = time.perf_counter()
    pull(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def main():
    from medicalimageanalysis_tpu.ops.pallas_warp import (
        affine_coords, affine_warp_fused, field_warp_xla, warp_disp_jit)

    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    # correctness: disp mode vs XLA twin on hardware
    vol = rng.normal(size=(21, 29, 71)).astype(np.float32)
    disp = rng.normal(scale=2.0, size=(3, 18, 27, 66)).astype(np.float32)
    Zo, Yo, Xo = disp.shape[1:]
    zz = np.arange(Zo, dtype=np.float32)[:, None, None]
    yy = np.arange(Yo, dtype=np.float32)[None, :, None]
    xx = np.arange(Xo, dtype=np.float32)[None, None, :]
    ref = np.asarray(field_warp_xla(
        jnp.asarray(vol)[None], jnp.asarray(zz + disp[2]),
        jnp.asarray(yy + disp[1]), jnp.asarray(xx + disp[0]), 0.25))[0]
    out, ovf = warp_disp_jit(jnp.asarray(vol), jnp.asarray(disp), 0.25,
                             with_overflow=True)
    err = np.abs(np.asarray(out) - ref).max()
    print(f"disp mode hw: ovf={float(ovf):.0f} maxerr={err:.2e}")
    assert float(ovf) == 0 and err < 1e-5

    # correctness: affine mode vs XLA coords on hardware
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] += rng.normal(scale=0.05, size=(3, 3)).astype(np.float32)
    A[:3, 3] = [2.5, -1.0, 0.5]
    osh = (17, 30, 70)
    cz, cy, cx = affine_coords(A, osh)
    ref2 = np.asarray(field_warp_xla(jnp.asarray(vol)[None],
                                     cz, cy, cx, -3001.0))[0]
    out2, ovf2 = affine_warp_fused(jnp.asarray(vol), jnp.asarray(A),
                                   jnp.float32(-3001.0), osh)
    err2 = np.abs(np.asarray(out2) - ref2).max()
    print(f"affine mode hw: ovf={float(ovf2):.0f} maxerr={err2:.2e}")
    assert float(ovf2) == 0 and err2 < 5e-3

    # timing: demons marginals with the planar/disp rewiring
    from medicalimageanalysis_tpu.ops.registration.demons import (
        _demons_core)
    from medicalimageanalysis_tpu.ops.registration.dvf import (
        _invert_planar)

    SHAPE = (128, 128, 128)
    fixed = jax.device_put(jnp.asarray(
        rng.normal(size=SHAPE).astype(np.float32)))
    moving = jax.device_put(jnp.asarray(
        rng.normal(size=SHAPE).astype(np.float32)))
    sp = jax.device_put(jnp.asarray([1.0, 1.0, 1.0], jnp.float32))
    jax.block_until_ready((fixed, moving))
    for method in ("fast", "diffeomorphic"):
        ts = {}
        for it in (10, 40):
            ts[it] = run(_demons_core, fixed, moving, sp, 1.0,
                         jnp.float32(2.0), jnp.float32(0.001), it,
                         method, True)
        marg = (ts[40] - ts[10]) / 30.0
        print(f"demons[{method}] planar/disp: marginal {marg:.2f} ms/iter"
              f" (10it={ts[10]:.0f} 40it={ts[40]:.0f})")

    from scipy.ndimage import gaussian_filter
    d = rng.normal(scale=6.0, size=SHAPE + (3,)).astype(np.float32)
    for c in range(3):
        d[..., c] = gaussian_filter(d[..., c], sigma=8.0) * 40.0
    fb = jax.device_put(jnp.asarray(np.moveaxis(d, -1, 0).copy()))
    jax.block_until_ready(fb)
    ts = {}
    for it in (10, 40):
        ts[it] = run(lambda f, i=it: _invert_planar(f, i), fb)
    marg = (ts[40] - ts[10]) / 30.0
    print(f"invert planar/disp smooth: marginal {marg:.2f} ms/iter"
          f" (10it={ts[10]:.0f} 40it={ts[40]:.0f})")

    # timing: fused affine reslice (bench 90-deg orientation case scale)
    big = jax.device_put(jnp.asarray(
        rng.normal(size=(160, 256, 256)).astype(np.float32)))
    jax.block_until_ready(big)
    Arot = np.eye(4, dtype=np.float32)
    Arot[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                            np.float32)
    Arot[:3, 3] = [255.0, 0.0, 0.0]
    t = run(lambda v: affine_warp_fused(v, jnp.asarray(Arot),
                                        jnp.float32(-3001.0),
                                        (160, 256, 256)), big)
    print(f"affine_warp_fused 90deg 160x256x256: {t:.1f} ms")
    A2 = np.eye(4, dtype=np.float32)
    A2[:3, :3] += rng.normal(scale=0.02, size=(3, 3)).astype(np.float32)
    t = run(lambda v: affine_warp_fused(v, jnp.asarray(A2),
                                        jnp.float32(-3001.0),
                                        (160, 256, 256)), big)
    print(f"affine_warp_fused near-id 160x256x256: {t:.1f} ms")


if __name__ == "__main__":
    main()
