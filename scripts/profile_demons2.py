"""Marginal per-iteration cost of _demons_core / _invert with
device-resident inputs: iters sweep isolates fixed dispatch/transfer
cost from true per-iteration compute."""

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


def pull(x):
    # block_until_ready can return early through the axon relay
    # (docs/PERF.md); a 1-element host pull forces completion
    float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(fn, *args):
    pull(fn(*args))
    t0 = time.perf_counter()
    pull(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def main():
    from medicalimageanalysis_tpu.ops.registration.demons import (
        _demons_core)
    from medicalimageanalysis_tpu.ops.registration.dvf import (
        _invert_planar)

    rng = np.random.default_rng(0)
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
        print(f"demons[{method}]: 10it={ts[10]:.0f}ms 40it={ts[40]:.0f}ms"
              f" -> marginal {marg:.2f} ms/iter, fixed"
              f" {ts[10] - 10 * marg:.0f} ms")

    dvf = jax.device_put(jnp.asarray(np.moveaxis(
        rng.normal(scale=2.0, size=SHAPE + (3,)).astype(np.float32),
        -1, 0).copy()))
    jax.block_until_ready(dvf)
    ts = {}
    for it in (10, 40):
        ts[it] = run(_invert_planar, dvf, it)
    marg = (ts[40] - ts[10]) / 30.0
    print(f"invert_dvf: 10it={ts[10]:.0f}ms 40it={ts[40]:.0f}ms"
          f" -> marginal {marg:.2f} ms/iter, fixed"
          f" {ts[10] - 10 * marg:.0f} ms")


if __name__ == "__main__":
    main()


def smooth_invert():
    """Marginal invert cost on a SMOOTH realistic DVF (the rough-noise
    field above inflates the kernel's dynamic window loop)."""
    from scipy.ndimage import gaussian_filter
    from medicalimageanalysis_tpu.ops.registration.dvf import (
        _invert_planar)
    rng = np.random.default_rng(1)
    d = rng.normal(scale=6.0, size=SHAPE + (3,)).astype(np.float32)
    for c in range(3):
        d[..., c] = gaussian_filter(d[..., c], sigma=8.0) * 40.0
    print(f"smooth DVF |d| max={np.abs(d).max():.1f} vox")
    dvf = jax.device_put(jnp.asarray(np.moveaxis(d, -1, 0).copy()))
    jax.block_until_ready(dvf)
    ts = {}
    for it in (10, 40):
        ts[it] = run(_invert_planar, dvf, it)
    marg = (ts[40] - ts[10]) / 30.0
    print(f"invert_dvf smooth: 10it={ts[10]:.0f}ms 40it={ts[40]:.0f}ms"
          f" -> marginal {marg:.2f} ms/iter")
