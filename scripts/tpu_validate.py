"""On-hardware validation of every Pallas kernel + hot path.

Run on a machine with a TPU attached (serialized — one process on the
tunneled chip at a time):

    python -u scripts/tpu_validate.py

The exactness checks live in ``medicalimageanalysis_tpu.validate``
(the same module bench.py records as ``kernels_validated`` every
round); this runner adds the larger-shape throughput and timing
checks that are too slow for the bench loop.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sync(x):
    # forced completion: block_until_ready can return early through
    # the axon relay (docs/PERF.md). Pull ONE element via a device-side
    # ravel — np.asarray(x) here would download the whole array and a
    # 192^3 f32 volume is ~28 MB against the tunnel's ~12 MB/s, timing
    # the transfer instead of the kernel (measured: the throughput
    # check read 1 M pts/s that way vs ~250 M with the 1-element pull).
    return float(x.ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from medicalimageanalysis_tpu import runtime
    runtime.setup_jax_cache()
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()!r}, not tpu")
        return 0

    failures = []
    rng = np.random.default_rng(0)

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'}: {name} {detail}")
        if not ok:
            failures.append(name)

    # 1) the full exactness battery (shared with bench.py's recorded
    # kernels_validated field), at the larger non-fast shapes
    from medicalimageanalysis_tpu.validate import validate_kernels
    kv = validate_kernels(fast=False)
    for name, ok in kv["checks"].items():
        check(name, ok, kv["detail"].get(name, ""))

    # 2) kernel throughput well clear of the gather pathology
    from medicalimageanalysis_tpu.ops.pallas_warp import _field_warp_call
    N = 192
    vol = jax.device_put(jnp.asarray(
        rng.normal(size=(N, N, N)).astype(np.float32)))
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N].astype(np.float32)
    cz = jax.device_put(jnp.asarray(zz + 3.0 * np.sin(xx / 40)))
    cy = jax.device_put(jnp.asarray(yy - 2.5 * np.cos(zz / 30)))
    cx = jax.device_put(jnp.asarray(xx + 2.0 * np.sin(yy / 50)))

    @jax.jit
    def warp(v, a, b, c):
        o, _, _ = _field_warp_call(v, a, b, c, jnp.float32(0.0),
                                   False, None, False)
        return o
    sync(warp(vol[None], cz, cy, cx))
    t0 = time.perf_counter()
    sync(warp(vol[None], cz, cy, cx))
    rate = N ** 3 / (time.perf_counter() - t0) / 1e6
    check("pallas_warp throughput", rate > 60,
          f"{rate:.0f} M pts/s (XLA gather path runs ~14)")

    # 3) registration 40-step level under the BASELINE target
    from medicalimageanalysis_tpu.models.rigid_intensity import (
        _register_level)
    c = N // 2
    refv = (np.exp(-(((zz - c) / 20) ** 2 + ((yy - c) / 24) ** 2
                     + ((xx - c) / 24) ** 2)) * 60000).astype(np.uint16)
    movv = np.roll(refv, (2, 4, -3), axis=(0, 1, 2))
    args = (jnp.asarray(refv), jnp.asarray(movv),
            jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
            jnp.asarray([float(c)] * 3, jnp.float32),
            jnp.zeros(6, jnp.float32), jnp.float32(0.1))
    out = _register_level(*args, steps=40, stride=(2, 2, 2),
                          intensity_scale=1 / 65535.)
    np.asarray(out[1])
    t0 = time.perf_counter()
    out = _register_level(*args, steps=40, stride=(2, 2, 2),
                          intensity_scale=1 / 65535.)
    np.asarray(out[1])
    ms = (time.perf_counter() - t0) * 1e3
    check("rigid 40-step level < 100 ms", ms < 100.0, f"{ms:.1f} ms")

    # 4) device connected components vs scipy (slow shape)
    from medicalimageanalysis_tpu.ops.filters import (
        largest_component, largest_component_batch)
    masks = rng.random((2, 24, 48, 48)) > 0.7
    outb = largest_component_batch(masks)
    ok = all((outb[b] == largest_component(masks[b])[0]).all()
             for b in range(2))
    check("largest_component_batch vs scipy", ok)

    print(f"\n{len(failures)} failure(s)" if failures
          else "\nALL TPU VALIDATIONS PASSED")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
