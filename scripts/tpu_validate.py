"""On-hardware validation of every Pallas kernel + hot path.

Run on a machine with a TPU attached (serialized — one process on the
tunneled chip at a time):

    python scripts/tpu_validate.py

Each check compares the compiled kernel against its exact XLA twin with
forced-completion timing (docs/PERF.md measurement rules) and prints
one PASS/FAIL line; exits nonzero on any failure.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def sync(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).ravel()[0])


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

    # 1) tile-slab warp vs XLA twin (DVF + affine), overflow fallback
    from medicalimageanalysis_tpu.ops.pallas_warp import (
        _field_warp_call, affine_coords, field_warp_xla)
    N = 192
    vol = jax.device_put(jnp.asarray(
        rng.normal(size=(N, N, N)).astype(np.float32)))
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N].astype(np.float32)
    cz = jax.device_put(jnp.asarray(zz + 3.0 * np.sin(xx / 40)))
    cy = jax.device_put(jnp.asarray(yy - 2.5 * np.cos(zz / 30)))
    cx = jax.device_put(jnp.asarray(xx + 2.0 * np.sin(yy / 50)))
    out, _, ovf = _field_warp_call(vol[None], cz, cy, cx,
                                   jnp.float32(0.0), False, None, False)
    ref = field_warp_xla(vol, cz, cy, cx, 0.0)
    d = float(jnp.max(jnp.abs(out[0] - ref)))
    check("pallas_warp DVF exactness", d < 1e-5 and float(ovf) == 0,
          f"max|diff|={d:.2e}")

    @jax.jit
    def warp(v, a, b, c):
        o, _, _ = _field_warp_call(v, a, b, c, jnp.float32(0.0),
                                   False, None, False)
        return o
    sync(warp(vol[None], cz, cy, cx))
    t0 = time.perf_counter()
    sync(warp(vol[None], cz, cy, cx))
    rate = N ** 3 / (time.perf_counter() - t0) / 1e6
    # threshold well clear of the ~24 ms relay floor at this size: the
    # XLA gather runs ~14 M pts/s, the kernel 300-550 on-chip
    check("pallas_warp throughput", rate > 60,
          f"{rate:.0f} M pts/s (XLA gather path runs ~14)")

    # 2) sampler gradient exactness (registration backward)
    from medicalimageanalysis_tpu.ops.pallas_warp import make_warp_sampler
    sampler = make_warp_sampler(np.asarray(vol), 0.0)
    g1 = jax.grad(lambda a: jnp.sum(sampler(a, cy, cx) ** 2))(cz)
    g2 = jax.grad(lambda a: jnp.sum(
        field_warp_xla(vol, a, cy, cx, 0.0) ** 2))(cz)
    d = float(jnp.max(jnp.abs(g1 - g2)))
    check("warp sampler VJP", d < 1e-2, f"max|diff|={d:.2e}")

    # 3) registration 40-step level under target
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

    # 4) lane_interp bit parity at unaligned widths
    from medicalimageanalysis_tpu.ops.pallas_kernels import (
        _lane_interp_xla, lane_interp)
    data = rng.normal(size=(37, 90)).astype(np.float32)
    pos = rng.uniform(-2, 92, size=(37, 104)).astype(np.float32)
    a = np.asarray(lane_interp(jnp.asarray(data), jnp.asarray(pos),
                               interpret=False))
    b = np.asarray(_lane_interp_xla(jnp.asarray(data), jnp.asarray(pos)))
    check("lane_interp unaligned bit parity", bool((a == b).all()))

    # 5) DVH histogram kernel
    from medicalimageanalysis_tpu.ops.pallas_kernels import (
        dose_below_histogram)
    dose = rng.uniform(0, 70, size=100_000).astype(np.float32)
    valid = (rng.random(100_000) > 0.3).astype(np.float32)
    thr = np.linspace(0, 70, 64).astype(np.float32)
    h = np.asarray(dose_below_histogram(dose, valid, thr,
                                        interpret=False))
    g = np.asarray([np.sum((dose < t) & (valid > 0)) for t in thr])
    check("DVH histogram kernel", bool((h == g).all()))

    # 6) device connected components vs scipy
    from medicalimageanalysis_tpu.ops.filters import (
        largest_component, largest_component_batch)
    masks = rng.random((2, 24, 48, 48)) > 0.7
    outb = largest_component_batch(masks)
    ok = all((outb[b] == largest_component(masks[b])[0]).all()
             for b in range(2))
    check("largest_component_batch vs scipy", ok)

    # 7) fused-coordinate kernel modes (disp / affine) vs XLA twin
    from medicalimageanalysis_tpu.ops.pallas_warp import (
        _base_grid, affine_warp_fused, make_disp_sampler, warp_disp_jit)
    volm = jax.device_put(jnp.asarray(
        rng.normal(size=(21, 29, 71)).astype(np.float32)))
    disp = jnp.asarray(
        rng.normal(scale=2.0, size=(3, 18, 27, 66)).astype(np.float32))
    bz, by, bx = _base_grid(disp.shape[1:])
    refd = field_warp_xla(volm[None], bz + disp[2], by + disp[1],
                          bx + disp[0], 0.25)[0]
    outd, ovfd = warp_disp_jit(volm, disp, 0.25, with_overflow=True)
    d = float(jnp.max(jnp.abs(outd - refd)))
    check("disp-mode warp exactness", d < 1e-5 and float(ovfd) == 0,
          f"max|diff|={d:.2e}")

    A = np.eye(4, dtype=np.float32)
    A[:3, :3] += rng.normal(scale=0.05, size=(3, 3)).astype(np.float32)
    A[:3, 3] = [2.5, -1.0, 0.5]
    ca, cb, cc = affine_coords(A, (17, 30, 70))
    refa = field_warp_xla(volm[None], ca, cb, cc, -3001.0)[0]
    outa, ovfa = affine_warp_fused(volm, jnp.asarray(A),
                                   jnp.float32(-3001.0), (17, 30, 70))
    d = float(jnp.max(jnp.abs(outa - refa)))
    check("affine-mode warp exactness", d < 5e-3 and float(ovfa) == 0,
          f"max|diff|={d:.2e}")

    # 8) disp-sampler VJP vs XLA autodiff on hardware
    sampler = make_disp_sampler(volm[:12, :16, :40], 0.0)
    disp_s = jnp.asarray(
        0.8 * rng.normal(size=(3, 12, 16, 40)).astype(np.float32))
    g1 = jax.grad(lambda dd: jnp.sum(sampler(dd) ** 2))(disp_s)
    bz, by, bx = _base_grid((12, 16, 40))

    def xla_loss(dd):
        o = field_warp_xla(volm[None, :12, :16, :40], bz + dd[2],
                           by + dd[1], bx + dd[0], 0.0)[0]
        return jnp.sum(o ** 2)

    g2 = jax.grad(xla_loss)(disp_s)
    d = float(jnp.max(jnp.abs(g1 - g2)))
    check("disp-sampler VJP vs autodiff", d < 1e-2, f"max|diff|={d:.2e}")

    print(f"\n{len(failures)} failure(s)" if failures
          else "\nALL TPU VALIDATIONS PASSED")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
