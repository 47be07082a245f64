"""On-chip marginal-cost measurement of the QA kernels (EDT panel,
cohort DVH, cohort gamma).

Methodology (docs/PERF.md rules): N vs 4N reps inside ONE compiled
program with counter-perturbed inputs (jnp.roll by the loop counter,
so XLA cannot CSE) and a full-output sum (so it cannot DCE); marginal
= (t_4N - t_N) / 3N. Completion forced with a float() pull. Run alone
— TPU tunnel processes must be serialized.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from medicalimageanalysis_tpu.ops.edt import (_surface_metrics_jit,
                                              squared_edt)


def timed(fn, *args):
    fn(*args)  # compile
    best = np.inf
    for _ in range(2):  # best-of-2 bounds relay jitter
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])  # force completion
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(make_prog, n=8):
    t1 = timed(make_prog(n))
    t4 = timed(make_prog(4 * n))
    return max((t4 - t1) / (3 * n), 1e-9)


def bench_edt(shape, sp=(1.0, 1.0, 1.0)):
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.random(shape) > 0.999)

    def make(reps):
        @jax.jit
        def prog():
            def body(i, acc):
                mm = jnp.roll(m, i, axis=0)
                return acc + jnp.sum(squared_edt(mm, sp))
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return prog

    t = marginal(make)
    vox = np.prod(shape)
    print(f"EDT {shape}: {t * 1e3:.2f} ms/transform "
          f"({vox / t / 1e9:.2f} G vox/s)")


def bench_panel(shape, sp=(1.0, 1.0, 1.0)):
    rng = np.random.default_rng(1)
    a = jnp.asarray(
        (rng.random(shape) > 0.9).astype(np.uint8))
    b = jnp.roll(a, 2, axis=1)

    def make(reps):
        @jax.jit
        def prog():
            def body(i, acc):
                # BOTH sides perturbed: a loop-invariant b would let
                # while-loop invariant code motion hoist edt(boundary(b))
                # — half the panel's cost — out of the rep loop
                aa = jnp.roll(a, i, axis=0)
                bb = jnp.roll(b, i, axis=2)
                out = _surface_metrics_jit(aa, bb, sp, 2.0)
                return acc + out["hd95_mm"] + out["dice"]
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return prog

    t = marginal(make)
    print(f"surface panel {shape}: {t * 1e3:.2f} ms/pair")


def bench_dvh(B, shape):
    from medicalimageanalysis_tpu.ops.dvh import D_VALUES, _dvh_core
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.uniform(0, 70, (B,) + shape).astype(np.float32))
    m = jnp.asarray(rng.random((B,) + shape) > 0.5)
    d_pcts = jnp.asarray(np.asarray(D_VALUES, np.float32))

    def single(dv, mv):
        return _dvh_core(dv.ravel(), mv.ravel(), d_pcts, 32, 5.0)

    def make(reps):
        @jax.jit
        def prog():
            def body(i, acc):
                dd = jnp.roll(d, i, axis=1)
                mm = jnp.roll(m, i, axis=2)  # perturb BOTH inputs
                out = jax.vmap(single)(dd, mm)
                # reduce EVERY output (the percentile sort and VS bins
                # are the cost — summing one scalar lets XLA DCE them)
                return acc + sum(jnp.sum(o).astype(jnp.float32)
                                 for o in out)
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return prog

    t = marginal(make)
    print(f"DVH batch B={B} {shape}: {t * 1e3:.2f} ms/batch "
          f"({t / B * 1e3:.2f} ms/pair)")


def bench_gamma(B, shape, sp=(2.5, 2.5, 2.5)):
    from medicalimageanalysis_tpu.ops.gamma import (_decompose_offsets,
                                                    _gamma_fn,
                                                    fine_grid_layout,
                                                    upsample_to_fine)
    zz, yy, xx = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    base = 60 * np.exp(-((zz - shape[0] / 2) ** 2 / 50
                         + (yy - shape[1] / 2) ** 2 / 300
                         + (xx - shape[2] / 2) ** 2 / 300))
    refs = jnp.asarray(np.stack([base * (1 + 0.03 * i)
                                 for i in range(B)]).astype(np.float32))
    evals = jnp.asarray(np.roll(np.asarray(refs), 1, axis=3) * 1.02)
    s, r, offsets, dist2 = fine_grid_layout(sp, 3.0, None, 2.0)
    rows = jnp.asarray(_decompose_offsets(offsets, s, r))
    dist2_j = jnp.asarray(dist2, jnp.float32)
    run = _gamma_fn(shape, s, r, None)

    def single(rv, ev):
        norm = jnp.max(rv)
        dd2 = (0.03 * norm) ** 2
        fine = upsample_to_fine(ev, s, r)
        gam = run(rv, fine, dd2, rows, dist2_j, jnp.float32(9.0))
        return jnp.sum(jnp.minimum(gam, 2.0))

    def make(reps):
        @jax.jit
        def prog():
            def body(i, acc):
                rr = jnp.roll(refs, i, axis=1)
                ee = jnp.roll(evals, i, axis=2)  # keep the fine-grid
                # upsample inside the loop (LICM would hoist it)
                return acc + jnp.sum(jax.vmap(single)(rr, ee))
            return lax.fori_loop(0, reps, body, jnp.float32(0))
        return prog

    t = marginal(make, n=2)
    print(f"gamma batch B={B} {shape} ({len(dist2)} offsets): "
          f"{t * 1e3:.1f} ms/batch ({t / B * 1e3:.1f} ms/pair)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_edt((128, 128, 128))
    bench_edt((64, 256, 256))
    bench_panel((128, 128, 128))
    bench_dvh(8, (64, 128, 128))
    bench_gamma(4, (64, 100, 100))
