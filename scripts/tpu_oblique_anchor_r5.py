"""Hardware anchor for the oblique trips roofline (VERDICT r4 #5).

Round 4 refused the 2-stair cascade on a SIMULATED ~1.2-1.3x net; the
judge asked for hardware. Full cascade implementation is only worth
it if the model predicts >= 1.15x, so this script replaces every
model COEFFICIENT with a hardware measurement:

1. an exact host re-implementation of the affine_shear kernel's
   per-tile (kz, ky) loop-range math gives mean trips/tile for any
   transform (validated against the round-4 numbers: in-plane 13.5,
   45(1,1,1) 51.5, 50(1,2,1) 70.0);
2. a LADDER of oblique transforms spanning that trips range is timed
   on the chip (marginal, K=2 vs 8 scanned warps, CSE-perturbed) and
   fit to ms = a*trips + b — the round-4 two-point fit (0.68, 12.8)
   becomes a many-point hardware line;
3. the cost of ONE extra staircase-shear pass (what a second stair
   adds) is measured directly as marginal ms.

Predicted cascade time = b + a*trips_cascade + shear_extra, with
trips_cascade = the round-4 cascade simulation (31.9 at 45(1,1,1),
35.1 at 50(1,2,1)) rescaled by this script's own single-stair sim so
the two simulations share a yardstick. Ship bar: >= 1.15x measured.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from medicalimageanalysis_tpu import runtime

runtime.setup_jax_cache()

import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from medicalimageanalysis_tpu.ops.pallas_warp import (
    _oblique_call, _pick_config, _round_up, _warp_call, oblique_plan)

SIZE = int(os.environ.get("MIA_OBL_SIZE", "256"))
Z = Y = X = SIZE


def mat(deg, axis):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    R = Rotation.from_rotvec(np.deg2rad(deg) * axis).as_matrix()
    A = np.eye(4)
    A[:3, :3] = R
    c = np.array([X / 2, Y / 2, Z / 2])
    A[:3, 3] = c - R @ c
    return A


def sim_mean_trips(A, plan, vol_shape):
    """Mean (kz, ky) match-loop trips/tile: exact host twin of the
    kernel's index math (pallas_warp._warp_kernel affine_shear branch,
    f32 rounding preserved)."""
    Zl, Yl, Xl = vol_shape
    Z2, Y2 = plan["Z2"], plan["Y2"]
    window = plan["window"]
    cfg = _pick_config((Z2, Y2, Xl), window)
    TZ, TY, TX = cfg["TZ"], cfg["TY"], cfg["TX"]
    ZS, YS, SX = cfg["ZS"], cfg["YS"], cfg["SX"]
    FZ, FY = TZ, TY
    ZP = max(_round_up(Z2 + FZ + TZ - 1, 8), ZS)
    YP = max(_round_up(Y2 + FY + TY - 1 + 8, 8), YS)
    XP = max(_round_up(Xl, 128), SX)

    c = np.asarray(A, np.float32)[:3, :].reshape(12)
    ky = np.float32(plan["ky"])
    kz = np.float32(plan["kz"])
    oyi, ozi = np.int32(plan["oy"]), np.int32(plan["oz"])

    Zo, Yo, Xo = Zl, Yl, Xl
    Zg = _round_up(Zo, TZ)
    Yg, Xg = _round_up(Yo, TY), _round_up(Xo, TX)
    gy = np.arange(Yg, dtype=np.float32)[:, None]
    gx = np.arange(Xg, dtype=np.float32)[None, :]
    gyi_ok = (np.arange(Yg)[:, None] < Yo)
    gxi_ok = (np.arange(Xg)[None, :] < Xo)
    ty_idx = (np.arange(Yg) % TY)[:, None].astype(np.int32)

    big = np.int32(1 << 30)
    trips_sum = 0.0
    n_tiles = 0
    for z_t in range(Zg // TZ):
        gz = np.arange(z_t * TZ, (z_t + 1) * TZ,
                       dtype=np.float32)[:, None, None]
        pad_ok = ((np.arange(z_t * TZ, (z_t + 1) * TZ)[:, None, None]
                   < Zo) & gyi_ok[None] & gxi_ok[None])
        cx = c[0] * gx + c[1] * gy + c[2] * gz + c[3]
        cy = c[4] * gx + c[5] * gy + c[6] * gz + c[7]
        cz = c[8] * gx + c[9] * gy + c[10] * gz + c[11]
        cz = np.where(pad_ok, cz, np.float32(-1.0))
        inside = ((cz >= 0) & (cz <= Zl - 1) & (cy >= 0)
                  & (cy <= Yl - 1) & (cx >= 0) & (cx <= Xl - 1))
        z0 = np.clip(np.floor(cz).astype(np.int32), 0, Zl - 1)
        y0 = np.clip(np.floor(cy).astype(np.int32), 0, Yl - 1)
        x0 = np.clip(np.floor(cx).astype(np.int32), 0, Xl - 1)
        z1 = np.minimum(z0 + 1, Zl - 1)
        y1 = np.minimum(y0 + 1, Yl - 1)
        x1 = np.minimum(x0 + 1, Xl - 1)
        tz_idx = np.broadcast_to(
            (np.arange(z_t * TZ, (z_t + 1) * TZ) % TZ)[:, None, None]
            .astype(np.int32), z0.shape)
        tyb = np.broadcast_to(ty_idx[None], z0.shape)
        x0f = x0.astype(np.float32)
        x1f = x1.astype(np.float32)
        sa_y = np.floor(ky * x0f + np.float32(0.5)).astype(np.int32)
        sb_y = np.floor(ky * x1f + np.float32(0.5)).astype(np.int32)
        sa_z = np.floor(kz * x0f + np.float32(0.5)).astype(np.int32)
        sb_z = np.floor(kz * x1f + np.float32(0.5)).astype(np.int32)
        z0a = z0 + FZ + ozi - sa_z
        z1a = z1 + FZ + ozi - sa_z
        z0b = z0 + FZ + ozi - sb_z
        z1b = z1 + FZ + ozi - sb_z
        y0a = y0 + FY + oyi - sa_y
        y1a = y1 + FY + oyi - sa_y
        y0b = y0 + FY + oyi - sb_y
        y1b = y1 + FY + oyi - sb_y
        sz = np.where(inside, np.minimum(z0a, z0b) - tz_idx, big)
        sy = np.where(inside, np.minimum(y0a, y0b) - tyb, big)

        # per-tile reductions
        def tiled(a):
            return a.reshape(TZ, Yg // TY, TY, Xg // TX, TX)

        zlo = np.clip(tiled(sz).min(axis=(0, 2, 4)), 0, ZP - ZS)
        ylo = np.clip(tiled(sy).min(axis=(0, 2, 4)), 0, YP - YS)
        ylo = (ylo // 8) * 8
        zlo_b = np.repeat(np.repeat(zlo, TY, 0), TX, 1)[None]
        ylo_b = np.repeat(np.repeat(ylo, TY, 0), TX, 1)[None]
        dz_min = np.minimum(z0a, z0b) - zlo_b - tz_idx
        dz_max = np.maximum(z1a, z1b) - zlo_b - tz_idx
        dy_min = np.minimum(y0a, y0b) - ylo_b - tyb
        dy_max = np.maximum(y1a, y1b) - ylo_b - tyb
        ZW, YW = ZS - TZ, YS - TY - 8
        kz_lo = np.clip(tiled(np.where(inside, dz_min, ZS))
                        .min(axis=(0, 2, 4)), 0, ZW)
        kz_hi = np.clip(tiled(np.where(inside, dz_max, -1))
                        .max(axis=(0, 2, 4)), -1, ZW) + 1
        ky_lo = np.clip(tiled(np.where(inside, dy_min, YS))
                        .min(axis=(0, 2, 4)), 0, YW)
        ky_hi = np.clip(tiled(np.where(inside, dy_max, -1))
                        .max(axis=(0, 2, 4)), -1, YW) + 1
        trips = (np.maximum(kz_hi - kz_lo, 0)
                 * np.maximum(ky_hi - ky_lo, 0))
        trips_sum += float(trips.sum())
        n_tiles += trips.size
    return trips_sum / n_tiles


def main():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(Z, Y, X)).astype(np.float32)
    volj = jax.device_put(vol)
    volj.block_until_ready()
    print("backend:", jax.default_backend(), "size:", SIZE, flush=True)

    ladder = [
        ("45 in-plane", mat(45, (0, 0, 1))),
        ("30 (1,1,1)", mat(30, (1, 1, 1))),
        ("37 (1,1,1)", mat(37, (1, 1, 1))),
        ("45 (1,1,1)", mat(45, (1, 1, 1))),
        ("52 (1,1,1)", mat(52, (1, 1, 1))),
        ("50 (1,2,1)", mat(50, (1, 2, 1))),
        ("40 (2,1,1)", mat(40, (2, 1, 1))),
    ]
    # MIA_OBL_ONLY="45 in-plane;45 (1,1,1)" runs a subset: cold 256^3
    # compiles through the tunnel occasionally hang for tens of
    # minutes (round-3 class), so entries run one process at a time
    # and accumulate in /tmp/obl_rows.json across invocations; the
    # fit/prediction only runs once the two cascade targets are in.
    only = os.environ.get("MIA_OBL_ONLY")
    if only:
        want = {s.strip() for s in only.split(";")}
        ladder = [e for e in ladder if e[0] in want]
    import json
    rows_path = os.environ.get("MIA_OBL_ROWS", "/tmp/obl_rows.json")
    saved = {}
    if os.path.exists(rows_path):
        saved = json.load(open(rows_path))
    ladder = [e for e in ladder if e[0] not in saved]

    def marginal_ms(fn):
        for K in (2, 8):
            jax.block_until_ready(fn(K))
        best = {}
        for K in (2, 8):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(K))
                b = min(b, time.perf_counter() - t0)
            best[K] = b
        return (best[8] - best[2]) / 6.0 * 1e3

    rows = []
    for label, A in ladder:
        plan = oblique_plan(A, vol.shape)
        if plan is None:
            print(f"  {label}: no plan (skipped)", flush=True)
            continue
        trips = sim_mean_trips(A, plan, vol.shape)

        @partial(jax.jit, static_argnames=("K",))
        def obl_scan(K, volj=volj, A=A, plan=plan):
            kap = jnp.asarray([plan["ky"], plan["kz"], plan["oy"],
                               plan["oz"]], jnp.float32)
            A12 = jnp.asarray(A, jnp.float32)[:3, :].reshape(12)

            def body(acc, i):
                a = A12.at[3].add(jnp.float32(i) * 1e-3)
                out, ovf = _oblique_call(
                    volj, a, kap, jnp.float32(0.0), (Z, Y, X),
                    (plan["Z2"], plan["Y2"]), plan["window"], None,
                    (), False)
                return acc + jnp.sum(out) + ovf, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(K))
            return acc

        ms = marginal_ms(obl_scan)
        mpts = Z * Y * X / (ms * 1e-3) / 1e6
        rows.append((label, trips, ms))
        saved[label] = [trips, ms]
        json.dump(saved, open(rows_path, "w"))
        print(f"  {label}: trips={trips:6.1f} {ms:6.1f} ms "
              f"({mpts:6.0f} M pts/s)", flush=True)

    rows = [(k, v[0], v[1]) for k, v in saved.items()]
    need = {"45 (1,1,1)", "50 (1,2,1)"}
    if not need <= set(saved) or len(rows) < 4:
        print(f"partial ({sorted(saved)}); rerun for the fit",
              flush=True)
        return

    # least-squares line ms = a*trips + b
    t = np.array([r[1] for r in rows])
    y = np.array([r[2] for r in rows])
    Amat = np.stack([t, np.ones_like(t)], axis=1)
    (a, b), res, _, _ = np.linalg.lstsq(Amat, y, rcond=None)
    pred = Amat @ np.array([a, b])
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    print(f"\nfit: ms = {a:.3f}*trips + {b:.2f}   R^2={r2:.3f}",
          flush=True)

    # extra staircase-shear pass cost: the shear-build leg alone
    plan3 = oblique_plan(mat(45, (1, 1, 1)), vol.shape)
    Z2, Y2 = plan3["Z2"], plan3["Y2"]

    @partial(jax.jit, static_argnames=("K",))
    def shear_scan(K, volj=volj):
        ky = jnp.float32(plan3["ky"])
        kz = jnp.float32(plan3["kz"])
        oy = jnp.int32(plan3["oy"])
        oz = jnp.int32(plan3["oz"])
        vt = jnp.transpose(volj, (0, 2, 1))
        z2 = jnp.arange(Z2, dtype=jnp.float32)[:, None, None]
        xc = jnp.arange(X, dtype=jnp.float32)[None, :, None]
        y2 = jnp.arange(Y2, dtype=jnp.float32)[None, None, :]
        sh = (Z2, X, Y2)

        def body(acc, i):
            stz = jnp.floor((kz + i * 1e-6) * xc + 0.5)
            sty = jnp.floor(ky * xc + 0.5)
            cz1 = jnp.broadcast_to(z2 - oz + stz, sh)
            cy1 = jnp.broadcast_to(xc, sh)
            cx1 = jnp.broadcast_to(y2 - oy + sty, sh)
            v2t, _, ovf = _warp_call(vt[None], (cz1, cy1, cx1),
                                     jnp.float32(0.0), False, None,
                                     False, mode="coords")
            return acc + jnp.sum(v2t) + ovf, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return acc

    shear_ms = marginal_ms(shear_scan)
    print(f"extra staircase-shear pass: {shear_ms:.1f} ms marginal",
          flush=True)

    # cascade prediction, rescaled to this sim's yardstick
    my45 = [r for r in rows if r[0] == "45 (1,1,1)"][0]
    my50 = [r for r in rows if r[0] == "50 (1,2,1)"][0]
    for label, meas_row, r4_single, r4_casc in (
            ("45 (1,1,1)", my45, 51.5, 31.9),
            ("50 (1,2,1)", my50, 70.0, 35.1)):
        scale = meas_row[1] / r4_single
        trips_c = r4_casc * scale
        t_pred = a * trips_c + b + shear_ms
        gain = meas_row[2] / t_pred
        print(f"cascade @ {label}: trips~{trips_c:.1f} -> predicted "
              f"{t_pred:.1f} ms vs measured {meas_row[2]:.1f} ms "
              f"(gain {gain:.2f}x; ship bar 1.15x)", flush=True)


if __name__ == "__main__":
    main()
