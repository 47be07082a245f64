"""Exact trilinear warp as a Pallas TPU kernel (tile-slab gather).

The performance problem this solves (docs/PERF.md): XLA lowers every
computed-index gather on TPU v5e to a ~14-34 M pts/s path, three orders
of magnitude under HBM speed-of-light. That gather sits under the
reference-parity workhorses this module replaces:

- ``vtkImageReslice`` (reference structure/rigid.py:691-740,
  structure/image.py:160-215),
- SimpleITK ``DisplacementFieldTransform`` resample / DVF inversion
  (reference structure/deformable.py:732-774),
- ``scipy.ndimage.map_coordinates`` mesh warping
  (reference structure/deformable.py:961-1001),

and under our own intensity-registration descent.

Design (TPU-native, not a translation):

- The output volume is tiled ``(TZ, TY, TX)``. For each tile the kernel
  computes the tile's own z/y/x tap-coordinate minima (vector reduce ->
  scalar) and DMAs one input slab ``(ZS, YS, SX)`` from HBM at that
  dynamic offset. Only the WITHIN-TILE variation of the coordinates has
  to fit the static slab caps - absolute displacement magnitude is
  absorbed by the slab base, so smooth DVFs of any amplitude and
  near-rigid affines both fit small slabs.
- The 8-tap trilinear accumulation runs over a dynamic ``(dz, dy)``
  window (``lax.fori_loop`` with bounds reduced from the tile's actual
  coordinate spread - near-identity warps run ~3x3 iterations). Each
  iteration reads a uniformly shifted ``(TZ, TY, SX)`` block of the
  slab, so every output row gets its matching input row, and the two x
  taps are per-element 128-lane ``take_along_axis`` gathers (the one
  fast gather primitive Mosaic lowers, segmented per vreg).
- Optionally the kernel also accumulates the analytic trilinear
  derivative w.r.t. the sample coordinates from the same taps
  (``want_grad``), giving registration an EXACT custom VJP with no
  re-gather in the backward pass.

Semantics match :func:`ops.resample._trilinear` exactly: taps clamp to
the volume edge, samples outside ``[0, dim-1]`` return ``background``.
A per-tile overflow counter reports elements whose taps exceeded the
slab caps (those return ``background``); eager wrappers use it to fall
back to the XLA twin, so user-facing results are always exact.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu exists on TPU builds of jax
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["field_warp", "field_warp_xla", "make_warp_sampler",
           "affine_coords", "affine_warp", "warp_jit", "warp_disp_jit",
           "fits_warp_caps", "predicted_spread", "required_window",
           "window_slab_bytes", "oblique_plan", "affine_warp_oblique"]


def _round_up(v, m):
    return -(-int(v) // m) * m


def _base_grid(shape_zyx):
    """Broadcastable (zz, yy, xx) f32 output-grid base coordinates —
    the XLA-twin counterpart of the fused modes' in-kernel iota."""
    Zo, Yo, Xo = shape_zyx
    zz = jnp.arange(Zo, dtype=jnp.float32)[:, None, None]
    yy = jnp.arange(Yo, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(Xo, dtype=jnp.float32)[None, None, :]
    return zz, yy, xx


def _pick_config(vol_shape, window=None, tz=8):
    """Static tile/slab sizes for a given (padded) volume shape.

    window: optional (DZ, DY) within-tile coordinate-spread caps.
    tz: output-tile z extent. The AFFINE path passes 16 when the
    transform's z-spread allows it: the kernel is slab-DMA-amplification
    bound there, and a taller tile amortizes the (ZS, YS, SX) slab over
    2x the output rows — measured 2.0x at 256^3 (5.58 -> 2.80 ms,
    bit-exact; docs/PERF.md round 4). Thinner tiles (TZ < 8) were
    probed for the oblique residual and LOST (per-tile ~1.1 us +
    per-iteration ~50 ns fixed costs outgrow the shrinking ranges);
    disp/coords modes keep 8 (measured slower at 16 — their
    coordinate blocks scale with the tile).

    TY is FIXED at 8: the kernel's aligned-load + pltpu.roll residual
    trick produces wrong row mappings for TY>8 (probed on hardware;
    multi-vreg sublane rotates). Tile-size probes showed (8,8,256) etc.
    within run noise of (8,8,128), so there is no perf reason to vary."""
    Z, Y, X = vol_shape
    TZ, TY, TX = int(tz), 8, 128
    DZ, DY = (16, 16) if window is None else window
    # NOTE: never shrink the slab below the window caps for small
    # volumes — the wrapper pads the volume to fit the slab, and
    # capping ZS at round_up(Z, 8) gave thin volumes (Z <= 8) a ZERO
    # z-window, silently backgrounding every fractional-z sample on
    # jit surfaces (round-2 self-review finding)
    ZS = _round_up(TZ + DZ + 2, 8)
    # +16 y rows: the slab base aligns down to 8 (HBM DMA tiling) and
    # the kernel reads 8-aligned blocks TY+8 tall, rotating out the
    # residual (Mosaic sublane alignment)
    YS = _round_up(TY + DY + 2, 8) + 16
    # x slab: whole row when it fits VMEM, else a 128-aligned window
    # (the base aligns down to 128, so allow a full extra segment)
    XP = _round_up(X, 128)
    SX = XP if XP <= 512 else 384
    return dict(TZ=TZ, TY=TY, TX=TX, ZS=ZS, YS=YS, SX=SX)


def predicted_spread(pixel_matrix, tz=8):
    """Per-tile coordinate spreads implied by an (x,y,z)-convention
    affine pixel matrix, in the same units the kernel's window caps
    bound. Host-side companion of :func:`fits_warp_caps`."""
    A = np.asarray(pixel_matrix, np.float64)
    cfg = _pick_config((1, 1, 1), tz=tz)
    TZ, TY, TX = cfg["TZ"], cfg["TY"], cfg["TX"]
    sz = (abs(A[2, 2] - 1) * TZ + abs(A[2, 1]) * TY
          + abs(A[2, 0]) * TX + 1)
    sy = (abs(A[1, 1] - 1) * TY + abs(A[1, 2]) * TZ
          + abs(A[1, 0]) * TX + 1)
    return sz, sy


def fits_warp_caps(pixel_matrix, window=None, vol_x=None, tz=8):
    """True when an affine's per-tile footprint fits the kernel's slab
    windows (derived from _pick_config, NOT hardcoded): beyond this the
    kernel would background-overflow and callers should take the exact
    gather or a bigger window.

    vol_x (the input volume's X extent) additionally checks the x-slab
    footprint that exists once X > 512 (SX becomes a 384-lane window):
    without it, wide-volume downsampling affines pass the prediction,
    then overflow at runtime and pay the wasted dispatch + eager sync
    this predicate exists to avoid (review finding)."""
    cfg = _pick_config((1 << 14, 1 << 14, 1 << 14), window, tz=tz)
    ZW = cfg["ZS"] - cfg["TZ"]
    YW = cfg["YS"] - cfg["TY"] - 8
    sz, sy = predicted_spread(pixel_matrix, tz=tz)
    if not (sz <= ZW - 1 and sy <= YW - 8):
        return False
    if vol_x is not None:
        cfg_x = _pick_config((1, 1, int(vol_x)), window, tz=tz)
        if cfg_x["SX"] < _round_up(int(vol_x), 128):
            A = np.asarray(pixel_matrix, np.float64)
            TZ, TY, TX = cfg["TZ"], cfg["TY"], cfg["TX"]
            sx = (abs(A[0, 0] - 1) * TX + abs(A[0, 1]) * TY
                  + abs(A[0, 2]) * TZ)
            if sx + TX + 3 > cfg_x["SX"] - 128:
                return False
    return True


def _gather_rows(rows, idx, SX):
    """Per-row lane gather, segmented per 128-lane vreg on BOTH sides:
    Mosaic's dynamic_gather wants indices shaped like the source, and
    supports one source vreg along the gather axis."""
    TXw = idx.shape[1]
    outs = []
    for o in range(0, TXw, 128):
        io = idx[:, o:o + 128]
        acc = jnp.zeros(io.shape, rows.dtype)
        for s in range(0, SX, 128):
            seg = rows[:, s:s + 128]
            local = jnp.clip(io - s, 0, 127)
            g = jnp.take_along_axis(seg, local, axis=1)
            acc = jnp.where((io >= s) & (io < s + 128), g, acc)
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _warp_kernel(dims_ref, bg_ref, *refs, cfg, B, want_grad, mode):
    if mode == "coords":
        cz_ref, cy_ref, cx_ref, vol_ref, *refs = refs
    else:
        c_ref, vol_ref, *refs = refs
    if want_grad:
        out_ref, gz_ref, gy_ref, gx_ref, ovf_ref, scratch, sem = refs
    else:
        out_ref, ovf_ref, scratch, sem = refs
        gz_ref = gy_ref = gx_ref = None
    TZ, TY, TX = cfg["TZ"], cfg["TY"], cfg["TX"]
    ZS, YS, SX = cfg["ZS"], cfg["YS"], cfg["SX"]
    T = TZ * TY

    Z = dims_ref[0]
    Y = dims_ref[1]
    X = dims_ref[2]
    bg = bg_ref[0]

    if mode == "coords":
        cz = cz_ref[...].reshape(T, TX)
        cy = cy_ref[...].reshape(T, TX)
        cx = cx_ref[...].reshape(T, TX)
    else:
        # fused coordinates: the output-grid base coordinate is derived
        # from (program_id, iota) in-register — callers never
        # materialize the three (Zo, Yo, Xo) coordinate volumes that
        # otherwise dominate HBM traffic for DVF warps (profiled at
        # ~2.4 ms/iter @128^3 vs the 2 ms warp itself — docs/PERF.md)
        ii = jax.lax.broadcasted_iota(jnp.int32, (T, TX), 0)
        gzi = pl.program_id(0) * TZ + ii // TY
        gyi = pl.program_id(1) * TY + ii % TY
        gxi = (pl.program_id(2) * TX
               + jax.lax.broadcasted_iota(jnp.int32, (T, TX), 1))
        gzf = gzi.astype(jnp.float32)
        gyf = gyi.astype(jnp.float32)
        gxf = gxi.astype(jnp.float32)
        # padded output rows/cols (beyond the logical out dims) must
        # not enter the slab-base reductions or the overflow count
        pad_ok = ((gzi < dims_ref[3]) & (gyi < dims_ref[4])
                  & (gxi < dims_ref[5]))
        if mode == "disp":
            d = c_ref[...].reshape(3, T, TX)   # (x, y, z) planar rows
            cz = gzf + d[2]
            cy = gyf + d[1]
            cx = gxf + d[0]
        else:                # affine / affine_shear: 12(+4) coeffs, SMEM
            cx = (c_ref[0] * gxf + c_ref[1] * gyf + c_ref[2] * gzf
                  + c_ref[3])
            cy = (c_ref[4] * gxf + c_ref[5] * gyf + c_ref[6] * gzf
                  + c_ref[7])
            cz = (c_ref[8] * gxf + c_ref[9] * gyf + c_ref[10] * gzf
                  + c_ref[11])
        cz = jnp.where(pad_ok, cz, -1.0)

    inside = ((cz >= 0) & (cz <= (Z - 1).astype(jnp.float32))
              & (cy >= 0) & (cy <= (Y - 1).astype(jnp.float32))
              & (cx >= 0) & (cx <= (X - 1).astype(jnp.float32)))

    # integer taps, clamped exactly like ops.resample._trilinear
    z0 = jnp.clip(jnp.floor(cz).astype(jnp.int32), 0, Z - 1)
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, Y - 1)
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, X - 1)
    z1 = jnp.minimum(z0 + 1, Z - 1)
    y1 = jnp.minimum(y0 + 1, Y - 1)
    x1 = jnp.minimum(x0 + 1, X - 1)
    fz = cz - jnp.floor(cz)
    fy = cy - jnp.floor(cy)
    fx = cx - jnp.floor(cx)

    # output-row index of each element within the tile
    tz = (jax.lax.broadcasted_iota(jnp.int32, (T, TX), 0) // TY)
    ty = (jax.lax.broadcasted_iota(jnp.int32, (T, TX), 0) % TY)

    # shift taps into the front-padded volume frame (FZ/FY leading rows
    # of zeros) so the slab base demand z0 - tz is never negative even
    # when a low output row samples volume row 0
    FZ, FY = cfg["FZ"], cfg["FY"]
    ZP, YP, XP = cfg["ZP"], cfg["YP"], cfg["XP"]
    shear = mode == "affine_shear"
    big = jnp.int32(1 << 30)
    if shear:
        # oblique mode: the volume is the integer-staircase-SHEARED
        # copy V2[z + oz - stair(kz, x), y + oy - stair(ky, x), x] =
        # V[z, y, x] (exact row permutation built by the caller), so
        # each x-tap addresses its own z/y rows. Taps/fracs/inside come
        # from the ORIGINAL-frame coords above; only row addressing
        # moves to the sheared frame, collapsing the per-tile sublane
        # spread from ~|sin(theta)|*TX to the Schur-complement residual
        # ~|A11 - ky*A01|*TY + O(1) (docs/PERF.md round 3).
        kyc = c_ref[12]
        kzc = c_ref[13]
        oyi = c_ref[14].astype(jnp.int32)
        ozi = c_ref[15].astype(jnp.int32)
        x0f = x0.astype(jnp.float32)
        x1f = x1.astype(jnp.float32)
        # staircase shifts per x-tap; formula must match the builder's
        # (_stair) bit-for-bit: floor(k*x + 0.5) in f32
        sa_y = jnp.floor(kyc * x0f + 0.5).astype(jnp.int32)
        sb_y = jnp.floor(kyc * x1f + 0.5).astype(jnp.int32)
        sa_z = jnp.floor(kzc * x0f + 0.5).astype(jnp.int32)
        sb_z = jnp.floor(kzc * x1f + 0.5).astype(jnp.int32)
        z0a = z0 + FZ + ozi - sa_z
        z1a = z1 + FZ + ozi - sa_z
        z0b = z0 + FZ + ozi - sb_z
        z1b = z1 + FZ + ozi - sb_z
        y0a = y0 + FY + oyi - sa_y
        y1a = y1 + FY + oyi - sa_y
        y0b = y0 + FY + oyi - sb_y
        y1b = y1 + FY + oyi - sb_y
        sz = jnp.where(inside, jnp.minimum(z0a, z0b) - tz, big)
        sy = jnp.where(inside, jnp.minimum(y0a, y0b) - ty, big)
    else:
        z0 = z0 + FZ
        z1 = z1 + FZ
        y0 = y0 + FY
        y1 = y1 + FY
        # slab base demand per element: tap row minus output row
        sz = jnp.where(inside, z0 - tz, big)
        sy = jnp.where(inside, y0 - ty, big)
    sx_lo = jnp.where(inside, x0, big)

    # HBM is (8, 128)-tiled: the DMA slice offsets in the last two dims
    # must be 8-/128-aligned (z on dim 1 is unconstrained); align the
    # bases down and let the window/index math absorb the residual
    zlo = jnp.clip(jnp.min(sz), 0, ZP - ZS)
    ylo = jnp.clip(jnp.min(sy), 0, YP - YS)
    ylo = pl.multiple_of((ylo // 8) * 8, 8)
    if SX == XP:
        xlo = jnp.int32(0)
    else:
        xlo = jnp.clip(jnp.min(sx_lo), 0, XP - SX)
        xlo = pl.multiple_of((xlo // 128) * 128, 128)

    # window offsets (delta = slab row - output row), per tap
    xal = x0 - xlo
    xbl = x1 - xlo

    ZW = ZS - TZ           # max z window offset
    YW = YS - TY - 8       # max y window offset (8 = aligned-load slack)
    if shear:
        dz0a = z0a - zlo - tz
        dz1a = z1a - zlo - tz
        dz0b = z0b - zlo - tz
        dz1b = z1b - zlo - tz
        dy0a = y0a - ylo - ty
        dy1a = y1a - ylo - ty
        dy0b = y0b - ylo - ty
        dy1b = y1b - ylo - ty
        dz_min = jnp.minimum(dz0a, dz0b)
        dz_max = jnp.maximum(dz1a, dz1b)
        dy_min = jnp.minimum(dy0a, dy0b)
        dy_max = jnp.maximum(dy1a, dy1b)
    else:
        dz_min = dza = z0 - zlo - tz
        dz_max = dzb = z1 - zlo - tz
        dy_min = dya = y0 - ylo - ty
        dy_max = dyb = y1 - ylo - ty
    bad = (inside
           & ((dz_min < 0) | (dz_max > ZW) | (dy_min < 0)
              | (dy_max > YW) | (xal < 0) | (xbl > SX - 1)))
    xal = jnp.clip(xal, 0, SX - 1)
    xbl = jnp.clip(xbl, 0, SX - 1)

    # dynamic loop bounds from the tile's actual spread (clipped so
    # out-of-cap elements can't explode the loop; they are masked bad)
    kz_lo = jnp.clip(jnp.min(jnp.where(inside, dz_min, ZS)), 0, ZW)
    kz_hi = jnp.clip(jnp.max(jnp.where(inside, dz_max, -1)), -1, ZW) + 1
    ky_lo = jnp.clip(jnp.min(jnp.where(inside, dy_min, YS)), 0, YW)
    ky_hi = jnp.clip(jnp.max(jnp.where(inside, dy_max, -1)), -1, YW) + 1

    dma = pltpu.make_async_copy(
        vol_ref.at[:, pl.ds(zlo, ZS), pl.ds(ylo, YS), pl.ds(xlo, SX)],
        scratch, sem)
    dma.start()
    dma.wait()

    one = jnp.float32(1.0)
    n_acc = 4 if want_grad else 1
    zeros = jnp.zeros((T, TX), jnp.float32)
    init = tuple(zeros for _ in range(B * n_acc))

    def ky_body(kz, ky, carry):
        if shear:
            # each x-tap owns its sheared-frame rows: separate (z, y)
            # match weights per tap, same two gathers per iteration
            wza = (jnp.where(dz0a == kz, one - fz, 0.0)
                   + jnp.where(dz1a == kz, fz, 0.0))
            wzb = (jnp.where(dz0b == kz, one - fz, 0.0)
                   + jnp.where(dz1b == kz, fz, 0.0))
            wya = (jnp.where(dy0a == ky, one - fy, 0.0)
                   + jnp.where(dy1a == ky, fy, 0.0))
            wyb = (jnp.where(dy0b == ky, one - fy, 0.0)
                   + jnp.where(dy1b == ky, fy, 0.0))
            wa = wza * wya * (one - fx)
            wb = wzb * wyb * fx
        else:
            wza = jnp.where(dza == kz, one - fz, 0.0)
            wzb = jnp.where(dzb == kz, fz, 0.0)
            wz = wza + wzb
            wya = jnp.where(dya == ky, one - fy, 0.0)
            wyb = jnp.where(dyb == ky, fy, 0.0)
            wy = wya + wyb
            wzy = wz * wy
            if want_grad:
                dwz = (jnp.where(dzb == kz, one, 0.0)
                       - jnp.where(dza == kz, one, 0.0))
                dwy = (jnp.where(dyb == ky, one, 0.0)
                       - jnp.where(dya == ky, one, 0.0))
        # Mosaic vector loads need 8-aligned sublane offsets: load an
        # aligned block 8 rows taller, then rotate out the residual
        ky_base = pl.multiple_of((ky // 8) * 8, 8)
        r = ky - ky_base
        out = []
        for b in range(B):
            blk = scratch[b, pl.ds(kz, TZ), pl.ds(ky_base, TY + 8), :]
            blk = pltpu.roll(blk, shift=-r, axis=1)
            rows = blk[:, :TY, :].reshape(T, SX)
            xa = _gather_rows(rows, xal, SX)
            xb = _gather_rows(rows, xbl, SX)
            if shear:
                out.append(carry[b * n_acc] + wa * xa + wb * xb)
                continue
            xv = xa * (one - fx) + xb * fx
            out.append(carry[b * n_acc] + wzy * xv)
            if want_grad:
                xd = xb - xa
                out.append(carry[b * n_acc + 1] + dwz * wy * xv)
                out.append(carry[b * n_acc + 2] + wz * dwy * xv)
                out.append(carry[b * n_acc + 3] + wzy * xd)
        return tuple(out)

    def kz_body(kz, carry):
        return jax.lax.fori_loop(
            ky_lo, ky_hi, lambda ky, c: ky_body(kz, ky, c), carry)

    acc = jax.lax.fori_loop(kz_lo, kz_hi, kz_body, init)

    keep = inside & jnp.logical_not(bad)
    for b in range(B):
        val = jnp.where(keep, acc[b * n_acc], bg)
        out_ref[b] = val.reshape(TZ, TY, TX)
        if want_grad:
            gz_ref[b] = jnp.where(keep, acc[b * n_acc + 1],
                                  0.0).reshape(TZ, TY, TX)
            gy_ref[b] = jnp.where(keep, acc[b * n_acc + 2],
                                  0.0).reshape(TZ, TY, TX)
            gx_ref[b] = jnp.where(keep, acc[b * n_acc + 3],
                                  0.0).reshape(TZ, TY, TX)

    # overflow counter: one shared (8, 128) block revisited by every
    # tile (TPU grid runs sequentially, so += is a safe reduction)
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        ovf_ref[...] = jnp.zeros_like(ovf_ref)

    ovf_ref[...] += jnp.sum(
        bad.astype(jnp.float32)) * jnp.ones_like(ovf_ref) / 1024.0


def _warp_call(vol, coords, background, want_grad, window, interpret,
               mode="coords", out_shape=None, logical_dims=None, tz=8):
    """Padded pallas_call. vol (B, Z, Y, X) f32.

    coords per mode:
    - "coords": (cz, cy, cx) tuple, each (Zo, Yo, Xo) absolute voxel
      sample coordinates;
    - "disp": (3, Zo, Yo, Xo) planar displacement field in voxel units,
      rows ordered (x, y, z) — the kernel adds the output-grid base;
    - "affine": 12 row-major coefficients of the output-pixel -> input
      pixel map ((x, y, z) rows over (x, y, z, 1) columns; traced values
      fine) with ``out_shape`` giving (Zo, Yo, Xo);
    - "affine_shear": 16 coefficients — the 12 affine ones plus
      (ky, kz, oy, oz) staircase-shear parameters; ``vol`` is the
      SHEARED volume built by :func:`affine_warp_oblique` and
      ``logical_dims`` carries the ORIGINAL (Z, Y, X) used for the
      inside test and tap clamping.
    """
    B, Z, Y, X = vol.shape
    # logical dims drive the inside test / tap clamps (original frame);
    # Z/Y/X stay the PHYSICAL (possibly sheared) dims for pad/slab math
    Zl, Yl, Xl = (Z, Y, X) if logical_dims is None \
        else (int(v) for v in logical_dims)
    if mode == "coords":
        cz, cy, cx = coords
        Zo, Yo, Xo = cz.shape
    elif mode == "disp":
        Zo, Yo, Xo = coords.shape[1:]
    else:
        Zo, Yo, Xo = out_shape
    if mode == "affine_shear" and want_grad:
        raise NotImplementedError("affine_shear mode is forward-only")
    cfg = _pick_config((Z, Y, X), window, tz=tz)
    TZ, TY, TX = cfg["TZ"], cfg["TY"], cfg["TX"]
    ZS, YS, SX = cfg["ZS"], cfg["YS"], cfg["SX"]

    # pad the volume: FZ/FY leading rows keep slab base demands
    # non-negative (a low output row may sample volume row 0), trailing
    # pad guarantees a full slab fits; the output grid pads to tile
    # multiples (padded positions are masked outside: explicit -1 coords
    # here, the (program_id, iota) < out-dims test in fused modes — so
    # they never enter the slab-base/window reductions or the overflow
    # count)
    FZ, FY = TZ, TY
    # trailing headroom of TZ-1/TY-1 rows: when the slab base clips to
    # ZP-ZS at the far edge, the widened window still fits ZS-TZ
    Zp = max(_round_up(Z + FZ + TZ - 1, 8), ZS)
    Yp = max(_round_up(Y + FY + TY - 1 + 8, 8), YS)  # +8 aligned-load slack
    Xp = max(_round_up(X, 128), SX)
    vol = jnp.pad(vol, ((0, 0), (FZ, Zp - Z - FZ), (FY, Yp - Y - FY),
                        (0, Xp - X)))
    cfg = dict(cfg, FZ=FZ, FY=FY, ZP=Zp, YP=Yp, XP=Xp)
    oz, oy, ox = (-Zo) % TZ, (-Yo) % TY, (-Xo) % TX
    if mode == "coords" and (oz or oy or ox):
        pad = ((0, oz), (0, oy), (0, ox))
        cz = jnp.pad(cz, pad, constant_values=-1.0)
        cy = jnp.pad(cy, pad, constant_values=-1.0)
        cx = jnp.pad(cx, pad, constant_values=-1.0)
    elif mode == "disp" and (oz or oy or ox):
        coords = jnp.pad(coords, ((0, 0), (0, oz), (0, oy), (0, ox)))
    Zg, Yg, Xg = Zo + oz, Yo + oy, Xo + ox
    grid = (Zg // TZ, Yg // TY, Xg // TX)

    dims = jnp.asarray([Zl, Yl, Xl, Zo, Yo, Xo], jnp.int32)
    bg = jnp.asarray(background, jnp.float32).reshape(1)

    kernel = partial(_warp_kernel, cfg=cfg, B=B, want_grad=want_grad,
                     mode=mode)

    def cspec():
        return pl.BlockSpec((TZ, TY, TX), lambda i, j, k: (i, j, k))

    def ospec():
        return pl.BlockSpec((B, TZ, TY, TX), lambda i, j, k: (0, i, j, k))

    g_sh = jax.ShapeDtypeStruct((B, Zg, Yg, Xg), jnp.float32)
    smem = pltpu.SMEM if (_HAS_PLTPU and not interpret) else None

    def sspec(shape):
        if smem is None:
            return pl.BlockSpec(shape, lambda i, j, k: (0,) * len(shape))
        return pl.BlockSpec(shape, lambda i, j, k: (0,) * len(shape),
                            memory_space=smem)

    if mode == "coords":
        c_specs = [cspec(), cspec(), cspec()]
        c_args = (cz, cy, cx)
    elif mode == "disp":
        c_specs = [pl.BlockSpec((3, TZ, TY, TX),
                                lambda i, j, k: (0, i, j, k))]
        c_args = (jnp.asarray(coords, jnp.float32),)
    else:
        n_coef = 16 if mode == "affine_shear" else 12
        c_specs = [sspec((n_coef,))]
        c_args = (jnp.asarray(coords, jnp.float32).reshape(n_coef),)

    n_out = 4 if want_grad else 1
    ovf_spec = pl.BlockSpec((8, 128), lambda i, j, k: (0, 0))
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sspec((6,)), sspec((1,))] + c_specs
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple([ospec()] * n_out) + (ovf_spec,),
        out_shape=tuple([g_sh] * n_out)
        + (jax.ShapeDtypeStruct((8, 128), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((B, ZS, YS, SX), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(dims, bg, *c_args, vol)

    out = results[0][:, :Zo, :Yo, :Xo]
    ovf = results[-1]
    grads = None
    if want_grad:
        grads = (results[1][:, :Zo, :Yo, :Xo],
                 results[2][:, :Zo, :Yo, :Xo],
                 results[3][:, :Zo, :Yo, :Xo])
    return out, grads, jnp.sum(ovf)


def _field_warp_call(vol, cz, cy, cx, background, want_grad, window,
                     interpret):
    """Back-compat shim: coordinate-mode :func:`_warp_call`."""
    return _warp_call(vol, (cz, cy, cx), background, want_grad, window,
                      interpret, mode="coords")


def field_warp_xla(vol, cz, cy, cx, background=0.0):
    """XLA twin (exact same semantics; the slow computed-index gather).
    vol (Z,Y,X) or (B,Z,Y,X)."""
    from .resample import _trilinear
    coords = jnp.stack([cx, cy, cz], axis=-1)
    if vol.ndim == 3:
        return _trilinear(jnp.asarray(vol, jnp.float32), coords,
                          jnp.float32(background))
    outs = [_trilinear(jnp.asarray(vol[b], jnp.float32), coords,
                       jnp.float32(background))
            for b in range(vol.shape[0])]
    return jnp.stack(outs)


def field_warp(vol, cz, cy, cx, background=0.0, want_grad=False,
               window=None, interpret=None, check_overflow=None):
    """Trilinear-sample ``vol`` at absolute voxel coords (cz, cy, cx).

    vol : (Z, Y, X) or (B, Z, Y, X) array (any real dtype)
    cz, cy, cx : (Zo, Yo, Xo) f32 sample coordinates in voxel units
    want_grad : also return (d/dcz, d/dcy, d/dcx) accumulated from the
        same taps (exact trilinear derivative)
    window : optional (DZ, DY) within-tile spread caps (static)
    check_overflow : pull the slab-overflow counter and redo with the
        XLA twin if any element exceeded the caps (default: on when
        called eagerly, off under jit where the sync is impossible)

    Returns ``out`` or ``(out, (gz, gy, gx))``.
    """
    squeeze = (np.ndim(vol) == 3)
    vol = jnp.asarray(vol, jnp.float32)
    if squeeze:
        vol = vol[None]
    cz = jnp.asarray(cz, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)

    backend = jax.default_backend()
    explicit_interpret = interpret is not None
    if interpret is None:
        interpret = backend != "tpu"
    tracing = any(isinstance(a, jax.core.Tracer)
                  for a in (vol, cz, cy, cx))
    if check_overflow is None:
        check_overflow = not tracing

    # off-TPU the XLA twin beats interpret-mode kernel emulation (the
    # gather pathology is TPU-specific); interpret=True explicitly
    # still exercises the kernel (the CPU test path). An explicit
    # interpret=False off-TPU ALSO takes the twin — a Mosaic kernel
    # cannot lower there (review finding, matching warp_disp_jit)
    if backend != "tpu" and not (explicit_interpret and interpret):
        out = field_warp_xla(vol, cz, cy, cx, background)
        out = out[0] if squeeze else out
        if want_grad:
            g = _xla_coord_grads(vol, cz, cy, cx, squeeze)
            return out, g
        return out

    out, grads, ovf = _field_warp_call(vol, cz, cy, cx, background,
                                       want_grad, window, bool(interpret))
    if check_overflow and not tracing and float(ovf) > 0:
        out = field_warp_xla(vol, cz, cy, cx, background)
        if want_grad:
            grads = _xla_coord_grads(vol, cz, cy, cx, False)
    if squeeze:
        out = out[0]
        if want_grad:
            grads = tuple(g[0] for g in grads)
    if want_grad:
        return out, grads
    return out


def _xla_coord_grads(vol, cz, cy, cx, squeeze):
    """Exact trilinear coordinate gradients via the XLA gather path
    (fallback twin of the kernel's want_grad accumulators)."""
    from .resample import _trilinear_parts
    gzs, gys, gxs = [], [], []
    coords = jnp.stack([cx, cy, cz], axis=-1)
    for b in range(vol.shape[0]):
        _, res = _trilinear_parts(vol[b], coords, jnp.float32(0.0))
        c, fx, fy, fz, c00, c01, c10, c11, c0, c1, inside = res
        dx = ((c[1] - c[0]) * (1 - fy) + (c[3] - c[2]) * fy) * (1 - fz) \
            + ((c[5] - c[4]) * (1 - fy) + (c[7] - c[6]) * fy) * fz
        dy = (c01 - c00) * (1 - fz) + (c11 - c10) * fz
        dz = c1 - c0
        m = inside.astype(jnp.float32)
        gzs.append(dz * m)
        gys.append(dy * m)
        gxs.append(dx * m)
    gz, gy, gx = (jnp.stack(gzs), jnp.stack(gys), jnp.stack(gxs))
    if squeeze:
        gz, gy, gx = gz[0], gy[0], gx[0]
    return gz, gy, gx


def make_warp_sampler(vol, background=0.0, window=None, interpret=None):
    """Differentiable sampler ``sample(cz, cy, cx) -> out`` with an
    EXACT analytic coordinate VJP computed by the warp kernel itself in
    the forward pass (no re-gather in the backward pass). Not
    differentiable w.r.t. the volume (returns zero cotangent).

    This is the registration hot path: under ``lax.scan`` the whole
    multi-resolution descent keeps one kernel dispatch per step.

    Off-TPU (unless interpret=True explicitly exercises the kernel)
    the sampler is built on the exact XLA twin instead of interpret-
    mode kernel emulation, which is orders of magnitude slower for the
    same result (review finding).
    """
    vol = jnp.asarray(vol, jnp.float32)
    squeeze = vol.ndim == 3
    volb = vol[None] if squeeze else vol

    def bwd(res, g):
        gz, gy, gx = res
        if not squeeze:
            return (jnp.sum(g * gz, axis=0), jnp.sum(g * gy, axis=0),
                    jnp.sum(g * gx, axis=0))
        return (g * gz, g * gy, g * gx)

    if jax.default_backend() != "tpu" and interpret is not True:
        @jax.custom_vjp
        def sample(cz, cy, cx):
            out = field_warp_xla(volb, cz, cy, cx, background)
            return out[0] if squeeze else out

        def fwd(cz, cy, cx):
            out = field_warp_xla(volb, cz, cy, cx, background)
            gz, gy, gx = _xla_coord_grads(volb, cz, cy, cx, False)
            if squeeze:
                out, gz, gy, gx = out[0], gz[0], gy[0], gx[0]
            return out, (gz, gy, gx)

        sample.defvjp(fwd, bwd)
        return sample

    @jax.custom_vjp
    def sample(cz, cy, cx):
        out, _, _ = _field_warp_call(
            volb, cz, cy, cx, jnp.float32(background), False, window,
            _default_interpret(interpret))
        return out[0] if squeeze else out

    def fwd(cz, cy, cx):
        out, grads, _ = _field_warp_call(
            volb, cz, cy, cx, jnp.float32(background), True, window,
            _default_interpret(interpret))
        gz, gy, gx = grads
        if squeeze:
            out, gz, gy, gx = out[0], gz[0], gy[0], gx[0]
        return out, (gz, gy, gx)

    sample.defvjp(fwd, bwd)
    return sample


def make_disp_sampler(vol, background=0.0, window=None, interpret=None,
                      with_overflow=False):
    """Differentiable DISPLACEMENT sampler ``sample(disp) -> out`` with
    the exact analytic VJP fused into the forward kernel pass.

    disp is the planar (3, Zo, Yo, Xo) voxel-displacement field, rows
    (x, y, z); out(p) = vol(p + disp(p)). The cotangent w.r.t. disp is
    just the coordinate gradients the kernel already accumulates —
    ``(g*gx, g*gy, g*gz)`` stacked planar — so deformable descents
    (B-spline FFD) never materialize coordinate volumes in either pass.
    Not differentiable w.r.t. the volume.

    with_overflow=True makes the sampler return ``(out, ovf)`` where
    ovf is the f32 slab-overflow element count (zero cotangent), so an
    optimizer scan can accumulate overflow across EVERY iterate instead
    of only inspecting the final field (ADVICE r2: a transiently
    overflowing fit silently degrades convergence).

    Off-TPU (unless interpret=True) the sampler is built on the exact
    XLA twin — overflow is then always 0.0 (the twin has no slab
    caps)."""
    vol = jnp.asarray(vol, jnp.float32)
    squeeze = vol.ndim == 3
    volb = vol[None] if squeeze else vol

    def bwd(res, g):
        gz, gy, gx = res
        if with_overflow:
            g = g[0]
        if not squeeze:
            return (jnp.stack([jnp.sum(g * gx, axis=0),
                               jnp.sum(g * gy, axis=0),
                               jnp.sum(g * gz, axis=0)]),)
        return (jnp.stack([g * gx, g * gy, g * gz]),)

    if jax.default_backend() != "tpu" and interpret is not True:
        def _disp_coords(disp):
            zz, yy, xx = _base_grid(disp.shape[1:])
            return (zz + disp[2], yy + disp[1], xx + disp[0])

        @jax.custom_vjp
        def sample(disp):
            cz, cy, cx = _disp_coords(disp)
            out = field_warp_xla(volb, cz, cy, cx, background)
            out = out[0] if squeeze else out
            return (out, jnp.float32(0.0)) if with_overflow else out

        def fwd(disp):
            cz, cy, cx = _disp_coords(disp)
            out = field_warp_xla(volb, cz, cy, cx, background)
            gz, gy, gx = _xla_coord_grads(volb, cz, cy, cx, False)
            if squeeze:
                out, gz, gy, gx = out[0], gz[0], gy[0], gx[0]
            return (((out, jnp.float32(0.0)) if with_overflow else out),
                    (gz, gy, gx))

        sample.defvjp(fwd, bwd)
        return sample

    @jax.custom_vjp
    def sample(disp):
        out, _, ovf = _warp_call(volb, disp, jnp.float32(background),
                                 False, window, _default_interpret(interpret),
                                 mode="disp")
        out = out[0] if squeeze else out
        return (out, ovf) if with_overflow else out

    def fwd(disp):
        out, grads, ovf = _warp_call(volb, disp, jnp.float32(background),
                                     True, window,
                                     _default_interpret(interpret),
                                     mode="disp")
        gz, gy, gx = grads
        if squeeze:
            out, gz, gy, gx = out[0], gz[0], gy[0], gx[0]
        return ((out, ovf) if with_overflow else out), (gz, gy, gx)

    sample.defvjp(fwd, bwd)
    return sample


def _default_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def warp_jit(vols, cz, cy, cx, background=0.0, window=None):
    """Jit-safe warp dispatch: the Pallas kernel on TPU, the XLA twin
    elsewhere. No overflow sync is possible under jit — elements whose
    taps exceed the slab caps return ``background`` (callers in
    iterative loops, e.g. demons, keep fields smooth so the caps hold;
    eager surfaces should use :func:`field_warp` which verifies).

    vols (B, Z, Y, X) or (Z, Y, X); coords (Zo, Yo, Xo) voxel units."""
    squeeze = vols.ndim == 3
    volb = vols[None] if squeeze else vols
    if jax.default_backend() == "tpu":
        out, _, _ = _field_warp_call(
            jnp.asarray(volb, jnp.float32), cz, cy, cx,
            jnp.asarray(background, jnp.float32), False, window, False)
    else:
        out = field_warp_xla(jnp.asarray(volb, jnp.float32), cz, cy, cx,
                             background)
    return out[0] if squeeze else out


def warp_disp_jit(vols, disp, background=0.0, window=None,
                  interpret=None, with_overflow=False):
    """Jit-safe DISPLACEMENT warp: out(p) = vols(p + disp(p)).

    disp is the (3, Zo, Yo, Xo) planar voxel-displacement field with
    rows ordered (x, y, z). On TPU this runs the fused-coordinate
    kernel mode — the output-grid base coordinates are generated
    in-register from (program_id, iota), so no (Zo, Yo, Xo) coordinate
    volumes are materialized (those dominate DVF-warp HBM traffic:
    ~2.4 ms/iter @128^3 vs ~2 ms for the warp itself, docs/PERF.md).

    with_overflow=True also returns the slab-overflow element count
    (f32 scalar, differentiable surfaces can carry it through scans so
    eager callers can verify exactness post-hoc).
    """
    squeeze = vols.ndim == 3
    volb = vols[None] if squeeze else vols
    # run the kernel on TPU, or anywhere when interpret=True explicitly
    # exercises it; interpret=False off-TPU still takes the XLA twin
    # (a Mosaic kernel cannot lower there — round-2 review finding)
    use_kernel = (jax.default_backend() == "tpu") or interpret is True
    if use_kernel:
        out, _, ovf = _warp_call(
            jnp.asarray(volb, jnp.float32), jnp.asarray(disp, jnp.float32),
            jnp.asarray(background, jnp.float32), False, window,
            _default_interpret(interpret), mode="disp")
    else:
        zz, yy, xx = _base_grid(disp.shape[1:])
        out = field_warp_xla(jnp.asarray(volb, jnp.float32),
                             zz + disp[2], yy + disp[1], xx + disp[0],
                             background)
        ovf = jnp.float32(0.0)
    out = out[0] if squeeze else out
    return (out, ovf) if with_overflow else out


# slab scratch budget for auto-sized windows (v5e VMEM is ~16 MB/core;
# leave headroom for coordinate/output blocks and Mosaic temporaries)
SLAB_VMEM_BUDGET = 8 << 20


def field_warp_disp(vols, disp, background=0.0):
    """Eager EXACT displacement warp: out(p) = vols(p + disp(p)).

    disp (3, Zo, Yo, Xo) planar voxel displacements, (x, y, z) rows.
    Sizes the kernel window from the field's own per-tile spread
    (:func:`required_window`), verifies the overflow counter, and
    falls back to the XLA twin when the demanded slab exceeds VMEM or
    any element still overflowed — results match the gather exactly."""
    squeeze = np.ndim(vols) == 3
    volb = jnp.asarray(vols, jnp.float32)
    if squeeze:
        volb = volb[None]
    disp = jnp.asarray(disp, jnp.float32)
    tracing = any(isinstance(a, jax.core.Tracer) for a in (volb, disp))
    if jax.default_backend() == "tpu" and not tracing:
        win = required_window(np.asarray(disp))
        if window_slab_bytes(volb.shape[1:], win,
                             volb.shape[0]) <= SLAB_VMEM_BUDGET:
            out, _, ovf = _warp_call(volb, disp,
                                     jnp.asarray(background, jnp.float32),
                                     False, win, False, mode="disp")
            if float(ovf) == 0.0:
                return out[0] if squeeze else out
    zz, yy, xx = _base_grid(disp.shape[1:])
    out = field_warp_xla(volb, zz + disp[2], yy + disp[1], xx + disp[0],
                         background)
    return out[0] if squeeze else out


def required_window(disp, tz=8, ty=8, tx=128):
    """Host-side (DZ, DY) window caps a displacement field demands.

    disp: (3, Z, Y, X) planar voxel displacements (x, y, z rows), host
    array. Returns the per-tile max spread of the z/y tap coordinates
    over the kernel's (tz, ty, tx) output tiling, plus the fractional
    tap and loop slack the kernel needs. Feed to ``window=`` so rough
    fields keep the exact fast path instead of overflowing to
    background."""
    d = np.asarray(disp, np.float32)
    _, Z, Y, X = d.shape
    pz, py, px = (-Z) % tz, (-Y) % ty, (-X) % tx
    d = np.pad(d, ((0, 0), (0, pz), (0, py), (0, px)), mode="edge")
    caps = []
    for comp in (2, 1):                      # z then y rows
        c = d[comp].reshape((Z + pz) // tz, tz, (Y + py) // ty, ty,
                            (X + px) // tx, tx)
        spread = c.max(axis=(1, 3, 5)) - c.min(axis=(1, 3, 5))
        caps.append(int(np.ceil(spread.max())) + 3)
    return max(caps[0], 16), max(caps[1], 16)


def window_slab_bytes(vol_shape, window, batch=1):
    """VMEM bytes the warp kernel's slab scratch needs for a window."""
    cfg = _pick_config(vol_shape, window)
    return batch * cfg["ZS"] * cfg["YS"] * cfg["SX"] * 4


def fits_x_window(disp_x, vol_x, tx=128):
    """True when a displacement field's x taps fit the kernel's x slab.

    For vol X <= 512 the whole padded row is resident (always fits);
    beyond that the slab is a 384-lane window with a 128-aligned base,
    so the within-tile x-tap spread (tile width + displacement spread)
    must stay under 256 lanes. required_window covers only (DZ, DY) —
    this is its x-axis companion (review finding)."""
    cfg = _pick_config((1, 1, vol_x))
    if cfg["SX"] >= _round_up(vol_x, 128):
        return True
    d = np.asarray(disp_x, np.float32)
    Z, Y, X = d.shape
    px = (-X) % tx
    d = np.pad(d, ((0, 0), (0, 0), (0, px)), mode="edge")
    c = d.reshape(Z, Y, (X + px) // tx, tx)
    spread = (c.max(axis=3) - c.min(axis=3)).max()
    return float(spread) + tx + 3 <= cfg["SX"] - 128


def affine_coords(pixel_matrix, out_shape):
    """Materialize (cz, cy, cx) for an (x,y,z)-ordered 4x4 pixel matrix
    mapping output pixel (x, y, z, 1) -> input pixel, the convention of
    :func:`ops.resample.affine_resample`. Differentiable in the matrix."""
    A = jnp.asarray(pixel_matrix, jnp.float32)
    Zo, Yo, Xo = (int(s) for s in out_shape)
    zz, yy, xx = _base_grid((Zo, Yo, Xo))
    cx = A[0, 0] * xx + A[0, 1] * yy + A[0, 2] * zz + A[0, 3]
    cy = A[1, 0] * xx + A[1, 1] * yy + A[1, 2] * zz + A[1, 3]
    cz = A[2, 0] * xx + A[2, 1] * yy + A[2, 2] * zz + A[2, 3]
    shape = (Zo, Yo, Xo)
    return (jnp.broadcast_to(cz, shape), jnp.broadcast_to(cy, shape),
            jnp.broadcast_to(cx, shape))


def affine_warp(volume, pixel_matrix, out_shape, background=0.0,
                window=None, interpret=None, check_overflow=None):
    """Exact affine resample through the Pallas warp kernel; same
    contract as :func:`ops.resample.affine_resample` (and the same
    result bit-for-bit, via the shared tap semantics)."""
    cz, cy, cx = affine_coords(pixel_matrix, out_shape)
    return field_warp(volume, cz, cy, cx, background=background,
                      window=window, interpret=interpret,
                      check_overflow=check_overflow)


@partial(jax.jit,
         static_argnames=("out_shape", "perm", "flips", "interpret",
                          "tz"))
def affine_warp_fused(volume, pixel_matrix, background, out_shape,
                      perm=None, flips=None, interpret=False, tz=8):
    """One-program affine resample: optional input relayout
    (transpose/flip pre-pass for large rotations) + coordinate
    generation + the warp kernel, returning ``(out, overflow_count)``.

    The eager :func:`affine_warp` chain costs ~20 separate dispatches
    (coords, pad, kernel, slice) — through the tunneled chip that is
    ~0.5 s of pure RPC floor per call (docs/PERF.md). Callers pull the
    1-element overflow count and fall back to the exact gather when it
    is nonzero."""
    vol = jnp.asarray(volume, jnp.float32)
    if perm is not None:
        vol = jnp.transpose(vol, perm)
    if flips:
        vol = jnp.flip(vol, flips)
    # fused affine mode: the kernel computes sample coordinates from 12
    # SMEM coefficients + (program_id, iota) — zero coordinate HBM
    # traffic (vs three materialized (Zo,Yo,Xo) volumes)
    A12 = jnp.asarray(pixel_matrix, jnp.float32)[:3, :].reshape(12)
    out, _, ovf = _warp_call(vol[None], A12,
                             jnp.asarray(background, jnp.float32),
                             False, None, interpret, mode="affine",
                             out_shape=tuple(int(s) for s in out_shape),
                             tz=tz)
    return out[0], ovf


# ---------------------------------------------------------------------------
# Oblique (30-60 degree) affine resample: exact staircase-shear
# factorization. A fully oblique rotation puts a ~|sin(theta)|*128-row
# diagonal band under every 128-lane output tile, which no VMEM slab
# window can cover (round-2 finding: such transforms fell back to the
# ~14 M pts/s XLA gather). Factor the map instead:
#
#   warp(V, A) == warp_shear(shear(V, ky, kz), A, ky, kz)
#
# where shear is an EXACT integer row permutation
#   V2[z + oz - stair(kz, x), y + oy - stair(ky, x), x] = V[z, y, x],
#   stair(k, x) = floor(k*x + 0.5),  ky = A10/A00, kz = A20/A00,
# built on-device by the ordinary warp kernel in TRANSPOSED (z, x, y)
# layout (there the per-column row shift is a per-sublane-constant LANE
# gather with integer coords — exact, and it fits the default slab
# windows since its sublane spreads are ~|k|*8). The residual warp's
# per-tile sublane spread collapses to the Schur-complement rows
# |A11 - ky*A01|*TY + |A12 - ky*A02|*TZ + O(1), so 30-60 degree
# obliques run at aligned-kernel-class speed instead of the gather.
# ---------------------------------------------------------------------------

def _stair(k, x):
    """The staircase shift floor(k*x + 0.5) — ONE formula shared by the
    host planner (numpy), the shear builder (jnp) and the kernel, so
    all three round identically (f32)."""
    return np.floor(np.float32(k) * np.float32(x) + np.float32(0.5))


def oblique_plan(pixel_matrix, vol_shape_zyx, budget=None):
    """Host-side feasibility plan for the staircase-shear oblique path.

    Returns None when the factorization does not apply (x column too
    weak / slopes too steep / residual window exceeds the VMEM budget),
    else a dict with the shear slopes, offsets, sheared dims and the
    residual (DZ, DY) window for :func:`affine_warp_oblique`."""
    A = np.asarray(pixel_matrix, np.float64)
    R = A[:3, :3]
    a00 = R[0, 0]
    if abs(a00) < 0.35:
        return None
    ky = R[1, 0] / a00
    kz = R[2, 0] / a00
    if abs(ky) > 1.05 or abs(kz) > 1.05:
        return None
    Z, Y, X = (int(v) for v in vol_shape_zyx)
    # residual per-tile spreads: the shear cancels the x_o coupling of
    # the z/y rows exactly; what remains is the Schur complement over
    # (y_o, z_o) plus bounded constants (floor tap +1, staircase
    # rounding +1, x0-vs-x1 shift difference +|k|, second tap +1).
    # The kernel's (kz, ky) match loop trips = the PRODUCT of the two
    # spreads. TZ stays 8: thinner output tiles were MEASURED worse
    # (45deg-(1,1,1) 256^3: 61.5 ms at TZ=2 vs 48.0 ms at TZ=8) — the
    # per-tile fixed cost (~1.1 us: DMA latency + grid iteration) and
    # the per-LOOP-ITERATION fixed cost (~50 ns) grow faster than the
    # trip ranges shrink (total iterations = trips(tz) * 8/tz RISES:
    # 51.5 -> 74 -> 117 for tz 8/4/2 despite per-tile trips falling
    # 51.5 -> 37 -> 29). Full roofline analysis: docs/PERF.md round 4.
    TZ, TY = 8, 8
    a12 = abs(R[1, 2] - ky * R[0, 2])
    sy = (abs(R[1, 1] - ky * R[0, 1]) * (TY - 1)
          + a12 * (TZ - 1) + abs(ky) + 4)
    szp = (abs(R[2, 1] - kz * R[0, 1]) * (TY - 1)
           + abs(R[2, 2] - kz * R[0, 2]) * (TZ - 1)
           + abs(kz) + 4)
    # the window also absorbs the slab-base alignment residual (y base
    # aligns down to 8) the non-shear path absorbs the same way
    win = (max(16, int(np.ceil(szp)) + 2),
           max(16, int(np.ceil(sy)) + 2))
    # sheared dims: staircases are monotone, extremes at x endpoints
    ez = int(_stair(kz, X - 1))
    ey = int(_stair(ky, X - 1))
    oz = max(0, ez)
    oy = max(0, ey)
    Z2 = _round_up(Z + abs(ez), 16)
    Y2 = _round_up(Y + abs(ey), 16)
    if budget is None:
        budget = SLAB_VMEM_BUDGET
    if window_slab_bytes((Z2, Y2, X), win, 1) > budget:
        return None
    # x slab: when the padded row exceeds the resident SX window the
    # within-tile x footprint (plus the 128-aligned base residual)
    # must fit the window, exactly like fits_x_window for fields
    cfg = _pick_config((Z2, Y2, X), win)
    if cfg["SX"] < _round_up(X, 128):
        foot = (abs(R[0, 0]) * 127 + abs(R[0, 1]) * 7
                + abs(R[0, 2]) * 7 + 2)
        if foot > cfg["SX"] - 128:
            return None
    return dict(ky=float(ky), kz=float(kz), oy=int(oy), oz=int(oz),
                Z2=int(Z2), Y2=int(Y2), window=win)


@partial(jax.jit, static_argnames=("out_shape", "v2_shape", "window",
                                   "perm", "flips", "interpret"))
def _oblique_call(vol, A12, kap, background, out_shape, v2_shape,
                  window, perm, flips, interpret):
    """One-program oblique resample: relayout -> on-device staircase
    shear (transposed-layout warp, integer coords, exact) -> residual
    affine_shear kernel. Returns (out, total_overflow)."""
    if perm is not None:
        vol = jnp.transpose(vol, perm)
    if flips:
        vol = jnp.flip(vol, flips)
    Z, Y, X = vol.shape
    Z2, Y2 = v2_shape
    ky, kz, oy, oz = kap[0], kap[1], kap[2], kap[3]
    # staircase shear in (z, x, y) layout: source row shifts become a
    # per-sublane-constant lane gather the ordinary kernel handles with
    # default windows (sublane spreads ~|k|*8); integer coords make the
    # trilinear taps degenerate to the exact row copy
    vt = jnp.transpose(vol, (0, 2, 1))
    z2 = jnp.arange(Z2, dtype=jnp.float32)[:, None, None]
    xc = jnp.arange(X, dtype=jnp.float32)[None, :, None]
    y2 = jnp.arange(Y2, dtype=jnp.float32)[None, None, :]
    stz = jnp.floor(kz * xc + 0.5)
    sty = jnp.floor(ky * xc + 0.5)
    sh = (Z2, X, Y2)
    cz1 = jnp.broadcast_to(z2 - oz + stz, sh)
    cy1 = jnp.broadcast_to(xc, sh)
    cx1 = jnp.broadcast_to(y2 - oy + sty, sh)
    v2t, _, ovf1 = _warp_call(vt[None], (cz1, cy1, cx1),
                              jnp.float32(0.0), False, None, interpret,
                              mode="coords")
    v2 = jnp.transpose(v2t[0], (0, 2, 1))
    coef = jnp.concatenate([A12, kap])
    out, _, ovf2 = _warp_call(v2[None], coef, background, False, window,
                              interpret, mode="affine_shear",
                              out_shape=out_shape,
                              logical_dims=(Z, Y, X))
    return out[0], ovf1 + ovf2


def affine_warp_oblique(volume, pixel_matrix, background, out_shape,
                        plan, perm=None, flips=None, interpret=False):
    """Exact oblique affine resample via the staircase-shear
    factorization (see module section comment). ``plan`` comes from
    :func:`oblique_plan` for the (relayouted) matrix; returns
    ``(out, overflow_count)`` — callers fall back to the XLA gather
    when the count is nonzero, so results are always exact."""
    vol = jnp.asarray(volume, jnp.float32)
    A12 = jnp.asarray(pixel_matrix, jnp.float32)[:3, :].reshape(12)
    kap = jnp.asarray([plan["ky"], plan["kz"], plan["oy"], plan["oz"]],
                      jnp.float32)
    return _oblique_call(vol, A12, kap,
                         jnp.asarray(background, jnp.float32),
                         tuple(int(s) for s in out_shape),
                         (plan["Z2"], plan["Y2"]), plan["window"],
                         perm, tuple(flips) if flips else (),
                         bool(interpret))
