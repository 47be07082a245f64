"""Device polygon rasterization: contour -> 3D binary mask.

TPU-native replacement for the reference's per-slice cv2.fillPoly + XOR
loop (reference utils/convert/contour.py:76-116). Semantics preserved:

- vertices truncated to int32 (the reference's ``astype(np.int32)``)
- each polygon fills interior + 8-connected Bresenham boundary (cv2's
  fillPoly convention)
- polygons on the same slice combine by XOR (hole handling)

Design (one fused XLA program, no per-slice host loop):
- per-row quantities per edge: the even-odd crossing position (interior)
  and the covered pixel run (8-connected boundary);
- accumulation over edges is a chunked broadcast-compare + reduce
  against the pixel axis (TPU scatters serialize; compare+reduce is
  fused VPU work: ~E/8 streaming passes over the (K, H, W) counters);
- per-slice XOR = parity of the per-polygon bitmap sum.

All shapes are static; polygons are padded to (K, E) buckets so jit
caches a small number of compilations.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["rasterize_polygons", "polygon_bitmaps", "fill_polygons_2d"]


def _bucket(n, minimum=8):
    b = minimum
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("H", "W"))
def _polygon_bitmaps(verts, edge_valid, H, W):
    """verts: (K, E+1, 2) int32 closed vertex chains (v[i], v[i+1]) edges;
    edge_valid: (K, E) bool. Returns (K, H, W) uint8 bitmaps."""
    K, E1, _ = verts.shape
    E = E1 - 1
    x1 = verts[:, :-1, 0].astype(jnp.float32)
    y1 = verts[:, :-1, 1].astype(jnp.float32)
    x2 = verts[:, 1:, 0].astype(jnp.float32)
    y2 = verts[:, 1:, 1].astype(jnp.float32)
    valid = edge_valid

    py = jnp.arange(H, dtype=jnp.float32)[None, None, :]       # (1,1,H)
    x1b = x1[:, :, None]
    y1b = y1[:, :, None]
    x2b = x2[:, :, None]
    y2b = y2[:, :, None]
    vb = valid[:, :, None]

    # ---- interior: even-odd crossings ------------------------------
    crosses = ((y1b > py) != (y2b > py)) & vb                   # (K,E,H)
    denom = jnp.where(y2b != y1b, y2b - y1b, 1.0)
    x_int = x1b + (py - y1b) * (x2b - x1b) / denom
    # px < x_int  <=>  px <= ceil(x_int) - 1; crossing bin = ceil(x_int)
    cross_bin = jnp.clip(jnp.ceil(x_int), 0, W).astype(jnp.int32)
    # bin 0 contributes nothing under the px < bin test -> no-op value
    cross_bin = jnp.where(crosses, cross_bin, 0)                # (K,E,H)

    # ---- boundary: 8-connected line coverage ------------------------
    # cv2's fixed-point scan rounds half DOWN (x_screen =
    # (x + 2^15 - 1) >> 16), so screen_y(x) == py <=> y(x) in
    # (py-0.5, py+0.5]. EPS implements the open/closed ends for the
    # exact half-integer crossings that integer vertices produce.
    EPS = 1e-3
    dx = x2b - x1b
    dy = y2b - y1b
    shallow = jnp.abs(dx) >= jnp.abs(dy)

    # shallow: pixels x with screen_y(x) == py form a contiguous run.
    # x(y) = x1 + (y - y1) * dx/dy; slope sign decides which end is open.
    sdy = jnp.where(dy != 0, dy, 1.0)
    t_m = x1b + (py - 0.5 - y1b) * dx / sdy   # x at y = py - 0.5
    t_p = x1b + (py + 0.5 - y1b) * dx / sdy   # x at y = py + 0.5
    # ties (exact half-integer crossings) are included at both ends —
    # matches cv2's fixed-point rounding across slope signs
    lo_sl = jnp.ceil(jnp.minimum(t_m, t_p) - EPS)
    hi_sl = jnp.floor(jnp.maximum(t_m, t_p) + EPS)
    # dy == 0: whole x-range when the row matches exactly
    row_match = jnp.abs(py - y1b) < 0.5
    lo_sh = jnp.where(dy != 0, lo_sl,
                      jnp.where(row_match, -jnp.inf, jnp.inf))
    hi_sh = jnp.where(dy != 0, hi_sl,
                      jnp.where(row_match, jnp.inf, -jnp.inf))
    xmin = jnp.minimum(x1b, x2b)
    xmax = jnp.maximum(x1b, x2b)
    lo_sh = jnp.maximum(lo_sh, xmin)
    hi_sh = jnp.minimum(hi_sh, xmax)

    # steep: one pixel per row: x = round_half_down(x(py)),
    # rows py in [ymin, ymax]
    x_at = x1b + (py - y1b) * dx / sdy
    xs = jnp.floor(x_at + 0.5 - EPS)
    ymin = jnp.minimum(y1b, y2b)
    ymax = jnp.maximum(y1b, y2b)
    in_rows = (py >= ymin) & (py <= ymax)
    lo_st = jnp.where(in_rows, xs, 1.0)
    hi_st = jnp.where(in_rows, xs, 0.0)

    lo = jnp.where(shallow, lo_sh, lo_st)
    hi = jnp.where(shallow, hi_sh, hi_st)
    run = vb & (hi >= lo)
    lo_c = jnp.clip(lo, 0, W).astype(jnp.int32)
    hi_c = jnp.clip(hi + 1, 0, W + 1).astype(jnp.int32)  # exclusive end
    ok = run & (hi >= 0) & (lo <= W - 1)
    lo_c = jnp.where(ok, lo_c, W + 2)                    # empty run
    hi_c = jnp.where(ok, hi_c, 0)

    # ---- accumulate over edges: fused compare+reduce (no scatter) ----
    # TPU scatters serialize; a per-edge fold (round-1 design) kept the
    # whole (K, H, W) carry in HBM and re-read/re-wrote it E times. Here
    # edges reduce in CHUNKS: inside a chunk the (K, C, H, W) compare is
    # a virtual fusion operand of the sum/any reduce — XLA keeps the
    # accumulator in registers per output tile — so the carry maps are
    # touched only E/C times (C=128: two orders of magnitude less HBM
    # traffic, same compares).
    px = jnp.arange(W, dtype=jnp.int32)[None, None, None, :]  # (1,1,1,W)
    C = min(128, E)

    def body(carry, xs):
        par, cov = carry
        cb, lo_e, hi_e = xs                              # each (C, K, H)
        cb = jnp.moveaxis(cb, 0, 1)[..., None]           # (K, C, H, 1)
        lo_b = jnp.moveaxis(lo_e, 0, 1)[..., None]
        hi_b = jnp.moveaxis(hi_e, 0, 1)[..., None]
        n_cross = jnp.sum((px < cb).astype(jnp.int32), axis=1)
        inrun = jnp.any((px >= lo_b) & (px < hi_b), axis=1)
        return (par ^ (n_cross & 1).astype(bool), cov | inrun), None

    init = (jnp.zeros((K, H, W), bool), jnp.zeros((K, H, W), bool))
    xs = (jnp.moveaxis(cross_bin, 1, 0).reshape(E // C, C, K, H),
          jnp.moveaxis(lo_c, 1, 0).reshape(E // C, C, K, H),
          jnp.moveaxis(hi_c, 1, 0).reshape(E // C, C, K, H))
    (interior, boundary), _ = lax.scan(body, init, xs)

    return (interior | boundary).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("n_slices",))
def _scatter_xor(bitmaps, slice_idx, n_slices):
    H, W = bitmaps.shape[1], bitmaps.shape[2]
    acc = jnp.zeros((n_slices + 1, H, W), dtype=jnp.uint8)
    acc = acc.at[slice_idx].add(bitmaps)
    return (acc[:n_slices] % 2).astype(jnp.uint8)


def _polygon_bitmaps_device(polygons, H, W):
    """(K-padded device bitmaps, K): stage polygons into (Kb, E) buckets
    and run the fused bitmap program; the result STAYS on device (rows
    k >= K are all-zero padding)."""
    K = len(polygons)
    E = _bucket(max(p.shape[0] for p in polygons))
    Kb = _bucket(K, minimum=1)
    verts = np.zeros((Kb, E + 1, 2), dtype=np.int32)
    edge_valid = np.zeros((Kb, E), dtype=bool)
    for k, poly in enumerate(polygons):
        # truncation like cv2's astype(int32), epsilon-stabilized so
        # pixel-aligned physical contours don't flip on 1e-10 roundoff
        p = np.trunc(np.asarray(poly)[:, :2] + 1e-6).astype(np.int32)
        n = p.shape[0]
        verts[k, :n] = p
        verts[k, n:] = p[0]  # close + pad on first vertex
        edge_valid[k, :n] = True  # n edges: v0..vn-1 -> v1..vn(=v0)
    out = _polygon_bitmaps(jnp.asarray(verts), jnp.asarray(edge_valid),
                           H, W)
    return out, K


def polygon_bitmaps(polygons, H, W):
    """Host wrapper: list of (N, 2) float vertex arrays -> (K, H, W)
    uint8 filled bitmaps (interior + boundary)."""
    if len(polygons) == 0:
        return np.zeros((0, H, W), dtype=np.uint8)
    out, K = _polygon_bitmaps_device(polygons, H, W)
    # slice on HOST: a device out[:K] is an eager op that compiles a new
    # executable for every distinct polygon count; the padded rows are
    # all-zero and compress to ~nothing in transfer
    return np.asarray(out)[:K]


def fill_polygons_2d(polygons, H, W):
    """XOR-combine polygons into one 2D mask (cv2.fillPoly + XOR loop
    equivalent for a single plane)."""
    bitmaps = polygon_bitmaps(polygons, H, W)
    if bitmaps.shape[0] == 0:
        return np.zeros((H, W), dtype=np.uint8)
    return (bitmaps.sum(axis=0) % 2).astype(np.uint8)


def rasterize_polygons(polygons, slice_indices, n_slices, H, W):
    """Full 3D rasterization: polygons (list of (N,2)) at slice_indices
    -> (n_slices, H, W) uint8 mask with per-slice XOR semantics."""
    K = len(polygons)
    if K == 0:
        return np.zeros((n_slices, H, W), dtype=np.uint8)
    # bitmaps stay ON DEVICE through the scatter-XOR: the padded rows
    # route to the dump row, so no per-K slice executable is needed and
    # the only host transfer is the final mask (the old host round trip
    # of the padded bitmaps cost seconds through the tunnel)
    bitmaps, _ = _polygon_bitmaps_device(polygons, H, W)
    Kb = bitmaps.shape[0]
    idx = np.full(Kb, n_slices, dtype=np.int32)        # padding -> dump
    ids = np.asarray(slice_indices, dtype=np.int32)
    # out-of-range (including NEGATIVE) slices -> dump row, matching the
    # cv2 backend's `if 0 <= s < S` drop (round-2 review finding: a
    # clip-to-0 XORed below-volume contours into slice 0)
    idx[:K] = np.where((ids >= 0) & (ids < n_slices), ids, n_slices)
    out = _scatter_xor(bitmaps, jnp.asarray(idx), int(n_slices))
    return np.asarray(out)
