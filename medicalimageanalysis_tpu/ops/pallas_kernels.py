"""Pallas TPU kernels.

First hand kernel: the DVH cumulative histogram — for every threshold
t_i, count masked dose voxels with dose < t_i. One pass over HBM with
the accumulator resident in VMEM (XLA's vmap-of-reductions reads the
dose array n_bins times; this reads it once). Used by ops/dvh for large
cohort DVH batches on TPU; interpret mode keeps it testable on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is present on TPU builds of jax
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ["dose_below_histogram", "lane_interp", "shear_x"]

_TILE = 2048
_ROW_TILE = 256


def _hist_kernel(dose_ref, valid_ref, thr_ref, out_ref):
    step = pl.program_id(0)
    dose = dose_ref[:]                      # (TILE,) f32 tile in VMEM
    valid = valid_ref[:]
    thr = thr_ref[:]                        # (n_bins,) resident

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # (n_bins, TILE) comparisons on the VPU, reduced along the tile
    below = (dose[None, :] < thr[:, None]) & (valid[None, :] > 0)
    out_ref[:] = out_ref[:] + jnp.sum(below.astype(jnp.float32), axis=1)


def _pallas_hist(dose, valid, thresholds, interpret):
    n = dose.shape[0]
    n_bins = thresholds.shape[0]
    grid = (n // _TILE,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        in_space = pltpu.VMEM
    else:
        in_space = None

    def spec(block, index_map):
        if in_space is None:
            return pl.BlockSpec(block, index_map)
        return pl.BlockSpec(block, index_map, memory_space=in_space)

    return pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            spec((_TILE,), lambda i: (i,)),
            spec((_TILE,), lambda i: (i,)),
            spec((n_bins,), lambda i: (0,)),
        ],
        out_specs=spec((n_bins,), lambda i: (0,)),
        out_shape=jax.ShapeDtypeStruct((n_bins,), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(dose, valid, thresholds)


def _gather_lanes(data, idx):
    """Lane-axis gather, segmented: Mosaic's tpu.dynamic_gather only
    supports a source spanning ONE 128-lane vreg along the gather dim
    ("Multiple source vregs along gather dimension"), so gather each
    128-wide segment and select by segment membership."""
    X = data.shape[1]
    outs = []
    for o in range(0, X, 128):                    # output lane chunk
        io = idx[:, o:o + 128]
        acc = jnp.zeros(io.shape, data.dtype)
        for s in range(0, X, 128):                # source vreg segment
            seg = data[:, s:s + 128]
            local = jnp.clip(io - s, 0, 127)
            g = jnp.take_along_axis(seg, local, axis=1)
            acc = jnp.where((io >= s) & (io < s + 128), g, acc)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _lane_interp_kernel(pos_ref, data_ref, out_ref, *, nx=None):
    data = data_ref[...]                      # (TR, X) rows in VMEM
    pos = pos_ref[...]                        # (TR, X) sample x-positions
    if nx is None:                            # may exceed data width when
        nx = data.shape[1]                    # the caller padded to 128
    x0f = jnp.clip(jnp.floor(pos), 0.0, nx - 2.0)
    x0 = x0f.astype(jnp.int32)
    f = pos - x0f
    a = _gather_lanes(data, x0)
    b = _gather_lanes(data, x0 + 1)
    out = a * (1.0 - f) + b * f
    # edge policy: clamp-to-edge inside, zero outside [−0.5, nx−0.5)
    valid = (pos > -0.5) & (pos < nx - 0.5)
    out_ref[...] = jnp.where(valid, out, 0.0)


def lane_interp(data, pos, interpret=None):
    """Per-row 1-D linear interpolation along the last (lane) axis.

    data : (R, Xs) f32 rows; pos : (R, Xd) f32 sample positions into
    each row. Returns (R, Xd) f32, zero outside [-0.5, Xs-0.5),
    clamp-to-edge interior taps. The Pallas building block of the
    shear-decomposed warp (docs/PERF.md: XLA computed-index gathers run
    at 14-34 M pts/s on v5e; in-kernel lane gathers run at VPU rate)."""
    data = jnp.asarray(data, jnp.float32)
    pos = jnp.asarray(pos, jnp.float32)
    R, Xs = data.shape
    Xd = pos.shape[1]

    backend = jax.default_backend()
    if interpret is None:
        interpret = backend != "tpu"
    if backend not in ("tpu", "cpu"):
        return _lane_interp_xla(data, pos)

    # the segmented gather slices whole 128-lane vregs, so pad widths up
    # to multiples of 128 instead of falling back to the slow XLA gather
    # (round-1 ADVICE: autocropped reslice dims almost never align). The
    # kernel clamps/masks against the ORIGINAL Xs (static kwarg), so the
    # zero padding is never sampled and semantics are unchanged.
    pad_s = (-Xs) % 128
    pad_d = (-Xd) % 128
    data_k = data if not pad_s else jnp.pad(data, ((0, 0), (0, pad_s)))
    pos_k = pos if not pad_d else jnp.pad(
        pos, ((0, 0), (0, pad_d)), constant_values=-1.0)

    pad = (-R) % _ROW_TILE
    if pad:
        data_k = jnp.pad(data_k, ((0, pad), (0, 0)))
        pos_k = jnp.pad(pos_k, ((0, pad), (0, 0)))
    XsK, XdK = data_k.shape[1], pos_k.shape[1]
    try:
        # NOTE: when called eagerly a Mosaic failure lands here and the
        # XLA twin takes over; under an outer jit, lowering errors
        # surface at the outer compile and are not catchable from here.
        from functools import partial
        out = pl.pallas_call(
            partial(_lane_interp_kernel, nx=Xs),
            grid=(data_k.shape[0] // _ROW_TILE,),
            in_specs=[
                pl.BlockSpec((_ROW_TILE, XdK), lambda i: (i, 0)),
                pl.BlockSpec((_ROW_TILE, XsK), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((_ROW_TILE, XdK), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((data_k.shape[0], XdK),
                                           jnp.float32),
            interpret=interpret,
        )(pos_k, data_k)
    except Exception:
        return _lane_interp_xla(data, pos)
    return out[:R, :Xd]


def _lane_interp_xla(data, pos):
    nx = data.shape[1]
    x0f = jnp.clip(jnp.floor(pos), 0.0, nx - 2.0)
    x0 = x0f.astype(jnp.int32)
    f = pos - x0f
    a = jnp.take_along_axis(data, x0, axis=1)
    b = jnp.take_along_axis(data, x0 + 1, axis=1)
    out = a * (1.0 - f) + b * f
    return jnp.where((pos > -0.5) & (pos < nx - 0.5), out, 0.0)


def shear_x(vol, pos_x, interpret=None):
    """Resample a (Z, Y, Xs) volume along x: out[z,y,x] =
    vol[z, y, pos_x[z,y,x]] (linear interp, zero outside). One pass of
    a shear-decomposed affine warp; flattens rows to (Z*Y, X) for the
    lane-gather kernel. pos_x may have a different last dim (Xd)."""
    Z, Y, Xs = vol.shape
    Xd = pos_x.shape[-1]
    out = lane_interp(vol.reshape(Z * Y, Xs), pos_x.reshape(Z * Y, Xd),
                      interpret=interpret)
    return out.reshape(Z, Y, Xd)


def dose_below_histogram(dose, valid, thresholds, interpret=None):
    """counts[i] = sum(valid & (dose < thresholds[i])).

    Falls back to the jnp path off-TPU; `interpret=True` forces the
    Pallas interpreter (CPU tests).
    """
    dose = jnp.asarray(dose, jnp.float32).ravel()
    valid = jnp.asarray(valid, jnp.float32).ravel()
    thresholds = jnp.asarray(thresholds, jnp.float32)

    backend = jax.default_backend()
    if interpret is None:
        interpret = backend != "tpu"
    if backend not in ("tpu", "cpu"):
        return jax.vmap(lambda t: jnp.sum(
            jnp.where(valid > 0, (dose < t).astype(jnp.float32),
                      0.0)))(thresholds)

    n = dose.shape[0]
    pad = (-n) % _TILE
    if pad:
        dose = jnp.pad(dose, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    try:
        return _pallas_hist(dose, valid, thresholds, interpret)
    except Exception:
        return jax.vmap(lambda t: jnp.sum(
            jnp.where(valid > 0, (dose < t).astype(jnp.float32),
                      0.0)))(thresholds)
