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

__all__ = ["dose_below_histogram"]

_TILE = 2048


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
