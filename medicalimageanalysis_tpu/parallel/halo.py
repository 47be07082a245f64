"""Spatially-sharded stencils with halo exchange.

SURVEY.md §5's sequence-parallel analogue: very large single volumes
shard their z-axis over the 'space' mesh axis; stencil kernels
(Gaussian here, the demons smoothing pattern) exchange a halo of
boundary slices with ring neighbors via lax.ppermute so each shard
convolves locally — collectives ride ICI, compute never leaves the
shard.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["gaussian_z_sharded"]


def _gauss_taps(sigma_vox):
    radius = max(1, int(np.ceil(4 * sigma_vox)))
    offsets = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (offsets / sigma_vox) ** 2)
    return (k / k.sum()).astype(np.float32), radius


def gaussian_z_sharded(volume, sigma_vox, mesh, axis_name="space"):
    """Gaussian blur along z of a z-sharded (Z, Y, X) volume.

    The volume is placed with z split over `axis_name`; each shard
    ppermutes its top/bottom `radius` slices to the neighboring shards,
    then convolves its halo-extended slab locally. Global edges use
    edge replication (matches ops.filters.gaussian_filter's 'nearest').
    """
    taps, radius = _gauss_taps(float(sigma_vox))
    n_shards = mesh.shape[axis_name]
    Z = volume.shape[0]
    if Z % n_shards != 0:
        raise ValueError(f"z={Z} not divisible by {n_shards} shards")

    taps_j = jnp.asarray(taps)

    def local_fn(block):
        # block: (Z/n, Y, X) local shard
        idx = lax.axis_index(axis_name)
        top = block[:radius]          # lowest-z slices of this shard
        bot = block[-radius:]         # highest-z slices

        # receive the neighbor-below's bottom slices and the
        # neighbor-above's top slices (ring permute; wrap masked below)
        from_below = lax.ppermute(
            bot, axis_name,
            [(i, (i + 1) % n_shards) for i in range(n_shards)])
        from_above = lax.ppermute(
            top, axis_name,
            [(i, (i - 1) % n_shards) for i in range(n_shards)])

        # global edges: replicate the shard's own edge slice instead of
        # the wrapped-around data
        edge_low = jnp.repeat(block[:1], radius, axis=0)
        edge_high = jnp.repeat(block[-1:], radius, axis=0)
        below = jnp.where(idx == 0, edge_low, from_below)
        above = jnp.where(idx == n_shards - 1, edge_high, from_above)

        slab = jnp.concatenate([below, block, above], axis=0)
        out = jnp.zeros_like(block)
        for t in range(2 * radius + 1):
            out = out + taps_j[t] * lax.dynamic_slice_in_dim(
                slab, t, block.shape[0], axis=0)
        return out

    sharding = NamedSharding(mesh, P(axis_name, None, None))
    vol = jax.device_put(jnp.asarray(volume, jnp.float32), sharding)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=P(axis_name, None, None),
                   out_specs=P(axis_name, None, None))
    return jax.jit(fn)(vol)
