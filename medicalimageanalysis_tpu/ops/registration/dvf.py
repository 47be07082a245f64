"""Displacement-vector-field primitives.

TPU-native replacements for the SimpleITK DVF machinery the reference
uses (reference structure/deformable.py:732-774):

- :func:`warp_volume` — DisplacementFieldTransform + Resample:
  out(x) = vol(x + d(x)) with d in physical mm on the output grid.
- :func:`invert_dvf` — InvertDisplacementFieldImageFilter: fixed-point
  iteration v <- -d(x + v(x)).
- :func:`compose_dvf` — field composition (u after v).
- :func:`gradient_magnitude` — sitk.GradientMagnitude equivalent
  (cross-modality correction, reference utils/deformable/simpleitk.py:48).

Fields are (Z, Y, X, 3) arrays with mm components in (x, y, z) order,
matching the DICOM/ITK convention the reference stores
(reference read/dicom.py:1766-1786).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["warp_volume", "invert_dvf", "compose_dvf",
           "gradient_magnitude", "sample_dvf_at_points"]


def _base_coords(shape):
    Z, Y, X = shape
    zz = jnp.arange(Z, dtype=jnp.float32)
    yy = jnp.arange(Y, dtype=jnp.float32)
    xx = jnp.arange(X, dtype=jnp.float32)
    Zg, Yg, Xg = jnp.meshgrid(zz, yy, xx, indexing="ij")
    return Xg, Yg, Zg


@partial(jax.jit, static_argnames=())
def _warp(vol, dvf_vox, background):
    """vol (Z,Y,X); dvf_vox (Z,Y,X,3) displacement in voxels (x,y,z).

    Runs the Pallas tile-slab warp on TPU (the XLA computed-index
    gather is ~14 M pts/s on v5e — docs/PERF.md); XLA twin elsewhere."""
    from ..pallas_warp import warp_jit
    Xg, Yg, Zg = _base_coords(vol.shape)
    return warp_jit(vol, Zg + dvf_vox[..., 2], Yg + dvf_vox[..., 1],
                    Xg + dvf_vox[..., 0], background)


def warp_volume(volume, dvf_mm, spacing_xyz, background=0.0):
    """Warp: out(x) = volume(x + d(x)); d in mm on the same grid.

    Eager surface: uses the overflow-checked field warp, so results
    are exact for arbitrarily rough fields (Pallas fast path when the
    field's within-tile variation fits the slab caps; XLA otherwise).
    Under jit it stays on the jit-safe dispatch."""
    vol = jnp.asarray(volume, dtype=jnp.float32)
    dvf = jnp.asarray(dvf_mm, dtype=jnp.float32)
    sp = jnp.asarray(spacing_xyz, dtype=jnp.float32)
    if isinstance(vol, jax.core.Tracer) or isinstance(dvf, jax.core.Tracer):
        return _warp(vol, dvf / sp, jnp.float32(background))
    from ..pallas_warp import field_warp
    dvf_vox = dvf / sp
    Xg, Yg, Zg = _base_coords(vol.shape)
    return field_warp(vol, Zg + dvf_vox[..., 2], Yg + dvf_vox[..., 1],
                      Xg + dvf_vox[..., 0], background=background)


@partial(jax.jit, static_argnames=("iterations",))
def _invert(dvf_vox, iterations):
    from ..pallas_warp import warp_jit
    Xg, Yg, Zg = _base_coords(dvf_vox.shape[:3])
    field_b = jnp.moveaxis(dvf_vox, -1, 0)      # (3, Z, Y, X)

    def body(_, v):
        out = warp_jit(field_b, Zg + v[..., 2], Yg + v[..., 1],
                       Xg + v[..., 0], 0.0)     # (3, Z, Y, X)
        return -jnp.moveaxis(out, 0, -1)

    v0 = -dvf_vox
    return jax.lax.fori_loop(0, iterations, body, v0)


def invert_dvf(dvf_mm, spacing_xyz, iterations=20):
    """Fixed-point DVF inversion: returns v with (id + v) ~ (id + d)^-1."""
    dvf = jnp.asarray(dvf_mm, dtype=jnp.float32)
    sp = jnp.asarray(spacing_xyz, dtype=jnp.float32)
    out = _invert(dvf / sp, int(iterations))
    return np.asarray(out * sp)


@jax.jit
def _compose(u_vox, v_vox):
    """(u after v)(x) = u(x + v(x)) + v(x)."""
    from ..pallas_warp import warp_jit
    Xg, Yg, Zg = _base_coords(u_vox.shape[:3])
    out = warp_jit(jnp.moveaxis(u_vox, -1, 0), Zg + v_vox[..., 2],
                   Yg + v_vox[..., 1], Xg + v_vox[..., 0], 0.0)
    return jnp.moveaxis(out, 0, -1) + v_vox


def compose_dvf(u_mm, v_mm, spacing_xyz):
    sp = jnp.asarray(spacing_xyz, dtype=jnp.float32)
    u = jnp.asarray(u_mm, dtype=jnp.float32) / sp
    v = jnp.asarray(v_mm, dtype=jnp.float32) / sp
    return np.asarray(_compose(u, v) * sp)


@jax.jit
def _grad_mag(vol, sp):
    gz, gy, gx = jnp.gradient(vol)
    return jnp.sqrt((gx / sp[0]) ** 2 + (gy / sp[1]) ** 2
                    + (gz / sp[2]) ** 2)


def gradient_magnitude(volume, spacing_xyz=(1.0, 1.0, 1.0)):
    """sitk.GradientMagnitude equivalent (central differences / spacing)."""
    return _grad_mag(jnp.asarray(volume, dtype=jnp.float32),
                     jnp.asarray(spacing_xyz, dtype=jnp.float32))


def sample_dvf_at_points(dvf_mm, points, origin, spacing_xyz,
                         mode_nearest=True):
    """Trilinear-sample the field at physical points (mesh warping,
    reference structure/deformable.py:961-1001 map_coordinates path)."""
    from ..resample import trilinear_gather

    pts = np.asarray(points, dtype=np.float64)
    voxel = (pts - np.asarray(origin)) / np.asarray(spacing_xyz)
    if mode_nearest:
        shape = dvf_mm.shape[:3]
        voxel = np.clip(voxel, 0, [shape[2] - 1, shape[1] - 1,
                                   shape[0] - 1])
    out = np.zeros_like(pts)
    for c in range(3):
        out[:, c] = np.asarray(trilinear_gather(
            dvf_mm[..., c], voxel.astype(np.float32), background=0.0))
    return out
