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
    """vol (Z,Y,X); dvf_vox (Z,Y,X,3) displacement in voxels (x,y,z)."""
    from ..resample import _trilinear
    Xg, Yg, Zg = _base_coords(vol.shape)
    coords = jnp.stack([Xg + dvf_vox[..., 0], Yg + dvf_vox[..., 1],
                        Zg + dvf_vox[..., 2]], axis=-1)
    return _trilinear(vol, coords, background)


def warp_volume(volume, dvf_mm, spacing_xyz, background=0.0):
    """Warp: out(x) = volume(x + d(x)); d in mm on the same grid."""
    vol = jnp.asarray(volume, dtype=jnp.float32)
    dvf = jnp.asarray(dvf_mm, dtype=jnp.float32)
    sp = jnp.asarray(spacing_xyz, dtype=jnp.float32)
    return _warp(vol, dvf / sp, jnp.float32(background))


@partial(jax.jit, static_argnames=("iterations",))
def _invert(dvf_vox, iterations):
    from ..resample import _trilinear
    Xg, Yg, Zg = _base_coords(dvf_vox.shape[:3])

    def sample_field(field, coords):
        outs = []
        for c in range(3):
            outs.append(_trilinear(field[..., c], coords,
                                   jnp.float32(0.0)))
        return jnp.stack(outs, axis=-1)

    def body(_, v):
        coords = jnp.stack([Xg + v[..., 0], Yg + v[..., 1],
                            Zg + v[..., 2]], axis=-1)
        return -sample_field(dvf_vox, coords)

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
    from ..resample import _trilinear
    Xg, Yg, Zg = _base_coords(u_vox.shape[:3])
    coords = jnp.stack([Xg + v_vox[..., 0], Yg + v_vox[..., 1],
                        Zg + v_vox[..., 2]], axis=-1)
    outs = [_trilinear(u_vox[..., c], coords, jnp.float32(0.0))
            for c in range(3)]
    return jnp.stack(outs, axis=-1) + v_vox


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
