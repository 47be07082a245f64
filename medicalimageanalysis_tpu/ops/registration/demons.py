"""Demons deformable registration (device stencil iterations).

TPU-native replacement for ITK's DemonsRegistrationFilter /
FastSymmetricForcesDemonsRegistrationFilter /
DiffeomorphicDemonsRegistrationFilter
(reference utils/deformable/simpleitk.py:178-256). Demons is pure
stencil + gather math — ideal XLA material: the whole iteration loop is
one fori_loop inside one jit, with per-iteration separable Gaussian
field smoothing on the MXU.

Update rule (Thirion, as in ITK): for difference D = f - m(x+u) and
gradient g (fixed grad, or symmetric mean for the fast variant):
    du = D * g / (|g|^2 + D^2 / K),  K = mean voxel spacing squared
Diffeomorphic composes exp(du) into the field instead of adding.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..filters import _gauss_kernel_matrix
from .dvf import _base_coords, _compose

__all__ = ["demons_registration"]


def _spatial_gradient(vol, sp):
    gz, gy, gx = jnp.gradient(vol)
    return jnp.stack([gx / sp[0], gy / sp[1], gz / sp[2]], axis=-1)


def _smooth_field(u, mz, my, mx):
    def one(c):
        out = jnp.einsum("ij,jyx->iyx", mz, u[..., c],
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("kj,zjx->zkx", my, out,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("lj,zyj->zyl", mx, out,
                         preferred_element_type=jnp.float32)
        return out
    return jnp.stack([one(0), one(1), one(2)], axis=-1)


@partial(jax.jit,
         static_argnames=("iterations", "method", "smooth", "std_vox"))
def _demons_core(fixed, moving, sp, std_vox, step, intensity_threshold,
                 iterations, method, smooth, elastic_lambda=0.2):
    from ..pallas_warp import warp_jit

    Xg, Yg, Zg = _base_coords(fixed.shape)
    grad_f = _spatial_gradient(fixed, sp)
    K = jnp.mean(sp) ** 2

    mz = jnp.asarray(_gauss_kernel_matrix(fixed.shape[0],
                                          max(float(std_vox), 1e-3)))
    my = jnp.asarray(_gauss_kernel_matrix(fixed.shape[1],
                                          max(float(std_vox), 1e-3)))
    mx = jnp.asarray(_gauss_kernel_matrix(fixed.shape[2],
                                          max(float(std_vox), 1e-3)))

    # the symmetric-forces variants warp the moving image AND its three
    # gradient components every iteration: batch all four through ONE
    # Pallas tile-slab warp sharing coordinates (docs/PERF.md)
    if method in ("fast", "diffeomorphic", "biomechanical"):
        grad_m = _spatial_gradient(moving, sp)
        warp_stack = jnp.stack([moving, grad_m[..., 0], grad_m[..., 1],
                                grad_m[..., 2]])
    else:
        warp_stack = moving[None]

    def warp_all(u_vox):
        return warp_jit(warp_stack, Zg + u_vox[..., 2],
                        Yg + u_vox[..., 1], Xg + u_vox[..., 0], 0.0)

    def body(_, u_vox):
        w = warp_all(u_vox)
        warped = w[0]
        diff = fixed - warped
        if method in ("fast", "diffeomorphic", "biomechanical"):
            grad_w = jnp.moveaxis(w[1:4], 0, -1)
            g = 0.5 * (grad_f + grad_w)
        else:
            g = grad_f
        g2 = jnp.sum(g * g, axis=-1)
        denom = g2 + (diff * diff) / K
        active = (jnp.abs(diff) > intensity_threshold) & (denom > 1e-9)
        upd_mm = jnp.where(active[..., None],
                           (diff / jnp.maximum(denom, 1e-9))[..., None] * g,
                           0.0)
        if method in ("fast", "diffeomorphic", "biomechanical"):
            max_norm = jnp.max(jnp.linalg.norm(upd_mm, axis=-1))
            scale = jnp.minimum(1.0, step / jnp.maximum(max_norm, 1e-9))
            upd_mm = upd_mm * scale
        upd_vox = upd_mm / sp
        if method == "diffeomorphic":
            # exp(upd) via scaling and squaring (3 squarings)
            v = upd_vox / 8.0
            for _s in range(3):
                v = _compose(v, v)
            u_new = _compose(u_vox, v)
        else:
            u_new = u_vox + upd_vox
        if smooth:
            u_new = _smooth_field(u_new, mz, my, mx)
        if method == "biomechanical":
            # linear-elastic regularization (Navier-Cauchy gradient
            # step): tissue-like near-incompressibility by relaxing the
            # field against grad(div u) — a pure central-difference
            # stencil, ideal XLA material. The reference's
            # compute_biomechanical is an empty stub
            # (structure/deformable.py:536-540); this implements the
            # capability it reserved.
            # dE/du of E = 1/2 (div u)^2 is -grad(div u), so descent
            # ADDS lambda * grad(div u)
            div = (jnp.gradient(u_new[..., 0], axis=2)
                   + jnp.gradient(u_new[..., 1], axis=1)
                   + jnp.gradient(u_new[..., 2], axis=0))
            u_new = u_new + elastic_lambda * jnp.stack(
                [jnp.gradient(div, axis=2), jnp.gradient(div, axis=1),
                 jnp.gradient(div, axis=0)], axis=-1)
        return u_new

    u0 = jnp.zeros(fixed.shape + (3,), jnp.float32)
    u = jax.lax.fori_loop(0, iterations, body, u0)
    return u * sp  # voxels -> mm


def demons_registration(fixed, moving, spacing_xyz=(1.0, 1.0, 1.0),
                        method="demons", smooth=True, std=1,
                        iterations=50, intensity_threshold=0.001,
                        step=2.0, elastic_lambda=0.2):
    """Run a demons variant; returns (Z, Y, X, 3) DVF in mm such that
    moving(x + d(x)) ~ fixed(x) on the fixed grid.

    method: 'demons' | 'fast' | 'diffeomorphic' — mirrors the three ITK
    filters the reference selects between (reference
    structure/deformable.py:677-690) — plus 'biomechanical': symmetric
    forces with a linear-elastic grad(div u) relaxation step
    (weight ``elastic_lambda``) for tissue-like near-incompressibility
    (the reference reserved this as an empty stub).
    """
    fixed = jnp.asarray(fixed, dtype=jnp.float32)
    moving = jnp.asarray(moving, dtype=jnp.float32)
    sp = jnp.asarray(spacing_xyz, dtype=jnp.float32)
    out = _demons_core(fixed, moving, sp, float(std), jnp.float32(step),
                       jnp.float32(intensity_threshold), int(iterations),
                       method, bool(smooth),
                       jnp.float32(elastic_lambda))
    return np.asarray(out)
