"""Volume filtering kernels: Gaussian, morphology, windowing, threshold.

TPU-native replacements for the scipy/skimage/SimpleITK filter calls in
the reference (reference utils/image/threshold.py:17-49,
utils/deformable/simpleitk.py:58-74). Separable Gaussian runs as three
MXU contractions; morphology as ``lax.reduce_window`` min/max pools —
both batched over volumes with vmap.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gaussian_filter", "binary_erode", "binary_dilate",
           "binary_open", "binary_close", "window_level",
           "largest_component", "fill_holes_2d"]


def _gauss_kernel_matrix(n, sigma_vox, dtype=np.float32):
    """(n, n) Toeplitz Gaussian matrix: out = G @ x along one axis.
    Dense so XLA runs it on the MXU; truncated at 4 sigma."""
    radius = max(1, int(np.ceil(4 * sigma_vox)))
    offsets = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (offsets / sigma_vox) ** 2)
    k /= k.sum()
    m = np.zeros((n, n), dtype=np.float64)
    idx = np.arange(n)
    for off, w in zip(offsets, k):
        src = np.clip(idx + off, 0, n - 1)  # edge-replicate
        np.add.at(m, (idx, src), w)
    return m.astype(dtype)


@jax.jit
def _separable3(vol, mz, my, mx):
    out = jnp.einsum("ij,jyx->iyx", mz, vol,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("kj,zjx->zkx", my, out,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("lj,zyj->zyl", mx, out,
                     preferred_element_type=jnp.float32)
    return out


def gaussian_filter(volume, sigma_mm, spacing_xyz=(1.0, 1.0, 1.0)):
    """Separable Gaussian blur; sigma in mm, converted per-axis to
    voxels (matches sitk SmoothingRecursiveGaussian semantics used at
    reference utils/deformable/simpleitk.py:58-74)."""
    vol = jnp.asarray(volume, dtype=jnp.float32)
    if np.isscalar(sigma_mm):
        sigma_mm = [sigma_mm] * 3
    sz = sigma_mm[2] / spacing_xyz[2]
    sy = sigma_mm[1] / spacing_xyz[1]
    sx = sigma_mm[0] / spacing_xyz[0]
    mz = jnp.asarray(_gauss_kernel_matrix(vol.shape[0], max(sz, 1e-3)))
    my = jnp.asarray(_gauss_kernel_matrix(vol.shape[1], max(sy, 1e-3)))
    mx = jnp.asarray(_gauss_kernel_matrix(vol.shape[2], max(sx, 1e-3)))
    return _separable3(vol, mz, my, mx)


@partial(jax.jit, static_argnames=("size",))
def _minpool(vol, size):
    window = (1,) * (vol.ndim - 3) + (size, size, size)
    return lax.reduce_window(vol, jnp.inf, lax.min, window,
                             (1,) * vol.ndim, "SAME")


@partial(jax.jit, static_argnames=("size",))
def _maxpool(vol, size):
    window = (1,) * (vol.ndim - 3) + (size, size, size)
    return lax.reduce_window(vol, -jnp.inf, lax.max, window,
                             (1,) * vol.ndim, "SAME")


def binary_erode(mask, size=3, iterations=1):
    """Erosion as min-pool; accepts (Z, Y, X) or batched (B, Z, Y, X)."""
    out = jnp.asarray(mask, dtype=jnp.float32)
    for _ in range(iterations):
        out = _minpool(out, size)
    return np.asarray(out > 0.5).astype(np.uint8)


def binary_dilate(mask, size=3, iterations=1):
    """Dilation as max-pool; accepts (Z, Y, X) or batched (B, Z, Y, X)."""
    out = jnp.asarray(mask, dtype=jnp.float32)
    for _ in range(iterations):
        out = _maxpool(out, size)
    return np.asarray(out > 0.5).astype(np.uint8)


def binary_open(mask, size=3):
    return binary_dilate(binary_erode(mask, size), size)


def binary_close(mask, size=3):
    return binary_erode(binary_dilate(mask, size), size)


@jax.jit
def _window_level(vol, lower, upper):
    return jnp.clip((vol - lower) / (upper - lower), 0.0, 1.0)


def window_level(volume, window):
    """Normalize to [0, 1] within [lower, upper] display window."""
    vol = jnp.asarray(volume, dtype=jnp.float32)
    return _window_level(vol, jnp.float32(window[0]), jnp.float32(window[1]))


def largest_component(binary, connectivity_full=True):
    """Largest connected component (host scipy labeling; the reference
    used skimage.measure.label whose default is full connectivity)."""
    from scipy import ndimage

    binary = np.asarray(binary) > 0
    structure = np.ones((3,) * binary.ndim) if connectivity_full else None
    labels, n = ndimage.label(binary, structure=structure)
    if n == 0:
        return np.zeros_like(binary, dtype=bool), None
    counts = np.bincount(labels.ravel())
    counts[0] = 0
    biggest = int(np.argmax(counts))
    mask = labels == biggest
    slices = ndimage.find_objects((labels == biggest).astype(np.int8))
    return mask, slices[0] if slices else None


def fill_holes_2d(mask2d):
    from scipy import ndimage
    return ndimage.binary_fill_holes(mask2d)
