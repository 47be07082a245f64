"""DeformableJAX: deformable-registration backend facade.

API-parity rebuild of the reference's DeformableITK
(reference utils/deformable/simpleitk.py:15-280) on the device kernels:
bspline / demons / fast_demons / diffeomorphic, cross-modality gradient
correction, mask blurring, grid resampling, joint-mask cropping.
Volumes are dicts {array, origin, spacing, direction} instead of
sitk.Image; ``create_sitk_image`` keeps its name for drop-in calls.

``elastix`` (reference simpleitk.py:131-176 requires a SimpleElastix
build) maps onto the B-spline path with elastix-flavored defaults.
"""

from __future__ import annotations

import numpy as np

from ...ops.filters import gaussian_filter
from ...ops.registration.bspline import bspline_registration
from ...ops.registration.demons import demons_registration
from ...ops.registration.dvf import gradient_magnitude
from ...ops.resample import affine_resample, compose_pixel_matrix

__all__ = ["DeformableJAX", "DeformableITK"]


def _volume(array, origin=(0, 0, 0), spacing=(1, 1, 1), direction=None):
    return {"array": np.asarray(array),
            "origin": np.asarray(origin, dtype=np.float64),
            "spacing": np.asarray(spacing, dtype=np.float64),
            "direction": np.eye(3) if direction is None
            else np.asarray(direction, dtype=np.float64)}


class DeformableJAX(object):
    """Deformable backend: reference/moving images + optional masks."""

    def __init__(self, reference_image=None, moving_image=None,
                 reference_mask=None, moving_mask=None):
        self.reference_image = reference_image
        self.reference_mask = reference_mask
        self.moving_image = moving_image
        self.moving_mask = moving_mask

    def create_sitk_image(self, array, origin, spacing, direction,
                          reference=True, mask=False):
        """Store a geometric volume (name kept from the reference API;
        no SimpleITK involved)."""
        vol = _volume(array, origin, spacing, direction)
        if reference:
            if mask:
                self.reference_mask = vol
            else:
                self.reference_image = vol
        else:
            if mask:
                self.moving_mask = vol
            else:
                self.moving_image = vol
        return vol

    create_volume = create_sitk_image

    def cross_modality_correction(self):
        """Gradient-magnitude both images (reference simpleitk.py:48-56)."""
        if self.reference_image is not None:
            self.reference_image["array"] = np.asarray(gradient_magnitude(
                self.reference_image["array"],
                self.reference_image["spacing"]))
        if self.moving_image is not None:
            self.moving_image["array"] = np.asarray(gradient_magnitude(
                self.moving_image["array"], self.moving_image["spacing"]))

    def blur_mask(self, sigma=2):
        """Gaussian blur + min-max normalize masks
        (reference simpleitk.py:58-74)."""
        for attr in ("reference_mask", "moving_mask"):
            vol = getattr(self, attr)
            if vol is None:
                continue
            blurred = np.asarray(gaussian_filter(
                vol["array"].astype(np.float32), sigma, vol["spacing"]))
            lo, hi = blurred.min(), blurred.max()
            vol["array"] = (blurred - lo) / max(hi - lo, 1e-9)

    def resample(self):
        """Resample moving image/mask onto the reference grid
        (reference simpleitk.py:76-94)."""
        def do(mov, ref):
            A = compose_pixel_matrix(
                mov["direction"], mov["spacing"], mov["origin"],
                ref["direction"], ref["spacing"], ref["origin"])
            out = np.asarray(affine_resample(
                mov["array"], A, ref["array"].shape, background=0.0))
            return _volume(out, ref["origin"], ref["spacing"],
                           ref["direction"])

        if self.reference_image is not None and self.moving_image is not None:
            self.moving_image = do(self.moving_image, self.reference_image)
        if self.reference_mask is not None and self.moving_mask is not None:
            self.moving_mask = do(self.moving_mask, self.reference_mask)

    def _masked_arrays(self):
        fixed = self.reference_image["array"].astype(np.float32)
        moving = self.moving_image["array"].astype(np.float32)
        if self.reference_mask is not None:
            fixed = fixed * self.reference_mask["array"].astype(np.float32)
        if self.moving_mask is not None:
            moving = moving * self.moving_mask["array"].astype(np.float32)
        return fixed, moving

    def _dvf_volume(self, dvf):
        ref = self.reference_image
        return {"array": dvf, "origin": ref["origin"],
                "spacing": ref["spacing"], "direction": ref["direction"]}

    def bspline(self, control_spacing=None, mesh_size=None, gradient=1e-5,
                iterations=100, crop=5, lr=0.5):
        """B-spline FFD (reference simpleitk.py:96-129); returns the DVF
        volume dict on the (possibly cropped) reference grid."""
        if crop > 0:
            self.mask_crop(margin=crop)
        fixed = self.reference_image["array"].astype(np.float32)
        moving = self.moving_image["array"].astype(np.float32)
        fmask = None if self.reference_mask is None \
            else self.reference_mask["array"]
        mmask = None if self.moving_mask is None \
            else self.moving_mask["array"]
        dvf, _ = bspline_registration(
            fixed, moving, self.reference_image["spacing"],
            control_spacing=control_spacing, mesh_size=mesh_size,
            iterations=iterations, lr=lr, fixed_mask=fmask,
            moving_mask=mmask)
        return self._dvf_volume(dvf)

    def elastix(self, parameter=None, metric="Intensity", bins=6,
                resolution=4, spacing=10, iterations=2000, order=3,
                crop=5):
        """Elastix-parity nonrigid registration (the reference needs a
        SimpleElastix build, simpleitk.py:131-176): multi-resolution
        B-spline with Mattes mutual information (``metric`` anything
        but 'Intensity', like the reference's switch) or mean squares,
        grid and image halving per level, elastix-style parameter map
        accepted via ``parameter`` (Metric / NumberOfHistogramBins /
        NumberOfResolutions / FinalGridSpacingInPhysicalUnits /
        MaximumNumberOfIterations keys, one-element string lists
        fine)."""
        from ...ops.registration.bspline import elastix_registration

        if crop > 0:
            self.mask_crop(margin=crop)
        fixed = self.reference_image["array"].astype(np.float32)
        moving = self.moving_image["array"].astype(np.float32)
        fmask = None if self.reference_mask is None \
            else self.reference_mask["array"]
        mmask = None if self.moving_mask is None \
            else self.moving_mask["array"]
        dvf, _ = elastix_registration(
            fixed, moving, self.reference_image["spacing"],
            parameter_map=parameter,
            metric=("mse" if metric == "Intensity" else "mi"),
            bins=max(int(bins), 8), resolutions=int(resolution),
            final_grid_spacing=float(spacing),
            iterations=min(int(iterations), 300),
            fixed_mask=fmask, moving_mask=mmask)
        return self._dvf_volume(dvf)

    def demons(self, smooth=True, std=1, iterations=50,
               intensity_threshold=0.001, step=2.0, crop=5,
               pyramid=None, forces="ssd", lncc_radius=3):
        if crop > 0:
            self.mask_crop(margin=crop)
        fixed, moving = self._masked_arrays()
        dvf = demons_registration(
            fixed, moving, self.reference_image["spacing"],
            method="demons", smooth=smooth, std=std,
            iterations=iterations,
            intensity_threshold=intensity_threshold, step=step,
            pyramid=pyramid, forces=forces, lncc_radius=lncc_radius)
        return self._dvf_volume(dvf)

    def fast_demons(self, smooth=True, std=1, iterations=50,
                    intensity_threshold=0.001, step=2.0, crop=5,
                    pyramid=None, forces="ssd", lncc_radius=3):
        if crop > 0:
            self.mask_crop(margin=crop)
        fixed, moving = self._masked_arrays()
        dvf = demons_registration(
            fixed, moving, self.reference_image["spacing"],
            method="fast", smooth=smooth, std=std, iterations=iterations,
            intensity_threshold=intensity_threshold, step=step,
            pyramid=pyramid, forces=forces, lncc_radius=lncc_radius)
        return self._dvf_volume(dvf)

    def diffeomorphic(self, smooth=True, std=1, iterations=50,
                      intensity_threshold=0.001, step=2.0, crop=5,
                      pyramid=None, forces="ssd", lncc_radius=3):
        if crop > 0:
            self.mask_crop(margin=crop)
        fixed, moving = self._masked_arrays()
        dvf = demons_registration(
            fixed, moving, self.reference_image["spacing"],
            method="diffeomorphic", smooth=smooth, std=std,
            iterations=iterations,
            intensity_threshold=intensity_threshold, step=step,
            pyramid=pyramid, forces=forces, lncc_radius=lncc_radius)
        return self._dvf_volume(dvf)

    def syn(self, smooth=True, std=1, iterations=50,
            intensity_threshold=0.001, step=2.0, crop=5, pyramid=None,
            forces="ssd", lncc_radius=3):
        """Greedy SyN: inverse-consistent symmetric diffeomorphic
        registration (ANTs' flagship; pairs with forces='lncc' for
        the CC+SyN combination). BEYOND-PARITY."""
        if crop > 0:
            self.mask_crop(margin=crop)
        fixed, moving = self._masked_arrays()
        dvf = demons_registration(
            fixed, moving, self.reference_image["spacing"],
            method="syn", smooth=smooth, std=std,
            iterations=iterations,
            intensity_threshold=intensity_threshold, step=step,
            pyramid=pyramid, forces=forces, lncc_radius=lncc_radius)
        return self._dvf_volume(dvf)

    def biomechanical(self, smooth=True, std=1, iterations=50,
                      intensity_threshold=0.001, step=2.0,
                      elastic_lambda=0.2, crop=5, forces="ssd",
                      lncc_radius=3):
        """Linear-elastic demons (grad(div u) relaxation for tissue-like
        near-incompressibility). The reference reserved this capability
        as an empty stub (structure/deformable.py:536-540)."""
        if crop > 0:
            self.mask_crop(margin=crop)
        fixed, moving = self._masked_arrays()
        dvf = demons_registration(
            fixed, moving, self.reference_image["spacing"],
            method="biomechanical", smooth=smooth, std=std,
            iterations=iterations,
            intensity_threshold=intensity_threshold, step=step,
            elastic_lambda=elastic_lambda, forces=forces,
            lncc_radius=lncc_radius)
        return self._dvf_volume(dvf)

    def mask_crop(self, margin=5):
        """Crop images+masks to the joint-mask bbox + margin
        (reference simpleitk.py:258-280)."""
        if self.reference_mask is None or self.moving_mask is None:
            return
        combined = (np.asarray(self.reference_mask["array"]) > 0) \
            | (np.asarray(self.moving_mask["array"]) > 0)
        if not combined.any():
            return
        nz = np.argwhere(combined)
        lo = np.maximum(nz.min(axis=0) - margin, 0)
        hi = np.minimum(nz.max(axis=0) + 1 + margin, combined.shape)

        def crop(vol):
            arr = vol["array"][lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
            # origin moves by the cropped-away voxels (x, y, z)
            shift = np.array([lo[2], lo[1], lo[0]], dtype=np.float64)
            new_origin = vol["origin"] + vol["direction"].T @ (
                shift * vol["spacing"])
            return _volume(arr, new_origin, vol["spacing"],
                           vol["direction"])

        self.reference_image = crop(self.reference_image)
        self.moving_image = crop(self.moving_image)
        self.reference_mask = crop(self.reference_mask)
        self.moving_mask = crop(self.moving_mask)


# the reference class name, for drop-in imports
DeformableITK = DeformableJAX
