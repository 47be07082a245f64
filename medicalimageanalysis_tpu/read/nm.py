"""Nuclear-medicine (NM) ingest: SPECT RECON TOMO volumes + planar.

BEYOND-PARITY: the reference's modality list stops at
CT/MR/PT/US/DX/RF/CR (+RT objects, reference reader.py:230-238), so NM
files — planar scintigraphy, whole-body sweeps, and reconstructed
SPECT volumes — are dropped on the floor.

The NM IOD (PS3.3 C.8.4) is a single multi-frame file. Geometry does
NOT live in per-frame functional groups (that's the enhanced-CT/MR/PT
layout handled by read/multiframe.py): a reconstructed tomo volume
carries ONE ImageOrientationPatient + ImagePositionPatient inside
``DetectorInformationSequence`` and a signed ``SpacingBetweenSlices``
for the frame pitch. ``expand_nm_tomo`` synthesizes a per-frame
ImagePositionPatient by stepping the detector IPP along the slice
normal, producing FrameViews that ride the standard grouping + Read3D
pipeline unchanged — including the FFS corner-analysis normalization,
which a negative SpacingBetweenSlices exercises for real.

Frames whose ImageType is not a reconstructed tomo (STATIC, WHOLE
BODY, DYNAMIC, GATED) have no patient-space geometry; they ingest as a
pseudo-3D frame stack via ``ReadNMPlanar`` (the ReadRF shape of the
pipeline), kept in int32 — NM counts are unsigned 16-bit and a blanket
int16 cast would wrap everything above 32767.
"""

from __future__ import annotations

import numpy as np

from .multiframe import FrameView

__all__ = ["is_nm_tomo", "expand_nm_tomo", "ReadNMPlanar"]

# ImageType value 3 for reconstructed volumetric NM (PS3.3 C.8.4.9.1)
_TOMO_TYPES = {"RECON TOMO", "RECON GATED TOMO"}


def _image_type_values(ds):
    v = ds.get("ImageType")
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    try:
        return [str(x) for x in v]
    except TypeError:
        return []


def _detector_geometry(ds):
    """(iop(6), ipp(3)) from DetectorInformationSequence[0], or None."""
    if "DetectorInformationSequence" not in ds:
        return None
    try:
        det = ds.DetectorInformationSequence[0]
        iop = np.asarray(det.ImageOrientationPatient, np.float64)
        ipp = np.asarray(det.ImagePositionPatient, np.float64)
    except (AttributeError, IndexError, TypeError, ValueError):
        return None
    if iop.shape != (6,) or ipp.shape != (3,):
        return None
    return iop, ipp


def _frame_pitch(ds):
    """Signed frame pitch in mm: SpacingBetweenSlices (may be negative
    per the NM IOD — slices stepping against the normal), falling back
    to SliceThickness."""
    from ..dicom.dataset import value_or
    for key in ("SpacingBetweenSlices", "SliceThickness"):
        v = value_or(ds, key, None)
        if v is not None:
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            if v != 0.0:
                return v
    return None


def is_nm_tomo(ds):
    """True when this NM dataset is a reconstructed volume with enough
    geometry to place every frame in patient space."""
    try:
        frames = int(ds.get("NumberOfFrames", 1) or 1)
    except (TypeError, ValueError):
        return False
    if frames <= 1:
        return False
    if not (_TOMO_TYPES & set(_image_type_values(ds))):
        return False
    # multi-detector tomo interleaves frames per detector; without the
    # FrameIncrementPointer walk the synthesized geometry would be
    # wrong, so only the single-detector layout expands
    try:
        n_det = int(ds.get("NumberOfDetectors", 1) or 1)
    except (TypeError, ValueError):
        n_det = 1
    if n_det > 1:
        return False
    return (_detector_geometry(ds) is not None
            and _frame_pitch(ds) is not None)


class NMTomoFrameView(FrameView):
    """One frame of an NM RECON TOMO volume, shaped like a single-slice
    dataset: geometry synthesized from the detector IOP/IPP + pitch
    instead of per-frame functional groups."""

    def __init__(self, parent, index, ipp, iop):
        super().__init__(parent, index, None, None)
        self._nm_ipp = [float(v) for v in ipp]
        self._nm_iop = [float(v) for v in iop]

    def _value(self, name):
        if name == "ImagePositionPatient":
            return self._nm_ipp
        if name == "ImageOrientationPatient":
            return self._nm_iop
        if name in ("PixelSpacing", "SliceThickness",
                    "RescaleSlope", "RescaleIntercept"):
            return self._parent.get(name)
        return super()._value(name)


def expand_nm_tomo(ds):
    """NM RECON TOMO dataset -> per-frame views with synthesized
    ImagePositionPatient stepping along the slice normal."""
    iop, ipp = _detector_geometry(ds)
    pitch = _frame_pitch(ds)
    frames = int(ds.NumberOfFrames)
    normal = np.cross(iop[:3], iop[3:])
    nrm = np.linalg.norm(normal)
    if nrm > 0:
        normal = normal / nrm
    return [NMTomoFrameView(ds, i, ipp + normal * (pitch * i), iop)
            for i in range(frames)]


class ReadNMPlanar(object):
    """Planar / whole-body / gated NM frame stacks: pseudo-3D like
    ReadRF, but int32 — counts are unsigned 16-bit and int16 wraps
    above 32767."""

    def __init__(self, image_set, only_tags):
        self.image_set = image_set if isinstance(image_set, list) \
            else [image_set]
        self.only_tags = only_tags

        self.unverified = "Modality"
        self.skipped_slice = None
        self.rgb = False

        self.modality = self.image_set[0].Modality
        self.filepaths = self.image_set[0].filename
        self.sops = self.image_set[0].SOPInstanceUID

        self.plane = "Axial"
        self.orientation = [1, 0, 0, 0, 1, 0]
        self.origin = np.array([0, 0, 0])
        self.image_matrix = np.eye(3, dtype=np.float32)

        img = self.image_set[0]
        frames = int(img.get("NumberOfFrames", 1) or 1)
        rows = int(img["Rows"].value)
        cols = int(img["Columns"].value)
        self.dimensions = np.array([frames, rows, cols])

        self.array = None
        if not self.only_tags:
            self._compute_array()
            self.dimensions = np.asarray(self.array.shape)

        self.spacing = self._compute_spacing()

        from .dicom import create_image_name
        from ..data import Data
        from ..structure.image import Image
        self.image_name = create_image_name(self.modality)
        image = Image(self)
        Data.image[self.image_name] = image
        Data.image_list.append(self.image_name)

    def _compute_spacing(self):
        from .planar import _inplane_spacing, _spacing_by_plane
        img = self.image_set[0]
        inplane = _inplane_spacing(img)
        if list(inplane) == [1, 1] and "DetectorInformationSequence" in img:
            # planar NM often carries spacing only on the detector item
            det = img.DetectorInformationSequence[0]
            if "PixelSpacing" in det:
                inplane = det.PixelSpacing
        return _spacing_by_plane(inplane, 1, self.plane)

    def _compute_array(self):
        arr = np.asarray(self.image_set[0].pixel_array)
        del self.image_set[0].PixelData
        if arr.ndim < 3:
            arr = arr.reshape((1, *arr.shape))
        self.array = arr.astype(np.int32)
