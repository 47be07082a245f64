"""Multi-fraction dose accumulation on a reference image grid.

BEYOND-PARITY: the reference's Dose object can only resample itself
onto an image grid for DVH extraction (structure/dose.py:738-772) and
its Deformable only warps ROI meshes (structure/deformable.py:961-1001).
Adaptive-radiotherapy workflows need the composition: warp each
fraction's dose through its deformable registration onto the planning
grid and sum. ``Deformable.update_dose`` provides the per-fraction
warp (Pallas tile-slab kernels); this module sums the contributions
and registers the result as a first-class Dose so every DVH analytic
(compute_roi_dose_statistics, compute_dvh_curve, ...) works on the
accumulated grid unchanged.
"""

from __future__ import annotations

import types

import numpy as np

from ..data import Data

__all__ = ["accumulate_dose", "register_dose_grid"]


def register_dose_grid(array, like, name=None, description="derived",
                       misc=None):
    """Register a float dose grid as a first-class ``Data.dose`` entry
    on the geometry of ``like`` (an Image or Dose: needs plane/spacing/
    origin/matrix/frame_ref). Re-registering an explicit ``name``
    replaces the previous entry. Returns the Dose object."""
    from ..dicom import Dataset, generate_uid
    from ..read.dicom import create_dose_name
    from ..structure.dose import Dose

    array = np.asarray(array, np.float32)
    ds = Dataset()
    ds.Modality = "RTDOSE"
    ds.SOPInstanceUID = generate_uid()
    ds.SeriesInstanceUID = generate_uid()
    study = getattr(like, "get_study_uid", None)
    if callable(study):
        try:
            ds.StudyInstanceUID = study()
        except Exception:
            pass
    if getattr(like, "frame_ref", None):
        ds.FrameOfReferenceUID = like.frame_ref
    ds.SeriesDescription = description
    ds.filename = f"<{description}>"

    carrier = types.SimpleNamespace(
        image_set=[ds],
        array=array,
        dose_name=(name if name is not None
                   else create_dose_name("RTDOSE")),
        modality="RTDOSE",
        filepaths=[str(ds.filename)],
        sops=[str(ds.SOPInstanceUID)],
        plane=like.plane,
        spacing=np.asarray(like.spacing, np.float64),
        dimensions=np.asarray(array.shape),
        orientation=np.asarray(like.orientation, np.float64),
        origin=np.asarray(like.origin, np.float64),
        image_matrix=np.asarray(like.matrix, np.float64),
    )
    dose_obj = Dose(carrier)
    if misc:
        dose_obj.misc.update(misc)
    if carrier.dose_name not in Data.dose:
        Data.dose_list += [carrier.dose_name]
    Data.dose[carrier.dose_name] = dose_obj
    return dose_obj


def accumulate_dose(image_name, contributions, weights=None, name=None,
                    register=True):
    """Sum dose grids on the grid of ``Data.image[image_name]``.

    Parameters
    ----------
    contributions : list
        Each entry is either a dose name (rigidly resampled onto the
        image grid — already in or co-registered to its frame), or a
        ``(dose_name, deformable_name)`` pair — the dose is warped
        through that Deformable (whose ``reference_name`` must be
        ``image_name``) via ``Deformable.update_dose``.
    weights : list of float, optional
        Per-contribution scale (e.g. fraction weighting); default 1.
    name : str, optional
        Dose name to register under; default sequential RTDOSE name.
    register : bool
        When True (default) the summed grid is registered in
        ``Data.dose`` as a Dose and returned; when False a plain
        volume dict is returned instead.
    """
    from ..ops.resample import affine_resample, compose_pixel_matrix

    if not contributions:
        raise ValueError("accumulate_dose: empty contributions")
    if image_name not in Data.image:
        raise KeyError(f"accumulate_dose: unknown image {image_name!r}")
    ref = Data.image[image_name]
    if weights is None:
        weights = [1.0] * len(contributions)
    if len(weights) != len(contributions):
        raise ValueError("accumulate_dose: len(weights) != "
                         "len(contributions)")

    total = np.zeros(tuple(int(v) for v in ref.dimensions), np.float32)
    source_doses = []
    for entry, w in zip(contributions, weights):
        if isinstance(entry, (tuple, list)):
            dose_name, deformable_name = entry
            defo = Data.deformable[deformable_name]
            if defo.reference_name != image_name:
                raise ValueError(
                    f"accumulate_dose: deformable {deformable_name!r} "
                    f"reference is {defo.reference_name!r}, not "
                    f"{image_name!r}")
            vol = defo.update_dose(dose_name)
            arr = vol["array"]
            source_doses.append(vol["dose_name"])
        else:
            dose = Data.dose[entry]
            A = compose_pixel_matrix(dose.matrix, dose.spacing,
                                     dose.origin, ref.matrix,
                                     ref.spacing, ref.origin)
            arr = np.asarray(affine_resample(
                np.asarray(dose.array, np.float32), A, total.shape,
                background=0.0))
            source_doses.append(entry)
        total += np.float32(w) * np.asarray(arr, np.float32)

    if not register:
        return {"array": total, "origin": np.asarray(ref.origin),
                "spacing": np.asarray(ref.spacing),
                "direction": np.asarray(ref.matrix),
                "source_doses": source_doses}

    # re-running with the same explicit name replaces the previous
    # result instead of leaving a duplicate dose_list entry
    return register_dose_grid(
        total, ref, name=name,
        description="accumulated: " + ", ".join(source_doses),
        misc={"source_doses": source_doses})
