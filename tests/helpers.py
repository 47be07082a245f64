"""Shared synthetic-data builders for tests."""

import numpy as np

from medicalimageanalysis_tpu.dicom import (Dataset, FileMetaDataset,
                                            Sequence, dcmwrite,
                                            generate_uid)
from medicalimageanalysis_tpu.dicom import uids
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage


def write_ct_series(folder, arr, origin=(-100.0, -120.0, -50.0),
                    spacing=(0.8, 0.8), thickness=2.5, modality="CT"):
    folder.mkdir(parents=True, exist_ok=True)
    gen = CreateDicomImage(folder, arr, origin=list(origin),
                           spacing=list(spacing), thickness=thickness)
    gen.run(modality=modality)
    # collect geometry for building RTSTRUCTs against this series
    series_uid = gen.series
    sops = list(gen.sops)
    return {"series_uid": series_uid, "sops": sops,
            "origin": np.asarray(origin), "spacing": np.asarray(spacing),
            "thickness": thickness, "frame": gen.frame}


def write_rtstruct(path, series_info, rois, pois=None):
    """rois: dict name -> list of (contour_xyz_mm (N,3), slice_index).
    pois: dict name -> point (3,)."""
    ds = Dataset()
    ds.SOPClassUID = uids.RTStructureSetStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "RTSTRUCT"
    ds.PatientName = "Test^Patient"
    ds.PatientID = "MRN001"
    ds.StructureSetLabel = "test"

    series_item = Dataset()
    series_item.SeriesInstanceUID = series_info["series_uid"]
    study_item = Dataset()
    study_item.RTReferencedSeriesSequence = Sequence([series_item])
    for_item = Dataset()
    for_item.ReferencedFrameOfReferenceUID = series_info["frame"]
    for_item.RTReferencedStudySequence = Sequence([study_item])
    ds.ReferencedFrameOfReferenceSequence = Sequence([for_item])

    roi_seq = Sequence()
    contour_seq = Sequence()
    names = list(rois.keys()) + list((pois or {}).keys())
    for number, name in enumerate(names, start=1):
        s = Dataset()
        s.ROINumber = number
        s.ROIName = name
        s.ReferencedFrameOfReferenceUID = series_info["frame"]
        roi_seq.append(s)

        item = Dataset()
        item.ReferencedROINumber = number
        item.ROIDisplayColor = [255, 0, 0]
        cs = Sequence()
        if name in rois:
            for contour_xyz, slice_idx in rois[name]:
                c = Dataset()
                c.ContourGeometricType = "CLOSED_PLANAR"
                img_item = Dataset()
                img_item.ReferencedSOPClassUID = uids.CTImageStorage
                img_item.ReferencedSOPInstanceUID = \
                    series_info["sops"][slice_idx]
                c.ContourImageSequence = Sequence([img_item])
                flat = np.asarray(contour_xyz, dtype=float).reshape(-1)
                c.ContourData = [float(v) for v in flat]
                c.NumberOfContourPoints = len(flat) // 3
                cs.append(c)
        else:
            c = Dataset()
            c.ContourGeometricType = "POINT"
            img_item = Dataset()
            img_item.ReferencedSOPClassUID = uids.CTImageStorage
            img_item.ReferencedSOPInstanceUID = series_info["sops"][0]
            c.ContourImageSequence = Sequence([img_item])
            c.ContourData = [float(v) for v in (pois or {})[name]]
            cs.append(c)
        item.ContourSequence = cs
        contour_seq.append(item)

    ds.StructureSetROISequence = roi_seq
    ds.ROIContourSequence = contour_seq
    dcmwrite(path, ds)
    return ds


def square_contour_mm(series_info, slice_idx, px_lo=5, px_hi=15):
    """Square contour in physical mm on a given slice (pixel-aligned)."""
    ox, oy, oz = series_info["origin"]
    sx, sy = series_info["spacing"]
    z = oz + slice_idx * series_info["thickness"]
    corners_px = [(px_lo, px_lo), (px_hi, px_lo), (px_hi, px_hi),
                  (px_lo, px_hi)]
    return np.array([[ox + sx * x, oy + sy * y, z] for x, y in corners_px])
