"""Kitchen-sink archive ingest: every registry object type in ONE
read_dicoms pass — the reference's primary real-world scenario
(patient folder with images, structures, registrations and dose), here
with SEG added. Pins the cross-object wiring: builder order, frame
matching, report bookkeeping."""

import numpy as np

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import Dataset, Sequence
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

from helpers import square_contour_mm, write_ct_series, write_rtstruct
from test_deformable_dose import (make_blob, write_reg_file,
                                  write_rtdose_file)


def test_full_archive_single_ingest(tmp_path):
    base = make_blob(shape=(8, 24, 24)).astype(np.int16)

    # CT + RTSTRUCT + SEG + RTDOSE
    ct_info = write_ct_series(tmp_path / "ct", base, spacing=(1, 1),
                              thickness=2.0)
    rois = {"Target": [(square_contour_mm(ct_info, z, 6, 14), z)
                       for z in range(2, 6)]}
    write_rtstruct(tmp_path / "ct" / "rs.dcm", ct_info, rois)
    dose_raw = np.full((8, 24, 24), 20000, np.uint32)
    write_rtdose_file(tmp_path / "ct" / "rd.dcm", dose_raw, ct_info)

    # MR in its own frame + rigid REG linking CT<->MR
    mr_info = write_ct_series(tmp_path / "mr",
                              np.roll(base, 2, axis=2),
                              spacing=(1, 1), thickness=2.0,
                              modality="MR")
    m = np.eye(4)
    m[:3, 3] = [5.0, -3.0, 2.0]
    write_reg_file(tmp_path / "reg.dcm", ct_info, mr_info, m)

    # PT with SUV inputs
    info = Dataset()
    info.RadionuclideTotalDose = 3.5e8
    info.RadionuclideHalfLife = 6586.2
    info.RadiopharmaceuticalStartTime = "080000"
    CreateDicomImage(str(tmp_path / "pt"),
                     np.full((4, 16, 16), 5000, np.int16),
                     spacing=[2.0, 2.0], thickness=3.0).run(
        modality="PT", rescale_slope=1.0,
        extra_tags={"Units": "BQML", "DecayCorrection": "ADMIN",
                    "PatientWeight": 70.0,
                    "RadiopharmaceuticalInformationSequence":
                        Sequence([info])})

    # first pass: ingest the images so a SEG can be authored, then the
    # REAL single-pass ingest of the complete archive
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    img = Data.image[ct]
    auto = np.zeros((8, 24, 24), np.uint8)
    auto[2:6, 6:14, 6:14] = 1
    img.create_roi(name="AutoSeg", color=[0, 200, 100])
    img.rois["AutoSeg"].convert_mask(auto)
    img.create_seg(roi_names=["AutoSeg"],
                   path=str(tmp_path / "ct" / "seg.dcm"))

    Data.clear()
    report = mia.read_dicoms(folder_path=str(tmp_path)).report

    # registry: 3 images, 1 rigid, 1 dose; ROIs from RTSTRUCT AND SEG
    assert len(Data.image_list) == 3
    modalities = {Data.image[n].modality for n in Data.image_list}
    assert modalities == {"CT", "MR", "PT"}
    ct = [n for n in Data.image_list
          if Data.image[n].modality == "CT"][0]
    img = Data.image[ct]
    assert "Target" in img.rois        # RTSTRUCT
    assert "AutoSeg" in img.rois       # SEG
    assert np.array_equal(
        np.asarray(img.rois["AutoSeg"].compute_mask()).astype(np.uint8),
        auto)
    assert len(Data.rigid_list) == 1
    rigid = Data.rigid[Data.rigid_list[0]]
    np.testing.assert_allclose(rigid.matrix, np.linalg.inv(m),
                               atol=1e-5)
    assert Data.dose_list == ["RTDOSE 01"]

    # cross-object analytics all work off one ingest
    stats = Data.dose["RTDOSE 01"].compute_roi_dose_statistics(
        ct, "Target")
    assert abs(stats["Dmean"] - 20.0) < 0.5
    pt = [n for n in Data.image_list
          if Data.image[n].modality == "PT"][0]
    suv = Data.image[pt].compute_suv()
    np.testing.assert_allclose(suv, 5000.0 * 70000.0 / 3.5e8,
                               rtol=1e-5)

    # report bookkeeping: nothing failed, nothing unmatched
    assert not report.failed_series
    assert not report.unmatched_rtstructs
    assert not report.unmatched_segs
    summary = report.summary()
    assert summary["unmatched_segs"] == 0
