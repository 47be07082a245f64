"""One-folder torture archive: the reference's actual use case — an
unorganized patient folder (reference README.md:1-25) holding EVERY
supported object type plus garbage — through ONE ``read_dicoms`` call.

Contents of the single archive root:
  - CT "anat"  : JPEG-LS-compressed series (transfer syntax .4.80)
  - CT "gated" : 4D series (3 temporal phases in one SeriesInstanceUID)
  - MR in its own frame of reference
  - PT with full SUV tag set
  - US grayscale cine (multi-frame)
  - NM RECON TOMO (uint16 counts)
  - RTSTRUCT (ROI + POI) on the JPEG-LS CT
  - SEG (binary) on the JPEG-LS CT
  - two REGs CT<->MR: rigid matrix + deformable DVF grid
  - RTDOSE with DESCENDING GridFrameOffsetVector, linked RTPLAN
  - a .zip holding one extra CT series
  - a corrupt file, a truncated DICOM, and an extension-less DICM file

Asserts exact registry contents, cross-links (ROI->image, SEG->image,
REG->pair, plan->dose), geometry, and report bookkeeping — the
cross-contamination class the per-IOD tests cannot see.
"""

import zipfile

import numpy as np

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import (Dataset, Sequence, dcmread,
                                            dcmwrite, generate_uid, uids)
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

from helpers import square_contour_mm, write_ct_series, write_rtstruct
from test_deformable_dose import (make_blob, write_reg_file,
                                  write_rtdose_file)
from test_rtplan import write_rtplan_file

NZ4D, NY4D, NX4D = 4, 16, 16
PHASES = 3


def _phase_volume(k):
    vol = np.full((NZ4D, NY4D, NX4D), -1000, np.int16)
    zz, yy, xx = np.mgrid[0:NZ4D, 0:NY4D, 0:NX4D]
    c = (NZ4D // 2, 4 + 2 * k, NX4D // 2)
    vol[((zz - c[0]) ** 2 * 4 + (yy - c[1]) ** 2
         + (xx - c[2]) ** 2) <= 9] = 200
    return vol


def _write_us_cine(folder, rng):
    cine = rng.integers(0, 255, size=(4, 16, 16)).astype(np.uint8)
    ds = Dataset()
    ds.SOPClassUID = uids.USImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.SeriesInstanceUID = generate_uid()
    ds.Modality = "US"
    ds.PatientID = "MRN001"
    ds.NumberOfFrames = 4
    ds.Rows, ds.Columns = 16, 16
    ds.BitsAllocated = 8
    ds.BitsStored = 8
    ds.HighBit = 7
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelData = cine.tobytes()
    folder.mkdir(parents=True, exist_ok=True)
    dcmwrite(folder / "us_cine.dcm", ds)
    return cine


def _write_nm_recon(folder, rng):
    frames = 5
    arr = rng.integers(0, 60000, size=(frames, 16, 16)).astype(np.uint16)
    ds = Dataset()
    ds.SOPClassUID = uids.NuclearMedicineImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.SeriesInstanceUID = generate_uid()
    ds.FrameOfReferenceUID = generate_uid()
    ds.Modality = "NM"
    ds.PatientID = "MRN001"
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PatientPosition = "HFS"
    ds.NumberOfFrames = frames
    ds.Rows, ds.Columns = 16, 16
    ds.BitsAllocated = 16
    ds.BitsStored = 16
    ds.HighBit = 15
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelSpacing = [0.5, 0.5]
    ds.SliceThickness = 2.0
    ds.SpacingBetweenSlices = 2.0
    ds.NumberOfDetectors = 1
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [-50.0, -60.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()
    folder.mkdir(parents=True, exist_ok=True)
    dcmwrite(folder / "nm_tomo.dcm", ds)
    return arr


def _write_deformable_reg(path, ref_info, mov_info, dvf, pre_matrix):
    ds = Dataset()
    ds.SOPClassUID = uids.DeformableSpatialRegistrationStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "REG"
    ds.PatientID = "MRN001"

    def series_item(info):
        item = Dataset()
        item.SeriesInstanceUID = info["series_uid"]
        refs = Sequence()
        for sop in info["sops"]:
            r = Dataset()
            r.ReferencedSOPInstanceUID = sop
            refs.append(r)
        item.ReferencedInstanceSequence = refs
        return item

    ds.ReferencedSeriesSequence = Sequence(
        [series_item(ref_info), series_item(mov_info)])
    pre = Dataset()
    pre.FrameOfReferenceTransformationMatrix = [
        float(v) for v in np.asarray(pre_matrix).reshape(-1)]
    grid = Dataset()
    grid.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    grid.ImagePositionPatient = [-10.0, -20.0, -30.0]
    grid.GridDimensions = [dvf.shape[2], dvf.shape[1], dvf.shape[0]]
    grid.GridResolution = [2.0, 2.0, 5.0]
    grid.VectorGridData = dvf.astype("<f4").tobytes()
    dreg = Dataset()
    dreg.PreDeformationMatrixRegistrationSequence = Sequence([pre])
    dreg.DeformableRegistrationGridSequence = Sequence([grid])
    ds.DeformableRegistrationSequence = Sequence([dreg])
    dcmwrite(path, ds)


def test_torture_archive_single_ingest(tmp_path):
    rng = np.random.default_rng(42)
    root = tmp_path / "patient"
    root.mkdir()

    # --- CT "anat": JPEG-LS compressed -------------------------------
    ct_arr = make_blob(shape=(8, 24, 24)).astype(np.int16)
    ct_dir = root / "ct_anat"
    ct_dir.mkdir()
    gen = CreateDicomImage(ct_dir, ct_arr, origin=[-100.0, -120.0, -50.0],
                           spacing=[1.0, 1.0], thickness=2.0,
                           transfer_syntax=uids.JPEGLSLossless)
    gen.run(modality="CT")
    ct_info = {"series_uid": gen.series, "sops": list(gen.sops),
               "origin": np.array([-100.0, -120.0, -50.0]),
               "spacing": np.array([1.0, 1.0]), "thickness": 2.0,
               "frame": gen.frame}

    # --- CT "gated": 3 phases in one series --------------------------
    gated_dir = root / "ct_gated"
    gated_dir.mkdir()
    study, series, frame = generate_uid(), generate_uid(), generate_uid()
    phase_vols = []
    for k in range(PHASES):
        vol = _phase_volume(k)
        phase_vols.append(vol)
        g4 = CreateDicomImage(gated_dir, vol, study=study, series=series,
                              frame=frame, origin=[0, 0, 0],
                              spacing=[1, 1], thickness=2.0)
        g4.run(modality="CT",
               extra_tags={"TemporalPositionIdentifier": str(k + 1),
                           "NumberOfTemporalPositions": str(PHASES)},
               instance_offset=k * NZ4D)

    # --- MR in its own frame + PT with SUV tags ----------------------
    mr_arr = np.roll(ct_arr, 2, axis=2)
    mr_info = write_ct_series(root / "mr", mr_arr, spacing=(1, 1),
                              thickness=2.0, modality="MR")
    suv_info = Dataset()
    suv_info.RadionuclideTotalDose = 3.5e8
    suv_info.RadionuclideHalfLife = 6586.2
    suv_info.RadiopharmaceuticalStartTime = "080000"
    CreateDicomImage(str(root / "pt"),
                     np.full((4, 16, 16), 5000, np.int16),
                     spacing=[2.0, 2.0], thickness=3.0).run(
        modality="PT", rescale_slope=1.0,
        extra_tags={"Units": "BQML", "DecayCorrection": "ADMIN",
                    "PatientWeight": 70.0,
                    "RadiopharmaceuticalInformationSequence":
                        Sequence([suv_info])})

    # --- US cine + NM RECON ------------------------------------------
    us_cine = _write_us_cine(root / "us", rng)
    nm_arr = _write_nm_recon(root / "nm", rng)

    # --- RTSTRUCT (ROI + POI) on the JPEG-LS CT ----------------------
    rois = {"Target": [(square_contour_mm(ct_info, z, 6, 14), z)
                       for z in range(2, 6)]}
    write_rtstruct(root / "rs.dcm", ct_info, rois,
                   pois={"Marker": (-95.0, -110.0, -46.0)})

    # --- RTDOSE with DESCENDING offsets + linked RTPLAN --------------
    dose_up = np.zeros((8, 24, 24), np.uint32)
    # 20 Gy at scaling 0.001; 6:15 covers the fillPoly-inclusive mask
    dose_up[2:6, 6:15, 6:15] = 20000
    info_top = dict(ct_info)
    top_origin = np.asarray(ct_info["origin"], float).copy()
    top_origin[2] += 7 * 2.0
    info_top["origin"] = top_origin
    write_rtdose_file(root / "rd.dcm", dose_up[::-1].copy(), info_top)
    d = dcmread(str(root / "rd.dcm"))
    d.GridFrameOffsetVector = [-2.0 * i for i in range(8)]
    dose_sop = d.SOPInstanceUID
    dcmwrite(str(root / "rd.dcm"), d)
    write_rtplan_file(root / "rp.dcm", n_fractions=30, prescription=60.0,
                      dose_sop=dose_sop)

    # --- two REGs CT<->MR: rigid + deformable ------------------------
    rig_m = np.eye(4)
    rig_m[:3, 3] = [5.0, -3.0, 2.0]
    write_reg_file(root / "reg_rigid.dcm", ct_info, mr_info, rig_m)
    dvf = rng.normal(0, 1.0, size=(4, 8, 8, 3)).astype("<f4")
    pre_m = np.eye(4)
    pre_m[:3, 3] = [1.0, 2.0, 3.0]
    _write_deformable_reg(root / "reg_dvf.dcm", ct_info, mr_info, dvf,
                          pre_m)

    # --- SEG on the JPEG-LS CT (author via a pre-pass, then clear) ---
    Data.clear()
    mia.read_dicoms(folder_path=str(ct_dir))
    seg_mask = np.zeros((8, 24, 24), np.uint8)
    seg_mask[2:6, 6:14, 6:14] = 1
    img0 = Data.image[Data.image_list[0]]
    img0.create_roi(name="AutoSeg", color=[0, 200, 100])
    img0.rois["AutoSeg"].convert_mask(seg_mask)
    img0.create_seg(roi_names=["AutoSeg"], path=str(root / "seg.dcm"))

    # --- a .zip holding one extra CT series --------------------------
    zip_src = tmp_path / "zipsrc"
    zip_arr = rng.integers(-200, 800, size=(3, 12, 12)).astype(np.int16)
    write_ct_series(zip_src, zip_arr, spacing=(1, 1), thickness=2.5)
    with zipfile.ZipFile(root / "extra.zip", "w") as z:
        for f in sorted(zip_src.iterdir()):
            z.write(f, f.name)

    # --- garbage: corrupt, truncated, and extension-less DICM --------
    (root / "junk.dcm").write_bytes(rng.bytes(512))
    valid = sorted(ct_dir.glob("*.dcm"))[0].read_bytes()
    (root / "trunc.dcm").write_bytes(valid[: len(valid) // 3])
    # header intact, PixelData cut: joins the anat series (duplicate
    # IPP) and must be dropped WITHOUT poisoning the 8 good slices
    (root / "trunc_pixels.dcm").write_bytes(
        valid[: int(len(valid) * 0.9)])
    noext_src = tmp_path / "noext_src"
    noext_arr = rng.integers(-100, 100, size=(2, 10, 10)).astype(np.int16)
    noext_info = write_ct_series(noext_src, noext_arr, spacing=(1, 1),
                                 thickness=2.0)
    for i, f in enumerate(sorted(noext_src.iterdir())):
        (root / f"IMG{i:04d}").write_bytes(f.read_bytes())

    # ======= THE single-pass ingest ===================================
    Data.clear()
    report = mia.read_dicoms(folder_path=str(root)).report

    # --- registry census ---------------------------------------------
    by_mod = {}
    for n in Data.image_list:
        by_mod.setdefault(Data.image[n].modality, []).append(n)
    assert sorted(by_mod) == ["CT", "MR", "NM", "PT", "US"]
    # CTs: anat + 3 gated phases + zip + extension-less = 6
    assert len(by_mod["CT"]) == 6
    assert len(by_mod["MR"]) == len(by_mod["PT"]) == 1
    assert len(by_mod["US"]) == len(by_mod["NM"]) == 1

    def find_ct(series_uid):
        for n in by_mod["CT"]:
            if Data.image[n].series_uid == series_uid:
                return Data.image[n]
        raise AssertionError(f"no CT with series {series_uid}")

    # --- JPEG-LS CT: lossless pixels + geometry + ROI/POI/SEG links --
    anat = find_ct(ct_info["series_uid"])
    np.testing.assert_array_equal(anat.array, ct_arr)
    np.testing.assert_allclose(anat.spacing, [1.0, 1.0, 2.0])
    np.testing.assert_allclose(anat.origin, ct_info["origin"])
    assert set(anat.rois) == {"Target", "AutoSeg"}
    assert set(anat.pois) == {"Marker"}
    np.testing.assert_allclose(
        np.asarray(anat.pois["Marker"].point_position).reshape(-1),
        [-95.0, -110.0, -46.0])
    seg_ingested = np.asarray(
        anat.rois["AutoSeg"].compute_mask()).astype(np.uint8)
    np.testing.assert_array_equal(seg_ingested, seg_mask)
    target_mask = np.asarray(
        anat.rois["Target"].compute_mask()).astype(np.uint8)
    assert target_mask[2:6].sum() == target_mask.sum() > 0
    # Data.match_rois injects name stubs everywhere (reference
    # data.py:111-145) — but the CONTOURS must live only on anat
    for mod, names in by_mod.items():
        for n in names:
            img = Data.image[n]
            if img is anat:
                continue
            for rn in ("Target", "AutoSeg"):
                roi = (img.rois or {}).get(rn)
                assert roi is None or not roi.contour_position, (mod, n)

    # --- 4D gated CT: 3 phases with exact per-phase pixels -----------
    from medicalimageanalysis_tpu.utils.fourd import find_phase_groups
    groups = find_phase_groups()
    assert len(groups) == 1 and len(groups[0]) == PHASES
    for k, name in enumerate(groups[0]):
        img = Data.image[name]
        np.testing.assert_array_equal(img.array, phase_vols[k])
        np.testing.assert_allclose(img.spacing, [1, 1, 2.0])

    # --- zip + extension-less CTs ------------------------------------
    zcts = [Data.image[n] for n in by_mod["CT"]
            if Data.image[n].array.shape == (3, 12, 12)]
    assert len(zcts) == 1
    np.testing.assert_array_equal(zcts[0].array, zip_arr)
    noext = find_ct(noext_info["series_uid"])
    np.testing.assert_array_equal(noext.array, noext_arr)

    # --- US / NM / PT payloads ---------------------------------------
    us = Data.image[by_mod["US"][0]]
    np.testing.assert_array_equal(us.array, us_cine)
    nm = Data.image[by_mod["NM"][0]]
    assert nm.array.dtype == np.float32  # counts >32767 must survive
    np.testing.assert_allclose(nm.array, nm_arr.astype(np.float32))
    pt = Data.image[by_mod["PT"][0]]
    suv = pt.compute_suv()
    np.testing.assert_allclose(suv, 5000.0 * 70000.0 / 3.5e8, rtol=1e-5)

    # --- REG pair links ----------------------------------------------
    assert len(Data.rigid_list) == 1
    rigid = Data.rigid[Data.rigid_list[0]]
    np.testing.assert_allclose(rigid.matrix, np.linalg.inv(rig_m),
                               atol=1e-5)
    assert rigid.reference_name == anat.image_name
    assert Data.image[rigid.moving_name].modality == "MR"
    assert len(Data.deformable_list) == 1
    deform = Data.deformable[Data.deformable_list[0]]
    np.testing.assert_allclose(deform.dvf, dvf, atol=1e-6)
    np.testing.assert_allclose(deform.rigid_matrix,
                               np.linalg.inv(pre_m), atol=1e-6)
    assert deform.reference_name == anat.image_name
    assert Data.image[deform.moving_name].modality == "MR"

    # --- dose: descending offsets normalized + plan link + DVH -------
    assert len(Data.dose_list) == 1
    dose = Data.dose[Data.dose_list[0]]
    assert dose.array.shape == (8, 24, 24)
    # normalized back to ascending: slab at z index 2..5
    assert np.abs(dose.array[2:6]).sum() > 0
    assert np.abs(dose.array[:2]).sum() == 0
    np.testing.assert_allclose(dose.origin, ct_info["origin"],
                               atol=1e-6)
    stats = dose.compute_roi_dose_statistics(anat.image_name, "Target")
    assert abs(stats["Dmean"] - 20.0) < 0.5
    assert Data.plan_list == ["RTPLAN 01"]
    plan = Data.plan["RTPLAN 01"]
    assert plan.linked_dose_names() == list(Data.dose_list)

    # --- report bookkeeping ------------------------------------------
    assert not report.failed_series
    assert not report.unmatched_rtstructs
    assert not report.unmatched_segs
    # junk + both truncations rejected, nothing else
    failed = {f.rsplit("/", 1)[-1] for f in report.failed_files}
    assert failed == {"junk.dcm", "trunc.dcm", "trunc_pixels.dcm"}
    # the series that carried the corrupt slice is flagged, not lost
    assert report.unverified.get(anat.image_name) == "CorruptSlices"
    assert len(report.images_created) == len(Data.image_list) == 10
