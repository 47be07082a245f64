"""PET SUV conversion + PT float32 ingest tests (BEYOND-PARITY: the
reference ingests PT but has no SUV conversion, and its blanket int16
cast saturates Bq/mL values — fixed here, PT arrays stay float32)."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import Dataset, Sequence
from medicalimageanalysis_tpu.utils.creation import CreateDicomImage


def _radiopharm(dose_bq=3.5e8, half_life_s=6586.2, start="080000"):
    info = Dataset()
    info.RadionuclideTotalDose = dose_bq
    info.RadionuclideHalfLife = half_life_s
    info.RadiopharmaceuticalStartTime = start
    return Sequence([info])


def _write_pt(folder, raw, slope=1.37, **tag_overrides):
    extra = {
        "Units": "BQML",
        "DecayCorrection": "START",
        "SeriesTime": "090000",
        "PatientWeight": 70.0,
        "RadiopharmaceuticalInformationSequence": _radiopharm(),
    }
    extra.update(tag_overrides)
    CreateDicomImage(str(folder), raw, spacing=[2.0, 2.0],
                     thickness=3.0).run(modality="PT",
                                        rescale_slope=slope,
                                        extra_tags=extra)


def test_pt_ingest_float32_no_saturation(tmp_path, ):
    """Stored 30000 * slope 1.37 = 41100 Bq/mL > int16 max: the PT
    array must hold it exactly (the reference saturates at 32767)."""
    raw = np.full((4, 16, 16), 30000, np.int16)
    _write_pt(tmp_path / "pt", raw)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]
    assert img.array.dtype == np.float32
    np.testing.assert_allclose(img.array, 30000 * 1.37, rtol=1e-6)


def test_suv_start_decay_correction(tmp_path):
    """SUVbw = act * weight_g / (dose * 2^(-dt/T_half)) with a 1-hour
    uptake: every term pinned by hand."""
    raw = np.full((4, 16, 16), 10000, np.int16)
    _write_pt(tmp_path / "pt", raw, slope=1.0)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]

    act = 10000.0                       # Bq/mL
    dt = 3600.0                         # 08:00 -> 09:00
    decayed = 3.5e8 * 2.0 ** (-dt / 6586.2)
    expected = act * 70.0 * 1000.0 / decayed
    suv = img.compute_suv()
    assert suv.dtype == np.float32
    np.testing.assert_allclose(suv, expected, rtol=1e-5)
    assert 2.0 < expected < 3.0         # sanity: physiologic range


def test_suv_admin_and_midnight_and_datetime(tmp_path):
    raw = np.full((2, 8, 8), 5000, np.int16)

    # ADMIN: no decay factor
    _write_pt(tmp_path / "a", raw, slope=1.0, DecayCorrection="ADMIN")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path / "a"))
    suv = Data.image["PT 01"].compute_suv()
    np.testing.assert_allclose(suv, 5000.0 * 70000.0 / 3.5e8,
                               rtol=1e-5)

    # midnight crossing: injection 23:30, scan 00:30 -> dt = 1 h
    info = Dataset()
    info.RadionuclideTotalDose = 3.5e8
    info.RadionuclideHalfLife = 6586.2
    info.RadiopharmaceuticalStartTime = "233000"
    _write_pt(tmp_path / "b", raw, slope=1.0, SeriesTime="003000",
              RadiopharmaceuticalInformationSequence=Sequence([info]))
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path / "b"))
    suv = Data.image["PT 01"].compute_suv()
    decayed = 3.5e8 * 2.0 ** (-3600.0 / 6586.2)
    np.testing.assert_allclose(suv, 5000.0 * 70000.0 / decayed,
                               rtol=1e-5)

    # DT start form (date+time) takes precedence
    info2 = Dataset()
    info2.RadionuclideTotalDose = 3.5e8
    info2.RadionuclideHalfLife = 6586.2
    info2.RadiopharmaceuticalStartDateTime = "20260818080000"
    _write_pt(tmp_path / "c", raw, slope=1.0, SeriesTime="090000",
              RadiopharmaceuticalInformationSequence=Sequence([info2]))
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path / "c"))
    suv = Data.image["PT 01"].compute_suv()
    decayed = 3.5e8 * 2.0 ** (-3600.0 / 6586.2)
    np.testing.assert_allclose(suv, 5000.0 * 70000.0 / decayed,
                               rtol=1e-5)


def test_suv_typed_errors(tmp_path):
    raw = np.full((2, 8, 8), 100, np.int16)

    _write_pt(tmp_path / "pt", raw, Units="CNTS")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]
    with pytest.raises(ValueError, match="Units"):
        img.compute_suv()

    # CT images refuse outright
    ct = np.zeros((2, 8, 8), np.int16)
    CreateDicomImage(str(tmp_path / "ct"), ct).run()
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path / "ct"))
    with pytest.raises(ValueError, match="PT"):
        Data.image["CT 01"].compute_suv()

    # missing weight
    _write_pt(tmp_path / "nw", raw, PatientWeight=None)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path / "nw"))
    with pytest.raises(ValueError, match="PatientWeight"):
        Data.image["PT 01"].compute_suv()


def test_roi_statistics_and_mtv_tlg(tmp_path):
    """ROI stats on the SUV map + MTV/TLG with absolute and
    41%-of-max thresholds, every number pinned by hand."""
    raw = np.full((4, 16, 16), 1000, np.int16)   # background
    raw[1:3, 4:10, 4:10] = 8000                  # hot lesion
    _write_pt(tmp_path / "pt", raw, slope=1.0, DecayCorrection="ADMIN")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]
    suv = img.compute_suv()
    scale = 70000.0 / 3.5e8                      # weight_g / dose

    roi = np.zeros((4, 16, 16), np.uint8)
    roi[1:3, 3:11, 3:11] = 1                     # lesion + 1-voxel rim
    img.create_roi(name="Lesion", color=[255, 0, 0])
    img.rois["Lesion"].convert_mask(roi)

    stats = img.compute_roi_statistics("Lesion", values=suv)
    voxel_cc = 2.0 * 2.0 * 3.0 / 1000.0
    assert stats["voxels"] == 2 * 8 * 8
    assert stats["volume_cc"] == pytest.approx(128 * voxel_cc)
    assert stats["max"] == pytest.approx(8000 * scale, rel=1e-5)
    assert stats["min"] == pytest.approx(1000 * scale, rel=1e-5)

    # absolute threshold between background and lesion SUV
    out = img.compute_mtv_tlg("Lesion", suv=suv,
                              threshold=4000 * scale)
    assert out["mtv_cc"] == pytest.approx(72 * voxel_cc)   # 2*6*6
    assert out["tlg"] == pytest.approx(
        72 * voxel_cc * 8000 * scale, rel=1e-5)
    assert out["suv_max"] == pytest.approx(8000 * scale, rel=1e-5)

    # 41% of max: 0.41 * 8000*scale > background 1000*scale
    rel = img.compute_mtv_tlg("Lesion", suv=suv, threshold=0.41,
                              relative=True)
    assert rel["mtv_cc"] == pytest.approx(72 * voxel_cc)

    # HU-style stats with values=None fall back to the image array
    s2 = img.compute_roi_statistics("Lesion")
    assert s2["max"] == pytest.approx(8000.0)


def test_pt_export_dicom_round_trip(tmp_path):
    """export_dicom of a float32 PT volume auto-scales into int16
    stored values + RescaleSlope; re-ingest restores Bq/mL within the
    quantization (max/32000)."""
    raw = np.full((3, 12, 12), 100, np.int16)
    raw[1, 4:8, 4:8] = 30000
    _write_pt(tmp_path / "pt", raw, slope=1.37)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]
    src = np.asarray(img.array)
    assert src.dtype == np.float32 and src.max() > 32767

    out = tmp_path / "export"
    img.export_dicom(str(out))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    back = Data.image["PT 01"]
    assert np.asarray(back.array).dtype == np.float32
    np.testing.assert_allclose(np.asarray(back.array), src,
                               atol=src.max() / 32000.0 + 1e-3)


def test_suv_dt_offset_and_truncated_forms(tmp_path):
    """Legal DT variants (UTC offset suffix, fractional seconds) parse
    (review finding: offset forms crashed tm_seconds)."""
    raw = np.full((2, 8, 8), 5000, np.int16)
    info = Dataset()
    info.RadionuclideTotalDose = 3.5e8
    info.RadionuclideHalfLife = 6586.2
    info.RadiopharmaceuticalStartDateTime = \
        "20260818080000.000000-0500"
    _write_pt(tmp_path / "pt", raw, slope=1.0, SeriesTime="090000",
              RadiopharmaceuticalInformationSequence=Sequence([info]))
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    suv = Data.image["PT 01"].compute_suv()
    decayed = 3.5e8 * 2.0 ** (-3600.0 / 6586.2)
    np.testing.assert_allclose(suv, 5000.0 * 70000.0 / decayed,
                               rtol=1e-5)


def test_pt_export_preserves_suv_inputs(tmp_path):
    """export_dicom of PT forwards Units/decay/weight/timing/
    radiopharm info so compute_suv works after the round trip (review
    finding: the exporter dropped them all)."""
    raw = np.full((2, 8, 8), 10000, np.int16)
    _write_pt(tmp_path / "pt", raw, slope=1.0)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    suv_src = Data.image["PT 01"].compute_suv()

    out = tmp_path / "export"
    Data.image["PT 01"].export_dicom(str(out))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    suv_back = Data.image["PT 01"].compute_suv()
    np.testing.assert_allclose(suv_back, suv_src, rtol=1e-3)


def test_export_int_out_of_range_rescaled(tmp_path):
    """Integer volumes beyond int16 range export via the rescale path
    instead of wrapping (review finding)."""
    from medicalimageanalysis_tpu.dicom import dcmread
    raw = np.full((2, 8, 8), 100, np.int16)
    _write_pt(tmp_path / "pt", raw, slope=3.0, DecayCorrection="ADMIN")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]
    img.array = np.full((2, 8, 8), 50000, np.int32)  # > int16 max

    out = tmp_path / "export"
    img.export_dicom(str(out))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    np.testing.assert_allclose(np.asarray(Data.image["PT 01"].array),
                               50000.0, rtol=1e-3)


def test_empty_roi_statistics_schema(tmp_path):
    raw = np.full((2, 8, 8), 100, np.int16)
    _write_pt(tmp_path / "pt", raw, DecayCorrection="ADMIN")
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["PT 01"]
    img.create_roi(name="Empty", color=[1, 2, 3])
    img.rois["Empty"].convert_mask(np.zeros((2, 8, 8), np.uint8))
    stats = img.compute_roi_statistics("Empty")
    assert stats["voxels"] == 0 and stats["volume_cc"] == 0.0
    for k in ("min", "max", "mean", "median", "std"):
        assert np.isnan(stats[k])
    out = img.compute_mtv_tlg("Empty", suv=np.zeros((2, 8, 8)))
    assert out["mtv_cc"] == 0.0 and out["threshold"] == 2.5


def test_extra_tags_unknown_keyword_raises(tmp_path):
    with pytest.raises(ValueError, match="not a known DICOM keyword"):
        CreateDicomImage(str(tmp_path / "x"),
                         np.zeros((1, 4, 4), np.int16)).run(
            extra_tags={"NotARealKeyword": 1})
