"""NM (SPECT/planar scintigraphy) + MG/XA ingest.

BEYOND-PARITY coverage: the reference's modality list stops at
CT/MR/PT/US/DX/RF/CR (+RT objects, reference reader.py:230-238), so
none of these files load there at all.
"""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import (Dataset, Sequence, dcmwrite,
                                            generate_uid, uids)


@pytest.fixture(autouse=True)
def _clear():
    Data.clear()
    yield
    Data.clear()


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _base_nm(rows=16, cols=16, frames=6):
    ds = Dataset()
    ds.SOPClassUID = uids.NuclearMedicineImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "NM"
    ds.PatientID = "NM1"
    ds.SeriesInstanceUID = generate_uid()
    ds.FrameOfReferenceUID = generate_uid()
    ds.NumberOfFrames = frames
    ds.Rows, ds.Columns = rows, cols
    ds.BitsAllocated = 16
    ds.BitsStored = 16
    ds.HighBit = 15
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    return ds


def test_nm_recon_tomo_negative_pitch(tmp_path, rng):
    """RECON TOMO with one detector IOP/IPP and a NEGATIVE
    SpacingBetweenSlices (frames step against the slice normal, legal
    per the NM IOD): frames land in ascending-z order with a correctly
    shifted origin, and uint16 counts above 32767 survive (float32, no
    int16 wrap)."""
    frames = 6
    arr = rng.integers(0, 60000, size=(frames, 16, 16)).astype(np.uint16)
    ds = _base_nm(frames=frames)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PatientPosition = "HFS"
    ds.PixelSpacing = [0.5, 0.5]
    ds.SliceThickness = 2.0
    ds.SpacingBetweenSlices = -2.0
    ds.NumberOfDetectors = 1
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [-50.0, -60.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "tomo.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert Data.image_list == ["NM 01"]
    img = Data.image["NM 01"]
    assert img.array.shape == (frames, 16, 16)
    assert img.array.dtype == np.float32
    # pitch -2 mm: frame i sits at z = -2*i -> ascending z = reversed
    np.testing.assert_array_equal(img.array, arr[::-1].astype(np.float32))
    np.testing.assert_allclose(img.origin, [-50.0, -60.0, -10.0])
    np.testing.assert_allclose(img.spacing, [0.5, 0.5, 2.0])
    np.testing.assert_allclose(img.matrix, np.eye(3))
    assert len(img.sops) == frames


def test_nm_planar_static_counts_and_detector_spacing(tmp_path, rng):
    """STATIC planar NM (no patient-space geometry): pseudo-3D frame
    stack, int32 so counts above 32767 survive, spacing pulled from the
    DetectorInformationSequence when absent at top level."""
    arr = rng.integers(0, 60000, size=(2, 16, 16)).astype(np.uint16)
    ds = _base_nm(frames=2)
    ds.ImageType = ["ORIGINAL", "PRIMARY", "STATIC", "EMISSION"]
    det = Dataset()
    det.PixelSpacing = [2.4, 2.4]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "static.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert Data.image_list == ["NM 01"]
    img = Data.image["NM 01"]
    assert img.array.shape == (2, 16, 16)
    assert img.array.dtype == np.int32
    np.testing.assert_array_equal(img.array, arr.astype(np.int32))
    np.testing.assert_allclose(img.spacing, [2.4, 2.4, 1.0])


def test_nm_whole_body_no_detector_geometry(tmp_path, rng):
    """WHOLE BODY with neither top-level nor detector spacing still
    ingests (unit spacing), exercising the no-geometry branch."""
    arr = rng.integers(0, 500, size=(16, 16)).astype(np.uint16)
    ds = _base_nm(frames=1)
    ds.NumberOfFrames = 1
    ds.ImageType = ["ORIGINAL", "PRIMARY", "WHOLE BODY", "EMISSION"]
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "wb.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert Data.image_list == ["NM 01"]
    img = Data.image["NM 01"]
    assert img.array.shape == (1, 16, 16)
    np.testing.assert_allclose(img.spacing, [1.0, 1.0, 1.0])


def test_nm_multi_detector_tomo_not_expanded(tmp_path, rng):
    """NumberOfDetectors > 1 interleaves frames per detector; without a
    FrameIncrementPointer walk the synthesized geometry would be wrong,
    so the file must take the planar (frame-stack) path, not a bogus
    volume."""
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=4)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PixelSpacing = [1.0, 1.0]
    ds.SpacingBetweenSlices = 2.0
    ds.NumberOfDetectors = 2
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [0.0, 0.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "dual.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    # frame stack in file order, not a z-sorted volume
    np.testing.assert_array_equal(img.array, arr.astype(np.int32))
    np.testing.assert_allclose(img.origin, [0.0, 0.0, 0.0])


def test_mg_reads_as_xray(tmp_path, rng):
    """16-bit FFDM routes through the X-ray reader: values above 32767
    must NOT wrap (int32 widening) and the Inverse LUT pivots on the
    max stored value (65535 for 16-bit), not the reference's hardcoded
    14-bit 16383."""
    arr = rng.integers(0, 60000, size=(16, 12)).astype(np.uint16)
    ds = Dataset()
    ds.SOPClassUID = uids.MammographyImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "MG"
    ds.PatientID = "MG1"
    ds.SeriesInstanceUID = generate_uid()
    ds.Rows, ds.Columns = 16, 12
    ds.BitsAllocated = 16
    ds.BitsStored = 16
    ds.HighBit = 15
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.ImagerPixelSpacing = [0.07, 0.07]
    ds.PresentationLUTShape = "Inverse"
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "mg").mkdir()
    dcmwrite(tmp_path / "mg" / "mg.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert Data.image_list == ["MG 01"]
    img = Data.image["MG 01"]
    assert img.array.shape == (1, 16, 12)
    assert img.array.dtype == np.int32
    np.testing.assert_array_equal(
        img.array[0], 65535 - arr.astype(np.int32))
    np.testing.assert_allclose(img.spacing, [0.07, 0.07, 1.0])


def test_mg_12bit_inverse_pivot(tmp_path, rng):
    """12-bit Inverse MG pivots around 4095 (a hardcoded 16383 would
    shift every intensity by 12288)."""
    arr = rng.integers(0, 4096, size=(8, 8)).astype(np.uint16)
    ds = Dataset()
    ds.SOPClassUID = uids.MammographyImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "MG"
    ds.PatientID = "MG2"
    ds.SeriesInstanceUID = generate_uid()
    ds.Rows, ds.Columns = 8, 8
    ds.BitsAllocated = 16
    ds.BitsStored = 12
    ds.HighBit = 11
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PresentationLUTShape = "Inverse"
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "mg").mkdir()
    dcmwrite(tmp_path / "mg" / "mg.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["MG 01"]
    np.testing.assert_array_equal(
        img.array[0], 4095 - arr.astype(np.int16))


def test_xa_cine_reads_as_multiframe(tmp_path, rng):
    """XA cine (multi-frame angio) routes through the RF-shaped
    frame-stack reader."""
    arr = rng.integers(0, 1024, size=(5, 8, 8)).astype(np.uint16)
    ds = Dataset()
    ds.SOPClassUID = uids.XRayAngiographicImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "XA"
    ds.PatientID = "XA1"
    ds.SeriesInstanceUID = generate_uid()
    ds.NumberOfFrames = 5
    ds.Rows, ds.Columns = 8, 8
    ds.BitsAllocated = 16
    ds.BitsStored = 10
    ds.HighBit = 9
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.ImagerPixelSpacing = [0.2, 0.2]
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "xa").mkdir()
    dcmwrite(tmp_path / "xa" / "xa.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    assert Data.image_list == ["XA 01"]
    img = Data.image["XA 01"]
    assert img.array.shape == (5, 8, 8)
    np.testing.assert_array_equal(img.array, arr.astype(np.int16))
    np.testing.assert_allclose(img.spacing, [0.2, 0.2, 1.0])


def test_nm_gated_tomo_not_expanded(tmp_path, rng):
    """RECON GATED TOMO interleaves time bins x slices — a linear IPP
    walk would stack every gate into one bogus volume, so it must take
    the frame-stack path."""
    arr = rng.integers(0, 100, size=(8, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=8)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON GATED TOMO",
                    "EMISSION"]
    ds.PixelSpacing = [1.0, 1.0]
    ds.SpacingBetweenSlices = 2.0
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [0.0, 0.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "gated.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    np.testing.assert_array_equal(img.array, arr.astype(np.int32))
    np.testing.assert_allclose(img.origin, [0.0, 0.0, 0.0])


def test_nm_number_of_slices_mismatch_not_expanded(tmp_path, rng):
    """NumberOfSlices != NumberOfFrames (e.g. a gated recon mislabeled
    RECON TOMO: 2 bins x 4 slices) fails closed to the frame stack."""
    arr = rng.integers(0, 100, size=(8, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=8)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PixelSpacing = [1.0, 1.0]
    ds.SpacingBetweenSlices = 2.0
    ds.NumberOfSlices = 4
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [0.0, 0.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "mislabel.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    np.testing.assert_array_equal(img.array, arr.astype(np.int32))


def test_nm_two_detector_items_not_expanded(tmp_path, rng):
    """Two DetectorInformationSequence items with NumberOfDetectors
    ABSENT: interleaved dual-head geometry must not expand along
    detector[0]'s normal (review finding)."""
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=4)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PixelSpacing = [1.0, 1.0]
    ds.SpacingBetweenSlices = 2.0
    det1 = Dataset()
    det1.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det1.ImagePositionPatient = [0.0, 0.0, 0.0]
    det2 = Dataset()
    det2.ImageOrientationPatient = [1, 0, 0, 0, -1, 0]
    det2.ImagePositionPatient = [0.0, 0.0, 100.0]
    ds.DetectorInformationSequence = Sequence([det1, det2])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "dual.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    np.testing.assert_array_equal(img.array, arr.astype(np.int32))


def test_nm_degenerate_detector_orientation_not_expanded(tmp_path, rng):
    """Parallel row/col orientation vectors (zero normal — the
    byte-flip fuzz class) must decline expansion instead of
    registering a spacing-0 volume."""
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=4)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PixelSpacing = [1.0, 1.0]
    ds.SpacingBetweenSlices = 2.0
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 1, 0, 0]
    det.ImagePositionPatient = [0.0, 0.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "degen.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    np.testing.assert_array_equal(img.array, arr.astype(np.int32))
    assert np.all(np.asarray(img.spacing) > 0)


def test_nm_planar_explicit_unit_spacing_wins(tmp_path, rng):
    """An explicit top-level PixelSpacing of exactly [1, 1] must NOT be
    overridden by a stale detector-item PixelSpacing (the fallback
    fires on tag absence, not on the value)."""
    arr = rng.integers(0, 100, size=(2, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=2)
    ds.ImageType = ["ORIGINAL", "PRIMARY", "STATIC", "EMISSION"]
    ds.PixelSpacing = [1.0, 1.0]
    det = Dataset()
    det.PixelSpacing = [4.8, 4.8]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "unit.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    np.testing.assert_allclose(img.spacing, [1.0, 1.0, 1.0])


def test_nm_planar_patient_orientation_plane(tmp_path, rng):
    """Planar NM honors PatientOrientation like every other planar
    reader (whole-body anterior sweep -> Coronal)."""
    arr = rng.integers(0, 100, size=(12, 8)).astype(np.uint16)
    ds = _base_nm(rows=12, cols=8, frames=1)
    ds.NumberOfFrames = 1
    ds.ImageType = ["ORIGINAL", "PRIMARY", "WHOLE BODY", "EMISSION"]
    ds.PatientOrientation = ["L", "F"]
    ds.PixelSpacing = [2.0, 2.0]
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "wb.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    assert img.plane == "Coronal"
    np.testing.assert_allclose(img.spacing, [2.0, 1.0, 2.0])


def test_nm_tomo_parent_pixeldata_released(tmp_path, rng):
    """After volume assembly the shared parent dataset must not keep
    its raw PixelData + full decoded cache pinned (review finding:
    ~2x volume memory for the image's lifetime)."""
    arr = rng.integers(0, 100, size=(4, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=4)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PatientPosition = "HFS"
    ds.PixelSpacing = [1.0, 1.0]
    ds.SpacingBetweenSlices = 2.0
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [0.0, 0.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "tomo.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["NM 01"]
    np.testing.assert_array_equal(img.array, arr.astype(np.float32))
    parent = img.tags[0]._parent
    assert "PixelData" not in parent
    assert parent._pixel_cache is None


def test_nm_tomo_byte_flip_fuzz(tmp_path, rng):
    """Byte-flip fuzz of an NM RECON TOMO file through the FULL
    read_dicoms flow: the detector-geometry expansion must honor the
    same tolerant-ingest contract as every other reader (corrupt files
    skipped or loaded partially, never an uncaught exception)."""
    arr = rng.integers(0, 60000, size=(4, 16, 16)).astype(np.uint16)
    ds = _base_nm(frames=4)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PatientPosition = "HFS"
    ds.PixelSpacing = [0.5, 0.5]
    ds.SpacingBetweenSlices = -2.0
    ds.NumberOfDetectors = 1
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [-50.0, -60.0, 0.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    good_path = tmp_path / "good.dcm"
    dcmwrite(good_path, ds)
    good = good_path.read_bytes()

    mut_path = tmp_path / "mut.dcm"
    fuzz_rng = np.random.default_rng(78)
    for trial in range(150):
        blob = bytearray(good)
        for _ in range(int(fuzz_rng.integers(1, 16))):
            blob[int(fuzz_rng.integers(0, len(blob)))] = int(
                fuzz_rng.integers(0, 256))
        mut_path.write_bytes(bytes(blob))
        Data.clear()
        # must not raise — corrupt files are skipped or load partially
        mia.read_dicoms(file_list=[str(mut_path)])


def test_nm_tomo_only_tags(tmp_path, rng):
    """only_tags keeps geometry without decoding pixels."""
    arr = rng.integers(0, 100, size=(3, 8, 8)).astype(np.uint16)
    ds = _base_nm(rows=8, cols=8, frames=3)
    ds.ImageType = ["DERIVED", "SECONDARY", "RECON TOMO", "EMISSION"]
    ds.PatientPosition = "HFS"
    ds.PixelSpacing = [1.5, 1.5]
    ds.SpacingBetweenSlices = 3.0
    det = Dataset()
    det.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    det.ImagePositionPatient = [0.0, 0.0, 10.0]
    ds.DetectorInformationSequence = Sequence([det])
    ds.PixelData = arr.astype("<u2").tobytes()

    (tmp_path / "nm").mkdir()
    dcmwrite(tmp_path / "nm" / "tomo.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path), only_tags=True)
    img = Data.image["NM 01"]
    assert img.array is None
    np.testing.assert_allclose(img.origin, [0.0, 0.0, 10.0])
    np.testing.assert_allclose(img.spacing, [1.5, 1.5, 3.0])
