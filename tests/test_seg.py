"""DICOM SEG (Segmentation IOD) reader + writer tests.

BEYOND-PARITY feature (the reference routes only RTSTRUCT for
structures): Image.create_seg writes BINARY (1-bit packed) and
FRACTIONAL (8-bit) SEG objects, read/seg.ReadSEG maps them back onto
the matched image as mask-derived ROIs. Round trips use rectangular
masks, where the cv2 contour<->mask conversion is exact, so equality
is bitwise.
"""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data

from helpers import write_ct_series


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def _ingest_ct(tmp_path, rng, shape=(6, 16, 16)):
    arr = rng.integers(-200, 200, size=shape).astype(np.int16)
    write_ct_series(tmp_path / "ct", arr)
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    return Data.image["CT 01"]


def _rect_masks(shape):
    a = np.zeros(shape, np.uint8)
    a[1:4, 2:8, 3:9] = 1
    b = np.zeros(shape, np.uint8)
    b[2:5, 9:14, 8:13] = 1
    return a, b


def test_cielab_color_round_trip():
    from medicalimageanalysis_tpu.read.seg import (cielab_uint16_to_rgb,
                                                   rgb_to_cielab_uint16)
    for rgb in ([255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255],
                [0, 0, 0], [128, 64, 200], [17, 230, 99]):
        back = cielab_uint16_to_rgb(rgb_to_cielab_uint16(rgb))
        assert np.max(np.abs(np.array(back) - np.array(rgb))) <= 2, \
            (rgb, back)


def test_binary_seg_round_trip(tmp_path, rng):
    img = _ingest_ct(tmp_path, rng)
    mask_a, mask_b = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    img.create_roi(name="B", color=[0, 128, 255])
    img.rois["B"].convert_mask(mask_b)

    ds = img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))
    assert ds.SegmentationType == "BINARY"
    assert int(ds.BitsAllocated) == 1
    # one frame per non-empty (segment, slice)
    assert int(ds.NumberOfFrames) == 3 + 3

    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img2 = Data.image["CT 01"]
    assert "A" in img2.rois and "B" in img2.rois
    assert np.array_equal(
        np.asarray(img2.rois["A"].compute_mask()).astype(np.uint8),
        mask_a)
    assert np.array_equal(
        np.asarray(img2.rois["B"].compute_mask()).astype(np.uint8),
        mask_b)
    # colors survive the CIELab encode/decode round trip
    assert np.max(np.abs(np.array(img2.rois["A"].color)
                         - np.array([255, 0, 0]))) <= 2


def test_fractional_seg_round_trip(tmp_path, rng):
    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[0, 255, 0])
    img.rois["A"].convert_mask(mask_a)

    ds = img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"),
                        fractional=True)
    assert ds.SegmentationType == "FRACTIONAL"
    assert int(ds.BitsAllocated) == 8

    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img2 = Data.image["CT 01"]
    assert np.array_equal(
        np.asarray(img2.rois["A"].compute_mask()).astype(np.uint8),
        mask_a)


def test_fractional_seg_rle_compressed(tmp_path, rng):
    """8-bit FRACTIONAL SEG written RLE-compressed decodes through the
    same pixel_array route the image readers use (BINARY 1-bit stays
    native-only per PS3.3 C.8.20.2.1)."""
    from medicalimageanalysis_tpu.dicom import dcmwrite, uids

    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[0, 255, 0])
    img.rois["A"].convert_mask(mask_a)
    ds = img.create_seg(fractional=True)
    dcmwrite(str(tmp_path / "ct" / "seg.dcm"), ds,
             transfer_syntax=uids.RLELossless)

    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img2 = Data.image["CT 01"]
    assert np.array_equal(
        np.asarray(img2.rois["A"].compute_mask()).astype(np.uint8),
        mask_a)


def test_seg_only_load_roi_names(tmp_path, rng):
    img = _ingest_ct(tmp_path, rng)
    mask_a, mask_b = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    img.create_roi(name="B", color=[0, 128, 255])
    img.rois["B"].convert_mask(mask_b)
    img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))

    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path), only_load_roi_names=["B"])
    img2 = Data.image["CT 01"]
    assert "B" in img2.rois and "A" not in img2.rois


def test_unmatched_seg_reported(tmp_path, rng):
    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    seg_dir = tmp_path / "seg_only"
    seg_dir.mkdir()
    img.create_seg(path=str(seg_dir / "seg.dcm"))

    Data.clear()
    report = mia.read_dicoms(folder_path=str(seg_dir)).report
    assert len(report.unmatched_segs) == 1
    assert not Data.image


def test_off_grid_frames_skipped(tmp_path, rng):
    """A frame whose ImagePositionPatient is off the image grid is
    counted in skipped_frames, not silently mislabeled."""
    from medicalimageanalysis_tpu.read.seg import ReadSEG

    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    ds = img.create_seg()
    plane = ds.PerFrameFunctionalGroupsSequence[0] \
        .PlanePositionSequence[0]
    ipp = [float(v) for v in plane.ImagePositionPatient]
    ipp[2] += 1.3  # 0.52 voxels at 2.5 mm slices: past the 0.5 snap
    plane.ImagePositionPatient = ipp

    seg = ReadSEG(ds, only_tags=False)
    assert seg.match_image_name == "CT 01"
    assert seg.skipped_frames == 1
    # the other two slices of A still landed
    assert int(seg.masks[0].sum()) == int(mask_a[2:4].sum())


def test_seg_ingest_byte_flip_fuzz(tmp_path, rng):
    """Byte-flip fuzz of a SEG object through the FULL read_dicoms
    flow: corrupt SEGs are skipped via the tolerant _build_series
    boundary, never an uncaught exception (same contract as the CT /
    RTSTRUCT / JPEG fuzz programs in test_native_hostile.py)."""
    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    seg_path = tmp_path / "ct" / "seg.dcm"
    img.create_seg(path=str(seg_path))
    good = seg_path.read_bytes()
    ct_files = [str(p) for p in sorted((tmp_path / "ct").glob("*.dcm"))
                if p.name != "seg.dcm"]

    mut_path = tmp_path / "mut_seg.dcm"
    frng = np.random.default_rng(79)
    for trial in range(120):
        blob = bytearray(good)
        for _ in range(int(frng.integers(1, 16))):
            blob[int(frng.integers(0, len(blob)))] = int(
                frng.integers(0, 256))
        mut_path.write_bytes(bytes(blob))
        Data.clear()
        # must not raise — corrupt SEGs are skipped or load partially
        mia.read_dicoms(file_list=ct_files + [str(mut_path)])
    Data.clear()


def test_seg_in_report_summary(tmp_path, rng):
    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))

    Data.clear()
    report = mia.read_dicoms(folder_path=str(tmp_path)).report
    assert report.summary()["unmatched_segs"] == 0


def test_transposed_seg_rejected(tmp_path, rng):
    """A SEG whose frame orientation disagrees with the image (e.g.
    row/col swapped) must be rejected, not ingested as a silently
    transposed mask (review finding)."""
    from medicalimageanalysis_tpu.read.seg import ReadSEG

    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    ds = img.create_seg()
    shared = ds.SharedFunctionalGroupsSequence[0]
    shared.PlaneOrientationSequence[0].ImageOrientationPatient = \
        [0.0, 1.0, 0.0, 1.0, 0.0, 0.0]

    with pytest.raises(ValueError, match="orientation"):
        ReadSEG(ds, only_tags=False)

    # through read_dicoms it lands in failed_series, not as a bad ROI
    seg_path = tmp_path / "ct" / "seg.dcm"
    from medicalimageanalysis_tpu.dicom import dcmwrite
    dcmwrite(str(seg_path), ds)
    Data.clear()
    report = mia.read_dicoms(folder_path=str(tmp_path)).report
    img2 = Data.image["CT 01"]
    assert "A" not in img2.rois
    assert any("ReadSEG" in f["builder"] for f in report.failed_series)


def test_zero_frame_seg_round_trip(tmp_path, rng):
    """An all-empty ROI writes a zero-frame SEG that re-ingests as an
    empty ROI instead of failing (review finding: '0 or 1' coerced
    NumberOfFrames=0 to 1)."""
    img = _ingest_ct(tmp_path, rng)
    img.create_roi(name="Empty", color=[10, 200, 10])
    img.rois["Empty"].convert_mask(np.zeros((6, 16, 16), np.uint8))
    ds = img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))
    assert int(ds.NumberOfFrames) == 0

    Data.clear()
    report = mia.read_dicoms(folder_path=str(tmp_path)).report
    assert not report.failed_series
    img2 = Data.image["CT 01"]
    assert "Empty" in img2.rois


def test_filtered_segments_not_counted_off_grid(tmp_path, rng):
    """Frames of segments excluded by only_load_roi_names are dropped
    silently, not reported as off-grid (review finding)."""
    img = _ingest_ct(tmp_path, rng)
    mask_a, mask_b = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    img.create_roi(name="B", color=[0, 128, 255])
    img.rois["B"].convert_mask(mask_b)
    img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))

    Data.clear()
    report = mia.read_dicoms(folder_path=str(tmp_path),
                             only_load_roi_names=["B"]).report
    assert not any("off-grid" in w for w in report.warnings)
    assert "B" in Data.image["CT 01"].rois


def test_seg_conformance_elements_round_trip(tmp_path, rng):
    """ContentLabel/Description, segment property code sequences and
    the dimension organization survive a write+parse round trip
    (review findings: ContentDescription silently dropped; Type-1
    code sequences missing)."""
    from medicalimageanalysis_tpu.dicom import dcmread

    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    img.create_seg(path=str(tmp_path / "seg.dcm"), label="my study")

    back = dcmread(str(tmp_path / "seg.dcm"))
    assert str(back.ContentDescription) == "my study"
    assert str(back.ContentLabel) == "SEG"
    seg0 = back.SegmentSequence[0]
    cat = seg0.SegmentedPropertyCategoryCodeSequence[0]
    assert str(cat.CodeValue) == "123037004"
    typ = seg0.SegmentedPropertyTypeCodeSequence[0]
    assert str(typ.CodeValue) == "85756007"
    dim = back.DimensionIndexSequence
    assert int(dim[0].DimensionIndexPointer) == 0x0062000B
    assert int(dim[1].DimensionIndexPointer) == 0x00200032
    frame0 = back.PerFrameFunctionalGroupsSequence[0]
    assert list(frame0.FrameContentSequence[0].DimensionIndexValues) \
        == [1, 2]


@pytest.mark.parametrize("orientation, plane", [
    ([1, 0, 0, 0, 0, -1], "Coronal"),
    ([0, 1, 0, 0, 0, -1], "Sagittal"),
])
def test_seg_and_export_non_axial_round_trip(tmp_path, rng,
                                             orientation, plane):
    """SEG write/read and export_dicom on coronal/sagittal-acquired
    series: the ingest canonicalizes to (z, y, x), the writers must
    emit pixel-axis geometry (review follow-up: CreateDicomImage
    previously stepped +z regardless of orientation and export_dicom
    wrote the acquisition IOP against z-sliced data)."""
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    arr = rng.integers(-200, 200, size=(6, 16, 16)).astype(np.int16)
    gen = CreateDicomImage(str(tmp_path / "ct"), arr,
                           origin=[-50, -60, -40], spacing=[1.0, 1.0],
                           thickness=2.0)
    gen.orientation = orientation
    gen.run()
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    assert img.plane == plane

    mask = np.zeros(img.array.shape, np.uint8)
    mask[1:4, 3:9, 2:10] = 1
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask)
    img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))

    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img2 = Data.image["CT 01"]
    assert np.array_equal(
        np.asarray(img2.rois["A"].compute_mask()).astype(np.uint8),
        mask)

    out = tmp_path / "export"
    img2.export_dicom(str(out))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    img3 = Data.image["CT 01"]
    np.testing.assert_array_equal(np.asarray(img3.array),
                                  np.asarray(img2.array))
    np.testing.assert_allclose(img3.origin, img2.origin, atol=1e-6)
    np.testing.assert_allclose(img3.matrix, img2.matrix, atol=1e-6)
    np.testing.assert_allclose(img3.spacing, img2.spacing, atol=1e-6)


def test_oblique_orientation_seg_and_export_round_trip(tmp_path, rng):
    """10-deg in-plane oblique acquisition: ingest preserves the exact
    rotated matrix, and SEG + export_dicom round trips stay exact
    (the SEG z-snap and orientation check run through the full
    position<->pixel matrices, not plane assumptions)."""
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    arr = rng.integers(-200, 200, size=(6, 16, 16)).astype(np.int16)
    c, s = np.cos(np.deg2rad(10)), np.sin(np.deg2rad(10))
    gen = CreateDicomImage(str(tmp_path / "ct"), arr,
                           origin=[-50, -60, -40], spacing=[1.0, 1.0],
                           thickness=2.0)
    gen.orientation = [c, s, 0, -s, c, 0]
    gen.run()
    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img = Data.image["CT 01"]
    np.testing.assert_allclose(img.matrix[0], [c, s, 0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(img.array), arr)

    mask = np.zeros((6, 16, 16), np.uint8)
    mask[1:4, 3:9, 2:10] = 1
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask)
    img.create_seg(path=str(tmp_path / "ct" / "seg.dcm"))

    Data.clear()
    mia.read_dicoms(folder_path=str(tmp_path))
    img2 = Data.image["CT 01"]
    assert np.array_equal(
        np.asarray(img2.rois["A"].compute_mask()).astype(np.uint8),
        mask)

    out = tmp_path / "export"
    img2.export_dicom(str(out))
    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    img3 = Data.image["CT 01"]
    np.testing.assert_array_equal(np.asarray(img3.array), arr)
    np.testing.assert_allclose(img3.matrix, img2.matrix, atol=1e-5)
    np.testing.assert_allclose(img3.origin, img2.origin, atol=1e-4)


def test_cropped_subwindow_seg(tmp_path, rng):
    """A SEG whose frames cover only a bounding sub-window of the
    image grid (tight-crop exports) pastes at each frame's integer
    pixel offset instead of being rejected."""
    from medicalimageanalysis_tpu.dicom import dcmread, dcmwrite

    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    ds = img.create_seg()

    # crop every frame to the y 2:8, x 3:9 window (exactly the A box)
    rows, cols = 6, 6
    y0, x0 = 2, 3
    nfr = int(ds.NumberOfFrames)
    flat = np.unpackbits(np.frombuffer(ds.PixelData, np.uint8),
                         bitorder="little")[:nfr * 16 * 16]
    frames = flat.reshape(nfr, 16, 16)
    cropped = frames[:, y0:y0 + rows, x0:x0 + cols]
    ds.Rows, ds.Columns = rows, cols
    payload = np.packbits(cropped.reshape(-1), bitorder="little") \
        .tobytes()
    ds.PixelData = payload + (b"\x00" if len(payload) % 2 else b"")
    # shift each frame's IPP to the window corner
    from medicalimageanalysis_tpu.ops import geometry as geo
    m = img.display.compute_matrix_pixel_to_position()
    for fi, item in enumerate(ds.PerFrameFunctionalGroupsSequence):
        plane = item.PlanePositionSequence[0]
        old = np.asarray(plane.ImagePositionPatient, np.float64)
        pix = geo.apply_homogeneous(
            old, img.display.compute_matrix_position_to_pixel())
        new = geo.apply_homogeneous(
            np.array([x0, y0, float(np.round(pix[2]))]), m)
        plane.ImagePositionPatient = [float(v) for v in new]
    dcmwrite(str(tmp_path / "ct" / "seg.dcm"), ds)

    Data.clear()
    report = mia.read_dicoms(folder_path=str(tmp_path)).report
    assert not report.failed_series
    img2 = Data.image["CT 01"]
    assert np.array_equal(
        np.asarray(img2.rois["A"].compute_mask()).astype(np.uint8),
        mask_a)


def test_seg_pixel_spacing_mismatch_rejected(tmp_path, rng):
    """A SEG whose PixelSpacing disagrees with the image is rejected
    instead of pasting a wrong-scale mask (review finding: direction
    cosines are spacing-independent, so the IOP check alone let
    half-resolution SEGs through corner-aligned)."""
    from medicalimageanalysis_tpu.read.seg import ReadSEG

    img = _ingest_ct(tmp_path, rng)
    mask_a, _ = _rect_masks((6, 16, 16))
    img.create_roi(name="A", color=[255, 0, 0])
    img.rois["A"].convert_mask(mask_a)
    ds = img.create_seg()
    shared = ds.SharedFunctionalGroupsSequence[0]
    shared.PixelMeasuresSequence[0].PixelSpacing = [1.6, 1.6]

    with pytest.raises(ValueError, match="PixelSpacing"):
        ReadSEG(ds, only_tags=False)
