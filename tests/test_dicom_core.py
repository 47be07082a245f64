"""Round-trip tests for the from-scratch DICOM core."""

import numpy as np
import pytest

from medicalimageanalysis_tpu.dicom import (
    Dataset, Sequence, dcmread, dcmwrite, generate_uid)
from medicalimageanalysis_tpu.dicom import uids
from medicalimageanalysis_tpu.dicom.writer import encode_rle_frame


def make_ct_slice(arr, z=0.0):
    ds = Dataset()
    ds.SOPClassUID = uids.CTImageStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "CT"
    ds.PatientName = "Test^Patient"
    ds.PatientID = "MRN001"
    ds.SeriesInstanceUID = "1.2.3.4"
    ds.StudyInstanceUID = "1.2.3"
    ds.FrameOfReferenceUID = "1.2.3.9"
    ds.ImagePositionPatient = [-250.0, -250.0, float(z)]
    ds.ImageOrientationPatient = [1, 0, 0, 0, 1, 0]
    ds.PixelSpacing = [0.9765625, 0.9765625]
    ds.SliceThickness = 3.0
    ds.RescaleIntercept = -1024.0
    ds.RescaleSlope = 1.0
    ds.Rows = arr.shape[0]
    ds.Columns = arr.shape[1]
    ds.BitsAllocated = 16
    ds.BitsStored = 16
    ds.HighBit = 15
    ds.PixelRepresentation = 0
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    ds.PixelData = arr.astype("<u2").tobytes()
    return ds


def test_explicit_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 3000, size=(64, 64)).astype(np.uint16)
    ds = make_ct_slice(arr)
    path = tmp_path / "ct.dcm"
    dcmwrite(path, ds)

    out = dcmread(path)
    assert out.Modality == "CT"
    assert out.PatientName == "Test^Patient"
    assert out.PixelSpacing == [0.9765625, 0.9765625]
    assert out.ImagePositionPatient == [-250.0, -250.0, 0.0]
    assert out.RescaleIntercept == -1024.0
    assert out.Rows == 64 and out.Columns == 64
    np.testing.assert_array_equal(out.pixel_array, arr)
    assert out.file_meta.TransferSyntaxUID == uids.ExplicitVRLittleEndian


def test_implicit_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 3000, size=(32, 48)).astype(np.uint16)
    ds = make_ct_slice(arr)
    path = tmp_path / "ct_implicit.dcm"
    dcmwrite(path, ds, transfer_syntax=uids.ImplicitVRLittleEndian)

    out = dcmread(path)
    assert out.Modality == "CT"
    np.testing.assert_array_equal(out.pixel_array, arr)


def test_stop_before_pixels(tmp_path, rng):
    arr = rng.integers(0, 100, size=(16, 16)).astype(np.uint16)
    ds = make_ct_slice(arr)
    path = tmp_path / "ct.dcm"
    dcmwrite(path, ds)
    out = dcmread(path, stop_before_pixels=True)
    assert "PixelData" not in out
    assert out.Modality == "CT"


def test_sequences_roundtrip(tmp_path):
    ds = Dataset()
    ds.SOPClassUID = uids.RTStructureSetStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "RTSTRUCT"
    item = Dataset()
    item.ROINumber = 1
    item.ROIName = "Liver"
    item2 = Dataset()
    item2.ROINumber = 2
    item2.ROIName = "Tumor"
    ds.StructureSetROISequence = Sequence([item, item2])

    inner = Dataset()
    inner.ContourGeometricType = "CLOSED_PLANAR"
    inner.ContourData = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.5, 8.5, 9.5]
    roi_item = Dataset()
    roi_item.ReferencedROINumber = 1
    roi_item.ROIDisplayColor = [255, 0, 0]
    roi_item.ContourSequence = Sequence([inner])
    ds.ROIContourSequence = Sequence([roi_item])

    path = tmp_path / "rs.dcm"
    dcmwrite(path, ds)
    out = dcmread(path)
    assert out.StructureSetROISequence[0].ROIName == "Liver"
    assert out.StructureSetROISequence[1].ROIName == "Tumor"
    cs = out.ROIContourSequence[0].ContourSequence[0]
    assert cs.ContourGeometricType == "CLOSED_PLANAR"
    assert cs.ContourData == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.5, 8.5, 9.5]
    assert out.ROIContourSequence[0].ROIDisplayColor == [255, 0, 0]


def test_rle_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 3000, size=(64, 64)).astype(np.int16)
    arr[10:20, :] = 42  # compressible run
    ds = make_ct_slice(arr.astype(np.uint16))
    ds.PixelRepresentation = 1
    ds.PixelData = [encode_rle_frame(arr)]
    path = tmp_path / "ct_rle.dcm"
    dcmwrite(path, ds, transfer_syntax=uids.RLELossless)
    # hand-frame the encapsulated pixel data for writing
    raw = dcmread(path, stop_before_pixels=True)
    assert raw.file_meta.TransferSyntaxUID == uids.RLELossless


def test_rle_decode(rng):
    from medicalimageanalysis_tpu.dicom.pixels import decode_rle
    arr = rng.integers(-1000, 3000, size=(64, 64)).astype(np.int16)
    arr[10:20, :] = 42
    ds = make_ct_slice(np.zeros((64, 64), np.uint16))
    ds.PixelRepresentation = 1
    ds.PixelData = [encode_rle_frame(arr)]
    out = decode_rle(ds)
    np.testing.assert_array_equal(out, arr)


def test_dataset_contains_and_get():
    ds = Dataset()
    ds.RescaleIntercept = -1024.0
    assert (0x0028, 0x1052) in ds
    assert "RescaleIntercept" in ds
    assert "RescaleSlope" not in ds
    assert ds.get("RescaleSlope", 1) == 1
    del ds.RescaleIntercept
    assert "RescaleIntercept" not in ds


def test_generate_uid_unique():
    seen = {generate_uid() for _ in range(100)}
    assert len(seen) == 100
    assert all(u.startswith("2.25.") and len(u) <= 64 for u in seen)


def test_deflated_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 3000, size=(24, 24)).astype(np.uint16)
    ds = make_ct_slice(arr)
    path = tmp_path / "ct_deflated.dcm"
    dcmwrite(path, ds, transfer_syntax=uids.DeflatedExplicitVRLittleEndian)
    out = dcmread(path)
    assert out.Modality == "CT"
    np.testing.assert_array_equal(out.pixel_array, arr)


def test_parser_robustness_fuzz(tmp_path, rng):
    """Truncated/corrupted files never raise through the tolerant
    ingest path (reference swallow-and-continue semantics)."""
    from medicalimageanalysis_tpu.read.dicom import thread_process_dicom
    arr = rng.integers(0, 1000, size=(16, 16)).astype(np.uint16)
    ds = make_ct_slice(arr)
    path = tmp_path / "ok.dcm"
    dcmwrite(path, ds)
    blob = path.read_bytes()

    for i, n in enumerate([0, 10, 131, 140, 200, len(blob) // 2,
                           len(blob) - 3]):
        p = tmp_path / f"trunc{i}.dcm"
        p.write_bytes(blob[:n])
        result = thread_process_dicom(str(p))
        assert result == [] or result  # no exception is the contract

    # random corruption
    for i in range(10):
        corrupt = bytearray(blob)
        for _ in range(20):
            corrupt[rng.integers(0, len(blob))] = rng.integers(0, 256)
        p = tmp_path / f"corrupt{i}.dcm"
        p.write_bytes(bytes(corrupt))
        thread_process_dicom(str(p))  # must not raise


def test_explicit_big_endian_parse():
    """Hand-built Explicit VR Big Endian dataset parses correctly."""
    import struct
    from medicalimageanalysis_tpu.dicom import uids

    def be_elem(group, elem, vr, raw):
        if len(raw) % 2:
            raw += b" "
        return struct.pack(">HH", group, elem) + vr \
            + struct.pack(">H", len(raw)) + raw

    # file meta is always explicit LITTLE endian
    def le_elem(group, elem, vr, raw):
        if len(raw) % 2:
            raw += b"\x00" if vr == b"UI" else b" "
        return struct.pack("<HH", group, elem) + vr \
            + struct.pack("<H", len(raw)) + raw

    ts = uids.ExplicitVRBigEndian.encode()
    meta_body = le_elem(2, 2, b"UI", uids.CTImageStorage.encode()) \
        + le_elem(2, 3, b"UI", b"1.2.3") \
        + le_elem(2, 0x10, b"UI", ts)
    meta = le_elem(2, 0, b"UL", struct.pack("<I", len(meta_body))) \
        + meta_body

    body = be_elem(0x0008, 0x0060, b"CS", b"CT") \
        + be_elem(0x0028, 0x0010, b"US", struct.pack(">H", 4)) \
        + be_elem(0x0028, 0x0011, b"US", struct.pack(">H", 4)) \
        + be_elem(0x0028, 0x0100, b"US", struct.pack(">H", 16)) \
        + be_elem(0x0028, 0x0103, b"US", struct.pack(">H", 0)) \
        + be_elem(0x0028, 0x0030, b"DS", b"1.5\\2.5")
    pixels = np.arange(16, dtype=">u2").tobytes()
    body += struct.pack(">HH", 0x7FE0, 0x0010) + b"OW\x00\x00" \
        + struct.pack(">I", len(pixels)) + pixels

    blob = b"\x00" * 128 + b"DICM" + meta + body
    ds = dcmread(blob)
    assert ds.Modality == "CT"
    assert ds.Rows == 4 and ds.Columns == 4
    assert ds.PixelSpacing == [1.5, 2.5]
    np.testing.assert_array_equal(
        ds.pixel_array, np.arange(16, dtype=np.uint16).reshape(4, 4))


def test_jpeg_lossless_8bit():
    from medicalimageanalysis_tpu.dicom.jpegls import encode_jpeg_lossless
    from medicalimageanalysis_tpu.native import (get_lib,
                                                 jpeg_lossless_decode)
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    img = np.random.default_rng(1).integers(0, 255, size=(20, 24)) \
        .astype(np.uint8)
    stream = encode_jpeg_lossless(img.astype(np.uint16), precision=8)
    out = jpeg_lossless_decode(stream)
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_lazy_element_deepcopy(tmp_path, rng):
    """Deep copies of lazily-parsed datasets materialize cleanly (the
    skipped-slice interpolation path deep-copies slice datasets)."""
    import copy
    arr = rng.integers(0, 100, size=(8, 8)).astype(np.uint16)
    ds = make_ct_slice(arr)
    dcmwrite(tmp_path / "c.dcm", ds)
    out = dcmread(tmp_path / "c.dcm")
    dup = copy.deepcopy(out)
    assert dup.Modality == "CT"
    assert dup.PixelSpacing == out.PixelSpacing
    np.testing.assert_array_equal(dup.pixel_array, arr)
    # mutating the copy leaves the original intact
    dup.RescaleIntercept = -500.0
    assert out.RescaleIntercept == -1024.0


def test_un_defined_length_kept_raw(tmp_path, rng):
    """Private/unknown elements (VR UN, defined length) survive both
    explicit and implicit round trips as raw bytes."""
    from medicalimageanalysis_tpu.dicom.dataset import DataElement
    arr = rng.integers(0, 100, size=(8, 8)).astype(np.uint16)
    ds = make_ct_slice(arr)
    priv = 0x00091001
    ds[priv] = DataElement(priv, "UN", b"\x01\x02\x03\x04\xff\x00")
    dcmwrite(tmp_path / "e.dcm", ds)
    out = dcmread(tmp_path / "e.dcm")
    assert out[priv].value == b"\x01\x02\x03\x04\xff\x00"
    # implicit LE: unknown tag resolves to UN via the dictionary fallback
    dcmwrite(tmp_path / "i.dcm", ds,
             transfer_syntax=uids.ImplicitVRLittleEndian)
    out2 = dcmread(tmp_path / "i.dcm")
    assert out2[priv].value == b"\x01\x02\x03\x04\xff\x00"
    np.testing.assert_array_equal(out2.pixel_array, arr)


def test_empty_and_multivalue_ds(tmp_path, rng):
    """Zero-length DS reads back as None (clinical files routinely ship
    empty numeric elements); multi-valued DS reads back as a list."""
    arr = rng.integers(0, 100, size=(8, 8)).astype(np.uint16)
    ds = make_ct_slice(arr)
    ds.RescaleIntercept = None      # -> zero-length element
    ds.WindowCenter = [40.0, 400.0]
    dcmwrite(tmp_path / "d.dcm", ds)
    out = dcmread(tmp_path / "d.dcm")
    assert out.RescaleIntercept is None
    assert out.WindowCenter == [40.0, 400.0]


def test_batch_read_mixed_cohort(tmp_path, rng):
    """DicomReader._read_batch over a mixed cohort: batch-flat explicit
    files, implicit VR, big-endian, deflated, sequences (RTSTRUCT-ish),
    and garbage — every parsed dataset must match the per-file dcmread
    result, and arena reuse across calls must not corrupt the first
    cohort's datasets."""
    from medicalimageanalysis_tpu.read.dicom import DicomReader

    paths = []
    arrs = []
    for i in range(3):  # explicit LE (batch-flat fast path)
        arr = rng.integers(0, 3000, size=(16, 16)).astype(np.uint16)
        ds = make_ct_slice(arr, z=float(i) * 3.0)
        p = tmp_path / f"e{i}.dcm"
        dcmwrite(p, ds)
        paths.append(p)
        arrs.append(arr)
    arr = rng.integers(0, 3000, size=(16, 16)).astype(np.uint16)
    ds = make_ct_slice(arr, z=9.0)
    p = tmp_path / "impl.dcm"
    dcmwrite(p, ds, transfer_syntax=uids.ImplicitVRLittleEndian)
    paths.append(p)
    arrs.append(arr)
    ds = make_ct_slice(arr, z=12.0)
    p = tmp_path / "defl.dcm"
    dcmwrite(p, ds, transfer_syntax=uids.DeflatedExplicitVRLittleEndian)
    paths.append(p)
    arrs.append(arr)
    # sequences: a minimal structure-set-flavored file
    sq = Dataset()
    sq.ROINumber = 1
    sq.ROIName = "Liver"
    st = Dataset()
    st.SOPClassUID = uids.RTStructureSetStorage
    st.SOPInstanceUID = generate_uid()
    st.Modality = "RTSTRUCT"
    st.StructureSetROISequence = Sequence([sq])
    p = tmp_path / "rs.dcm"
    dcmwrite(p, st)
    paths.append(p)
    arrs.append(None)
    # garbage
    p = tmp_path / "junk.bin"
    p.write_bytes(b"this is not dicom at all" * 10)
    paths.append(p)
    arrs.append(None)

    r = DicomReader.__new__(DicomReader)
    r.only_tags = False
    first = r._read_batch([str(q) for q in paths])
    assert first is not None

    # second batch call overwrites the scan arena; first cohort's
    # datasets must stay intact (they must have copied out)
    r2 = DicomReader.__new__(DicomReader)
    r2.only_tags = False
    other = tmp_path / "other.dcm"
    alt = make_ct_slice(rng.integers(0, 99, size=(8, 8)).astype(np.uint16))
    alt.PatientName = "Other^Patient"
    dcmwrite(other, alt)
    r2._read_batch([str(other)] * 4)

    for q, ds_b, arr in zip(paths, first, arrs):
        ref = dcmread(str(q)) if str(q).endswith(".dcm") else []
        if not ref:
            assert ds_b == []
            continue
        assert ds_b, q
        assert ds_b.Modality == ref.Modality
        for kw in ("PatientName", "SOPInstanceUID", "SeriesInstanceUID"):
            if kw in ref:
                assert getattr(ds_b, kw) == getattr(ref, kw), (q, kw)
        if "ImagePositionPatient" in ref:
            assert ds_b.ImagePositionPatient == ref.ImagePositionPatient
        if arr is not None:
            np.testing.assert_array_equal(ds_b.pixel_array, arr)
        if ref.file_meta is not None:
            assert ds_b.file_meta is not None
            assert ds_b.file_meta.TransferSyntaxUID \
                == ref.file_meta.TransferSyntaxUID
    # sequences survived the non-flat path
    rs = first[5]
    assert rs.StructureSetROISequence[0].ROIName == "Liver"
