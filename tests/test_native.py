"""Native C++ DICOM core tests: scanner parity, RLE, JPEG-Lossless."""

import numpy as np
import pytest

from medicalimageanalysis_tpu.dicom import (dcmread, dcmwrite,
                                            generate_uid, uids)
from medicalimageanalysis_tpu.dicom.jpegls import encode_jpeg_lossless
from medicalimageanalysis_tpu.dicom.writer import encode_rle_frame
from medicalimageanalysis_tpu.native import get_lib

from test_dicom_core import make_ct_slice

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


def test_native_scan_parity(tmp_path, rng):
    arr = rng.integers(0, 3000, size=(32, 32)).astype(np.uint16)
    ds = make_ct_slice(arr)
    dcmwrite(tmp_path / "a.dcm", ds)

    a = dcmread(tmp_path / "a.dcm", use_native=True)
    b = dcmread(tmp_path / "a.dcm", use_native=False)
    for kw in ("Modality", "PatientName", "PixelSpacing",
               "ImagePositionPatient", "RescaleIntercept", "Rows"):
        assert a.get(kw) == b.get(kw), kw
    np.testing.assert_array_equal(a.pixel_array, b.pixel_array)
    assert a.file_meta.TransferSyntaxUID == b.file_meta.TransferSyntaxUID


def test_native_scan_implicit_with_sequence(tmp_path):
    from medicalimageanalysis_tpu.dicom import Dataset, Sequence
    ds = Dataset()
    ds.SOPClassUID = uids.RTStructureSetStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "RTSTRUCT"
    item = Dataset()
    item.ROINumber = 7
    item.ROIName = "Lung"
    ds.StructureSetROISequence = Sequence([item])
    dcmwrite(tmp_path / "rs.dcm", ds,
             transfer_syntax=uids.ImplicitVRLittleEndian)
    out = dcmread(tmp_path / "rs.dcm", use_native=True)
    assert out.StructureSetROISequence[0].ROIName == "Lung"


def test_native_rle_decode(rng):
    from medicalimageanalysis_tpu.native import rle_decode_frame
    arr = rng.integers(-1000, 3000, size=(64, 64)).astype(np.int16)
    arr[20:30] = 77
    frag = encode_rle_frame(arr)
    out = rle_decode_frame(frag, 64, 64, 1, 2)
    assert out is not None
    decoded = np.frombuffer(out.tobytes(), dtype="<i2").reshape(64, 64)
    np.testing.assert_array_equal(decoded, arr)


def test_jpeg_lossless_roundtrip(rng):
    from medicalimageanalysis_tpu.native import jpeg_lossless_decode
    img = rng.integers(0, 4000, size=(48, 56)).astype(np.uint16)
    stream = encode_jpeg_lossless(img, precision=16)
    out = jpeg_lossless_decode(stream)
    assert out is not None
    np.testing.assert_array_equal(out, img.astype(np.int32))


def test_jpeg_lossless_dicom_end_to_end(tmp_path, rng):
    arr = rng.integers(0, 3000, size=(32, 32)).astype(np.uint16)
    ds = make_ct_slice(np.zeros((32, 32), np.uint16))
    ds.Rows, ds.Columns = 32, 32
    ds.PixelData = [encode_jpeg_lossless(arr, precision=16)]
    dcmwrite(tmp_path / "jls.dcm", ds,
             transfer_syntax=uids.JPEGLosslessSV1)
    out = dcmread(tmp_path / "jls.dcm")
    np.testing.assert_array_equal(out.pixel_array, arr)
