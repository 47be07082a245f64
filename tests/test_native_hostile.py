"""Hostile-input regression tests for the native DICOM core.

The native scanner/decoders are reached automatically from read_dicoms
on untrusted files, so every crafted-input finding from the round-1
security review (ADVICE.md) is pinned here: the calls must return an
error (None at the Python boundary), never crash the process.
"""

import struct

import numpy as np
import pytest

import medicalimageanalysis_tpu.native as native


def _lib_or_skip():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _sof3(precision=12, h=2, w=2, ncomp=1):
    p = bytes([precision]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        p += bytes([i + 1, 0x11, 0])
    return _seg(0xC3, p)


def _dht(th=0, counts=None, values=None):
    counts = counts if counts is not None else [0] * 16
    values = values if values is not None else []
    return _seg(0xC4, bytes([th]) + bytes(counts) + bytes(values))


def _sos(ns=1, comps=None, ss=1, al=0):
    comps = comps if comps is not None else [(1, 0)]
    p = bytes([ns])
    for cid, tbl in comps:
        p += bytes([cid, tbl << 4])
    p += bytes([ss, 0, al])
    return _seg(0xDA, p)


def test_jpeg_sos_component_overflow():
    """SOS with ns=255 wrote scan_comp[255] into an int[4] (stack
    overflow, ADVICE round 1 high). Must now reject cleanly."""
    _lib_or_skip()
    # craft ns=255 with 255 component entries so lengths are coherent
    comps = [(1, 0)] * 255
    buf = (b"\xff\xd8" + _sof3()
           + _dht(counts=[1] + [0] * 15, values=[0])
           + _sos(ns=255, comps=comps) + b"\x00" * 64)
    assert native.jpeg_lossless_decode(buf) is None


def test_jpeg_sos_table_index_oob():
    """SOS table id up to 15 indexed tables[4] out of bounds."""
    _lib_or_skip()
    buf = (b"\xff\xd8" + _sof3()
           + _dht(counts=[1] + [0] * 15, values=[0])
           + _sos(comps=[(1, 15)]) + b"\x00" * 64)
    assert native.jpeg_lossless_decode(buf) is None


def test_jpeg_bad_precision():
    """precision outside [2,16] made 1<<(precision-pt-1) UB."""
    _lib_or_skip()
    for prec in (0, 1, 17, 255):
        buf = (b"\xff\xd8" + _sof3(precision=prec)
               + _dht(counts=[1] + [0] * 15, values=[0])
               + _sos() + b"\x00" * 64)
        assert native.jpeg_lossless_decode(buf) is None


def test_jpeg_truncated_dht():
    """DHT whose counts promise more values than the segment holds."""
    _lib_or_skip()
    bad_dht = _seg(0xC4, bytes([0]) + bytes([255] * 16))  # no values
    buf = b"\xff\xd8" + _sof3() + bad_dht + _sos() + b"\x00" * 64
    assert native.jpeg_lossless_decode(buf) is None


def test_jpeg_hostile_huffman_value_index():
    """A contradictory DHT can drive valptr[l]+code-mincode[l] past
    vals[256]; the decode loop must bail, not read wild memory."""
    _lib_or_skip()
    # counts claim 255 codes of length 16 -> huge valptr offsets
    counts = [0] * 15 + [255]
    buf = (b"\xff\xd8" + _sof3()
           + _dht(counts=counts, values=list(range(255)))
           + _sos() + b"\xff" * 512)
    native.jpeg_lossless_decode(buf)  # any non-crash outcome is a pass


def test_scan_meta_group_length_past_eof():
    """File-meta group length exceeding the buffer clamped to len."""
    _lib_or_skip()
    head = b"\x00" * 128 + b"DICM"
    # (0002,0000) UL 4 = huge group length
    meta = (struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
            + struct.pack("<I", 0xFFFFFF00))
    # one truncated element after it
    meta += struct.pack("<HH", 2, 0x10) + b"UI" + struct.pack("<H", 600)
    buf = head + meta + b"1.2" * 4
    assert native.scan(buf) is None  # clean parse error, no crash


def test_scan_ts_string_at_eof():
    """TransferSyntax value length running past the buffer."""
    _lib_or_skip()
    head = b"\x00" * 128 + b"DICM"
    ts = b"1.2.840.10008.1.2.1"
    el = (struct.pack("<HH", 2, 0x10) + b"UI"
          + struct.pack("<H", len(ts) + 40) + ts)  # lies about length
    gl = (struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
          + struct.pack("<I", len(el)))
    native.scan(head + gl + el)  # must not read past EOF


def test_scan_random_fuzz():
    """Seeded random buffers through every native entry point."""
    _lib_or_skip()
    rng = np.random.default_rng(1234)
    dicm = b"\x00" * 128 + b"DICM"
    for i in range(200):
        n = int(rng.integers(0, 600))
        blob = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        native.scan(blob)
        native.scan(dicm + blob)
        native.rle_decode_frame(blob, 16, 16, 1, 2)
        native.jpeg_lossless_decode(b"\xff\xd8" + blob)


def test_packbits_truncated_streams():
    """Pure-Python RLE fallback: truncated literal and replicate runs
    must produce short output, not raise (ADVICE round 1 low)."""
    from medicalimageanalysis_tpu.dicom.pixels import _packbits_decode

    # literal header claiming 5 bytes with only 2 present
    out = _packbits_decode(bytes([4, 1, 2]), 64)
    assert list(out) == [1, 2]
    # replicate header ending the stream
    out = _packbits_decode(bytes([0x81]), 64)
    assert len(out) == 0
    # replicate run overflowing `expected`
    out = _packbits_decode(bytes([0x81, 7]), 2)
    assert list(out) == [7, 7]
    # no-op header then EOF
    out = _packbits_decode(bytes([128]), 8)
    assert len(out) == 0


def test_full_ingest_byte_flip_fuzz(tmp_path):
    """Byte-flip fuzz through the FULL Python ingest path: a valid CT
    slice with random corruptions must never escape the tolerant
    read_dicoms flow as an uncaught exception (reference behavior:
    unparseable files are skipped)."""
    import os

    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.data import Data
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    rng = np.random.default_rng(77)
    d = tmp_path / "ct"
    arr = rng.integers(-500, 2000, size=(4, 32, 32)).astype(np.int16)
    CreateDicomImage(str(d), arr, spacing=[1.0, 1.0], thickness=2.0).run()
    src = sorted(os.listdir(d))[0]
    good = open(os.path.join(d, src), "rb").read()

    mut_path = tmp_path / "mut.dcm"
    for trial in range(100):
        blob = bytearray(good)
        for _ in range(int(rng.integers(1, 16))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        mut_path.write_bytes(bytes(blob))
        Data.clear()
        # must not raise — corrupt files are skipped or load partially
        mia.read_dicoms(file_list=[str(mut_path)])
    Data.clear()


def test_jpeg_extended_ingest_byte_flip_fuzz(tmp_path):
    """Byte-flip fuzz of a 12-bit JPEG-Extended (.51) slice through
    the FULL read_dicoms flow: the new native sequential-DCT decode
    path must honor the same tolerant-ingest contract (corrupt files
    skipped, never an uncaught exception)."""
    import os

    import medicalimageanalysis_tpu as mia
    from medicalimageanalysis_tpu.data import Data
    from medicalimageanalysis_tpu.dicom import dcmwrite, uids
    from medicalimageanalysis_tpu.dicom.jpegdct import encode_jpeg_dct
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage

    rng = np.random.default_rng(78)
    d = tmp_path / "ct"
    arr = rng.integers(0, 3000, size=(4, 32, 32)).astype(np.int16)
    CreateDicomImage(str(d), arr, spacing=[1.0, 1.0], thickness=2.0).run()
    # rewrite slice 0 as encapsulated JPEG-Extended
    from medicalimageanalysis_tpu.dicom import dcmread
    src = sorted(os.listdir(d))[0]
    ds = dcmread(os.path.join(d, src))
    px = np.asarray(ds.pixel_array).clip(0, 4095).astype(np.uint16)
    ds.BitsAllocated = 16
    ds.BitsStored = 12
    ds.HighBit = 11
    ds.PixelData = [encode_jpeg_dct(px, precision=12, quant=1)]
    jext = tmp_path / "jext.dcm"
    dcmwrite(jext, ds, transfer_syntax=uids.JPEGExtended12Bit)
    good = jext.read_bytes()

    # sanity: the clean file ingests with pixels intact
    Data.clear()
    mia.read_dicoms(file_list=[str(jext)])
    assert len(Data.image_list) == 1

    mut_path = tmp_path / "mut.dcm"
    for trial in range(150):
        blob = bytearray(good)
        for _ in range(int(rng.integers(1, 16))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        mut_path.write_bytes(bytes(blob))
        Data.clear()
        mia.read_dicoms(file_list=[str(mut_path)])  # must not raise
    Data.clear()
