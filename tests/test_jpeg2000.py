"""JPEG 2000 Part-1 codec tests (dicom/jpeg2k.py + jpeg2k_enc.py).

Validation strategy mirrors the JPEG-LS program: the decoder is
checked against OpenJPEG-encoded streams (cv2.imencode -> lossless
reversible codestreams), the encoder is checked by decoding its
output with OpenJPEG (cv2.imdecode) — two independent external
cross-checks — plus exhaustive own round trips over the feature
matrix cv2 cannot produce (signed, 12-bit, tile grids, precincts,
SOP/EPH, all five progression orders, layers, the six code-block
style bits, 9/7).
"""

import struct as _struct

import numpy as np
import pytest

from medicalimageanalysis_tpu.dicom.jpeg2k import (
    CB_LAZY, CB_RESET, CB_SEGSYM, CB_TERMALL, CB_VSC, decode_j2k,
)
from medicalimageanalysis_tpu.dicom.jpeg2k_enc import encode_j2k

cv2 = pytest.importorskip("cv2")

LOSSLESS = [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000]


def _cv2_jp2(img, params=LOSSLESS):
    ok, buf = cv2.imencode(".jp2", img, params)
    assert ok
    return buf.tobytes()


def _cv2_dec(cs):
    return cv2.imdecode(np.frombuffer(cs, np.uint8), cv2.IMREAD_UNCHANGED)


# ---------------------------------------------------------------------------
# decoder vs OpenJPEG-encoded streams
# ---------------------------------------------------------------------------

def test_decode_openjpeg_u8_random():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 41)).astype(np.uint8)
    assert np.array_equal(decode_j2k(_cv2_jp2(img)), img)


def test_decode_openjpeg_u16_random():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 65536, (70, 90)).astype(np.uint16)
    assert np.array_equal(decode_j2k(_cv2_jp2(img)), img)


def test_decode_openjpeg_u16_smooth_multires():
    yy, xx = np.mgrid[0:128, 0:160]
    img = ((np.sin(yy / 9.0) * np.cos(xx / 13.0) + 1) * 2000
           + 100).astype(np.uint16)
    assert np.array_equal(decode_j2k(_cv2_jp2(img)), img)


def test_decode_openjpeg_rgb_codestream_order():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (45, 53, 3)).astype(np.uint8)
    dec = decode_j2k(_cv2_jp2(img))
    # we return codestream component order (R, G, B); cv2 feeds BGR
    assert np.array_equal(dec[..., ::-1], img)


def test_decode_openjpeg_truncated_rate_controlled():
    # rate-controlled OpenJPEG streams truncate coding passes; the
    # in-interval reconstruction choice is encoder freedom (T.800
    # E.1), so require closeness to OpenJPEG's decode, not equality
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    cs = _cv2_jp2(img, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 50])
    ours = decode_j2k(cs).astype(int)
    ref = _cv2_dec(cs).astype(int)
    assert np.abs(ours - ref).mean() < 8.0


# ---------------------------------------------------------------------------
# own encoder round trips + OpenJPEG cross-decode
# ---------------------------------------------------------------------------

def _roundtrip(img, cv2check=True, tol=0, **kw):
    cs = encode_j2k(img, **kw)
    dec = decode_j2k(cs)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
    assert err <= tol, f"round-trip max err {err} > {tol}"
    if cv2check:
        ref = _cv2_dec(cs)
        assert ref is not None, "OpenJPEG could not decode our stream"
        if ref.ndim == 3:
            ref = ref[..., ::-1]
        cerr = np.abs(ref.astype(np.int64) - dec.astype(np.int64)).max()
        assert cerr <= max(tol, 1), f"OpenJPEG disagrees by {cerr}"
    return cs


def test_roundtrip_u8():
    rng = np.random.RandomState(4)
    _roundtrip(rng.randint(0, 256, (50, 61)).astype(np.uint8), levels=3)


def test_roundtrip_u12():
    rng = np.random.RandomState(5)
    _roundtrip(rng.randint(0, 4096, (47, 52)).astype(np.uint16),
               levels=4)


def test_roundtrip_s16_signed():
    # the case cv2/OpenJPEG-via-imencode cannot represent at all
    rng = np.random.RandomState(6)
    img = rng.randint(-1024, 3072, (45, 63)).astype(np.int16)
    _roundtrip(img, cv2check=False, levels=5)


def test_roundtrip_rgb_rct():
    rng = np.random.RandomState(7)
    _roundtrip(rng.randint(0, 256, (33, 39, 3)).astype(np.uint8),
               levels=2)


def test_roundtrip_multitile():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 4096, (50, 61)).astype(np.uint16)
    _roundtrip(img, levels=2, tile_size=(25, 20))


def test_roundtrip_precincts_sop_eph():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 4096, (47, 52)).astype(np.uint16)
    _roundtrip(img, levels=3, sop=True, eph=True,
               precincts=[(4, 4), (5, 5), (6, 6), (7, 7)])


@pytest.mark.parametrize("prog", ["RLCP", "RPCL", "PCRL", "CPRL"])
def test_roundtrip_progressions(prog):
    rng = np.random.RandomState(10)
    img = rng.randint(0, 4096, (47, 52)).astype(np.uint16)
    _roundtrip(img, levels=3, prog=prog,
               precincts=[(4, 4), (5, 5), (6, 6), (7, 7)])


def test_roundtrip_layers():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 4096, (47, 52)).astype(np.uint16)
    _roundtrip(img, levels=3, layers=4)


@pytest.mark.parametrize("style", [
    CB_LAZY, CB_RESET, CB_TERMALL, CB_VSC, CB_SEGSYM,
    CB_LAZY | CB_TERMALL,
    CB_LAZY | CB_RESET | CB_TERMALL | CB_VSC | CB_SEGSYM,
])
def test_roundtrip_cbstyles(style):
    rng = np.random.RandomState(12)
    img = rng.randint(0, 4096, (47, 52)).astype(np.uint16)
    _roundtrip(img, levels=3, cbstyle=style)


def test_roundtrip_97_gray():
    yy, xx = np.mgrid[0:64, 0:80]
    img = ((np.sin(yy / 7.0) * np.cos(xx / 9.0) + 1.2)
           * 1500).astype(np.uint16)
    _roundtrip(img, tol=4, levels=4, irreversible=True)


def test_roundtrip_97_signed():
    yy, xx = np.mgrid[0:64, 0:80]
    img = (((np.sin(yy / 7.0) * np.cos(xx / 9.0) + 1.2) * 1500)
           .astype(np.int32) - 2000).astype(np.int16)
    _roundtrip(img, cv2check=False, tol=4, levels=3, irreversible=True)


def test_roundtrip_97_ict_rgb():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (33, 39, 3)).astype(np.uint8)
    _roundtrip(img, tol=6, levels=2, irreversible=True)


def test_roundtrip_97_derived_quant():
    yy, xx = np.mgrid[0:64, 0:80]
    img = ((np.sin(yy / 7.0) * np.cos(xx / 9.0) + 1.2)
           * 1500).astype(np.uint16)
    _roundtrip(img, tol=32, levels=4, irreversible=True,
               quant="derived")


def test_roundtrip_tiny_and_odd_shapes():
    rng = np.random.RandomState(14)
    for shape in [(1, 1), (1, 7), (5, 1), (3, 3), (4, 66), (65, 2)]:
        img = rng.randint(0, 4096, shape).astype(np.uint16)
        _roundtrip(img, cv2check=False, levels=3)


# ---------------------------------------------------------------------------
# DICOM integration (.4.90 write -> read)
# ---------------------------------------------------------------------------

def test_dicom_j2k_write_read_signed(tmp_path):
    from medicalimageanalysis_tpu.dicom import uids
    from medicalimageanalysis_tpu.dicom.dataset import Dataset
    from medicalimageanalysis_tpu.dicom.parser import dcmread
    from medicalimageanalysis_tpu.dicom.pixels import decode_pixel_data
    from medicalimageanalysis_tpu.dicom.writer import dcmwrite

    rng = np.random.RandomState(15)
    arr = rng.randint(-1024, 3072, (40, 50)).astype(np.int16)
    ds = Dataset()
    ds.add(0x00280010, "US", 40)
    ds.add(0x00280011, "US", 50)
    ds.add(0x00280100, "US", 16)
    ds.add(0x00280101, "US", 16)
    ds.add(0x00280102, "US", 15)
    ds.add(0x00280103, "US", 1)
    ds.add(0x00280002, "US", 1)
    ds.add(0x7FE00010, "OW", arr.tobytes())
    f = str(tmp_path / "t.dcm")
    dcmwrite(f, ds, transfer_syntax=uids.JPEG2000Lossless)
    ds2 = dcmread(f)
    assert ds2.file_meta.get("TransferSyntaxUID") == uids.JPEG2000Lossless
    out = decode_pixel_data(ds2)
    assert out.dtype == np.int16
    assert np.array_equal(out, arr)


def test_dicom_j2k_multiframe(tmp_path):
    from medicalimageanalysis_tpu.dicom import uids
    from medicalimageanalysis_tpu.dicom.dataset import Dataset
    from medicalimageanalysis_tpu.dicom.parser import dcmread
    from medicalimageanalysis_tpu.dicom.pixels import decode_pixel_data
    from medicalimageanalysis_tpu.dicom.writer import dcmwrite

    rng = np.random.RandomState(16)
    arr = rng.randint(0, 4096, (3, 30, 40)).astype(np.uint16)
    ds = Dataset()
    ds.add(0x00280010, "US", 30)
    ds.add(0x00280011, "US", 40)
    ds.add(0x00280008, "IS", "3")
    ds.add(0x00280100, "US", 16)
    ds.add(0x00280101, "US", 12)
    ds.add(0x00280102, "US", 11)
    ds.add(0x00280103, "US", 0)
    ds.add(0x00280002, "US", 1)
    ds.add(0x7FE00010, "OW", arr.tobytes())
    f = str(tmp_path / "mf.dcm")
    dcmwrite(f, ds, transfer_syntax=uids.JPEG2000Lossless)
    out = decode_pixel_data(dcmread(f))
    assert out.shape == (3, 30, 40)
    assert np.array_equal(out, arr)


# ---------------------------------------------------------------------------
# hostile inputs: typed errors, no crashes
# ---------------------------------------------------------------------------

def test_unsupported_features_raise_typed():
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    cs = bytearray(encode_j2k(img, levels=1))
    # splice a POC marker into the main header (before SOT)
    sot = bytes(cs).find(b"\xFF\x90")
    poc = b"\xFF\x5F" + b"\x00\x09" + b"\x00" * 7
    hostile = bytes(cs[:sot]) + poc + bytes(cs[sot:])
    with pytest.raises(ValueError):
        decode_j2k(hostile)


def test_byte_flip_fuzz_no_crashes():
    rng = np.random.RandomState(18)
    img = rng.randint(0, 4096, (24, 28)).astype(np.uint16)
    cs = bytearray(encode_j2k(img, levels=2))
    crashes = 0
    for t in range(120):
        buf = bytearray(cs)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            out = decode_j2k(bytes(buf))
            assert out.shape[0] <= 1 << 16 and out.shape[1] <= 1 << 16
        except (ValueError, _struct.error):
            pass
        except Exception as e:                      # noqa: BLE001
            crashes += 1
    assert crashes == 0


def test_truncation_fuzz_no_crashes():
    rng = np.random.RandomState(19)
    img = rng.randint(0, 4096, (24, 28)).astype(np.uint16)
    cs = encode_j2k(img, levels=2)
    for n in range(0, len(cs), max(len(cs) // 60, 1)):
        try:
            decode_j2k(cs[:n])
        except ValueError:
            pass



# ---------------------------------------------------------------------------
# native decoder parity (mia_j2k_decode vs the Python golden)
# ---------------------------------------------------------------------------

def _native():
    from medicalimageanalysis_tpu.native import get_lib, j2k_decode
    if get_lib() is None:
        pytest.skip("native library unavailable")
    return j2k_decode


@pytest.mark.parametrize("cfg", [
    dict(levels=4),
    dict(levels=2, tile_size=(20, 25)),
    dict(levels=3, sop=True, eph=True,
         precincts=[(4, 4), (5, 5), (6, 6), (7, 7)]),
    dict(levels=3, prog="RPCL",
         precincts=[(4, 4), (5, 5), (6, 6), (7, 7)]),
    dict(levels=3, layers=4),
    dict(levels=3, cbstyle=CB_LAZY | CB_RESET | CB_TERMALL
                           | CB_VSC | CB_SEGSYM),
    dict(levels=4, irreversible=True),
])
def test_native_parity_configs(cfg):
    j2k_decode = _native()
    rng = np.random.RandomState(20)
    img = rng.randint(-1024, 3072, (47, 52)).astype(np.int16)
    cs = encode_j2k(img, **cfg)
    py = decode_j2k(cs)
    nat = j2k_decode(cs)
    assert nat is not None
    assert np.array_equal(np.asarray(py, np.int64),
                          np.asarray(nat, np.int64))


def test_native_parity_rgb_and_openjpeg_stream():
    j2k_decode = _native()
    rng = np.random.RandomState(21)
    rgb = rng.randint(0, 256, (33, 39, 3)).astype(np.uint8)
    cs = encode_j2k(rgb, levels=2)
    assert np.array_equal(np.asarray(j2k_decode(cs), np.int64),
                          np.asarray(decode_j2k(cs), np.int64))
    big = rng.randint(0, 65536, (64, 80)).astype(np.uint16)
    jp2 = _cv2_jp2(big)
    nat = j2k_decode(jp2)
    assert nat is not None and np.array_equal(nat, big)


def test_native_hostile_no_crash():
    j2k_decode = _native()
    rng = np.random.RandomState(22)
    img = rng.randint(0, 4096, (24, 28)).astype(np.uint16)
    cs = bytearray(encode_j2k(img, levels=2))
    for t in range(150):
        buf = bytearray(cs)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        j2k_decode(bytes(buf))        # None or an array; never a crash
    for n in range(0, len(cs), max(len(cs) // 40, 1)):
        j2k_decode(bytes(cs[:n]))


# ---------------------------------------------------------------------------
# review-finding regressions (round 3)
# ---------------------------------------------------------------------------

def _marker_offsets(cs, marker):
    # FF 90 (SOT) is in the forbidden bitstream range (>0x8F), so a
    # naive scan finds only genuine marker positions
    out, i = [], 0
    while True:
        i = cs.find(marker, i)
        if i < 0:
            return out
        out.append(i)
        i += 1


def _with_mixed_transform_coc(cs):
    """Insert a COC for component 1 whose wavelet transform differs
    from the COD's — T.800 forbids this under MCT."""
    cod = cs.find(b"\xFF\x52")
    assert cod > 0
    lcod = _struct.unpack(">H", cs[cod + 2:cod + 4])[0]
    spcod = cs[cod + 9:cod + 2 + lcod]           # after Scod+SGcod
    sp = bytearray(spcod[:5])
    sp[4] ^= 1                                   # flip 5/3 <-> 9/7
    coc = b"\xFF\x53" + _struct.pack(">H", 9) + bytes([1, 0]) + bytes(sp)
    end = cod + 2 + lcod
    return cs[:end] + coc + cs[end:]


def test_mct_mixed_transform_rejected():
    # crafted stream previously drove an OOB read/write in the native
    # decoder (empty plane storage indexed by the RCT loop)
    rng = np.random.RandomState(30)
    rgb = rng.randint(0, 256, (21, 26, 3)).astype(np.uint8)
    crafted = _with_mixed_transform_coc(encode_j2k(rgb, levels=2))
    with pytest.raises(ValueError, match="mixed|malformed"):
        decode_j2k(crafted)


def test_mct_mixed_transform_native_rejected():
    j2k_decode = _native()
    rng = np.random.RandomState(30)
    rgb = rng.randint(0, 256, (21, 26, 3)).astype(np.uint8)
    crafted = _with_mixed_transform_coc(encode_j2k(rgb, levels=2))
    assert j2k_decode(crafted) is None


def test_headers_only_stream_rejected():
    rng = np.random.RandomState(31)
    img = rng.randint(0, 4096, (20, 24)).astype(np.uint16)
    cs = encode_j2k(img, levels=2)
    headers_only = cs[:cs.find(b"\xFF\x90")] + b"\xFF\xD9"
    with pytest.raises(ValueError, match="tile|truncated"):
        decode_j2k(headers_only)


def test_headers_only_stream_native_rejected():
    # previously returned rc=0 with the np.empty output untouched ->
    # uninitialized heap bytes surfaced as pixels
    j2k_decode = _native()
    rng = np.random.RandomState(31)
    img = rng.randint(0, 4096, (20, 24)).astype(np.uint16)
    cs = encode_j2k(img, levels=2)
    headers_only = cs[:cs.find(b"\xFF\x90")] + b"\xFF\xD9"
    assert j2k_decode(headers_only) is None


def test_missing_tile_zero_filled_parity():
    # a stream truncated at a tile boundary decodes: missing tiles are
    # zero regions, identically in both decoders (native previously
    # left whatever was in the heap there)
    j2k_decode = _native()
    rng = np.random.RandomState(32)
    img = rng.randint(1, 4096, (50, 61)).astype(np.uint16)
    cs = encode_j2k(img, levels=2, tile_size=(25, 20))
    sots = _marker_offsets(cs, b"\xFF\x90")
    assert len(sots) >= 2
    crafted = cs[:sots[-1]] + b"\xFF\xD9"
    py = np.asarray(decode_j2k(crafted), np.int64)
    nat = j2k_decode(crafted)
    assert nat is not None
    assert np.array_equal(py, np.asarray(nat, np.int64))
    assert py.max() > 0               # decoded tiles are present
    assert (py == 0).any()            # the dropped tile is zeroed


def test_native_python_parity_rate_controlled():
    # truncated coding passes exercise the half-LSB midpoint paths,
    # including run-length-primitive significance (lastp fix): the two
    # decoders must agree exactly on every stream
    j2k_decode = _native()
    rng = np.random.RandomState(33)
    img = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    smooth = ((np.sin(np.arange(64) / 5.0)[:, None]
               * np.cos(np.arange(64) / 7.0)[None, :] + 1)
              * 120).astype(np.uint8)
    for src in (img, smooth):
        for rate in (30, 60, 120):
            cs = _cv2_jp2(src, [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000,
                                rate])
            py = decode_j2k(cs)
            nat = j2k_decode(cs)
            assert nat is not None
            assert np.array_equal(np.asarray(py, np.int64),
                                  np.asarray(nat, np.int64))


def test_jp2_fragment_grouping_bot_and_continuation():
    from medicalimageanalysis_tpu.dicom.pixels import \
        _group_jpeg_fragments

    jp2_sig = b"\x00\x00\x00\x0C\x6A\x50\x20\x20"
    frame = jp2_sig + b"\x0D\x0A\x87\x0A" + b"rest-of-frame-bytes"
    # non-empty Basic Offset Table: first entry is offset 0, so a
    # 2-byte 00 00 start prefix also matched the BOT (review finding)
    bot = b"\x00\x00\x00\x00\x40\x00\x00\x00"
    assert _group_jpeg_fragments([bot, frame], 1,
                                 start=jp2_sig) == [frame]
    # a continuation fragment that happens to begin 00 00 must merge
    a, b = frame[:10], b"\x00\x00" + frame[10:]
    assert _group_jpeg_fragments([a, b], 1, start=jp2_sig) == [a + b]


def test_cv2_exact_fastpath_gating():
    from medicalimageanalysis_tpu.dicom.jpeg2k import parse_siz
    from medicalimageanalysis_tpu.dicom.pixels import \
        _decode_j2k_cv2_exact

    rng = np.random.RandomState(34)
    u16 = rng.randint(0, 65536, (40, 44)).astype(np.uint16)
    got = _decode_j2k_cv2_exact(_cv2_jp2(u16), parse_siz)
    assert got is not None and np.array_equal(got, u16)
    # signed components are NOT cv2-exact (OpenJPEG refuses) -> None
    s16 = encode_j2k(rng.randint(-100, 100, (20, 22)).astype(np.int16),
                     levels=2)
    assert _decode_j2k_cv2_exact(s16, parse_siz) is None
    # unsigned 12-bit IS exact in this build (measured: no upshift)
    img12 = rng.randint(0, 4096, (20, 22)).astype(np.uint16)
    u12 = encode_j2k(img12, levels=2, precision=12)
    got12 = _decode_j2k_cv2_exact(u12, parse_siz)
    assert got12 is not None and np.array_equal(got12, img12)


def test_writer_signed_full_range_precision(tmp_path):
    # -2048 is a legal 12-bit two's-complement value; abs().max()+1
    # previously bumped Ssiz to 16 (review finding)
    from medicalimageanalysis_tpu.dicom import uids
    from medicalimageanalysis_tpu.dicom.dataset import Dataset
    from medicalimageanalysis_tpu.dicom.jpeg2k import parse_siz
    from medicalimageanalysis_tpu.dicom.parser import dcmread
    from medicalimageanalysis_tpu.dicom.pixels import decode_pixel_data
    from medicalimageanalysis_tpu.dicom.writer import dcmwrite

    arr = np.full((16, 16), -2048, np.int16)
    arr[0, 0] = 2047
    ds = Dataset()
    ds.add(0x00280010, "US", 16)
    ds.add(0x00280011, "US", 16)
    ds.add(0x00280100, "US", 16)
    ds.add(0x00280101, "US", 12)
    ds.add(0x00280102, "US", 11)
    ds.add(0x00280103, "US", 1)
    ds.add(0x00280002, "US", 1)
    ds.add(0x7FE00010, "OW", arr.tobytes())
    f = str(tmp_path / "minmax.dcm")
    dcmwrite(f, ds, transfer_syntax=uids.JPEG2000Lossless)
    ds2 = dcmread(f)
    pd = ds2.PixelData
    frag = next(bytes(f) for f in pd if len(f)) \
        if isinstance(pd, list) else bytes(pd)
    _, _, _, comps = parse_siz(frag)
    assert comps[0] == (12, True)
    assert np.array_equal(decode_pixel_data(ds2), arr)


# ---------------------------------------------------------------------------
# HTJ2K (.4.201-.203) capability boundary
# ---------------------------------------------------------------------------

def _ht_signal(cs):
    """Set Rsiz bit 14 (CAP-marker capabilities = HTJ2K/Part 2) in a
    raw codestream: SOC(2) SIZ-marker(2) Lsiz(2) then Rsiz."""
    b = bytearray(cs)
    assert b[:4] == b"\xFF\x4F\xFF\x51"
    b[6] |= 0x40
    return bytes(b)


def test_ht_capability_stream_rejected_by_part1_codec():
    # decoding an HT codestream with the Part-1 block coder would
    # emit garbage; both decoders must refuse instead
    rng = np.random.RandomState(50)
    img = rng.randint(0, 4096, (20, 24)).astype(np.uint16)
    crafted = _ht_signal(encode_j2k(img, levels=2, precision=12))
    with pytest.raises(ValueError, match="HTJ2K"):
        decode_j2k(crafted)


def test_ht_capability_stream_native_rejected():
    j2k_decode = _native()
    rng = np.random.RandomState(50)
    img = rng.randint(0, 4096, (20, 24)).astype(np.uint16)
    crafted = _ht_signal(encode_j2k(img, levels=2, precision=12))
    assert j2k_decode(crafted) is None


def test_htj2k_signed_decodes_via_dc_shift_transcode(tmp_path):
    """Signed HTJ2K (VERDICT r3 #9): component signedness selects ONLY
    the DC level shift (ISO 15444-1 G.1.2) — the entropy-coded data is
    identical — so the decoder rewrites Ssiz to unsigned, lets
    OpenJPEG decode (it handles HT block coding but refuses signed
    outright), and subtracts 2^(P-1). End-to-end: a signed series
    under the .4.201 transfer syntax decodes exactly."""
    from medicalimageanalysis_tpu.dicom import uids
    from medicalimageanalysis_tpu.dicom.dataset import Dataset
    from medicalimageanalysis_tpu.dicom.pixels import decode_pixel_data

    rng = np.random.RandomState(51)
    signed = rng.randint(-1024, 1024, (16, 18)).astype(np.int16)
    frag = _ht_signal(encode_j2k(signed, levels=2, precision=12,
                                 signed=True))
    ds = Dataset()
    ds.Rows, ds.Columns = 16, 18
    ds.BitsAllocated = 16
    ds.BitsStored = 12
    ds.HighBit = 11
    ds.PixelRepresentation = 1
    ds.SamplesPerPixel = 1
    ds.PixelData = [frag]
    ds.file_meta = {"TransferSyntaxUID": uids.HTJ2KLossless}
    out = decode_pixel_data(ds)
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, signed)


def test_signed_dc_shift_transcode_equivalence_fuzz():
    """The shift-equivalence leg of the signed route, pinned against
    the own Part-1 signed decoder across precisions/shapes/levels
    (lossless) and against value bounds for a lossy stream."""
    from medicalimageanalysis_tpu.dicom import pixels
    from medicalimageanalysis_tpu.dicom.jpeg2k import parse_siz

    rng = np.random.RandomState(60)
    for prec, shape, levels in ((9, (20, 26), 1), (12, (32, 28), 2),
                                (16, (24, 24), 3)):
        lo = -(1 << (prec - 1))
        hi = (1 << (prec - 1)) - 1
        src = rng.randint(lo, hi + 1, shape).astype(np.int32)
        frag = encode_j2k(src, levels=levels, precision=prec,
                          signed=True)
        own = decode_j2k(frag)
        tc = pixels._decode_j2k_cv2_signed(frag, parse_siz)
        np.testing.assert_array_equal(own, src)
        assert tc is not None, f"transcode refused prec {prec}"
        np.testing.assert_array_equal(tc, src)

    # JP2-wrapped signed input stays on the typed-error boundary
    assert pixels._siz_to_unsigned(
        b"\x00\x00\x00\x0C\x6A\x50\x20\x20" + b"\x00" * 64) is None


def test_part2_capability_stream_rejected():
    # Rsiz bit 15 = Part-2 (T.801) extensions: ATK/DFS/... marker
    # segments sit in the silently-skipped 0xFF30-0xFFFF range, so a
    # Part-1 decode would emit wrong pixels with no error — both
    # decoders must refuse (review finding: bit 14 alone left this open)
    rng = np.random.RandomState(52)
    img = rng.randint(0, 4096, (20, 24)).astype(np.uint16)
    cs = encode_j2k(img, levels=2, precision=12)
    b = bytearray(cs)
    assert b[:4] == b"\xFF\x4F\xFF\x51"
    b[6] |= 0x80
    crafted = bytes(b)
    with pytest.raises(ValueError, match="Part-2"):
        decode_j2k(crafted)
    assert _native()(crafted) is None


def test_cv2_upshift_build_detected(monkeypatch):
    """The per-precision round-trip probe must catch an OpenJPEG build
    that upshifts sub-16-bit precisions even on DARK frames, where the
    old max-based range check passes (12-bit max 200 << 16 = 3200 still
    fits 12 bits) — review finding."""
    from medicalimageanalysis_tpu.dicom.jpeg2k import parse_siz
    from medicalimageanalysis_tpu.dicom import pixels

    rng = np.random.RandomState(53)
    dark = rng.randint(0, 200, (20, 22)).astype(np.uint16)
    frag = encode_j2k(dark, levels=2, precision=12)

    real = cv2.imdecode

    def upshifting(buf, flags):
        img = real(buf, flags)
        if img is not None and img.dtype == np.uint16:
            img = (img.astype(np.uint32) << 4).astype(np.uint16)
        return img

    pixels._CV2_J2K_UNSCALED.clear()
    try:
        monkeypatch.setattr(cv2, "imdecode", upshifting)
        assert pixels._decode_j2k_cv2_exact(frag, parse_siz) is None
        monkeypatch.setattr(cv2, "imdecode", real)
        pixels._CV2_J2K_UNSCALED.clear()
        got = pixels._decode_j2k_cv2_exact(frag, parse_siz)
        assert got is not None and np.array_equal(got, dark)
    finally:
        pixels._CV2_J2K_UNSCALED.clear()


def test_cv2_openjpeg_build_capability():
    """Unsigned HTJ2K decode rides cv2's OpenJPEG; HT decoding needs
    OpenJPEG >= 2.5. Pin the build expectation so an environment swap
    that silently downgrades the route fails loudly here rather than
    as undecodable HTJ2K series."""
    import re
    m = re.search(r"JPEG 2000:\s+.*?ver (\d+)\.(\d+)",
                  cv2.getBuildInformation())
    assert m is not None, "cv2 built without JPEG 2000 support"
    assert (int(m.group(1)), int(m.group(2))) >= (2, 5)
