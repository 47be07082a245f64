"""J2K decoder-routing matrix (VERDICT r4 #6).

``decode_jpeg2000`` cascades native (mia_j2k_decode, full Part-1) ->
cv2/OpenJPEG exact-gated (unsigned, and the HT block coder native
lacks) -> cv2 DC-shift transcode (signed) -> pure-Python golden
decoder (seconds/frame — correct but never the intended route for a
clinical stream). This module PINS which decoder serves every
clinical (syntax x bit-depth x signedness x container) class, so the
"which streams fall to the slow path" question has a routed answer:
with the native library present, NONE do; without it, cv2 serves
everything and the Python decoder is reached only when the cv2 build
fails its exactness probe (and then only for Part-1 — HT without cv2
raises the typed HTJ2K error). The PARITY.md routing table mirrors
these rows.
"""

import numpy as np
import pytest

import medicalimageanalysis_tpu.dicom.jpeg2k as jpeg2k_mod
import medicalimageanalysis_tpu.dicom.pixels as pixels
import medicalimageanalysis_tpu.native as native_mod
from medicalimageanalysis_tpu.dicom import uids
from medicalimageanalysis_tpu.dicom.dataset import Dataset
from medicalimageanalysis_tpu.dicom.jpeg2k_enc import encode_j2k
from medicalimageanalysis_tpu.dicom.pixels import decode_pixel_data


def _ht_signal(cs):
    """Rsiz bit 14 (HTJ2K capabilities) on a raw codestream — the
    payload stays Part-1 (we have no HT encoder) but every router in
    the package treats the stream as HT: native refuses it, the
    Python decoder raises, cv2/OpenJPEG decodes (same boundary the
    real HT block coder hits)."""
    b = bytearray(cs)
    assert b[:4] == b"\xFF\x4F\xFF\x51"
    b[6] |= 0x40
    return bytes(b)


def _jp2_wrap(cs, w, h, ncomp, prec, signed):
    """Minimal conforming JP2 container around a raw codestream."""
    import struct

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    sig = b"\x00\x00\x00\x0CjP  \r\n\x87\n"
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    bpc = (prec - 1) | (0x80 if signed else 0)
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", h, w, ncomp, bpc,
                                    7, 0, 0))
    colr = box(b"colr", b"\x01\x00\x00"
               + struct.pack(">I", 17 if ncomp == 1 else 16))
    return sig + ftyp + box(b"jp2h", ihdr + colr) + box(b"jp2c", cs)


def _dataset(frag, arr, prec, signed, syntax):
    ds = Dataset()
    ds.Rows, ds.Columns = arr.shape[:2]
    ds.BitsAllocated = 8 if prec <= 8 else 16
    ds.BitsStored = prec
    ds.HighBit = prec - 1
    ds.PixelRepresentation = 1 if signed else 0
    ds.SamplesPerPixel = arr.shape[2] if arr.ndim == 3 else 1
    if arr.ndim == 3:
        ds.PhotometricInterpretation = "RGB"
        ds.PlanarConfiguration = 0
    ds.PixelData = [frag]
    ds.file_meta = {"TransferSyntaxUID": syntax}
    return ds


class _Router:
    """Wrap all four decode legs; record which one SERVED the frame
    (first leg returning a non-None / non-raising result)."""

    def __init__(self, monkeypatch, native_available=True):
        self.served = []
        self.attempted = []
        self._depth = 0   # the signed leg re-enters the exact leg on
                          # its rewritten stream; record top level only

        real_native = native_mod.j2k_decode
        real_exact = pixels._decode_j2k_cv2_exact
        real_signed = pixels._decode_j2k_cv2_signed
        real_py = jpeg2k_mod.decode_j2k

        def native_leg(frag):
            self.attempted.append("native")
            out = real_native(frag) if native_available else None
            if out is not None:
                self.served.append("native")
            return out

        def exact_leg(frag, parse_siz):
            if self._depth:
                return real_exact(frag, parse_siz)
            self.attempted.append("cv2_exact")
            out = real_exact(frag, parse_siz)
            if out is not None:
                self.served.append("cv2_exact")
            return out

        def signed_leg(frag, parse_siz):
            self.attempted.append("cv2_signed")
            self._depth += 1
            try:
                out = real_signed(frag, parse_siz)
            finally:
                self._depth -= 1
            if out is not None:
                self.served.append("cv2_signed")
            return out

        def py_leg(frag):
            self.attempted.append("python")
            out = real_py(frag)
            self.served.append("python")
            return out

        monkeypatch.setattr(native_mod, "j2k_decode", native_leg)
        monkeypatch.setattr(pixels, "_decode_j2k_cv2_exact", exact_leg)
        monkeypatch.setattr(pixels, "_decode_j2k_cv2_signed",
                            signed_leg)
        monkeypatch.setattr(jpeg2k_mod, "decode_j2k", py_leg)


def _case(prec, signed, ht, jp2, ncomp=1, seed=7):
    rng = np.random.RandomState(seed)
    shape = (14, 18) if ncomp == 1 else (14, 18, 3)
    if signed:
        arr = rng.randint(-(1 << (prec - 1)), 1 << (prec - 1),
                          shape).astype(np.int16)
    else:
        dt = np.uint8 if prec <= 8 else np.uint16
        arr = rng.randint(0, 1 << prec, shape).astype(dt)
    frag = encode_j2k(arr, levels=2, precision=prec, signed=signed)
    if ht:
        frag = _ht_signal(frag)
    if jp2:
        frag = _jp2_wrap(frag, 18, 14, ncomp, prec, signed)
    syntax = uids.HTJ2KLossless if ht else uids.JPEG2000Lossless
    return arr, _dataset(frag, arr, prec, signed, syntax)


# the clinical matrix: (prec, signed, ht, jp2, ncomp) -> expected
# serving decoder WITH the native library present
MATRIX_NATIVE = [
    (8, False, False, False, 1, "native"),
    (12, False, False, False, 1, "native"),
    (16, False, False, False, 1, "native"),
    (12, True, False, False, 1, "native"),
    (16, True, False, False, 1, "native"),
    (8, False, False, False, 3, "native"),
    (12, False, False, True, 1, "native"),      # JP2-wrapped Part-1
    (12, False, True, False, 1, "cv2_exact"),   # HT unsigned
    (16, False, True, False, 1, "cv2_exact"),
    (12, True, True, False, 1, "cv2_signed"),   # HT signed (r3 #9)
    (16, True, True, False, 1, "cv2_signed"),
    (12, False, True, True, 1, "cv2_exact"),    # HT unsigned, JP2
    (12, True, True, True, 1, "cv2_signed"),    # HT signed, JP2 (r5)
]

# without the native library, cv2 serves everything
MATRIX_NO_NATIVE = [
    (8, False, False, False, 1, "cv2_exact"),
    (12, False, False, False, 1, "cv2_exact"),
    (16, False, False, False, 1, "cv2_exact"),
    (12, True, False, False, 1, "cv2_signed"),
    (16, True, False, False, 1, "cv2_signed"),
    (12, False, False, True, 1, "cv2_exact"),
    (12, True, False, True, 1, "cv2_signed"),   # JP2 signed (r5)
    (12, True, True, False, 1, "cv2_signed"),
]


@pytest.mark.parametrize("prec,signed,ht,jp2,ncomp,want",
                         MATRIX_NATIVE)
def test_routing_with_native(monkeypatch, prec, signed, ht, jp2,
                             ncomp, want):
    if native_mod.get_lib() is None:
        pytest.skip("native library unavailable")
    arr, ds = _case(prec, signed, ht, jp2, ncomp)
    router = _Router(monkeypatch, native_available=True)
    out = decode_pixel_data(ds)
    np.testing.assert_array_equal(np.asarray(out).reshape(arr.shape),
                                  arr)
    assert router.served == [want], (
        f"served={router.served} attempted={router.attempted}")
    assert "python" not in router.attempted or want == "python", \
        "a clinical stream fell through to the slow Python decoder"


@pytest.mark.parametrize("prec,signed,ht,jp2,ncomp,want",
                         MATRIX_NO_NATIVE)
def test_routing_without_native(monkeypatch, prec, signed, ht, jp2,
                                ncomp, want):
    arr, ds = _case(prec, signed, ht, jp2, ncomp)
    router = _Router(monkeypatch, native_available=False)
    out = decode_pixel_data(ds)
    np.testing.assert_array_equal(np.asarray(out).reshape(arr.shape),
                                  arr)
    assert router.served == [want], (
        f"served={router.served} attempted={router.attempted}")
    assert "python" not in router.served, \
        "a clinical stream fell through to the slow Python decoder"


def test_python_fallback_only_when_cv2_probe_fails(monkeypatch):
    """The ONLY route to the slow decoder: no native library AND a
    cv2/OpenJPEG build that fails its exactness probe. Part-1 still
    decodes exactly (slow, correct); HT raises the typed HTJ2K error
    instead of emitting garbage."""
    arr, ds = _case(12, False, False, False, 1)
    router = _Router(monkeypatch, native_available=False)
    monkeypatch.setattr(pixels, "_cv2_j2k_precision_exact",
                        lambda prec: False)
    out = decode_pixel_data(ds)
    np.testing.assert_array_equal(np.asarray(out), arr)
    assert router.served == ["python"]

    arr, ds = _case(12, False, True, False, 1)
    router = _Router(monkeypatch, native_available=False)
    monkeypatch.setattr(pixels, "_cv2_j2k_precision_exact",
                        lambda prec: False)
    with pytest.raises(ValueError, match="HTJ2K"):
        decode_pixel_data(ds)
