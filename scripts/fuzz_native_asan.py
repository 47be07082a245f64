"""ASan/UBSan fuzz harness for every native decoder in dicomscan.cpp.

The in-suite fuzz (tests/test_native*.py) runs the production .so: it
proves hostile input fails TYPED, but a silent out-of-bounds READ that
doesn't crash is invisible there. This harness rebuilds the native
sources with -fsanitize=address,undefined and drives the same decoder
entry points with byte-flips, truncations, random garbage, and crafted
header mutations; any OOB access or UB aborts the process loudly.

Run:  python scripts/fuzz_native_asan.py [trials_per_target]
Used before release of native-code changes; not part of the CI suite
(ASan build + run is ~a minute).
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SRC = os.path.join(REPO, "medicalimageanalysis_tpu", "native",
                   "dicomscan.cpp")
SO = "/tmp/libmiadicom_asan.so"


def build():
    cmd = ["g++", "-O1", "-g", "-shared", "-fPIC", "-std=c++17",
           "-pthread", "-fsanitize=address,undefined",
           "-fno-sanitize-recover=all", SRC, "-o", SO]
    subprocess.run(cmd, check=True)


def load():
    # the ASan runtime must be first in the process: re-exec under
    # LD_PRELOAD when not already set
    if "libasan" not in os.environ.get("LD_PRELOAD", ""):
        asan = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, text=True).stdout.strip()
        # libstdc++ must be resident when ASan initialises or its
        # __cxa_throw interceptor cannot resolve the real symbol (the
        # J2K decoder is the first native component that throws)
        stdcxx = subprocess.run(
            ["g++", "-print-file-name=libstdc++.so"],
            capture_output=True, text=True).stdout.strip()
        env = dict(os.environ)
        env["LD_PRELOAD"] = asan + " " + stdcxx
        env["ASAN_OPTIONS"] = "abort_on_error=1:detect_leaks=0"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    return ctypes.CDLL(SO)


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    build()
    lib = load()
    for fn in ("mia_jpegls_decode", "mia_jpegls14_decode",
               "mia_jpegdct_decode", "mia_j2k_decode"):
        f = getattr(lib, fn)
        f.restype = ctypes.c_int
        f.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.mia_rle_decode.restype = ctypes.c_int
    lib.mia_rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int]

    def _jp2_container_seed():
        # OpenJPEG-encoded JP2 container: exercises the box parser and
        # the decoder paths an own-encoder seed cannot reach
        import cv2
        # >=32px per side: OpenJPEG rejects smaller images at its
        # default 6 resolution levels
        a = np.random.default_rng(7).integers(0, 65535, (64, 64))
        ok, b = cv2.imencode(".jp2", a.astype(np.uint16),
                             [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000,
                              1000])
        assert ok
        return b.tobytes()

    rng = np.random.default_rng(0)
    img12 = rng.integers(0, 4096, (24, 24)).astype(np.int64)
    img8 = rng.integers(0, 256, (24, 24)).astype(np.uint16)

    from medicalimageanalysis_tpu.dicom.jpeg2k_enc import encode_j2k
    from medicalimageanalysis_tpu.dicom.jpegdct import encode_jpeg_dct
    from medicalimageanalysis_tpu.dicom.jpegls import encode_jpeg_lossless
    from medicalimageanalysis_tpu.dicom.jpegls_t87 import encode_jpegls
    from medicalimageanalysis_tpu.dicom.writer import encode_rle_frame

    seeds = {
        "mia_jpegls_decode": [
            encode_jpegls(img12, precision=12),
            encode_jpegls(img12, precision=12, near=3),
            encode_jpegls(np.minimum(img12, 4000), precision=12,
                          maxval=4000, thresholds=(9, 30, 80),
                          reset=32),
            encode_jpegls(rng.integers(0, 256, (16, 16, 3)),
                          precision=8),   # multi-scan (ILV 0) path
            encode_jpegls(rng.integers(0, 256, (16, 16, 3)),
                          precision=8, ilv=1),   # line-interleaved
            encode_jpegls(rng.integers(0, 256, (16, 16, 3)),
                          precision=8, ilv=2),   # sample-interleaved
        ],
        "mia_jpegls14_decode": [
            encode_jpeg_lossless(img8, precision=8),
            encode_jpeg_lossless(img12.astype(np.uint16), precision=12),
        ],
        "mia_jpegdct_decode": [
            encode_jpeg_dct(img8.astype(np.uint8), precision=8, quant=1),
            encode_jpeg_dct(img12.astype(np.uint16), precision=12,
                            quant=1),
        ],
        "mia_j2k_decode": [
            encode_j2k(img12.astype(np.uint16), levels=3),
            encode_j2k((img12 - 2048).astype(np.int16), levels=2,
                       tile_size=(12, 12)),
            encode_j2k(img12.astype(np.uint16), levels=3, sop=True,
                       eph=True, prog="RPCL",
                       precincts=[(4, 4), (5, 5), (6, 6), (7, 7)]),
            encode_j2k(img12.astype(np.uint16), levels=3, layers=3,
                       cbstyle=0x2F),
            encode_j2k(img12.astype(np.uint16), levels=3,
                       irreversible=True),
            encode_j2k(rng.integers(0, 256, (16, 16, 3))
                       .astype(np.uint8), levels=2),
            _jp2_container_seed(),
        ],
    }

    def run_jpeg(fn, blob):
        cap = 1 << 20
        out = np.zeros(cap, np.int32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        nc = ctypes.c_int()
        pr = ctypes.c_int()
        getattr(lib, fn)(bytes(blob), len(blob),
                         out.ctypes.data_as(ctypes.c_void_p), cap,
                         ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(nc), ctypes.byref(pr))

    total = 0
    for fn, blobs in seeds.items():
        for good in blobs:
            good = bytearray(good)
            n = len(good)
            per = max(trials // (4 * len(blobs)), 100)
            for t in range(per):
                blob = bytearray(good)
                kind = t % 4
                if kind == 0:        # byte flips
                    for _ in range(int(rng.integers(1, 9))):
                        blob[int(rng.integers(0, n))] = int(
                            rng.integers(0, 256))
                elif kind == 1:      # truncation
                    blob = blob[:int(rng.integers(2, n))]
                elif kind == 2:      # header-area mutation
                    for _ in range(int(rng.integers(1, 5))):
                        blob[int(rng.integers(0, min(64, n)))] = int(
                            rng.integers(0, 256))
                else:                # random garbage, valid start marker
                    head = (b"\xFF\x4F\xFF\x51"
                            if fn == "mia_j2k_decode" else b"\xFF\xD8")
                    blob = bytearray(head) + bytearray(
                        rng.integers(0, 256, int(rng.integers(8, 512)))
                        .astype(np.uint8).tobytes())
                run_jpeg(fn, blob)
                total += 1
        print(f"{fn}: fuzzed OK")

    # RLE: fragment fuzz against a valid encapsulated frame
    frame = rng.integers(0, 3000, (32, 32)).astype(np.int16)
    good = bytearray(encode_rle_frame(frame))
    out = np.zeros(32 * 32 * 2, np.uint8)
    for t in range(max(trials // 2, 200)):
        blob = bytearray(good)
        if t % 3 == 0:
            for _ in range(int(rng.integers(1, 9))):
                blob[int(rng.integers(0, len(blob)))] = int(
                    rng.integers(0, 256))
        elif t % 3 == 1:
            blob = blob[:int(rng.integers(1, len(blob)))]
        else:
            blob = bytearray(rng.integers(0, 256, int(
                rng.integers(64, 1024))).astype(np.uint8).tobytes())
        lib.mia_rle_decode(bytes(blob), len(blob),
                           out.ctypes.data_as(ctypes.c_void_p),
                           32, 32, 1, 2)
        total += 1
    print("mia_rle_decode: fuzzed OK")

    # element scanner: hostile Part-10 streams (the scanner parses the
    # full tag/VR/length structure of untrusted files)
    from medicalimageanalysis_tpu.native import ENTRY_DTYPE, Entry
    lib.mia_scan.restype = ctypes.c_int64
    lib.mia_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
        ctypes.POINTER(Entry), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64)]
    from medicalimageanalysis_tpu.dicom import dcmwrite
    from medicalimageanalysis_tpu.utils.creation import CreateDicomImage
    import tempfile
    d = tempfile.mkdtemp()
    CreateDicomImage(d, rng.integers(0, 3000, (2, 16, 16))
                     .astype(np.int16)).run()
    fname = os.path.join(d, sorted(os.listdir(d))[0])
    with open(fname, "rb") as fh:
        good = bytearray(fh.read())
    entries = (Entry * 512)()
    meta = (ctypes.c_uint64 * 4)()
    for t in range(max(trials, 500)):
        blob = bytearray(good)
        if t % 3 == 0:
            for _ in range(int(rng.integers(1, 12))):
                blob[int(rng.integers(0, len(blob)))] = int(
                    rng.integers(0, 256))
        elif t % 3 == 1:
            blob = blob[:int(rng.integers(4, len(blob)))]
        else:
            blob = bytearray(b"\x00" * 128 + b"DICM") + bytearray(
                rng.integers(0, 256, int(rng.integers(8, 2048)))
                .astype(np.uint8).tobytes())
        lib.mia_scan(bytes(blob), len(blob), int(t % 2), entries, 512,
                     meta)
        total += 1
    print("mia_scan: fuzzed OK")
    print(f"ALL CLEAN under ASan/UBSan ({total} trials)")


if __name__ == "__main__":
    main()
