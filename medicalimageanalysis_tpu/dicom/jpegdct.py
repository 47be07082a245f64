"""JPEG sequential DCT encoder (SOF0 8-bit / SOF1 12-bit extended).

Test-grade single-component encoder producing streams for the native
decoder (native/dicomscan.cpp mia_jpegdct_decode) — the DICOM
JPEG-Extended 12-bit path (transfer syntax 1.2.840.10008.1.2.4.51,
processes 2/4) that GDCM provides the reference and cv2 cannot decode
(VERDICT r2 missing #1). 8-bit output is standards-plain enough that
cv2 decodes it too, which the tests use as an external compliance
check.

Huffman tables are fixed-length canonical codes (DC: 17 symbols at 5
bits, AC: 242 symbols at 8 bits) — legal per T.81 (the all-ones code
of each length stays unassigned) and trivially correct.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg_dct"]

_ZIGZAG = np.array([
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])


def _dct_matrix():
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1 / 8.0) if u == 0 else np.sqrt(2 / 8.0)
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


def _category(v):
    v = abs(int(v))
    c = 0
    while v:
        v >>= 1
        c += 1
    return c


def encode_jpeg_dct(image, precision=12, quant=1, restart_interval=0):
    """Encode a 2D unsigned array as sequential-DCT JPEG bytes.

    precision 8 emits SOF0 (baseline, process 1), anything higher SOF1
    (extended, process 2/4). ``quant`` is a scalar or (8, 8) table.
    """
    img = np.asarray(image, np.float64)
    H, W = img.shape
    q = np.full((8, 8), float(quant)) if np.isscalar(quant) \
        else np.asarray(quant, np.float64)
    # quantize with the SAME integer table the DQT segment carries —
    # dividing by a fractional q while writing round(q) would make
    # every decoder dequantize with a different table than the encoder
    # used (silent intensity scaling, review finding)
    q = np.maximum(1, np.round(q))
    level = 1 << (precision - 1)

    bh, bw = -(-H // 8), -(-W // 8)
    padded = np.pad(img, ((0, bh * 8 - H), (0, bw * 8 - W)),
                    mode="edge") - level
    D = _dct_matrix()
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,byxw,vw->byuv", D, blocks, D)
    qc = np.round(coef / q).astype(np.int64)

    # fixed-length canonical tables; libjpeg (the cv2 cross-check)
    # rejects DC symbols > 15, and 12-bit DC differences can reach
    # category 16 -> for 8-bit emit the strictly-compliant 16-symbol
    # table, for 12-bit include category 16 (our decoder handles it)
    dc_syms = list(range(17 if precision > 8 else 16))
    max_s = 15 if precision > 8 else 11
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, max_s + 1)]
    ac_syms = sorted(set(ac_syms))
    dc_code = {s: (i, 5) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 8) for i, s in enumerate(ac_syms)}

    out = bytearray()
    out += b"\xFF\xD8"
    # DQT table 0, zigzag order; baseline (SOF0) forbids 16-bit
    # entries, so use pq=0 whenever the values fit a byte
    qz = q.astype(int).ravel()[_ZIGZAG]
    if qz.max() <= 255:
        dqt = bytes([0x00]) + bytes(int(v) for v in qz)
    else:
        dqt = bytes([0x10]) + b"".join(struct.pack(">H", int(v))
                                       for v in qz)
    out += b"\xFF\xDB" + struct.pack(">H", len(dqt) + 2) + dqt
    sof_marker = b"\xFF\xC0" if precision == 8 else b"\xFF\xC1"
    sof = struct.pack(">BHHB", precision, H, W, 1) + bytes([1, 0x11, 0])
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    # DHT: DC class0 id0 (17 syms @5 bits), AC class1 id0 (242 @8)
    dc_bits = [0] * 16
    dc_bits[4] = len(dc_syms)
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)
    dht = (bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms)
           + bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
    out += b"\xFF\xC4" + struct.pack(">H", len(dht) + 2) + dht
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos

    acc = 0
    nacc = 0
    data = bytearray()

    def put(code_val, nbits):
        nonlocal acc, nacc
        acc = (acc << nbits) | code_val
        nacc += nbits
        while nacc >= 8:
            nacc -= 8
            b = (acc >> nacc) & 0xFF
            data.append(b)
            if b == 0xFF:
                data.append(0x00)

    def flush_pad():
        nonlocal acc, nacc
        if nacc:
            pad = 8 - nacc
            put((1 << pad) - 1, pad)

    dc_pred = 0
    n_since = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and n_since == restart_interval:
                flush_pad()
                data.extend(b"\xFF" + bytes([0xD0 + (rst & 7)]))
                rst += 1
                n_since = 0
                dc_pred = 0
            zz = qc[by, bx].ravel()[_ZIGZAG]
            diff = int(zz[0]) - dc_pred
            dc_pred = int(zz[0])
            t = _category(diff)
            put(*dc_code[t])
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                put(v & ((1 << t) - 1), t)
            run = 0
            last_nz = np.nonzero(zz[1:])[0]
            last = last_nz[-1] + 1 if last_nz.size else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    put(*ac_code[0xF0])
                    run -= 16
                s = _category(v)
                put(*ac_code[(run << 4) | s])
                vv = v if v >= 0 else v + (1 << s) - 1
                put(vv & ((1 << s) - 1), s)
                run = 0
            if last < 63:
                put(*ac_code[0x00])  # EOB
            n_since += 1
    flush_pad()
    out += bytes(data)
    out += b"\xFF\xD9"
    return bytes(out)
