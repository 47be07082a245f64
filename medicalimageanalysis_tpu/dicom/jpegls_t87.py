"""JPEG-LS (ITU-T T.87 / ISO 14495-1) encoder — LOCO-I.

Own implementation of the codec the reference obtains through
GDCM/CharLS (reference requirements.txt pins python-gdcm; gdcm import
at reference read/dicom.py:52), covering DICOM transfer syntaxes
1.2.840.10008.1.2.4.80 (lossless, NEAR=0) and .81 (near-lossless,
NEAR>0). Single-component scans, 2..16-bit precision, ILV=0 — the
DICOM CT/MR/PT case.

This encoder is deliberately an independent second implementation of
the T.87 pseudo-code (regular mode with 365 contexts, bias
correction, run mode with the 32-entry J[] ladder, run-interruption
contexts 365/366, limited-length Golomb LG(k, LIMIT), marker-stuffed
bit packing) written against the spec rather than sharing state code
with the native decoder (native/dicomscan.cpp mia_jpegls_decode), so
round-trip tests cross-validate both. Where the published pseudo-code
is ambiguous the behavior of the CharLS reference implementation is
followed: the run-interruption sample is coded with the
pre-decrement RUNindex, and RUNindex is decremented after.

Pure NumPy/Python; test- and export-grade (encoding a 512x512 CT in
Python is seconds, not ms — the DECODE hot path is the native C++).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpegls", "default_thresholds"]

_J = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
      4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def default_thresholds(maxval, near):
    """T.87 C.2.4.1.1.1 default (T1, T2, T3, RESET) for MAXVAL/NEAR.

    CLAMP_1 semantics (CharLS clamp_value): a computed default outside
    [lo, MAXVAL] on either side collapses to the LOWER bound (NEAR+1
    for T1, then T1 for T2, T2 for T3)."""
    if maxval >= 128:
        factor = (min(maxval, 4095) + 128) // 256
        t1 = factor * (3 - 2) + 2 + 3 * near
        t2 = factor * (7 - 3) + 3 + 5 * near
        t3 = factor * (21 - 4) + 4 + 7 * near
    else:
        factor = 256 // (maxval + 1)
        t1 = max(2, 3 // factor + 3 * near)
        t2 = max(3, 7 // factor + 5 * near)
        t3 = max(4, 21 // factor + 7 * near)
    t1 = near + 1 if (t1 > maxval or t1 < near + 1) else t1
    t2 = t1 if (t2 > maxval or t2 < t1) else t2
    t3 = t2 if (t3 > maxval or t3 < t2) else t3
    return t1, t2, t3, 64


class _BitWriter:
    """MSB-first bit packer with JPEG-LS marker stuffing: the byte
    after an emitted 0xFF carries only 7 payload bits (MSB = 0)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0
        self.room = 8

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == self.room:
                self.out.append(self.cur)
                self.room = 7 if self.cur == 0xFF else 8
                self.cur = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.cur <<= self.room - self.n
            self.out.append(self.cur)
            self.cur = 0
            self.n = 0
            self.room = 8


def _golomb_limited(bw, val, k, limit, qbpp):
    """Limited-length Golomb LG(k, limit) append (T.87 A.5.3)."""
    hi = val >> k
    if hi < limit - qbpp - 1:
        bw.put(1, hi + 1)              # hi zeros then a 1
        if k:
            bw.put(val & ((1 << k) - 1), k)
    else:
        bw.put(1, limit - qbpp)        # (limit-qbpp-1) zeros then a 1
        bw.put(val - 1, qbpp)


def encode_jpegls(image, precision=None, near=0, maxval=None,
                  thresholds=None, reset=64):
    """Encode a non-negative integer array as a JPEG-LS codestream.

    2D (H, W) -> single-component; 3D (H, W, C<=4) -> C plane-
    separated scans (ILV 0, one SOS per component — the layout the
    native decoder supports for color/secondary-capture streams).
    near=0 -> lossless (.4.80); near>0 -> near-lossless (.4.81) with
    |decoded - original| <= near guaranteed. Returns bytes.
    """
    img = np.ascontiguousarray(image)
    if img.dtype.kind not in "ui":
        raise ValueError("encode_jpegls: integer samples required")
    img = img.astype(np.int64)
    if img.ndim == 2:
        planes = [img]
    elif img.ndim == 3 and 1 <= img.shape[2] <= 4:
        planes = [np.ascontiguousarray(img[..., c])
                  for c in range(img.shape[2])]
    else:
        raise ValueError("encode_jpegls: expected (H, W) or "
                         "(H, W, C<=4)")
    if img.size and int(img.min()) < 0:
        raise ValueError("encode_jpegls: samples must be >= 0")
    H, W = planes[0].shape
    if not (0 < H < 65536 and 0 < W < 65536):
        raise ValueError("encode_jpegls: dimensions out of range")

    peak = int(img.max()) if img.size else 1
    if precision is None:
        precision = max(2, int(peak).bit_length())
    if not 2 <= precision <= 16:
        raise ValueError("encode_jpegls: precision must be 2..16")
    if maxval is None:
        maxval = (1 << precision) - 1
    if peak > maxval:
        raise ValueError("encode_jpegls: sample exceeds MAXVAL")
    near = int(near)
    if not 0 <= near <= min(255, maxval // 2):
        raise ValueError("encode_jpegls: NEAR out of range")

    t1d, t2d, t3d, _ = default_thresholds(maxval, near)
    if thresholds is None:
        t1, t2, t3 = t1d, t2d, t3d
    else:
        t1, t2, t3 = (int(t) for t in thresholds)
        if not near < t1 <= t2 <= t3 <= maxval:
            raise ValueError("encode_jpegls: bad thresholds")
    reset = int(reset)
    if not 3 <= reset <= max(255, maxval):
        raise ValueError("encode_jpegls: bad RESET")

    # ---- header -----------------------------------------------------
    nc = len(planes)
    out = bytearray(b"\xFF\xD8")                       # SOI
    sof = struct.pack(">BHHB", precision, H, W, nc) + b"".join(
        bytes([c + 1, 0x11, 0]) for c in range(nc))
    out += b"\xFF\xF7" + struct.pack(">H", len(sof) + 2) + sof  # SOF55
    nondefault = (maxval != (1 << precision) - 1 or reset != 64
                  or (t1, t2, t3) != (t1d, t2d, t3d))
    if nondefault:
        lse = bytes([1]) + struct.pack(">HHHHH", maxval, t1, t2, t3,
                                       reset)
        out += b"\xFF\xF8" + struct.pack(">H", len(lse) + 2) + lse
    for ci, plane in enumerate(planes):
        sos = bytes([1, ci + 1, 0x00, near, 0, 0])     # Cs,Tm,NEAR,ILV,Al
        out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
        out += _encode_scan(plane, W, H, maxval, near, t1, t2, t3,
                            reset)
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


def _encode_scan(img, W, H, maxval, near, t1, t2, t3, reset):
    """Entropy-coded bytes of ONE single-component scan (fresh context
    state per T.87 — each ILV-0 scan restarts its modeller)."""
    rng = (maxval + 2 * near) // (2 * near + 1) + 1
    qbpp = max(1, (rng - 1).bit_length())
    bpp = max(2, (maxval).bit_length())
    limit = 2 * (bpp + max(8, bpp))
    full = rng * (2 * near + 1)
    half_rng = (rng + 1) // 2

    # ---- context state ----------------------------------------------
    ainit = max(2, (rng + 32) // 64)
    A = [ainit] * 367
    B = [0] * 365
    C = [0] * 365
    N = [1] * 367
    Nn = [0, 0]                      # run-interruption negatives
    runindex = 0
    twon1 = 2 * near + 1

    def quantize(d):
        if d <= -t3:
            return -4
        if d <= -t2:
            return -3
        if d <= -t1:
            return -2
        if d < -near:
            return -1
        if d <= near:
            return 0
        if d < t1:
            return 1
        if d < t2:
            return 2
        if d < t3:
            return 3
        return 4

    bw = _BitWriter()
    # reconstructed neighbor rows (margin layout matches the decoder:
    # index x+1 = column x; prev[0] is the previous line's Ra at col 0)
    prev = [0] * (W + 2)
    cur = [0] * (W + 2)

    for y in range(H):
        row = img[y]
        prev[W + 1] = prev[W]
        cur[0] = prev[1]
        x = 0
        while x < W:
            Ra = cur[x]
            Rb = prev[x + 1]
            Rc = prev[x]
            Rd = prev[x + 2]
            D1 = Rd - Rb
            D2 = Rb - Rc
            D3 = Rc - Ra
            if (abs(D1) <= near and abs(D2) <= near and abs(D3) <= near):
                # ---------------- run mode ----------------
                runcnt = 0
                while x + runcnt < W and abs(int(row[x + runcnt]) - Ra) \
                        <= near:
                    runcnt += 1
                for i in range(runcnt):
                    cur[x + 1 + i] = Ra
                end = x + runcnt
                while runcnt >= (1 << _J[runindex]):
                    bw.put(1, 1)
                    runcnt -= 1 << _J[runindex]
                    if runindex < 31:
                        runindex += 1
                if end >= W:             # run to end of line
                    if runcnt > 0:
                        bw.put(1, 1)
                    x = end
                    continue
                bw.put(0, 1)
                if _J[runindex]:
                    bw.put(runcnt, _J[runindex])
                x = end

                # ------- run interruption sample (ctx 365/366)
                Ix = int(row[x])
                Ra2 = cur[x]
                Rb2 = prev[x + 1]
                ritype = 1 if abs(Ra2 - Rb2) <= near else 0
                Px = Ra2 if ritype else Rb2
                sign = -1 if (not ritype and Ra2 > Rb2) else 1
                e = (Ix - Px) * sign
                if near:
                    e = (near + e) // twon1 if e > 0 \
                        else -((near - e) // twon1)
                # modulo-reduce BEFORE reconstruction (A.4.5 order —
                # the decoder reconstructs from the reduced value)
                if e < 0:
                    e += rng
                if e >= half_rng:
                    e -= rng
                Rx = Px + sign * e * twon1
                if Rx < -near:
                    Rx += full
                elif Rx > maxval + near:
                    Rx -= full
                Rx = min(max(Rx, 0), maxval)
                cur[x + 1] = Rx
                Q = 365 + ritype
                temp = A[366] + (N[366] >> 1) if ritype else A[365]
                k = 0
                while (N[Q] << k) < temp:
                    k += 1
                if k == 0 and e > 0 and 2 * Nn[ritype] < N[Q]:
                    emap = 1
                elif e < 0 and 2 * Nn[ritype] >= N[Q]:
                    emap = 1
                elif e < 0 and k != 0:
                    emap = 1
                else:
                    emap = 0
                emerr = 2 * abs(e) - ritype - emap
                _golomb_limited(bw, emerr, k,
                                limit - _J[runindex] - 1, qbpp)
                if e < 0:
                    Nn[ritype] += 1
                A[Q] += (emerr + 1 - ritype) >> 1
                if N[Q] == reset:
                    A[Q] >>= 1
                    N[Q] >>= 1
                    Nn[ritype] >>= 1
                N[Q] += 1
                if runindex > 0:
                    runindex -= 1
                x += 1
                continue

            # ---------------- regular mode ----------------
            q1 = quantize(D1)
            q2 = quantize(D2)
            q3 = quantize(D3)
            sign = 1
            if q1 < 0 or (q1 == 0 and (q2 < 0 or (q2 == 0 and q3 < 0))):
                sign = -1
                q1, q2, q3 = -q1, -q2, -q3
            Q = q1 * 81 + q2 * 9 + q3

            mn, mx = (Ra, Rb) if Ra < Rb else (Rb, Ra)
            if Rc >= mx:
                Px = mn
            elif Rc <= mn:
                Px = mx
            else:
                Px = Ra + Rb - Rc
            Px += sign * C[Q]
            Px = min(max(Px, 0), maxval)

            Ix = int(row[x])
            e = (Ix - Px) * sign
            if near:
                e = (near + e) // twon1 if e > 0 \
                    else -((near - e) // twon1)
            if e < 0:
                e += rng
            if e >= half_rng:
                e -= rng
            Rx = Px + sign * e * twon1
            if Rx < -near:
                Rx += full
            elif Rx > maxval + near:
                Rx -= full
            Rx = min(max(Rx, 0), maxval)
            cur[x + 1] = Rx

            k = 0
            while (N[Q] << k) < A[Q]:
                k += 1
            if near == 0 and k == 0 and 2 * B[Q] <= -N[Q]:
                merr = 2 * e + 1 if e >= 0 else -2 * (e + 1)
            else:
                merr = 2 * e if e >= 0 else -2 * e - 1
            _golomb_limited(bw, merr, k, limit, qbpp)

            B[Q] += e * twon1
            A[Q] += abs(e)
            if N[Q] == reset:
                A[Q] >>= 1
                B[Q] = B[Q] >> 1 if B[Q] >= 0 else -((1 - B[Q]) >> 1)
                N[Q] >>= 1
            N[Q] += 1
            if B[Q] <= -N[Q]:
                if C[Q] > -128:
                    C[Q] -= 1
                B[Q] += N[Q]
                if B[Q] <= -N[Q]:
                    B[Q] = -N[Q] + 1
            elif B[Q] > 0:
                if C[Q] < 127:
                    C[Q] += 1
                B[Q] -= N[Q]
                if B[Q] > 0:
                    B[Q] = 0
            x += 1
        prev, cur = cur, prev

    bw.flush()
    return bytes(bw.out)
