"""JPEG 2000 Part 1 (ISO/IEC 15444-1 / ITU-T T.800) decoder.

Own implementation of the codec the reference obtains through
GDCM/OpenJPEG via pydicom (reference requirements.txt pins
python-gdcm; gdcm import at reference read/dicom.py:52), covering
DICOM transfer syntaxes 1.2.840.10008.1.2.4.90 (JPEG 2000 lossless)
and .91 (JPEG 2000). The cv2/OpenJPEG route this replaces is wrong
for medical data in two ways measured on this box: cv2 re-scales
components whose precision is not exactly 8/16 bits (a 12-bit CT
codestream decodes shifted left by 4), and it has no signed-component
path at all (int16 encode falls back to 8-bit); DICOM J2K CT is
routinely 12..16-bit *signed*.

Coverage: raw codestreams and JP2 containers; multiple tiles and
tile-parts; 1..4 components, 1..38 bit precision, signed/unsigned;
all five progression orders (LRCP/RLCP/RPCL/PCRL/CPRL); arbitrary
decomposition levels; precincts + SOP/EPH; all six code-block style
bits (selective MQ bypass, context reset, pass termination,
vertically-causal contexts, predictable termination, segmentation
symbols); reversible 5/3 and irreversible 9/7 wavelets; RCT and ICT
multi-component transforms; scalar-derived and expounded
quantization; truncated (lossy) codestreams with half-LSB
reconstruction rounding.

Not supported (typed ValueError): component subsampling != 1 (never
valid for DICOM single-plane syntaxes), POC progression changes,
PPM/PPT packed packet headers, RGN ROI shifts — none are emitted by
the OpenJPEG/GDCM encoders that produce clinical DICOM J2K.

Pure NumPy/Python and deliberately an independent second
implementation written against the spec text: the native C++ decoder
(native/dicomscan.cpp mia_j2k_decode) is validated against this one,
and this one is validated against OpenJPEG-encoded streams. Decode
here is test-grade (seconds per 512^2 frame); the hot path is native.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["decode_j2k", "parse_siz"]


def _ceil_div(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# MQ arithmetic decoder (T.800 Annex C, software conventions)
# ---------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH)
_MQ_TABLE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

# EBCOT context numbering: 0..8 significance, 9..13 sign, 14..16
# magnitude refinement, 17 run-length, 18 UNIFORM.
N_CTX = 19
CTX_RL = 17
CTX_UNI = 18


def _initial_contexts():
    idx = [0] * N_CTX
    mps = [0] * N_CTX
    idx[0] = 4        # zero-neighbourhood significance context
    idx[CTX_RL] = 3
    idx[CTX_UNI] = 46
    return idx, mps


class MQDecoder:
    """MQ decoder over one codeword segment (T.800 C.3)."""

    __slots__ = ("data", "bp", "end", "c", "a", "ct", "idx", "mps")

    def __init__(self, data, ctx_idx, ctx_mps):
        self.data = data
        self.bp = 0
        self.end = len(data)
        self.idx = ctx_idx
        self.mps = ctx_mps
        b0 = data[0] if self.end > 0 else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i):
        return self.data[i] if i < self.end else 0xFF

    def _bytein(self):
        bp = self.bp
        if self._byte(bp) == 0xFF:
            if self._byte(bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += self._byte(bp + 1) << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            self.c += self._byte(bp + 1) << 8
            self.ct = 8

    def decode(self, cx):
        idx = self.idx
        i = idx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = self.mps[cx]
                idx[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                idx[cx] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return self.mps[cx]
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] ^= 1
                idx[cx] = nlps
            else:
                d = self.mps[cx]
                idx[cx] = nmps
        # renormalise
        a = self.a
        c = self.c
        ct = self.ct
        while not (a & 0x8000):
            if ct == 0:
                self.c = c
                self._bytein()
                c = self.c
                ct = self.ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self.a = a
        self.c = c
        self.ct = ct
        return d


class RawDecoder:
    """Raw (arithmetic-bypass) bit reader with 0xFF stuffing
    (T.800 D.6): a byte following 0xFF carries only 7 bits."""

    __slots__ = ("data", "pos", "end", "cur", "nbits")

    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.end = len(data)
        self.cur = 0
        self.nbits = 0

    def bit(self):
        if self.nbits == 0:
            prev = self.cur
            if self.pos < self.end:
                self.cur = self.data[self.pos]
                self.pos += 1
            else:
                self.cur = 0
            self.nbits = 7 if prev == 0xFF else 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1


class HeaderBitReader:
    """Packet-header bit reader with the same 0xFF stuffing rule."""

    __slots__ = ("data", "pos", "cur", "nbits")

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def bit(self):
        if self.nbits == 0:
            prev = self.cur
            if self.pos >= len(self.data):
                raise ValueError("JPEG2000: packet header overruns data")
            self.cur = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if prev == 0xFF else 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        # a stuffed 0 bit after a trailing 0xFF is part of the header
        if self.nbits == 0 and self.cur == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG2000: packet header overruns data")
            self.pos += 1
        self.nbits = 0
        self.cur = 0
        return self.pos


class TagTree:
    """Tag tree decoder (T.800 B.10.2)."""

    def __init__(self, w, h):
        self.w = w
        self.h = h
        self.levels = []
        lw, lh = w, h
        while True:
            self.levels.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw = _ceil_div(lw, 2)
            lh = _ceil_div(lh, 2)
        self.low = [np.zeros((lh_ * lw_,), dtype=np.int32)
                    for (lw_, lh_) in self.levels]
        self.known = [np.zeros((lh_ * lw_,), dtype=bool)
                      for (lw_, lh_) in self.levels]

    def reset(self):
        for a in self.low:
            a[:] = 0
        for a in self.known:
            a[:] = False

    def decode(self, rdr, x, y, threshold):
        """Advance knowledge of leaf (x, y) up to `threshold`.

        Returns True iff the leaf value is known and < threshold."""
        # path root..leaf
        path = []
        lx, ly = x, y
        for lev, (lw, lh) in enumerate(self.levels):
            path.append((lev, ly * lw + lx))
            lx //= 2
            ly //= 2
        path.reverse()
        low = 0
        for lev, idx in path:
            lows = self.low[lev]
            knowns = self.known[lev]
            if lows[idx] < low:
                lows[idx] = low
            while not knowns[idx] and lows[idx] < threshold:
                if rdr.bit():
                    knowns[idx] = True
                else:
                    lows[idx] += 1
            low = lows[idx]
            if not knowns[idx]:
                return False
        return low < threshold

    def value(self, rdr, x, y):
        """Fully decode the leaf value (used for zero-bitplane trees)."""
        t = 1
        while not self.decode(rdr, x, y, t):
            t += 1
        return int(self.low[0][y * self.levels[0][0] + x])

    # --- encoder side (used by dicom.jpeg2k_enc) ---

    def set_values(self, leaf_values):
        """Install leaf values ((h, w) array) and build internal-node
        minima bottom-up; resets coding state."""
        self.reset()
        vals = [np.asarray(leaf_values, dtype=np.int32).reshape(
            self.levels[0][1], self.levels[0][0])]
        for (lw, lh) in self.levels[1:]:
            prev = vals[-1]
            ph, pw = prev.shape
            cur = np.full((lh, lw), np.iinfo(np.int32).max, dtype=np.int32)
            for j in range(ph):
                for i in range(pw):
                    cur[j // 2, i // 2] = min(cur[j // 2, i // 2],
                                              prev[j, i])
            vals.append(cur)
        self.values = [v.reshape(-1) for v in vals]

    def encode(self, wtr, x, y, threshold):
        """Emit bits advancing knowledge of leaf (x, y) to threshold
        (T.800 B.10.2, encoder side)."""
        path = []
        lx, ly = x, y
        for lev, (lw, lh) in enumerate(self.levels):
            path.append((lev, ly * lw + lx))
            lx //= 2
            ly //= 2
        path.reverse()
        low = 0
        for lev, idx in path:
            lows = self.low[lev]
            knowns = self.known[lev]
            val = int(self.values[lev][idx])
            if lows[idx] < low:
                lows[idx] = low
            while lows[idx] < threshold:
                if lows[idx] < val:
                    wtr.bit(0)
                    lows[idx] += 1
                else:
                    if not knowns[idx]:
                        wtr.bit(1)
                        knowns[idx] = True
                    break
            low = min(lows[idx], val)
            if not knowns[idx]:
                return


# ---------------------------------------------------------------------------
# Marker segment parsing (T.800 Annex A)
# ---------------------------------------------------------------------------

SOC, SOT, SOD, EOC = 0xFF4F, 0xFF90, 0xFF93, 0xFFD9
SIZ, COD, COC, QCD, QCC = 0xFF51, 0xFF52, 0xFF53, 0xFF5C, 0xFF5D
RGN, POC, PPM, PPT = 0xFF5E, 0xFF5F, 0xFF60, 0xFF61
TLM, PLM, PLT, CRG, CME = 0xFF55, 0xFF57, 0xFF58, 0xFF63, 0xFF64
SOP, EPH = 0xFF91, 0xFF92

# code-block style bits (SPcod byte 3, T.800 Table A.19)
CB_LAZY, CB_RESET, CB_TERMALL = 0x01, 0x02, 0x04
CB_VSC, CB_ERTERM, CB_SEGSYM = 0x08, 0x10, 0x20


class CodingStyle:
    """Per-component coding style (COD/COC)."""

    __slots__ = ("nl", "xcb", "ycb", "cbstyle", "transform", "prec_exps")

    def copy(self):
        c = CodingStyle()
        c.nl, c.xcb, c.ycb = self.nl, self.xcb, self.ycb
        c.cbstyle, c.transform = self.cbstyle, self.transform
        c.prec_exps = list(self.prec_exps)
        return c


class Quant:
    """Per-component quantization (QCD/QCC)."""

    __slots__ = ("style", "guard", "steps")

    def copy(self):
        q = Quant()
        q.style, q.guard, q.steps = self.style, self.guard, list(self.steps)
        return q


def _parse_spcod(body, off, scod_has_prec):
    cs = CodingStyle()
    cs.nl = body[off]
    cs.xcb = (body[off + 1] & 0x0F) + 2
    cs.ycb = (body[off + 2] & 0x0F) + 2
    if cs.xcb > 10 or cs.ycb > 10 or cs.xcb + cs.ycb > 12:
        raise ValueError("JPEG2000: invalid code-block size exponents")
    cs.cbstyle = body[off + 3]
    cs.transform = body[off + 4]
    if cs.transform > 1:
        raise ValueError("JPEG2000: unknown wavelet transform "
                         f"{cs.transform}")
    off += 5
    if scod_has_prec:
        cs.prec_exps = []
        for _ in range(cs.nl + 1):
            b = body[off]
            off += 1
            cs.prec_exps.append((b & 0x0F, (b >> 4) & 0x0F))
    else:
        cs.prec_exps = [(15, 15)] * (cs.nl + 1)
    return cs, off


def _parse_sqcx(body, off, length, nl):
    q = Quant()
    sq = body[off]
    q.style = sq & 0x1F
    q.guard = (sq >> 5) & 7
    off += 1
    q.steps = []
    end = length
    if q.style == 0:          # no quantization (reversible)
        while off < end:
            q.steps.append((body[off] >> 3, 0))
            off += 1
    elif q.style == 1:        # scalar derived: single (exp, mant)
        v = struct.unpack(">H", body[off:off + 2])[0]
        q.steps.append((v >> 11, v & 0x7FF))
        off += 2
    elif q.style == 2:        # scalar expounded
        while off + 1 < end:
            v = struct.unpack(">H", body[off:off + 2])[0]
            q.steps.append((v >> 11, v & 0x7FF))
            off += 2
    else:
        raise ValueError(f"JPEG2000: unknown quantization style {q.style}")
    return q


class _Main:
    pass


def _find_codestream(buf):
    """Accept a raw codestream or a JP2 container."""
    if buf[:2] == b"\xFF\x4F":
        return buf
    if buf[:12] == b"\x00\x00\x00\x0CjP  \r\n\x87\n":
        pos = 12
        n = len(buf)
        while pos + 8 <= n:
            (lbox,) = struct.unpack(">I", buf[pos:pos + 4])
            tbox = buf[pos + 4:pos + 8]
            hdr = 8
            if lbox == 1:
                (lbox,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
                hdr = 16
            if tbox == b"jp2c":
                end = n if lbox == 0 else pos + lbox
                return buf[pos + hdr:end]
            if lbox == 0:
                break
            pos += lbox
        raise ValueError("JPEG2000: JP2 container without jp2c box")
    i = buf.find(b"\xFF\x4F\xFF\x51")
    if i < 0:
        raise ValueError("JPEG2000: no codestream found")
    return buf[i:]


def parse_siz(buf):
    """Parse just enough of the main header to report geometry:
    returns (width, height, ncomp, [(prec, signed), ...])."""
    buf = _find_codestream(bytes(buf))
    if struct.unpack(">H", buf[2:4])[0] != SIZ:
        raise ValueError("JPEG2000: SIZ must follow SOC")
    (lsiz,) = struct.unpack(">H", buf[4:6])
    body = buf[6:4 + lsiz]
    (rsiz, xs, ys, xo, yo, xts, yts, xto, yto, csiz) = struct.unpack(
        ">HIIIIIIIIH", body[:36])
    comps = []
    for c in range(csiz):
        ssiz = body[36 + 3 * c]
        comps.append(((ssiz & 0x7F) + 1, bool(ssiz & 0x80)))
    return xs - xo, ys - yo, csiz, comps


class Tile:
    __slots__ = ("idx", "data", "next_tp")

    def __init__(self, idx):
        self.idx = idx
        self.data = []
        self.next_tp = 0


def _parse_codestream(buf):
    """Parse the main header and collect per-tile bitstream data."""
    if struct.unpack(">H", buf[0:2])[0] != SOC:
        raise ValueError("JPEG2000: missing SOC")
    pos = 2
    m = _Main()
    m.cod = None
    m.qcd = None
    m.coc = {}
    m.qcc = {}
    m.tile_cod = {}
    m.tile_coc = {}
    m.tile_qcd = {}
    m.tile_qcc = {}
    m.prog = 0
    m.layers = 1
    m.mct = 0
    tiles = {}
    n = len(buf)

    def parse_headers(pos, end, tile_idx):
        """Parse marker segments until SOD (tile) or SOT/EOC (main)."""
        while pos + 4 <= end:
            (mk,) = struct.unpack(">H", buf[pos:pos + 2])
            if mk in (SOT, EOC):
                return pos, mk
            if mk == SOD:
                return pos + 2, mk
            if mk < 0xFF30 or mk > 0xFFFF:
                raise ValueError(f"JPEG2000: bad marker 0x{mk:04X}")
            (ln,) = struct.unpack(">H", buf[pos + 2:pos + 4])
            body = buf[pos + 4:pos + 2 + ln]
            if len(body) != ln - 2:
                raise ValueError("JPEG2000: marker segment overruns stream")
            if mk == SIZ:
                (m.rsiz, m.xs, m.ys, m.xo, m.yo, m.xts, m.yts, m.xto,
                 m.yto, m.csiz) = struct.unpack(">HIIIIIIIIH", body[:36])
                if m.rsiz & 0xC000:
                    # Rsiz bit 14: CAP-marker capabilities — HTJ2K
                    # (Part 15, DICOM .4.201-.203). Rsiz bit 15:
                    # Part-2 (T.801) extensions (ATK/DFS/... marker
                    # segments fall in the silently-skipped
                    # 0xFF30-0xFFFF range). Either way the block /
                    # transform machinery differs from Part 1;
                    # decoding anyway would emit garbage.
                    kind = ("HTJ2K/extended-capability"
                            if m.rsiz & 0x4000 else "Part-2 extension")
                    raise ValueError(
                        f"JPEG2000: {kind} codestream — not decodable "
                        "by the built-in Part-1 codec (unsigned HTJ2K "
                        "decodes via the OpenJPEG route)")
                if not 1 <= m.csiz <= 16384:
                    raise ValueError("JPEG2000: bad component count")
                if len(body) < 36 + 3 * m.csiz:
                    raise ValueError("JPEG2000: SIZ shorter than its "
                                     "component table")
                m.comp_prec = []
                m.comp_signed = []
                for c in range(m.csiz):
                    ssiz = body[36 + 3 * c]
                    xr = body[37 + 3 * c]
                    yr = body[38 + 3 * c]
                    if xr != 1 or yr != 1:
                        raise ValueError(
                            "JPEG2000: component subsampling is not "
                            "supported (not valid for DICOM volumes)")
                    m.comp_prec.append((ssiz & 0x7F) + 1)
                    m.comp_signed.append(bool(ssiz & 0x80))
                if m.xts == 0 or m.yts == 0:
                    raise ValueError("JPEG2000: zero tile size")
            elif mk == COD:
                scod = body[0]
                prog = body[1]
                layers = struct.unpack(">H", body[2:4])[0]
                mct = body[4]
                cs, _ = _parse_spcod(body, 5, scod & 1)
                entry = (scod, prog, layers, mct, cs)
                if tile_idx is None:
                    m.cod = entry
                else:
                    m.tile_cod[tile_idx] = entry
            elif mk == COC:
                if m.csiz < 257:
                    ci = body[0]
                    off = 1
                else:
                    ci = struct.unpack(">H", body[0:2])[0]
                    off = 2
                scoc = body[off]
                cs, _ = _parse_spcod(body, off + 1, scoc & 1)
                if tile_idx is None:
                    m.coc[ci] = cs
                else:
                    m.tile_coc.setdefault(tile_idx, {})[ci] = cs
            elif mk == QCD:
                q = _parse_sqcx(body, 0, len(body), None)
                if tile_idx is None:
                    m.qcd = q
                else:
                    m.tile_qcd[tile_idx] = q
            elif mk == QCC:
                if m.csiz < 257:
                    ci = body[0]
                    off = 1
                else:
                    ci = struct.unpack(">H", body[0:2])[0]
                    off = 2
                q = _parse_sqcx(body, off, len(body), None)
                if tile_idx is None:
                    m.qcc[ci] = q
                else:
                    m.tile_qcc.setdefault(tile_idx, {})[ci] = q
            elif mk == POC:
                raise ValueError("JPEG2000: POC progression-order changes "
                                 "are not supported")
            elif mk in (PPM, PPT):
                raise ValueError("JPEG2000: packed packet headers (PPM/PPT) "
                                 "are not supported")
            elif mk == RGN:
                raise ValueError("JPEG2000: RGN ROI shifts are not "
                                 "supported")
            # TLM/PLM/PLT/CRG/CME and others: skip
            pos += 2 + ln
        raise ValueError("JPEG2000: truncated header")

    pos, mk = parse_headers(pos, n, None)
    if m.cod is None or m.qcd is None:
        raise ValueError("JPEG2000: missing COD/QCD")

    while True:
        if mk == EOC or pos >= n:
            break
        # SOT
        if pos + 12 > n:
            raise ValueError("JPEG2000: truncated SOT")
        (mk2, lsot, isot, psot, tpsot, tnsot) = struct.unpack(
            ">HHHIBB", buf[pos:pos + 12])
        if mk2 != SOT:
            raise ValueError("JPEG2000: expected SOT")
        tp_end = pos + psot if psot else n
        if tp_end > n:
            raise ValueError("JPEG2000: tile-part overruns stream")
        hpos, hmk = parse_headers(pos + 12, tp_end, isot)
        if hmk != SOD:
            raise ValueError("JPEG2000: tile-part without SOD")
        t = tiles.setdefault(isot, Tile(isot))
        t.data.append(bytes(buf[hpos:tp_end]))
        pos = tp_end
        if pos + 2 <= n:
            (mk,) = struct.unpack(">H", buf[pos:pos + 2])
            if mk not in (SOT, EOC):
                raise ValueError(
                    f"JPEG2000: bad marker 0x{mk:04X} after tile-part")
        else:
            break
    return m, tiles


# ---------------------------------------------------------------------------
# Tile-component geometry (T.800 Annex B)
# ---------------------------------------------------------------------------

class CodeBlock:
    __slots__ = ("x0", "y0", "x1", "y1", "included", "zbp", "npasses",
                 "lblock", "segs", "seg_state")

    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.included = False
        self.zbp = 0
        self.npasses = 0
        self.lblock = 3
        self.segs = {}          # seg id -> bytearray


class PrecinctBand:
    __slots__ = ("cbs", "ncbw", "ncbh", "incl_tree", "zbp_tree")


class Band:
    __slots__ = ("orient", "x0", "y0", "x1", "y1", "eps", "mant", "gain",
                 "coefs")


class Resolution:
    __slots__ = ("r", "x0", "y0", "x1", "y1", "ppx", "ppy", "bands",
                 "precincts", "npw", "nph")


class TileComp:
    __slots__ = ("c", "cs", "quant", "x0", "y0", "x1", "y1", "resolutions")


_GAIN = {0: 0, 1: 1, 2: 1, 3: 2}


def _band_quant(quant, r, orient, nl):
    """(eps, mant) for band; derived style computes from the single pair."""
    lev = nl if r == 0 else nl - r + 1
    if quant.style == 1:
        e0, m0 = quant.steps[0]
        return e0 - nl + lev, m0
    bi = 0 if r == 0 else 3 * (r - 1) + orient
    if bi >= len(quant.steps):
        raise ValueError("JPEG2000: quantization table too short for bands")
    return quant.steps[bi]


def _build_tilecomp(m, c, cs, quant, tx0, ty0, tx1, ty1):
    tc = TileComp()
    tc.c = c
    tc.cs = cs
    tc.quant = quant
    tc.x0, tc.y0, tc.x1, tc.y1 = tx0, ty0, tx1, ty1
    nl = cs.nl
    tc.resolutions = []
    for r in range(nl + 1):
        res = Resolution()
        res.r = r
        sh = nl - r
        res.x0 = _ceil_div(tx0, 1 << sh)
        res.y0 = _ceil_div(ty0, 1 << sh)
        res.x1 = _ceil_div(tx1, 1 << sh)
        res.y1 = _ceil_div(ty1, 1 << sh)
        res.ppx, res.ppy = cs.prec_exps[r]
        res.bands = []
        if r == 0:
            bands_geo = [(0, res.x0, res.y0, res.x1, res.y1)]
        else:
            lev = nl - r + 1
            bands_geo = []
            for orient, xob, yob in ((1, 1, 0), (2, 0, 1), (3, 1, 1)):
                bx0 = _ceil_div(tx0 - (1 << (lev - 1)) * xob, 1 << lev)
                by0 = _ceil_div(ty0 - (1 << (lev - 1)) * yob, 1 << lev)
                bx1 = _ceil_div(tx1 - (1 << (lev - 1)) * xob, 1 << lev)
                by1 = _ceil_div(ty1 - (1 << (lev - 1)) * yob, 1 << lev)
                bands_geo.append((orient, bx0, by0, bx1, by1))
        for orient, bx0, by0, bx1, by1 in bands_geo:
            b = Band()
            b.orient = orient
            b.x0, b.y0, b.x1, b.y1 = bx0, by0, bx1, by1
            b.eps, b.mant = _band_quant(quant, r, orient, nl)
            b.gain = _GAIN[orient]
            w = max(bx1 - bx0, 0)
            h = max(by1 - by0, 0)
            if cs.transform == 1:
                b.coefs = np.zeros((h, w), dtype=np.int32)
            else:
                b.coefs = np.zeros((h, w), dtype=np.float64)
            res.bands.append(b)
        # precinct grid on the resolution
        if res.x1 > res.x0 and res.y1 > res.y0:
            res.npw = _ceil_div(res.x1, 1 << res.ppx) - (res.x0 >> res.ppx)
            res.nph = _ceil_div(res.y1, 1 << res.ppy) - (res.y0 >> res.ppy)
        else:
            res.npw = res.nph = 0
        shift = 0 if r == 0 else 1
        xcb_eff = min(cs.xcb, res.ppx if r == 0 else max(res.ppx - 1, 0))
        ycb_eff = min(cs.ycb, res.ppy if r == 0 else max(res.ppy - 1, 0))
        res.precincts = []
        for pj in range(res.nph):
            for pi in range(res.npw):
                # unclipped anchored precinct rect on resolution grid
                ax0 = ((res.x0 >> res.ppx) + pi) << res.ppx
                ay0 = ((res.y0 >> res.ppy) + pj) << res.ppy
                ax1 = ax0 + (1 << res.ppx)
                ay1 = ay0 + (1 << res.ppy)
                pbs = []
                for b in res.bands:
                    pb = PrecinctBand()
                    # precinct rect in band coords (code-block group)
                    gx0 = max(b.x0, ax0 >> shift)
                    gy0 = max(b.y0, ay0 >> shift)
                    gx1 = min(b.x1, ax1 >> shift)
                    gy1 = min(b.y1, ay1 >> shift)
                    if gx1 > gx0 and gy1 > gy0:
                        cw = 1 << xcb_eff
                        ch = 1 << ycb_eff
                        ci0 = gx0 // cw
                        cj0 = gy0 // ch
                        pb.ncbw = _ceil_div(gx1, cw) - ci0
                        pb.ncbh = _ceil_div(gy1, ch) - cj0
                        pb.cbs = []
                        for cj in range(pb.ncbh):
                            for ci in range(pb.ncbw):
                                cx0 = max(gx0, (ci0 + ci) * cw)
                                cy0 = max(gy0, (cj0 + cj) * ch)
                                cx1 = min(gx1, (ci0 + ci + 1) * cw)
                                cy1 = min(gy1, (cj0 + cj + 1) * ch)
                                pb.cbs.append(CodeBlock(cx0, cy0, cx1, cy1))
                        pb.incl_tree = TagTree(pb.ncbw, pb.ncbh)
                        pb.zbp_tree = TagTree(pb.ncbw, pb.ncbh)
                    else:
                        pb.ncbw = pb.ncbh = 0
                        pb.cbs = []
                        pb.incl_tree = pb.zbp_tree = None
                    pbs.append(pb)
                res.precincts.append(pbs)
        tc.resolutions.append(res)
    return tc


# ---------------------------------------------------------------------------
# Coding-pass / codeword-segment mapping (T.800 D.4, D.6)
# ---------------------------------------------------------------------------

def _pass_type(idx):
    """0 = significance, 1 = refinement, 2 = cleanup."""
    return 2 if idx == 0 else (idx - 1) % 3


def _seg_of_pass(idx, cbstyle):
    """Codeword-segment id for coding pass `idx` (0-based)."""
    if cbstyle & CB_TERMALL:
        return idx
    if cbstyle & CB_LAZY:
        if idx < 10:
            return 0
        k = idx - 10       # k%3: 0=sig, 1=ref, 2=cleanup
        return 1 + 2 * (k // 3) + (1 if k % 3 == 2 else 0)
    return 0


def _seg_last_pass(idx, cbstyle):
    """Last pass index sharing the segment of pass `idx`."""
    if cbstyle & CB_TERMALL:
        return idx
    if cbstyle & CB_LAZY:
        if idx < 10:
            return 9
        k = idx - 10
        if k % 3 == 2:
            return idx
        return 10 + 3 * (k // 3) + 1
    return 1 << 62


def _split_passes(p0, n, cbstyle):
    """Split passes [p0, p0+n) into per-segment portions."""
    out = []
    p = p0
    rem = n
    while rem > 0:
        sid = _seg_of_pass(p, cbstyle)
        last = _seg_last_pass(p, cbstyle)
        take = min(rem, last - p + 1)
        out.append((sid, take))
        p += take
        rem -= take
    return out


# ---------------------------------------------------------------------------
# Packet decoding (T.800 B.9/B.10)
# ---------------------------------------------------------------------------

class _TileStream:
    __slots__ = ("data", "pos")

    def __init__(self, parts):
        self.data = b"".join(parts)
        self.pos = 0


def _read_packet(ts, res, pidx, layer, scod, cbstyle):
    """Parse one packet at the tile-stream cursor; append codeword
    bytes to the contributing code blocks."""
    data = ts.data
    pos = ts.pos
    if pos >= len(data):
        raise ValueError("JPEG2000: bitstream ends before all packets")
    if (scod & 2) and data[pos:pos + 2] == b"\xFF\x91":
        pos += 6                         # SOP marker segment
    rdr = HeaderBitReader(data, pos)
    contribs = []
    if rdr.bit():
        for pb in res.precincts[pidx]:
            if pb.ncbw == 0:
                continue
            for ci, cb in enumerate(pb.cbs):
                x = ci % pb.ncbw
                y = ci // pb.ncbw
                if not cb.included:
                    inc = pb.incl_tree.decode(rdr, x, y, layer + 1)
                else:
                    inc = rdr.bit()
                if not inc:
                    continue
                if not cb.included:
                    cb.included = True
                    cb.zbp = pb.zbp_tree.value(rdr, x, y)
                # number of new coding passes (T.800 Table B.4)
                if rdr.bit() == 0:
                    n = 1
                elif rdr.bit() == 0:
                    n = 2
                else:
                    v = rdr.bits(2)
                    if v < 3:
                        n = 3 + v
                    else:
                        v = rdr.bits(5)
                        if v < 31:
                            n = 6 + v
                        else:
                            n = 37 + rdr.bits(7)
                while rdr.bit():
                    cb.lblock += 1
                    if cb.lblock > 64:
                        raise ValueError(
                            "JPEG2000: runaway Lblock (corrupt header)")
                portions = _split_passes(cb.npasses, n, cbstyle)
                lens = []
                for sid, np_ in portions:
                    nbits = cb.lblock + int(math.floor(math.log2(np_)))
                    lens.append((sid, rdr.bits(nbits)))
                cb.npasses += n
                contribs.append((cb, n, lens))
    pos = rdr.align()
    if scod & 4:
        if data[pos:pos + 2] != b"\xFF\x92":
            raise ValueError("JPEG2000: missing EPH marker")
        pos += 2
    for cb, n, lens in contribs:
        for sid, nbytes in lens:
            if pos + nbytes > len(data):
                raise ValueError("JPEG2000: packet body overruns tile data")
            cb.segs.setdefault(sid, bytearray()).extend(
                data[pos:pos + nbytes])
            pos += nbytes
    ts.pos = pos


def _packet_sequence(m, tcs, tx0, ty0, tx1, ty1):
    """Yield (layer, res_index, comp_index, precinct_index) in the
    tile's progression order (T.800 B.12). Subsampling is 1."""
    prog = m.prog
    layers = m.layers
    ncomp = len(tcs)
    maxres = max(tc.cs.nl for tc in tcs) + 1
    if prog == 0:       # LRCP
        for l in range(layers):
            for r in range(maxres):
                for c in range(ncomp):
                    if r > tcs[c].cs.nl:
                        continue
                    res = tcs[c].resolutions[r]
                    for p in range(res.npw * res.nph):
                        yield (l, r, c, p)
        return
    if prog == 1:       # RLCP
        for r in range(maxres):
            for l in range(layers):
                for c in range(ncomp):
                    if r > tcs[c].cs.nl:
                        continue
                    res = tcs[c].resolutions[r]
                    for p in range(res.npw * res.nph):
                        yield (l, r, c, p)
        return
    if prog not in (2, 3, 4):
        raise ValueError(f"JPEG2000: unknown progression order {prog}")
    # positional orders: compute each precinct's reference-grid anchor
    events = []     # (c, r, p, x, y)
    for c, tc in enumerate(tcs):
        nl = tc.cs.nl
        for r, res in enumerate(tc.resolutions):
            sh = nl - r
            for pj in range(res.nph):
                ay = (((res.y0 >> res.ppy) + pj) << res.ppy) << sh
                y = max(ay, ty0)
                for pi in range(res.npw):
                    ax = (((res.x0 >> res.ppx) + pi) << res.ppx) << sh
                    x = max(ax, tx0)
                    events.append((c, r, pj * res.npw + pi, x, y))
    if prog == 2:       # RPCL
        events.sort(key=lambda e: (e[1], e[4], e[3], e[0]))
    elif prog == 3:     # PCRL
        events.sort(key=lambda e: (e[4], e[3], e[0], e[1]))
    else:               # CPRL
        events.sort(key=lambda e: (e[0], e[4], e[3], e[1]))
    for c, r, p, x, y in events:
        for l in range(layers):
            yield (l, r, c, p)


# ---------------------------------------------------------------------------
# EBCOT Tier-1 code-block decoding (T.800 Annex D)
# ---------------------------------------------------------------------------

def _build_sig_luts():
    """Significance context from (h, v, d) neighbour counts
    (T.800 Table D.1), per band orientation."""
    def ll_lh(h, v, d):
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        if d >= 2:
            return 2
        return d        # 1 or 0
    def hh(h, v, d):
        hv = h + v
        if d >= 3:
            return 8
        if d == 2:
            return 7 if hv >= 1 else 6
        if d == 1:
            return 5 if hv >= 2 else (4 if hv == 1 else 3)
        return 2 if hv >= 2 else hv
    lut = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                lut[(0, h, v, d)] = ll_lh(h, v, d)     # LL
                lut[(2, h, v, d)] = ll_lh(h, v, d)     # LH
                lut[(1, h, v, d)] = ll_lh(v, h, d)     # HL: h/v swapped
                lut[(3, h, v, d)] = hh(h, v, d)        # HH
    return lut


_SIG_LUT = _build_sig_luts()

_RECON_MODE = "half"

# sign context (T.800 Table D.2): (hc+1, vc+1) -> (context, xor bit)
_SIGN_LUT = {
    (2, 2): (13, 0), (2, 1): (12, 0), (2, 0): (11, 0),
    (1, 2): (10, 0), (1, 1): (9, 0), (1, 0): (10, 1),
    (0, 2): (11, 1), (0, 1): (12, 1), (0, 0): (13, 1),
}


def _t1_decode(cb, orient, mb, cbstyle):
    """Decode one code block; returns (mag int64 array, sign array) in
    (h, w) layout. Truncation midpoint rounding (half-LSB at the last
    decoded plane, T.800 E.1 r=0.5) is applied here via ``lastp``."""
    w = cb.x1 - cb.x0
    h = cb.y1 - cb.y0
    numbps = mb - cb.zbp
    mag = np.zeros((h, w), dtype=np.int64)
    sgn = np.zeros((h, w), dtype=np.uint8)
    if cb.npasses == 0 or numbps <= 0 or w <= 0 or h <= 0:
        return mag, sgn
    # flat python lists for scalar speed
    size = w * h
    sig = [0] * size
    vis = [0] * size
    ref = [0] * size
    mg = [0] * size
    sg = [0] * size
    lastp = [0] * size
    vsc = bool(cbstyle & CB_VSC)
    lut = _SIG_LUT

    def sig_at(x, y, ystripe):
        if x < 0 or x >= w or y < 0 or y >= h:
            return 0
        if vsc and (y >> 2) > ystripe:
            return 0
        return sig[y * w + x]

    def sig_ctx(x, y):
        ys = y >> 2
        hh_ = sig_at(x - 1, y, ys) + sig_at(x + 1, y, ys)
        vv = sig_at(x, y - 1, ys) + sig_at(x, y + 1, ys)
        dd = (sig_at(x - 1, y - 1, ys) + sig_at(x + 1, y - 1, ys)
              + sig_at(x - 1, y + 1, ys) + sig_at(x + 1, y + 1, ys))
        return lut[(orient, hh_, vv, dd)]

    def contrib(x, y, ystripe):
        if x < 0 or x >= w or y < 0 or y >= h:
            return 0
        if vsc and (y >> 2) > ystripe:
            return 0
        i = y * w + x
        if not sig[i]:
            return 0
        return -1 if sg[i] else 1

    def sign_ctx(x, y):
        ys = y >> 2
        hc = contrib(x - 1, y, ys) + contrib(x + 1, y, ys)
        hc = max(-1, min(1, hc))
        vc = contrib(x, y - 1, ys) + contrib(x, y + 1, ys)
        vc = max(-1, min(1, vc))
        return _SIGN_LUT[(hc + 1, vc + 1)]

    ctx_idx, ctx_mps = _initial_contexts()
    seg_sorted = sorted(cb.segs.items())
    seg_data = {sid: bytes(b) for sid, b in seg_sorted}
    mq = None
    raw = None
    cur_seg = -1
    plane = numbps - 1
    lazy = bool(cbstyle & CB_LAZY)

    npasses = cb.npasses
    for pidx in range(npasses):
        ptype = _pass_type(pidx)
        is_raw = lazy and pidx >= 10 and ptype != 2
        sid = _seg_of_pass(pidx, cbstyle)
        if sid != cur_seg:
            data = seg_data.get(sid, b"")
            if is_raw:
                raw = RawDecoder(data)
                mq = None
            else:
                mq = MQDecoder(data, ctx_idx, ctx_mps)
                raw = None
            cur_seg = sid
        if (cbstyle & CB_RESET) and not is_raw:
            ni, nm = _initial_contexts()
            ctx_idx[:] = ni
            ctx_mps[:] = nm
        bit = 1 << plane

        if ptype == 0:          # significance propagation
            for y0 in range(0, h, 4):
                ylim = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, ylim):
                        i = y * w + x
                        if sig[i]:
                            continue
                        cx = sig_ctx(x, y)
                        if cx == 0:
                            continue
                        vis[i] = 1
                        d = raw.bit() if is_raw else mq.decode(cx)
                        if d:
                            if is_raw:
                                s = raw.bit()
                            else:
                                sctx, xorbit = sign_ctx(x, y)
                                s = mq.decode(sctx) ^ xorbit
                            sig[i] = 1
                            sg[i] = s
                            mg[i] |= bit
                            lastp[i] = plane
        elif ptype == 1:        # magnitude refinement
            for y0 in range(0, h, 4):
                ylim = min(y0 + 4, h)
                for x in range(w):
                    for y in range(y0, ylim):
                        i = y * w + x
                        if not sig[i] or vis[i]:
                            continue
                        if is_raw:
                            d = raw.bit()
                        else:
                            if ref[i]:
                                cx = 16
                            else:
                                ys = y >> 2
                                any_sig = (
                                    sig_at(x - 1, y, ys) + sig_at(x + 1, y, ys)
                                    + sig_at(x, y - 1, ys)
                                    + sig_at(x, y + 1, ys)
                                    + sig_at(x - 1, y - 1, ys)
                                    + sig_at(x + 1, y - 1, ys)
                                    + sig_at(x - 1, y + 1, ys)
                                    + sig_at(x + 1, y + 1, ys))
                                cx = 15 if any_sig else 14
                            d = mq.decode(cx)
                        if d:
                            mg[i] |= bit
                        lastp[i] = plane
                        ref[i] = 1
        else:                   # cleanup
            for y0 in range(0, h, 4):
                ylim = min(y0 + 4, h)
                for x in range(w):
                    y = y0
                    # run-length mode eligibility
                    if ylim - y0 == 4:
                        rl_ok = True
                        for yy in range(y0, ylim):
                            i = yy * w + x
                            if sig[i] or vis[i] or sig_ctx(x, yy) != 0:
                                rl_ok = False
                                break
                        if rl_ok:
                            if mq.decode(CTX_RL) == 0:
                                continue
                            rr = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                            y = y0 + rr
                            i = y * w + x
                            sctx, xorbit = sign_ctx(x, y)
                            s = mq.decode(sctx) ^ xorbit
                            sig[i] = 1
                            sg[i] = s
                            mg[i] |= bit
                            lastp[i] = plane
                            y += 1
                    while y < ylim:
                        i = y * w + x
                        if not sig[i] and not vis[i]:
                            cx = sig_ctx(x, y)
                            if mq.decode(cx):
                                sctx, xorbit = sign_ctx(x, y)
                                s = mq.decode(sctx) ^ xorbit
                                sig[i] = 1
                                sg[i] = s
                                mg[i] |= bit
                                lastp[i] = plane
                        y += 1
            if cbstyle & CB_SEGSYM:
                v = 0
                for _ in range(4):
                    v = (v << 1) | mq.decode(CTX_UNI)
                if v != 0xA:
                    raise ValueError(
                        "JPEG2000: segmentation symbol mismatch "
                        "(corrupt code block)")
            for i in range(size):
                vis[i] = 0
            plane -= 1

    # per-coefficient midpoint reconstruction (T.800 E.1 leaves the
    # in-interval choice free; OpenJPEG centres at the last touched
    # plane, which this matches): add half the last coded plane's LSB
    mode = _RECON_MODE
    if mode != "none":
        for i in range(size):
            if mg[i] and lastp[i] > 0:
                mg[i] += 1 << (lastp[i] - 1)
    mag[:] = np.asarray(mg, dtype=np.int64).reshape(h, w)
    sgn[:] = np.asarray(sg, dtype=np.uint8).reshape(h, w)
    return mag, sgn


# ---------------------------------------------------------------------------
# Inverse DWT (T.800 Annex F)
# ---------------------------------------------------------------------------

_K97 = 1.230174104914001
_KH_INV = 1.0 / _K97   # inverse high-pass scale (T.800 F.4.8.2 step 2;
                       # validated against OpenJPEG decode of our streams)
_A97 = 1.586134342059924
_B97 = 0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971


def _reflect(k, n):
    if n == 1:
        return 0
    period = 2 * (n - 1)
    k %= period
    return k if k < n else period - k


def _sr1d(a, i0, i1, irreversible):
    """1D synthesis on the last axis; coords i0..i1-1 (T.800 F.3.8)."""
    n = i1 - i0
    if n == 1:
        if i0 % 2 == 1:
            if irreversible:
                return a * _K97
            return a >> 1 if a.dtype.kind == "i" else a / 2
        return a
    shape = a.shape[:-1] + (n + 4,)
    ext = np.empty(shape, dtype=a.dtype)
    ext[..., 2:2 + n] = a

    def refresh_pads():
        ext[..., 1] = ext[..., 2 + _reflect(-1, n)]
        ext[..., 0] = ext[..., 2 + _reflect(-2, n)]
        ext[..., 2 + n] = ext[..., 2 + _reflect(n, n)]
        ext[..., 3 + n] = ext[..., 2 + _reflect(n + 1, n)]

    refresh_pads()
    # extended-index helpers: global coord g -> ext index g - i0 + 2
    ev = np.arange(i0 + (i0 & 1), i1, 2) - i0 + 2      # even coords
    od = np.arange(i0 + 1 - (i0 & 1), i1, 2) - i0 + 2  # odd coords
    if not irreversible:
        ext[..., ev] -= (ext[..., ev - 1] + ext[..., ev + 1] + 2) >> 2
        refresh_pads()
        ext[..., od] += (ext[..., od - 1] + ext[..., od + 1]) >> 1
    else:
        # T.800 F.4.8.2: the spec's alpha/beta are negative; with the
        # positive constants here the last two lifting steps ADD
        ext[..., ev] *= _K97
        ext[..., od] *= _KH_INV
        refresh_pads()
        ext[..., ev] -= _D97 * (ext[..., ev - 1] + ext[..., ev + 1])
        refresh_pads()
        ext[..., od] -= _G97 * (ext[..., od - 1] + ext[..., od + 1])
        refresh_pads()
        ext[..., ev] += _B97 * (ext[..., ev - 1] + ext[..., ev + 1])
        refresh_pads()
        ext[..., od] += _A97 * (ext[..., od - 1] + ext[..., od + 1])
    return ext[..., 2:2 + n]


def _idwt_level(ll, hl, lh, hh, ox0, oy0, ox1, oy1, irreversible):
    """One 2D synthesis level: interleave + HOR then VER 1D."""
    oh, ow = oy1 - oy0, ox1 - ox0
    a = np.zeros((oh, ow), dtype=ll.dtype)
    ye = 0 if oy0 % 2 == 0 else 1
    xe = 0 if ox0 % 2 == 0 else 1
    yo = 1 - ye
    xo = 1 - xe
    if ll.size:
        a[ye::2, xe::2] = ll
    if hl.size:
        a[ye::2, xo::2] = hl
    if lh.size:
        a[yo::2, xe::2] = lh
    if hh.size:
        a[yo::2, xo::2] = hh
    a = _sr1d(a, ox0, ox1, irreversible)
    a = _sr1d(np.ascontiguousarray(a.T), oy0, oy1, irreversible)
    return np.ascontiguousarray(a.T)


def _dequant_band(band, mag, sgn, prec, irreversible):
    """Sign-magnitude -> coefficient values (T.800 E.1); midpoint
    rounding for truncated code blocks already applied in Tier-1."""
    val = np.where(sgn.astype(bool), -mag, mag)
    if not irreversible:
        return val.astype(np.int32)
    rb = prec + band.gain
    delta = (2.0 ** (rb - band.eps)) * (1.0 + band.mant / 2048.0)
    return val.astype(np.float64) * delta


# ---------------------------------------------------------------------------
# Top-level decode
# ---------------------------------------------------------------------------

def _decode_tile(m, tile, p, q):
    ntx = _ceil_div(m.xs - m.xto, m.xts)
    tx0 = max(m.xto + p * m.xts, m.xo)
    ty0 = max(m.yto + q * m.yts, m.yo)
    tx1 = min(m.xto + (p + 1) * m.xts, m.xs)
    ty1 = min(m.yto + (q + 1) * m.yts, m.ys)
    tidx = tile.idx

    scod, prog, layers, mct, cs0 = m.tile_cod.get(tidx, m.cod)
    msave = (m.prog, m.layers, m.mct)
    m.prog, m.layers, m.mct = prog, layers, mct
    tcs = []
    for c in range(m.csiz):
        cs = m.tile_coc.get(tidx, {}).get(c) or m.coc.get(c) or cs0
        q_ = m.tile_qcc.get(tidx, {}).get(c) or m.qcc.get(c) \
            or m.tile_qcd.get(tidx) or m.qcd
        if cs.transform == 1 and q_.style != 0:
            raise ValueError("JPEG2000: 5/3 transform requires "
                             "no-quantization style")
        tcs.append(_build_tilecomp(m, c, cs, q_, tx0, ty0, tx1, ty1))

    ts = _TileStream(tile.data)
    for (l, r, c, pidx) in _packet_sequence(m, tcs, tx0, ty0, tx1, ty1):
        res = tcs[c].resolutions[r]
        if res.npw * res.nph == 0:
            continue
        _read_packet(ts, res, pidx, l, scod, tcs[c].cs.cbstyle)

    planes = []
    for c, tc in enumerate(tcs):
        irr = tc.cs.transform == 0
        prec = m.comp_prec[c]
        for res in tc.resolutions:
            for bi, band in enumerate(res.bands):
                for pbs in res.precincts:
                    pb = pbs[bi]
                    for cb in pb.cbs:
                        mb = tc.quant.guard + band.eps - 1
                        mag, sgn = _t1_decode(
                            cb, band.orient, mb, tc.cs.cbstyle)
                        vals = _dequant_band(band, mag, sgn, prec, irr)
                        band.coefs[cb.y0 - band.y0:cb.y1 - band.y0,
                                   cb.x0 - band.x0:cb.x1 - band.x0] = vals
        # synthesis
        nl = tc.cs.nl
        cur = tc.resolutions[0].bands[0].coefs
        for r in range(1, nl + 1):
            res = tc.resolutions[r]
            hl, lh, hh = (res.bands[0].coefs, res.bands[1].coefs,
                          res.bands[2].coefs)
            cur = _idwt_level(cur, hl, lh, hh, res.x0, res.y0,
                              res.x1, res.y1, irr)
        planes.append(cur)

    # multi-component transform
    if m.mct and len(planes) >= 3:
        # T.800: components 0..2 must share the wavelet transform
        # under MCT (RCT pairs with 5/3, ICT with 9/7)
        if any(tcs[c].cs.transform != tcs[0].cs.transform
               for c in (1, 2)):
            raise ValueError("JPEG2000: MCT with mixed per-component "
                             "wavelet transforms")
        y0_, cb_, cr_ = planes[0], planes[1], planes[2]
        if tcs[0].cs.transform == 1:        # RCT (reversible)
            g = y0_ - ((cb_ + cr_) >> 2)
            r_ = cr_ + g
            b_ = cb_ + g
        else:                               # ICT
            r_ = y0_ + 1.402 * cr_
            g = y0_ - 0.344136 * cb_ - 0.714136 * cr_
            b_ = y0_ + 1.772 * cb_
        planes[0], planes[1], planes[2] = r_, g, b_

    out = []
    for c, plane in enumerate(planes):
        prec = m.comp_prec[c]
        signed = m.comp_signed[c]
        if plane.dtype.kind == "f":
            plane = np.rint(plane)
        plane = plane.astype(np.int64)
        if signed:
            lo, hi = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
        else:
            plane = plane + (1 << (prec - 1))
            lo, hi = 0, (1 << prec) - 1
        out.append(np.clip(plane, lo, hi))
    m.prog, m.layers, m.mct = msave
    return (tx0, ty0, tx1, ty1), out


def decode_j2k(buf):
    """Decode a JPEG 2000 codestream (raw or in a JP2 container).

    Returns (rows, cols) for single-component images or
    (rows, cols, ncomp); dtype u1/i1/u2/i2 from SIZ precision and
    signedness (components above 16 bits return int32).

    Typed-error contract: every malformed input raises ValueError
    (the ingest fuzz program relies on this)."""
    try:
        return _decode_j2k_inner(buf)
    except ValueError:
        raise
    except (IndexError, KeyError, TypeError, ZeroDivisionError,
            OverflowError, struct.error) as e:
        raise ValueError(f"JPEG2000: malformed codestream ({e})") from e


def _decode_j2k_inner(buf):
    buf = _find_codestream(bytes(buf))
    m, tiles = _parse_codestream(buf)
    if not tiles:
        raise ValueError("JPEG2000: no tile data")
    w = m.xs - m.xo
    h = m.ys - m.yo
    if w <= 0 or h <= 0:
        raise ValueError("JPEG2000: empty image region")
    if w * h > (1 << 30):
        raise ValueError("JPEG2000: image too large")
    maxprec = max(m.comp_prec)
    anysigned = any(m.comp_signed)
    if maxprec <= 8:
        dtype = np.int8 if anysigned else np.uint8
    elif maxprec <= 16:
        dtype = np.int16 if anysigned else np.uint16
    else:
        dtype = np.int32
    img = np.zeros((h, w, m.csiz), dtype=dtype)
    ntx = _ceil_div(m.xs - m.xto, m.xts)
    nty = _ceil_div(m.ys - m.yto, m.yts)
    for tidx, tile in sorted(tiles.items()):
        if tidx >= ntx * nty:
            raise ValueError("JPEG2000: tile index out of range")
        p, q = tidx % ntx, tidx // ntx
        (tx0, ty0, tx1, ty1), planes = _decode_tile(m, tile, p, q)
        for c, plane in enumerate(planes):
            img[ty0 - m.yo:ty1 - m.yo, tx0 - m.xo:tx1 - m.xo, c] = \
                plane.astype(dtype)
    if m.csiz == 1:
        return img[:, :, 0]
    return img
