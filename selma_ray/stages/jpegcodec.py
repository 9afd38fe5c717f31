"""Pure-stdlib baseline JPEG codec (decode + scoped encode).

No image library ships in this container, but baseline sequential JPEG
(ITU-T T.81) is decodable with stdlib + numpy the same way PNG was:
marker parse -> canonical Huffman entropy decode -> dequantize ->
dezigzag -> vectorized 8x8 IDCT (one einsum over all blocks of a
component) -> chroma upsample -> YCbCr->RGB. That covers the dominant
real-world web image payload; out-of-scope variants raise
NotImplementedError so `DecodeImageFeatures` can fall through to its
documented fake under ``fake=True``.

Scope (documented, not hidden):
- decode: baseline + extended-sequential DCT (SOF0/SOF1) AND
  progressive DCT (SOF2: spectral selection + successive
  approximation, T.81 G.1.2), 8-bit, grayscale / YCbCr / Adobe APP14
  CMYK+YCCK (1, 3 or 4 components; 4-component output converts to RGB
  under the Adobe inverted-ink convention), any sampling factors up
  to 4, restart markers, 16-bit quant tables, and 12-bit
  extended-sequential (SOF1; samples scale to the 8-bit output
  domain at assembly). Arithmetic coding, hierarchical, and 12-bit
  progressive raise NotImplementedError.
- encode (for round-trip tests + sinks): 8-bit gray / RGB, baseline,
  Annex K quantization tables with libjpeg quality scaling, Annex K
  Huffman tables, 4:4:4 or 4:2:0 chroma, optional restart interval;
  plus scoped progressive, Adobe CMYK/YCCK, and 12-bit SOF1
  (precision=12) encoders (test-vector generators) whose output must
  decode bit-identically to the equivalent baseline/grayscale
  encodings.

All algorithms and constant tables are from the public JPEG standard
(ITU-T T.81 Annex K) — reference intent only; no library code.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants --------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
_UNZIG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 quantization tables (zigzag order applied later;
# these are in natural row-major order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II basis: C[u, k] = a(u) cos((2k+1) u pi / 16)
_C = np.zeros((8, 8), np.float64)
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _k in range(8):
        _C[_u, _k] = _a * np.cos((2 * _k + 1) * _u * np.pi / 16.0)


def sniff_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# -- Huffman ---------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) from BITS/HUFFVAL, T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]):
    """16-bit-prefix lookup: window -> (symbol, code length). O(1)
    decode per symbol instead of bit-by-bit tree walking."""
    sym = np.full(1 << 16, -1, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    for s, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


class _BitReader:
    """MSB-first bit reader over UNSTUFFED scan bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int):
        while self.n < need:
            # past-end pad with 1-bits (T.81 F.1.2.3 pads with 1s)
            b = self.data[self.i] if self.i < len(self.data) else 0xFF
            self.i += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int):
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map s magnitude bits to a signed coefficient."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# -- decoder ---------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc", "ac", "pred", "blocks")


def _split_scan(data: bytes, start: int):
    """Entropy segments split at RST markers; returns (segments,
    index of the byte after the scan)."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker: end of scan
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """bytes -> (h, w, channels) uint8 (channels 1 or 3). Raises
    ValueError on corrupt/truncated data, NotImplementedError on
    out-of-scope variants — never struct.error/IndexError (the stage
    fakes catch codec errors by those two types)."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt JPEG: truncated or malformed "
                         f"({type(e).__name__})") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if not sniff_jpeg(payload):
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[_Component] = []
    h = w = 0
    restart = 0
    progressive = False
    precision = 8
    adobe_transform = None
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        m = payload[i + 1]
        i += 2
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            continue
        if m == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[i:i + 2])
        seg = payload[i + 2:i + seglen]
        if m == 0xEE and seg[:5] == b"Adobe":    # APP14 (color xform)
            adobe_transform = seg[11] if len(seg) > 11 else 0
        elif m == 0xDB:                          # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2").astype(
                        np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(
                        np.int64)
                    p += 64
                qt[tid] = tbl                    # zigzag order
        elif m == 0xC4:                          # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17:p + 17 + cnt])
                huff[(cls, tid)] = _decode_lut(bits, vals)
                p += 17 + cnt
        elif m in (0xC0, 0xC1, 0xC2):            # SOF0/1 seq, SOF2 prog
            progressive = m == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec == 12:
                # T.81 allows 12-bit only for extended-seq/progressive;
                # scope here: SOF1 (the Huffman/IDCT machinery is
                # precision-agnostic; samples scale to 8 bits at
                # assembly). 12-bit progressive stays out of scope.
                if m != 0xC1:
                    raise NotImplementedError(
                        "12-bit JPEG supported only for "
                        "extended-sequential (SOF1)")
            elif prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG not supported (8/12 only)")
            precision = prec
            if nc not in (1, 3, 4):
                raise NotImplementedError(
                    f"{nc}-component JPEG not supported")
            comps = []
            for c in range(nc):
                comp = _Component()
                comp.cid = seg[6 + 3 * c]
                comp.h = seg[7 + 3 * c] >> 4
                comp.v = seg[7 + 3 * c] & 15
                comp.tq = seg[8 + 3 * c]
                comp.pred = 0
                comp.blocks = None
                comps.append(comp)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential/progressive JPEG "
                "(SOF0/SOF1/SOF2) is supported")
        elif m == 0xDD:                          # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:                          # SOS
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            order = []
            for s in range(ns):
                c = by_id[seg[1 + 2 * s]]
                c.dc = huff.get((0, seg[2 + 2 * s] >> 4))
                c.ac = huff.get((1, seg[2 + 2 * s] & 15))
                order.append(c)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            segs, i = _split_scan(payload, i + seglen)
            if progressive:
                _decode_scan_progressive(segs, order, comps, h, w,
                                         restart, ss, se, ah, al)
            else:
                if any(c.dc is None or c.ac is None for c in order):
                    raise ValueError(
                        "corrupt JPEG: scan references missing "
                        "Huffman table")
                _decode_scan(segs, order, comps, h, w, restart)
            continue
        i += seglen
    if not comps or comps[0].blocks is None:
        raise ValueError("corrupt JPEG: no decoded scan")
    return _assemble(comps, qt, h, w, adobe_transform, precision)


def _decode_scan(segs, order, comps, h, w, restart):
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    for c in comps:
        c.blocks = np.zeros((mcuy * c.v, mcux * c.h, 64), np.int64)
        c.pred = 0
    si = 0
    rd = _BitReader(segs[0])
    for mi in range(n_mcu):
        if restart and mi and mi % restart == 0:
            si += 1
            if si >= len(segs):
                raise ValueError("corrupt JPEG: missing restart segment")
            rd = _BitReader(segs[si])
            for c in comps:
                c.pred = 0
        my, mx = divmod(mi, mcux)
        for c in order:
            for by in range(c.v):
                for bx in range(c.h):
                    blk = _decode_block(rd, c)
                    c.blocks[my * c.v + by, mx * c.h + bx] = blk


def _decode_block(rd: _BitReader, c: _Component) -> np.ndarray:
    coef = np.zeros(64, np.int64)
    dsym, dlen = c.dc
    win = rd.peek16()
    s = int(dsym[win])
    if s < 0:
        raise ValueError("corrupt JPEG: bad DC code")
    rd.skip(int(dlen[win]))
    diff = _extend(rd.read(s), s) if s else 0
    c.pred += diff
    coef[0] = c.pred
    asym, alen = c.ac
    k = 1
    while k < 64:
        win = rd.peek16()
        sym = int(asym[win])
        if sym < 0:
            raise ValueError("corrupt JPEG: bad AC code")
        rd.skip(int(alen[win]))
        if sym == 0x00:
            break
        if sym == 0xF0:
            k += 16
            continue
        k += sym >> 4
        size = sym & 15
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        coef[k] = _extend(rd.read(size), size)
        k += 1
    return coef


# -- progressive scans (T.81 G.1.2: spectral selection + successive
# approximation, Huffman entropy only) --------------------------------------


def _huff_symbol(rd: _BitReader, table) -> int:
    if table is None:
        raise ValueError("corrupt JPEG: scan references missing "
                         "Huffman table")
    sym_lut, len_lut = table
    win = rd.peek16()
    s = int(sym_lut[win])
    if s < 0:
        raise ValueError("corrupt JPEG: bad Huffman code")
    rd.skip(int(len_lut[win]))
    return s


def _dc_first_block(rd: _BitReader, c: _Component, blk, al: int):
    """DC first scan (Ss=0, Ah=0): baseline DC decode of the
    point-transformed value, stored shifted left by Al."""
    s = _huff_symbol(rd, c.dc)
    diff = _extend(rd.read(s), s) if s else 0
    c.pred += diff
    blk[0] = c.pred << al


def _dc_refine_block(rd: _BitReader, blk, al: int):
    """DC refinement (Ss=0, Ah>0): one raw bit per block appended at
    position Al (two's-complement OR is exact for the negatives)."""
    if rd.read(1):
        blk[0] = int(blk[0]) | (1 << al)


def _ac_first_block(rd: _BitReader, c: _Component, blk,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """AC first scan over band [Ss, Se]: baseline run/size coding plus
    EOBn run codes (r < 15, SSSS = 0 -> 2^r + extra end-of-bands).
    Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _huff_symbol(rd, c.ac)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r == 15:                    # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC run past band end")
        blk[k] = _extend(rd.read(s), s) << al
        k += 1
    return 0


def _refine_nonzero(rd: _BitReader, blk, k: int, se: int, p1: int):
    """Append correction bits to every nonzero-history coefficient in
    [k, Se] (the EOB-run tail of a refinement block)."""
    while k <= se:
        v = int(blk[k])
        if v != 0 and rd.read(1) and (v & p1) == 0:
            blk[k] = v + (p1 if v > 0 else -p1)
        k += 1


def _ac_refine_block(rd: _BitReader, c: _Component, blk,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement (Ah > 0): newly
    significant coefficients arrive as run/1 codes whose run counts
    ZERO-HISTORY positions only; every nonzero-history coefficient
    passed over (and every one in an EOB-run tail) consumes one
    correction bit. T.81 G.1.2.3."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _huff_symbol(rd, c.ac)
            r, s = sym >> 4, sym & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: refinement magnitude > 1")
                newval = p1 if rd.read(1) else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += rd.read(r)
                break
            # advance past r zero-history positions, refining nonzero
            # ones on the way (ZRL: r=15 consumes 16 zero positions
            # via the trailing k += 1)
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if rd.read(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        _refine_nonzero(rd, blk, k, se, p1)
        return eobrun - 1
    return 0


def _decode_scan_progressive(segs, order, comps, h, w, restart,
                             ss, se, ah, al):
    """One progressive scan: interleaved MCU order when the scan lists
    several components (DC scans only), otherwise the single
    component's own ceil(dim/8) block raster (T.81 A.2.2 — sampling
    factors don't apply to non-interleaved scans). Coefficient arrays
    persist across scans on the components."""
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: progressive DC scan with "
                         "Se != 0 (baseline stream under SOF2?)")
    if ss > se or se > 63:
        raise ValueError("corrupt JPEG: bad spectral band")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        if c.blocks is None:
            c.blocks = np.zeros((mcuy * c.v, mcux * c.h, 64), np.int64)
    for c in order:
        c.pred = 0
    if ss > 0 and len(order) != 1:
        raise ValueError("corrupt JPEG: interleaved AC scan")
    si = 0
    rd = _BitReader(segs[0])
    eobrun = 0
    if ss == 0 and len(order) > 1:
        for mi in range(mcux * mcuy):
            if restart and mi and mi % restart == 0:
                si += 1
                if si >= len(segs):
                    raise ValueError(
                        "corrupt JPEG: missing restart segment")
                rd = _BitReader(segs[si])
                for c in order:
                    c.pred = 0
            my, mx = divmod(mi, mcux)
            for c in order:
                for by in range(c.v):
                    for bx in range(c.h):
                        blk = c.blocks[my * c.v + by, mx * c.h + bx]
                        if ah == 0:
                            _dc_first_block(rd, c, blk, al)
                        else:
                            _dc_refine_block(rd, blk, al)
        return
    c = order[0]
    bw = (-(-(w * c.h) // hmax) + 7) // 8
    bh = (-(-(h * c.v) // vmax) + 7) // 8
    for bi in range(bw * bh):
        if restart and bi and bi % restart == 0:
            si += 1
            if si >= len(segs):
                raise ValueError("corrupt JPEG: missing restart segment")
            rd = _BitReader(segs[si])
            c.pred = 0
            eobrun = 0
        by, bx = divmod(bi, bw)
        blk = c.blocks[by, bx]
        if ss == 0:
            if ah == 0:
                _dc_first_block(rd, c, blk, al)
            else:
                _dc_refine_block(rd, blk, al)
        elif ah == 0:
            eobrun = _ac_first_block(rd, c, blk, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(rd, c, blk, ss, se, al, eobrun)


def _ycc_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return r, g, b


def _assemble(comps, qt, h, w, adobe_transform=None,
              precision: int = 8) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        q = qt[c.tq]                      # zigzag order
        by, bx, _ = c.blocks.shape
        deq = (c.blocks * q[None, None, :])[:, :, _UNZIG] \
            .reshape(by, bx, 8, 8).astype(np.float64)
        # IDCT for every block at once: x = C^T X C; level shift is
        # 2^(P-1), then 12-bit samples scale into the 8-bit domain
        # (/16) so every downstream color path is precision-blind
        pix = np.einsum("ur,yxuv,vs->yxrs", _C, deq, _C,
                        optimize=True) + float(1 << (precision - 1))
        if precision != 8:
            pix /= float(1 << (precision - 8))
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # nearest-neighbor upsample to full grid
        plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0),
                          hmax // c.h, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(planes) == 4:
        # Adobe CMYK/YCCK (APP14): stored samples follow the Adobe
        # inverted-ink convention (sample = 255 - ink), so
        # channel * K / 255 IS the additive value. transform 2 (YCCK)
        # carries the inverted CMY through the YCbCr transform first;
        # transform 0/absent is direct (inverted) CMYK. Planes round
        # to uint8 BEFORE combining so each equals the grayscale
        # decode of the same coefficients (the bit-exact test hook).
        if adobe_transform == 2:
            sc, sm, sy = _ycc_to_rgb(*planes[:3])
        else:
            sc, sm, sy = planes[:3]
        q8 = [np.clip(np.round(p), 0, 255).astype(np.float64)
              for p in (sc, sm, sy, planes[3])]
        rgb = np.stack([q8[0] * q8[3] / 255.0,
                        q8[1] * q8[3] / 255.0,
                        q8[2] * q8[3] / 255.0], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    r, g, b = _ycc_to_rgb(*planes)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder (scoped: tests + sinks) ---------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)        # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)   # pad with 1-bits


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (H/8, W/8, 8, 8) DCT."""
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return np.einsum("ur,yxrs,vs->yxuv", _C, blocks, _C, optimize=True)


def _encode_plane(wr, blocks_q: np.ndarray, dc_codes, ac_codes,
                  order: list[tuple[int, int]], pred: int) -> int:
    """Entropy-encode zigzagged quantized blocks in the given
    (by, bx) order; returns the new DC predictor."""
    for by, bx in order:
        z = blocks_q[by, bx]
        diff = int(z[0]) - pred
        pred = int(z[0])
        s = int(abs(diff)).bit_length()
        code, ln = dc_codes[s]
        wr.write(code, ln)
        if s:
            wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(z[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                wr.write(code, ln)
                run -= 16
            s = int(abs(v)).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            wr.write(code, ln)
            wr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]
            wr.write(code, ln)
    return pred


def _prepare_planes(img: np.ndarray, quality: int, subsample):
    """Shared encoder front half: color transform, optional chroma
    subsampling, pad, forward DCT, quantize, zigzag. Returns
    (prepared zz-blocks per component, samp, ch, h, w, ql, qc)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg takes 1- or 3-channel uint8")
    x = img.astype(np.float64)
    if ch == 3:
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    else:
        planes = [x[:, :, 0]]
        subsample = False
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    def pad_to(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
        ph = (-p.shape[0]) % mh
        pw = (-p.shape[1]) % mw
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    if subsample is True:
        samp = (2, 2)
    elif subsample:
        samp = (int(subsample[0]), int(subsample[1]))
        if samp[0] not in (1, 2) or samp[1] not in (1, 2):
            raise ValueError("sampling factors must be 1 or 2")
    else:
        samp = (1, 1)
    sh, sv = samp
    prepared = []
    for ci, p in enumerate(planes):
        if ci == 0:
            p = pad_to(p, 8 * sv, 8 * sh)
        else:
            if samp != (1, 1):
                p = pad_to(p, 8 * sv, 8 * sh)   # align to luma MCU grid
                p = p.reshape(p.shape[0] // sv, sv,
                              p.shape[1] // sh, sh).mean(axis=(1, 3))
            else:
                p = pad_to(p, 8, 8)
        q = ql if ci == 0 else qc
        d = _fdct_blocks(p - 128.0)
        zz = np.round(d.reshape(d.shape[0], d.shape[1], 64)
                      [:, :, ZIGZAG] / q[None, None, :]).astype(np.int64)
        prepared.append(zz)
    return prepared, samp, ch, h, w, ql, qc


def encode_jpeg(img: np.ndarray, *, quality: int = 85,
                subsample=False,
                restart_interval: int = 0,
                precision: int = 8) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> baseline
    JFIF bytes. ``subsample``: False = 4:4:4, True = 4:2:0
    (2x2-box-averaged chroma), or an explicit (h_factor, v_factor)
    luma sampling pair — (2, 1) = 4:2:2, (1, 2) = 4:4:0.

    ``precision=12`` emits an extended-sequential (SOF1) 12-bit file
    from the SAME 8-bit input: samples notionally scale x16 into the
    12-bit domain and the quantization tables scale x16 with them
    (written as a 16-bit DQT), so the quantized coefficients — and
    the entropy stream — are bit-identical to the 8-bit encode and
    every Huffman category stays in the standard tables' range. A
    decoder that scales 12-bit samples back to 8 therefore reproduces
    the 8-bit decode exactly (the bit-exact test hook, same trick as
    the CMYK encoder's per-plane contract)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    prepared, samp, ch, h, w, ql, qc = _prepare_planes(
        img, quality, subsample)

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    for tid, q in ((0, ql), (1, qc))[:1 if ch == 1 else 2]:
        if precision == 12:
            out += b"\xff\xdb" + struct.pack(">H", 131) \
                + bytes([(1 << 4) | tid]) \
                + b"".join(struct.pack(">H", int(v) * 16) for v in q)
        else:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
                + bytes(int(v) for v in q)
    sof_marker = b"\xff\xc1" if precision == 12 else b"\xff\xc0"
    out += sof_marker + struct.pack(">HBHHB", 8 + 3 * ch, precision,
                                    h, w, ch)
    for ci in range(ch):
        sf = (samp[0] << 4) | samp[1] if ci == 0 else 0x11
        out += bytes([ci + 1, sf if ch == 3 else 0x11,
                      0 if ci == 0 else 1])
    for cls, tid, (bits, vals) in (
            (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
            (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA))[
                :2 if ch == 1 else 4]:
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)) + bytes([(cls << 4) | tid]) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ch, ch)
    for ci in range(ch):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    wr = _BitWriter()
    luma = prepared[0]
    mcuy = luma.shape[0] // samp[1]
    mcux = luma.shape[1] // samp[0]
    preds = [0] * ch
    rst = 0
    for mi in range(mcuy * mcux):
        if restart_interval and mi and mi % restart_interval == 0:
            wr.flush()
            out += wr.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wr = _BitWriter()
            preds = [0] * ch
        my, mx = divmod(mi, mcux)
        order_l = [(my * samp[1] + by, mx * samp[0] + bx)
                   for by in range(samp[1]) for bx in range(samp[0])]
        preds[0] = _encode_plane(wr, luma, dc_l, ac_l, order_l, preds[0])
        for ci in range(1, ch):
            preds[ci] = _encode_plane(wr, prepared[ci], dc_c, ac_c,
                                      [(my, mx)], preds[ci])
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def encode_jpeg_cmyk(cmyk: np.ndarray, *, quality: int = 85,
                     transform: int = 0) -> bytes:
    """(h, w, 4) uint8 ACTUAL ink values -> Adobe APP14 4-component
    baseline JPEG: ``transform=0`` stores (inverted) CMYK planes
    directly, ``transform=2`` routes the inverted CMY through the
    YCbCr transform (YCCK). Samples are written with the Adobe
    inverted-ink convention (sample = 255 - ink) that
    :func:`decode_jpeg` assumes. Sampling is 1x1 on every component,
    so each plane's coefficient path is identical to a grayscale
    encode — the bit-exact verification hook."""
    cmyk = np.asarray(cmyk)
    if cmyk.ndim != 3 or cmyk.shape[2] != 4:
        raise ValueError("encode_jpeg_cmyk takes (h, w, 4) uint8")
    if transform not in (0, 2):
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    h, w, _ = cmyk.shape
    stored = 255.0 - cmyk.astype(np.float64)
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    if transform == 2:
        r, g, b = stored[:, :, 0], stored[:, :, 1], stored[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
                  stored[:, :, 3]]
        tqs, use_chroma = [0, 1, 1, 0], [False, True, True, False]
    else:
        planes = [stored[:, :, i] for i in range(4)]
        tqs, use_chroma = [0, 0, 0, 0], [False] * 4

    def pad8(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, (-p.shape[0]) % 8),
                          (0, (-p.shape[1]) % 8)), mode="edge")

    prepared = []
    for p, ch in zip(planes, use_chroma):
        q = qc if ch else ql
        d = _fdct_blocks(pad8(p) - 128.0)
        prepared.append(np.round(
            d.reshape(d.shape[0], d.shape[1], 64)[:, :, ZIGZAG]
            / q[None, None, :]).astype(np.int64))

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" \
        + struct.pack(">HHHB", 100, 0, 0, transform)
    quant_ids = [(0, ql)] + ([(1, qc)] if transform == 2 else [])
    for tid, q in quant_ids:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 12, 8, h, w, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x11, tqs[ci]])
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if transform == 2:
        tables += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for cls, tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)) + bytes([(cls << 4) | tid]) \
            + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 8, 4)
    for ci in range(4):
        out += bytes([ci + 1, 0x11 if use_chroma[ci] else 0x00])
    out += b"\x00\x3f\x00"

    wr = _BitWriter()
    mcuy = prepared[0].shape[0]
    mcux = prepared[0].shape[1]
    preds = [0, 0, 0, 0]
    for mi in range(mcuy * mcux):
        my, mx = divmod(mi, mcux)
        for ci in range(4):
            dcs = dc_c if use_chroma[ci] else dc_l
            acs = ac_c if use_chroma[ci] else ac_l
            preds[ci] = _encode_plane(wr, prepared[ci], dcs, acs,
                                      [(my, mx)], preds[ci])
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


# -- progressive encoder (scoped: test-vector generator) --------------------
#
# Annex K AC tables define no EOBn symbols above EOB0, so a progressive
# stream with real EOB runs needs its own table. A flat 9-bit canonical
# table over every symbol a progressive AC scan can emit (run/size with
# size 1..10, EOBn for runs up to 2^14, ZRL) is trivially valid
# (176 * 2^-9 < 1, all-ones code unused) — poor compression, which is
# fine for a generator whose only job is exercising the decoder.

_PROG_AC_SYMBOLS = sorted({(r << 4) | s for r in range(16)
                           for s in range(1, 11)}
                          | {r << 4 for r in range(15)} | {0xF0})
HUFF_AC_PROG = ([0] * 8 + [len(_PROG_AC_SYMBOLS)] + [0] * 7,
                _PROG_AC_SYMBOLS)


class _ProgACWriter:
    """AC-scan entropy state shared across one scan's blocks. Two
    correction-bit buffers with distinct wire positions (T.81
    G.1.2.2-3): ``pend_run`` holds bits belonging to blocks folded
    into the pending EOB run — the decoder reads them right after the
    EOBn code — while ``pend_cur`` holds bits for history coefficients
    passed since the last emitted symbol of the CURRENT block, read
    after that symbol's sign bit / ZRL."""

    def __init__(self, wr: _BitWriter, ac_codes):
        self.wr = wr
        self.ac = ac_codes
        self.eobrun = 0
        self.pend_run: list[int] = []
        self.pend_cur: list[int] = []

    def emit_symbol(self, sym: int):
        code, ln = self.ac[sym]
        self.wr.write(code, ln)

    def emit_cur(self):
        for b in self.pend_cur:
            self.wr.write(b, 1)
        self.pend_cur = []

    def flush_eob(self):
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.emit_symbol(r << 4)
            if r:
                self.wr.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.pend_run:
                self.wr.write(b, 1)
            self.pend_run = []

    def count_eob(self):
        """Close the current block into the EOB run; its buffered
        segment bits travel with the run."""
        self.eobrun += 1
        self.pend_run += self.pend_cur
        self.pend_cur = []
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _encode_ac_first(st: _ProgACWriter, z: np.ndarray, ss: int, se: int,
                     al: int):
    """One block of an AC first scan: run/size over the
    point-transformed band, EOB folded into the shared run."""
    t = [int(np.sign(v)) * (abs(int(v)) >> al) for v in z[ss:se + 1]]
    nz = [i for i, v in enumerate(t) if v]
    if not nz:
        st.count_eob()
        return
    st.flush_eob()
    run = 0
    for i in range(nz[-1] + 1):
        v = t[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            st.emit_symbol(0xF0)
            run -= 16
        s = abs(v).bit_length()
        st.emit_symbol((run << 4) | s)
        st.wr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] < se - ss:
        st.count_eob()


def _encode_ac_refine(st: _ProgACWriter, z: np.ndarray, ss: int, se: int,
                      al: int):
    """One block of an AC refinement scan, the libjpeg-shaped
    realization of T.81 figure G.7: runs count zero-HISTORY positions,
    history coefficients buffer one correction bit each, ZRLs flush
    the buffer in positional order."""
    temps = [abs(int(v)) >> al for v in z[ss:se + 1]]
    signs = [1 if int(v) >= 0 else 0 for v in z[ss:se + 1]]
    eob = -1
    for i, tv in enumerate(temps):
        if tv == 1:
            eob = i
    run = 0
    for i, tv in enumerate(temps):
        if tv == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            st.flush_eob()
            st.emit_symbol(0xF0)
            run -= 16
            st.emit_cur()
        if tv > 1:
            st.pend_cur.append(tv & 1)
            continue
        st.flush_eob()
        st.emit_symbol((run << 4) | 1)
        st.wr.write(signs[i], 1)
        st.emit_cur()
        run = 0
    if run > 0 or st.pend_cur:
        st.count_eob()


def encode_jpeg_progressive(img: np.ndarray, *, quality: int = 85,
                            subsample=False,
                            restart_interval: int = 0) -> bytes:
    """(h, w[, 1|3]) uint8 -> progressive (SOF2) JFIF bytes with a
    libjpeg-style scan script (interleaved DC first/refine, per-
    component spectral-selection AC scans, two successive-approximation
    levels on luma AC), optionally with restart markers every
    ``restart_interval`` MCUs/blocks in every scan. Quantized
    coefficients are identical to :func:`encode_jpeg` at the same
    quality/subsampling, so ``decode_jpeg`` of both must agree
    bit-for-bit — the round-trip contract the progressive decoder is
    tested against."""
    prepared, samp, ch, h, w, ql, qc = _prepare_planes(
        img, quality, subsample)
    sh, sv = samp

    dc_codes = [_canonical_codes(*HUFF_DC_LUMA)] + \
        [_canonical_codes(*HUFF_DC_CHROMA)] * (ch - 1)
    ac_codes = _canonical_codes(*HUFF_AC_PROG)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc))[:1 if ch == 1 else 2]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ch, 8, h, w, ch)
    for ci in range(ch):
        sf = (sh << 4) | sv if ci == 0 else 0x11
        out += bytes([ci + 1, sf if ch == 3 else 0x11,
                      0 if ci == 0 else 1])
    for cls, tid, (bits, vals) in (
            (0, 0, HUFF_DC_LUMA), (0, 1, HUFF_DC_CHROMA))[
                :1 if ch == 1 else 2]:
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(vals)) + bytes([(cls << 4) | tid]) \
            + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(
        ">H", 19 + len(HUFF_AC_PROG[1])) + bytes([0x10]) \
        + bytes(HUFF_AC_PROG[0]) + bytes(HUFF_AC_PROG[1])

    if ch == 3:
        script = [
            ((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((1,), 1, 63, 0, 1),
            ((2,), 1, 63, 0, 1),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0, 1, 2), 0, 0, 1, 0),
            ((2,), 1, 63, 1, 0),
            ((0,), 1, 63, 1, 0),
            ((1,), 1, 63, 1, 0),
        ]
    else:
        script = [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]

    luma = prepared[0]
    mcuy = luma.shape[0] // sv
    mcux = luma.shape[1] // sh

    def comp_block_order(ci: int):
        """Non-interleaved block raster: ceil(comp_dim/8), which may be
        SMALLER than the MCU-padded prepared grid for luma."""
        fh, fv = (sh, sv) if ci == 0 else (1, 1)
        bw = (-(-(w * fh) // sh) + 7) // 8
        bh = (-(-(h * fv) // sv) + 7) // 8
        return bw, bh

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    for comps_idx, ss, se, ah, al in script:
        ns = len(comps_idx)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comps_idx:
            td = 0 if ci == 0 else 1
            out += bytes([ci + 1, (td << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])

        # restart UNITS: MCUs for interleaved scans, blocks otherwise
        if ss == 0 and ns > 1:
            units = []
            for mi in range(mcuy * mcux):
                my, mx = divmod(mi, mcux)
                unit = []
                for ci in comps_idx:
                    blocks = [(my * sv + by, mx * sh + bx)
                              for by in range(sv)
                              for bx in range(sh)] \
                        if ci == 0 else [(my, mx)]
                    unit += [(ci, by, bx) for by, bx in blocks]
                units.append(unit)
        else:
            ci0 = comps_idx[0]
            bw, bh = comp_block_order(ci0)
            units = [[(ci0,) + divmod(bi, bw)]
                     for bi in range(bw * bh)]

        wr = _BitWriter()
        st = _ProgACWriter(wr, ac_codes)
        preds = {ci: 0 for ci in comps_idx}
        rst = 0
        for ui, unit in enumerate(units):
            if restart_interval and ui and ui % restart_interval == 0:
                # close the entropy segment: pending EOB run +
                # buffered correction bits, pad, RST marker, fresh
                # predictors/EOB state (mirrors the decoder's
                # per-segment reset)
                st.flush_eob()
                wr.flush()
                out += wr.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                wr = _BitWriter()
                st = _ProgACWriter(wr, ac_codes)
                preds = {ci: 0 for ci in comps_idx}
            for ci, by, bx in unit:
                if ss == 0 and ah == 0:               # DC first
                    v = int(prepared[ci][by, bx, 0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = abs(diff).bit_length()
                    code, ln = dc_codes[ci][s]
                    wr.write(code, ln)
                    if s:
                        wr.write(diff if diff >= 0
                                 else diff + (1 << s) - 1, s)
                elif ss == 0:                          # DC refine
                    wr.write((int(prepared[ci][by, bx, 0]) >> al) & 1,
                             1)
                elif ah == 0:                          # AC first
                    _encode_ac_first(st, prepared[ci][by, bx],
                                     ss, se, al)
                else:                                  # AC refine
                    _encode_ac_refine(st, prepared[ci][by, bx],
                                      ss, se, al)
        st.flush_eob()
        wr.flush()
        out += wr.out
    out += b"\xff\xd9"
    return bytes(out)
