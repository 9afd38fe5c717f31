"""Pure-stdlib image codec: PNG (zlib + numpy unfilter), BMP, PPM.

No image library ships in this container (PIL/cv2 absent), but PNG is
just zlib-compressed filtered scanlines and BMP/PPM are raw rasters —
all decodable with the stdlib. This gives the multimodal stages
(`selma_ray.stages.multimodal`) a REAL decode path, the same way stdlib
``wave`` gave the audio stage real PCM decode.

Scope (documented, not hidden): PNG 8-bit depth, color types
0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA), all five scanline
filters, non-interlaced; BMP 24-bit uncompressed BITMAPINFOHEADER;
PPM binary P6 maxval 255. That covers everything `encode_png` /
`synth_image` emit plus the overwhelmingly common web cases; exotic
variants raise NotImplementedError so callers fall through to the
documented fake.

Reference for parity intent: the reference repo processes HTML only —
these stages are the builder-brief "multimodal columns" extension, not
a Selma port.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str | None:
    """Return 'png' | 'bmp' | 'ppm' | 'jpeg' | None for a payload."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (h, stride) uint8.

    Filters 0 (None), 2 (Up) and 1 (Sub) are fully vectorized (Sub is a
    mod-256 cumulative sum over the per-pixel strided view); 3 (Average)
    and 4 (Paeth) carry a true sequential dependency along x, so they
    loop over pixel columns with the channel lanes vectorized.
    """
    if len(raw) != h * (1 + stride):
        raise ValueError("corrupt PNG: IDAT size mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    npix = stride // bpp
    for y in range(h):
        f = ftypes[y]
        row = data[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: mod-256 cumsum over pixel groups
            rec = (np.cumsum(row.reshape(npix, bpp).astype(np.uint32),
                             axis=0) & 0xFF).astype(np.uint8) \
                .reshape(stride)
        elif f == 2:  # Up
            rec = ((row.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif f == 3:  # Average
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint16)
            r16 = row.astype(np.uint16)
            for x in range(npix):
                s = slice(x * bpp, (x + 1) * bpp)
                left = (r16[s] + ((left + prev[s]) >> 1)) & 0xFF
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.int32)
            ul = np.zeros(bpp, np.int32)
            r32 = row.astype(np.int32)
            p32 = prev.astype(np.int32)
            for x in range(npix):
                s = slice(x * bpp, (x + 1) * bpp)
                up = p32[s]
                p = left + up - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, up, ul))
                left = (r32[s] + pred) & 0xFF
                rec[s] = left
                ul = up
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[y] = rec
        prev = rec.astype(np.uint16)
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array.

    8-bit, non-interlaced, color types 0/2/3/4/6. Palette (type 3)
    expands through PLTE to RGB.
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat: list[bytes] = []
    plte: np.ndarray | None = None
    w = h = depth = color = interlace = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # incl. CRC (not verified: payloads are
        # already integrity-checked by the storage layer at scale)
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("corrupt PNG: no IHDR")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (8 only)")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color}")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    grid = _unfilter(raw, h, w * ch, ch).reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        grid = plte[grid[:, :, 0]]
    return grid


def encode_png(arr: np.ndarray, *, filters: int | list[int] = 0) -> bytes:
    """(h, w[, channels]) uint8 -> PNG bytes.

    ``filters`` picks the per-row filter type (int for all rows, or one
    per row) — mainly so tests can exercise every unfilter branch; 0 is
    the fast path. Gray (1ch), gray+alpha (2), RGB (3), RGBA (4).
    """
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if isinstance(filters, int):
        filters = [filters] * h
    flat = arr.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    lines = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        row = flat[y]
        f = filters[y]
        if f == 0:
            enc = row
        elif f == 1:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            enc = (row - left) & 0xFF
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 3:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            enc = (row - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            ul = np.zeros_like(row)
            ul[bpp:] = prev[:-bpp]
            p = left + prev - ul
            pa_ = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (row - pred) & 0xFF
        else:
            raise ValueError(f"filter {f}")
        lines.append(f)
        lines += enc.astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + chunk(b"IEND", b""))


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant")
    w, h = struct.unpack("<ii", payload[18:26])
    bpp, comp = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8,
                         count=h * stride, offset=data_off) \
        .reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals: list[int] = []
    pos = 2
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end:end + 1].isspace():
            end += 1
        vals.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval}")
    return np.frombuffer(payload, np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> (h, w, c) uint8; ValueError if the
    payload is not a recognized raster format."""
    fmt = sniff_format(payload or b"")
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError("unrecognized image format")


def nearest_resize(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (h_out=h, w_out=w) via pure indexing —
    pixel centers, the standard convention."""
    sh, sw = arr.shape[:2]
    yi = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64),
                    sh - 1)
    xi = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64),
                    sw - 1)
    return arr[yi][:, xi]


def synth_image(seed: int, w: int = 48, h: int = 32) -> bytes:
    """Deterministic RGB PNG test/bench payload: seeded gradient +
    interference pattern (structured, compresses like a real image)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f = 0.1 + (seed % 13) * 0.05
    r = 127.5 + 127.5 * np.sin(f * xx + seed)
    g = 127.5 + 127.5 * np.cos(f * yy - seed * 0.5)
    b = (xx * 255 / max(1, w - 1) + yy * 255 / max(1, h - 1)) / 2
    arr = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return encode_png(arr)
