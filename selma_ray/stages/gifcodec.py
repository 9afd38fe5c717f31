"""Pure-stdlib GIF codec: LZW decode/encode, frame composition.

The container ships no video/animation library, but animated GIF is
decodable with stdlib + numpy alone (LZW over palette rasters), the
same way PNG was zlib + unfilter (`imagecodec.py`) and WAV was stdlib
``wave``. This gives `selma_ray.stages.multimodal.SampleVideoFrames` a
REAL frame-sampling path: parse the animation, compose frames per the
GIF disposal model, sample N evenly spaced frames, re-encode each as
PNG.

Scope (documented, not hidden): GIF87a/GIF89a, global + local color
tables, interlaced and non-interlaced rasters, graphic-control
transparency, disposal methods 0-3. Malformed/truncated streams raise
ValueError; non-GIF payloads are the caller's job to sniff
(`sniff_gif`).

Reference for parity intent: the reference repo processes HTML only —
this is the builder-brief "multimodal columns" extension (frame-sample
as an actor-pool stage), not a Selma port.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


def sniff_gif(payload: bytes) -> bool:
    return payload[:6] in GIF_SIGS


# ---------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """Decode a GIF LZW stream (already de-sub-blocked) to index bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    # dict entries as (prefix_code, suffix_byte); roots are implicit
    prefix = [0] * 4096
    suffix = bytearray(4096)
    first = bytearray(4096)   # first byte of each code's expansion
    for i in range(clear):
        suffix[i] = i
        first[i] = i
        prefix[i] = -1
    code_size = min_code_size + 1
    next_code = end + 1
    mask = (1 << code_size) - 1
    acc = 0
    nbits = 0
    out = bytearray()
    prev = -1
    stack = bytearray()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & mask
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                code_size = min_code_size + 1
                mask = (1 << code_size) - 1
                next_code = end + 1
                prev = -1
                continue
            if code == end:
                return out
            if prev == -1:
                if code >= clear:
                    raise ValueError("gif: first LZW code not a literal")
                out.append(code)
                prev = code
                continue
            # expand `code` (or prev+firstbyte for the not-yet-defined one)
            if code < next_code:
                c = code
            elif code == next_code:
                c = prev
                stack.append(first[prev])
            else:
                raise ValueError("gif: LZW code out of range")
            while c >= clear:
                stack.append(suffix[c])
                c = prefix[c]
            stack.append(first[c])
            stack.reverse()
            out += stack
            fb = stack[0]
            stack.clear()
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = fb
                first[next_code] = first[prev]   # roots: first[i] == i
                next_code += 1
                if next_code > mask and code_size < 12:
                    code_size += 1
                    mask = (1 << code_size) - 1
            prev = code
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW encoder (dict-based), LSB-first bitstream."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decode


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(payload[pos:pos + ln])
        pos += ln


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode all frames of a GIF.

    Returns (frames, delays_cs): each frame an (H, W, 4) uint8 RGBA
    array composed on the logical screen per the disposal model;
    delays in centiseconds (0 for still GIFs).
    """
    if not sniff_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos:pos + 3 * sz], np.uint8).reshape(sz, 3)
        pos += 3 * sz

    canvas = np.zeros((h, w, 4), np.uint8)   # starts fully transparent
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = -1
    disposal = 0
    delay = 0
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:            # trailer
            break
        if block == 0x21:            # extension
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                flags, delay = struct.unpack_from("<BH", data, 0)
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("gif: truncated image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload,
                                                        pos)
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            # numpy slicing would silently CLIP the canvas view and the
            # later full-rect mask assignment would raise IndexError,
            # escaping the module's ValueError malformed-stream contract
            raise ValueError("gif: frame rectangle outside logical screen")
        ct = gct
        if fpacked & 0x80:
            sz = 2 << (fpacked & 0x07)
            ct = np.frombuffer(
                payload[pos:pos + 3 * sz], np.uint8).reshape(sz, 3)
            pos += 3 * sz
        if ct is None:
            raise ValueError("gif: no color table")
        mcs = payload[pos]
        pos += 1
        raw, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(raw, mcs))[:fw * fh], np.uint8)
        if idx.size < fw * fh:
            raise ValueError("gif: short frame data")
        if fpacked & 0x40:           # interlaced: reorder rows
            rect = np.empty((fh, fw), np.uint8)
            src = idx.reshape(fh, fw)
            r = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    rect[y] = src[r]
                    r += 1
        else:
            rect = idx.reshape(fh, fw)

        saved = canvas.copy() if disposal == 3 else None
        rgba = np.empty((fh, fw, 4), np.uint8)
        rgba[..., :3] = ct[np.minimum(rect, len(ct) - 1)]
        rgba[..., 3] = 255
        region = canvas[top:top + fh, left:left + fw]
        if transparent >= 0:
            opaque = rect != transparent
            region[opaque] = rgba[opaque]
        else:
            region[:] = rgba
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:            # restore to background (transparent)
            canvas[top:top + fh, left:left + fw] = 0
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent = -1
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("gif: no frames")
    return frames, delays


# ------------------------------------------------------------- encode


def encode_gif(frames: list[np.ndarray], *, delay_cs: int = 4) -> bytes:
    """Encode RGB(A) uint8 frames as an animated GIF.

    Each frame is quantized independently to its own 256-color local
    table built from the frame's unique colors (callers here synthesize
    low-color frames, so this is exact, not dithered).
    """
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x70, 0, 0)   # no GCT
    if len(frames) > 1:
        # Netscape looping extension
        out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        rgb = np.asarray(fr, np.uint8)[..., :3]
        colors, inv = np.unique(rgb.reshape(-1, 3), axis=0,
                                return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_gif: >256 unique colors in a frame")
        bits = max(1, int(len(colors) - 1).bit_length())
        size_field = bits - 1
        tbl = np.zeros((2 << size_field, 3), np.uint8)
        tbl[:len(colors)] = colors
        out += b"\x21\xF9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x80 | size_field)
        out += tbl.tobytes()
        mcs = max(2, bits)
        out.append(mcs)
        lzw = _lzw_encode(inv.astype(np.uint8).tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def synth_gif(seed: int, w: int = 24, h: int = 16,
              n_frames: int = 6) -> bytes:
    """Deterministic small animated GIF for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = []
    for f in range(n_frames):
        idx = ((np.add.outer(np.arange(h), np.arange(w)) + f * 3) // 4) % 8
        frames.append(palette[idx])
    return encode_gif(frames)


def sample_gif_frames(payload: bytes, n: int) -> list[bytes]:
    """Real frame sampling: decode, pick n evenly spaced frames,
    re-encode each as PNG (via imagecodec.encode_png)."""
    from selma_ray.stages.imagecodec import encode_png

    frames, _delays = decode_gif(payload)
    k = len(frames)
    picks = [min(k - 1, (i * k) // max(1, n)) for i in range(n)]
    return [encode_png(frames[p]) for p in picks]
