"""Pure-stdlib media CONTAINER parsers: ISO-BMFF (MP4) and MPEG audio
(MP3) — the two formats whose codec bitstreams have no stdlib decode.

The honest split for this environment: the container layer (box
structure, sample tables, frame headers) is fully specified in public
standards (ISO/IEC 14496-12 for BMFF; ISO/IEC 11172-3 frame headers
for MPEG audio) and parses with struct + bytes alone, so THAT part is
real — durations, dimensions, codec fourccs, per-sample byte ranges,
bitrate statistics. Only the codec payload decode (H.264 macroblocks,
Layer-III subband synthesis) stays behind the documented
NotImplementedError / fake in `stages/multimodal.py`.

That makes two operators real end-to-end:
- frame sampling over MP4: N evenly-spaced SAMPLES extracted by byte
  range from mdat via stsz/stsc/stco — the same access pattern a real
  decoder pool would use, with the decode step stubbed;
- media probing (ffprobe-style metadata): format, duration, geometry,
  sample/frame counts — real for MP4, MP3, WAV, GIF, PNG, JPEG.

Synthesizers (`synth_mp4`, `synth_mp3`) emit minimal VALID files with
deterministic payloads so tests and queries can verify the parsers
exactly (the pdf_pages pattern: the oracle recomputes the expected
metadata from the synthesis parameters).
"""

from __future__ import annotations

import struct

import numpy as np

# -- ISO-BMFF (MP4) ---------------------------------------------------------


def sniff_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the top-level boxes
    in data[start:end]. Handles 32-bit sizes and size==1 (64-bit)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i:i + 4])
        btype = data[i + 4:i + 8]
        body = i + 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[i + 8:i + 16])
            body = i + 16
        elif size == 0:          # box extends to end of enclosing scope
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("corrupt MP4: bad box size")
        yield btype, body, i + size
        i += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Descend a box path; returns (body_start, body_end) or None."""
    for btype, b0, b1 in _walk_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _find_box(data, b0, b1, path[1:])
    return None


def parse_mp4(payload: bytes) -> dict:
    """ISO-BMFF structural parse -> dict with movie timescale/duration,
    per-track geometry + codec fourcc, and the first video/media
    track's flattened sample table (sizes + absolute byte offsets).

    Raises ValueError on structural corruption. The sample payloads
    these offsets point at are codec bitstream — decoding THEM is out
    of scope here (no codec libs)."""
    if not sniff_mp4(payload):
        raise ValueError("not an ISO-BMFF payload (no ftyp)")
    end = len(payload)
    moov = _find_box(payload, 0, end, [b"moov"])
    if moov is None:
        raise ValueError("corrupt MP4: no moov box")
    m0, m1 = moov
    mvhd = _find_box(payload, m0, m1, [b"mvhd"])
    if mvhd is None:
        raise ValueError("corrupt MP4: no mvhd")
    v0, _ = mvhd
    version = payload[v0]
    if version == 1:
        timescale, duration = struct.unpack(
            ">IQ", payload[v0 + 20:v0 + 32])
    else:
        timescale, duration = struct.unpack(
            ">II", payload[v0 + 12:v0 + 20])
    out = {
        "timescale": int(timescale),
        "duration_sec": (float(duration) / timescale) if timescale
        else 0.0,
        "tracks": [],
    }
    for btype, t0, t1 in _walk_boxes(payload, m0, m1):
        if btype != b"trak":
            continue
        trk: dict = {}
        tkhd = _find_box(payload, t0, t1, [b"tkhd"])
        if tkhd is not None:
            k0, k1 = tkhd
            # width/height are 16.16 fixed point at the box tail
            w_fx, h_fx = struct.unpack(">II", payload[k1 - 8:k1])
            trk["width"] = w_fx >> 16
            trk["height"] = h_fx >> 16
        stbl = _find_box(payload, t0, t1,
                         [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            continue
        s0, s1 = stbl
        stsd = _find_box(payload, s0, s1, [b"stsd"])
        if stsd is not None:
            d0, d1 = stsd
            # entry 0: size(4) fourcc(4)
            trk["codec"] = payload[d0 + 12:d0 + 16].decode(
                "latin-1", "replace")
        stsz = _find_box(payload, s0, s1, [b"stsz"])
        stco = _find_box(payload, s0, s1, [b"stco"])
        co64 = _find_box(payload, s0, s1, [b"co64"])
        stsc = _find_box(payload, s0, s1, [b"stsc"])
        if stsz is None or (stco is None and co64 is None) \
                or stsc is None:
            out["tracks"].append(trk)
            continue
        z0, _z1 = stsz
        fixed_size, n_samples = struct.unpack(
            ">II", payload[z0 + 4:z0 + 12])
        if fixed_size:
            sizes = np.full(n_samples, fixed_size, np.int64)
        else:
            sizes = np.frombuffer(
                payload, ">u4", count=n_samples,
                offset=z0 + 12).astype(np.int64)
        if stco is not None:
            c0, _c1 = stco
            (n_chunks,) = struct.unpack(">I", payload[c0 + 4:c0 + 8])
            chunk_offs = np.frombuffer(
                payload, ">u4", count=n_chunks,
                offset=c0 + 8).astype(np.int64)
        else:
            c0, _c1 = co64
            (n_chunks,) = struct.unpack(">I", payload[c0 + 4:c0 + 8])
            chunk_offs = np.frombuffer(
                payload, ">u8", count=n_chunks,
                offset=c0 + 8).astype(np.int64)
        x0, _x1 = stsc
        (n_ent,) = struct.unpack(">I", payload[x0 + 4:x0 + 8])
        ent = np.frombuffer(payload, ">u4", count=3 * n_ent,
                            offset=x0 + 8).astype(np.int64) \
            .reshape(n_ent, 3)   # (first_chunk, samples_per_chunk, id)
        # flatten: absolute offset per sample, vectorized — build each
        # sample's chunk index from the stsc runs, then offset =
        # chunk_base[chunk] + (prefix_sum(sizes) - prefix at the
        # chunk's first sample)
        chunk_of = np.zeros(n_samples, np.int64)
        si = 0
        for ei in range(n_ent):
            first = int(ent[ei, 0]) - 1
            spc = int(ent[ei, 1])
            last = int(ent[ei + 1, 0]) - 1 if ei + 1 < n_ent \
                else n_chunks
            n_here = min((last - first) * spc, n_samples - si)
            if n_here <= 0:
                continue
            chunk_of[si:si + n_here] = first + \
                np.arange(n_here, dtype=np.int64) // spc
            si += n_here
        if si < n_samples:
            raise ValueError("corrupt MP4: stsc covers fewer samples "
                             "than stsz")
        pre = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        starts = np.zeros(n_samples, bool)
        starts[0] = True
        starts[1:] = chunk_of[1:] != chunk_of[:-1]
        chunk_first_pre = np.maximum.accumulate(
            np.where(starts, pre, 0))
        offsets = chunk_offs[chunk_of] + (pre - chunk_first_pre)
        trk["n_samples"] = int(n_samples)
        trk["sample_sizes"] = sizes
        trk["sample_offsets"] = offsets
        out["tracks"].append(trk)
    if not out["tracks"]:
        raise ValueError("corrupt MP4: no tracks")
    return out


def sample_mp4_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """N evenly-spaced SAMPLE payloads (raw codec bitstream bytes)
    extracted via the real sample table — the container half of frame
    sampling; bitstream decode is the documented stub."""
    info = parse_mp4(payload)
    trk = next((t for t in info["tracks"] if "n_samples" in t), None)
    if trk is None or trk["n_samples"] == 0:
        raise ValueError("corrupt MP4: no sampled track")
    n = trk["n_samples"]
    picks = np.unique(np.linspace(0, n - 1, max(1, min(n_frames, n)),
                                  dtype=np.int64))
    out = []
    for i in picks:
        off = int(trk["sample_offsets"][i])
        sz = int(trk["sample_sizes"][i])
        if off + sz > len(payload):
            raise ValueError("corrupt MP4: sample past EOF")
        out.append(payload[off:off + sz])
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def synth_mp4(seed: int, *, n_samples: int = 8, width: int = 64,
              height: int = 48, timescale: int = 600,
              sample_dur: int = 25) -> bytes:
    """Minimal valid single-track ISO-BMFF file with deterministic
    per-sample payloads (md5-seeded bytes, variable sizes) — enough
    structure for parse_mp4/sample_mp4_frames to verify exactly.
    Codec fourcc is 'fake' on purpose: the payloads are NOT real video
    bitstream and must never be mistaken for it."""
    from hashlib import md5

    sizes = [16 + (md5(f"{seed}:{i}".encode()).digest()[0] % 48)
             for i in range(n_samples)]
    samples = [b"".join(md5(f"{seed}:{i}:{b}".encode()).digest()
                        for b in range((sz + 15) // 16))[:sz]
               for i, sz in enumerate(sizes)]
    mdat_body = b"".join(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2")
    # offsets: ftyp | mdat header (8) | payload
    mdat_off = len(ftyp) + 8
    duration = n_samples * sample_dur

    stts = _box(b"stts", struct.pack(">II", 0, 1)
                + struct.pack(">II", n_samples, sample_dur))
    stsc = _box(b"stsc", struct.pack(">II", 0, 1)
                + struct.pack(">III", 1, n_samples, 1))
    stsz = _box(b"stsz", struct.pack(">III", 0, 0, n_samples)
                + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _box(b"stco", struct.pack(">II", 0, 1)
                + struct.pack(">I", mdat_off))
    entry = struct.pack(">I", 8 + 70) + b"fake" + bytes(70)
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _box(b"dref", struct.pack(">II", 0, 1)
                + _box(b"url ", struct.pack(">I", 1)))
    dinf = _box(b"dinf", dref)
    vmhd = _box(b"vmhd", struct.pack(">I", 1) + bytes(8))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + bytes(12) + b"fake\x00")
    mdhd = _box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                     duration)
                + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">IIIII", 7, 0, 0, 1, 0)
                + struct.pack(">I", duration) + bytes(8)
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                     duration)
                + struct.pack(">IHH", 0x10000, 0x100, 0) + bytes(8)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + bytes(24) + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


# -- MPEG audio (MP3) frame headers -----------------------------------------

# ISO/IEC 11172-3 tables: MPEG-1 Layer III bitrates (kbps, index 1..14)
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)
_MP3_SAMPLERATES = (44100, 48000, 32000)


def sniff_mp3(payload: bytes) -> bool:
    p = _skip_id3(payload)
    return len(payload) >= p + 2 and payload[p] == 0xFF \
        and (payload[p + 1] & 0xE0) == 0xE0


def _skip_id3(payload: bytes) -> int:
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14) \
            | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
        return 10 + sz
    return 0


def parse_mp3(payload: bytes) -> dict:
    """Frame-header walk over an MPEG-1 Layer III stream (ID3v2 tag
    skipped): frame count, exact duration (1152 samples/frame),
    bitrate stats, VBR flag. Raises ValueError when no valid frame
    sequence exists. Audio DECODE (subband synthesis) is out of scope
    — this is the container/framing layer only."""
    i = _skip_id3(payload)
    n = len(payload)
    frames = 0
    bitrates: list[int] = []
    sr_out = None
    while i + 4 <= n:
        if payload[i] != 0xFF or (payload[i + 1] & 0xE0) != 0xE0:
            break
        b1, b2 = payload[i + 1], payload[i + 2]
        version = (b1 >> 3) & 3          # 3 = MPEG-1
        layer = (b1 >> 1) & 3            # 1 = Layer III
        if version != 3 or layer != 1:
            raise NotImplementedError(
                "only MPEG-1 Layer III framing is parsed")
        br_idx = (b2 >> 4) & 15
        sr_idx = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("corrupt MP3: bad bitrate/samplerate "
                             "index")
        bitrate = _MP3_BITRATES[br_idx] * 1000
        sr = _MP3_SAMPLERATES[sr_idx]
        if sr_out is None:
            sr_out = sr
        flen = 144 * bitrate // sr + pad
        if i + flen > n:
            break                        # truncated final frame
        frames += 1
        bitrates.append(bitrate)
        i += flen
    if frames == 0:
        raise ValueError("corrupt MP3: no valid frames")
    return {
        "n_frames": frames,
        "sample_rate": int(sr_out),
        "duration_sec": frames * 1152.0 / sr_out,
        "bitrate_mean": float(np.mean(bitrates)),
        "vbr": len(set(bitrates)) > 1,
    }


def synth_mp3(seed: int, *, n_frames: int = 16,
              bitrate_kbps: int = 128, sample_rate: int = 44100,
              vbr: bool = False) -> bytes:
    """Valid MPEG-1 Layer III frame-header sequence with deterministic
    junk payload (NOT decodable audio — framing only), for exercising
    parse_mp3 exactly."""
    from hashlib import md5

    sr_idx = _MP3_SAMPLERATES.index(sample_rate)
    out = bytearray()
    for i in range(n_frames):
        kb = bitrate_kbps
        if vbr and i % 3 == 1:
            kb = 192 if bitrate_kbps != 192 else 128
        br_idx = _MP3_BITRATES.index(kb)
        pad = 0
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2)
                     | (pad << 1), 0x00])
        flen = 144 * kb * 1000 // sample_rate + pad
        body_len = flen - 4
        body = b"".join(md5(f"{seed}:{i}:{b}".encode()).digest()
                        for b in range((body_len + 15) // 16))[:body_len]
        out += hdr + body
    return bytes(out)
