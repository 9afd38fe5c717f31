"""Pure-stdlib media CONTAINER parsers: ISO-BMFF (MP4), MPEG audio
(MP3) and Matroska/WebM (EBML) — formats whose codec bitstreams have
no stdlib decode.

The honest split for this environment: the container layer (box
structure, sample tables, frame headers) is fully specified in public
standards (ISO/IEC 14496-12 for BMFF; ISO/IEC 11172-3 frame headers
for MPEG audio; RFC 8794 + the public Matroska element registry for
EBML) and parses with struct + bytes alone, so THAT part is
real — durations, dimensions, codec fourccs, per-sample byte ranges,
bitrate statistics. Only the codec payload decode (H.264 macroblocks,
Layer-III subband synthesis) stays behind the documented
NotImplementedError / fake in `stages/multimodal.py`.

That makes two operators real end-to-end:
- frame sampling over MP4/WebM: N evenly-spaced SAMPLES extracted by
  byte range via stsz/stsc/stco or Cluster/SimpleBlock tables — the same access pattern a real
  decoder pool would use, with the decode step stubbed;
- media probing (ffprobe-style metadata): format, duration, geometry,
  sample/frame counts — real for MP4, MP3, WebM, WAV, GIF, PNG, JPEG.

Synthesizers (`synth_mp4`, `synth_mp3`, `synth_webm`) emit minimal VALID files with
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
    for btype, _h, b0, b1 in _walk_boxes_h(data, start, end):
        yield btype, b0, b1


def _walk_boxes_h(data: bytes, start: int, end: int):
    """Like :func:`_walk_boxes` but also yields the box HEADER start
    (box_type, header_start, body_start, body_end) — needed where an
    offset is defined relative to the box's first byte (trun
    data_offset), which body - 8 gets wrong for 64-bit headers."""
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
        yield btype, i, body, i + size
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

    # fragmented MP4 (fMP4/DASH): samples live in moof/trun tables,
    # not stbl. Walk every top-level moof; each trun's data_offset is
    # relative to the moof's first byte (the default-base-is-moof
    # convention modern fragmenters emit).
    frag_sizes: list[int] = []
    frag_offs: list[int] = []
    for btype, moof_start, b0, b1 in _walk_boxes_h(payload, 0, end):
        if btype != b"moof":
            continue
        for ttype, t0, t1 in _walk_boxes(payload, b0, b1):
            if ttype != b"traf":
                continue
            default_size = None
            tfhd = _find_box(payload, t0, t1, [b"tfhd"])
            if tfhd is not None:
                f0, _f1 = tfhd
                (flags,) = struct.unpack(
                    ">I", b"\x00" + payload[f0 + 1:f0 + 4])
                p = f0 + 8
                if flags & 0x01:
                    p += 8               # base_data_offset
                if flags & 0x02:
                    p += 4               # sample_description_index
                if flags & 0x08:
                    p += 4               # default_sample_duration
                if flags & 0x10:
                    (default_size,) = struct.unpack(
                        ">I", payload[p:p + 4])
            for rtype, r0, r1 in _walk_boxes(payload, t0, t1):
                if rtype != b"trun":
                    continue
                (tflags,) = struct.unpack(
                    ">I", b"\x00" + payload[r0 + 1:r0 + 4])
                (cnt,) = struct.unpack(">I", payload[r0 + 4:r0 + 8])
                p = r0 + 8
                data_off = 0
                if tflags & 0x01:
                    (data_off,) = struct.unpack(
                        ">i", payload[p:p + 4])
                    p += 4
                if tflags & 0x04:
                    p += 4               # first_sample_flags
                per = ((4 if tflags & 0x100 else 0)
                       + (4 if tflags & 0x200 else 0)
                       + (4 if tflags & 0x400 else 0)
                       + (4 if tflags & 0x800 else 0))
                off = moof_start + data_off
                for s in range(cnt):
                    q = p + s * per
                    if tflags & 0x100:
                        q += 4
                    if tflags & 0x200:
                        (sz,) = struct.unpack(">I", payload[q:q + 4])
                    elif default_size is not None:
                        sz = default_size
                    else:
                        raise ValueError(
                            "corrupt MP4: trun without sizes")
                    frag_offs.append(off)
                    frag_sizes.append(int(sz))
                    off += int(sz)
    if frag_sizes:
        trk = next((t for t in out["tracks"]
                    if t.get("n_samples", 0) == 0 or
                    "n_samples" not in t), out["tracks"][0])
        base_sizes = trk.get("sample_sizes")
        if base_sizes is not None and len(base_sizes):
            trk["sample_sizes"] = np.concatenate(
                [base_sizes, np.asarray(frag_sizes, np.int64)])
            trk["sample_offsets"] = np.concatenate(
                [trk["sample_offsets"],
                 np.asarray(frag_offs, np.int64)])
        else:
            trk["sample_sizes"] = np.asarray(frag_sizes, np.int64)
            trk["sample_offsets"] = np.asarray(frag_offs, np.int64)
        trk["n_samples"] = int(len(trk["sample_sizes"]))
        out["fragmented"] = True
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


def synth_fmp4(seed: int, *, n_fragments: int = 3,
               samples_per_frag: int = 4, width: int = 64,
               height: int = 48) -> bytes:
    """Minimal valid FRAGMENTED MP4 (fMP4/DASH shape): moov carries
    the track header but no stbl samples; each moof/mdat pair carries
    a trun sample table with per-sample sizes and a data_offset
    relative to the moof start. Payloads are md5-chain junk keyed
    (seed, fragment, sample)."""
    from hashlib import md5

    timescale = 600
    n_total = n_fragments * samples_per_frag
    duration = n_total * 25
    entry = struct.pack(">I", 8 + 70) + b"fake" + bytes(70)
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stbl = _box(b"stbl", stsd)
    dref = _box(b"dref", struct.pack(">II", 0, 1)
                + _box(b"url ", struct.pack(">I", 1)))
    minf = _box(b"minf", _box(b"vmhd", struct.pack(">I", 1)
                              + bytes(8)) + _box(b"dinf", dref)
                + stbl)
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
    out = bytearray(
        _box(b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5dash")
        + moov)
    for f in range(n_fragments):
        sizes = [16 + (md5(f"{seed}:f{f}:{s}".encode()).digest()[0]
                       % 48) for s in range(samples_per_frag)]
        samples = [b"".join(
            md5(f"{seed}:f{f}:{s}:{b}".encode()).digest()
            for b in range((sz + 15) // 16))[:sz]
            for s, sz in enumerate(sizes)]
        mfhd = _box(b"mfhd", struct.pack(">II", 0, f + 1))
        tfhd = _box(b"tfhd", struct.pack(">II", 0x020000, 1))
        trun_body = struct.pack(">II", 0x201, samples_per_frag)
        # data_offset filled after moof size is known
        trun_body += struct.pack(">i", 0)
        trun_body += b"".join(struct.pack(">I", sz) for sz in sizes)
        trun = _box(b"trun", trun_body)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        data_off = len(moof) + 8               # to first mdat byte
        moof = bytearray(moof)
        # patch the trun data_offset (12 bytes from trun body start)
        ti = bytes(moof).find(b"trun")
        struct.pack_into(">i", moof, ti + 12, data_off)
        out += bytes(moof) + _box(b"mdat", b"".join(samples))
    return bytes(out)


# -- MPEG audio (MP3) frame headers -----------------------------------------

# ISO/IEC 11172-3 / 13818-3 tables: Layer III bitrates (kbps,
# index 1..14) and sample rates per MPEG version
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                    128, 144, 160)
_MP3_SAMPLERATES = (44100, 48000, 32000)
_MP3_SAMPLERATES_V2 = (22050, 24000, 16000)
_MP3_SAMPLERATES_V25 = (11025, 12000, 8000)


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


def _mp3_frame_params(b1: int, b2: int):
    """(version, samples_per_frame, bitrate, sample_rate, frame_len)
    for one Layer III frame header; raises on reserved/invalid
    fields."""
    version = (b1 >> 3) & 3              # 3=MPEG-1, 2=MPEG-2, 0=2.5
    layer = (b1 >> 1) & 3                # 1 = Layer III
    if layer != 1 or version == 1:
        raise NotImplementedError(
            "only Layer III framing is parsed")
    br_idx = (b2 >> 4) & 15
    sr_idx = (b2 >> 2) & 3
    pad = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("corrupt MP3: bad bitrate/samplerate index")
    if version == 3:
        bitrate = _MP3_BITRATES[br_idx] * 1000
        sr = _MP3_SAMPLERATES[sr_idx]
        spf = 1152
        flen = 144 * bitrate // sr + pad
    else:
        bitrate = _MP3_BITRATES_V2[br_idx] * 1000
        sr = (_MP3_SAMPLERATES_V2 if version == 2
              else _MP3_SAMPLERATES_V25)[sr_idx]
        spf = 576                        # MPEG-2/2.5 Layer III
        flen = 72 * bitrate // sr + pad
    return version, spf, bitrate, sr, flen


def _xing_offset(version: int, b3: int) -> int:
    """Byte offset of a Xing/Info tag inside the first frame: 4-byte
    header + side info (MPEG-1: 17 mono / 32 stereo; MPEG-2/2.5:
    9 / 17)."""
    mono = ((b3 >> 6) & 3) == 3
    if version == 3:
        return 4 + (17 if mono else 32)
    return 4 + (9 if mono else 17)


def parse_mp3(payload: bytes) -> dict:
    """Frame-header walk over an MPEG-1/2/2.5 Layer III stream (ID3v2
    tag skipped): frame count, exact duration (1152 or 576
    samples/frame), bitrate stats, VBR flag. A Xing/Info tag in the
    first frame (the LAME/VBR convention) is honored: its frame count
    wins for duration, 'Xing' marks VBR, and the tag frame itself is
    excluded from the audio stats. Raises ValueError when no valid
    frame sequence exists. Audio DECODE (subband synthesis) is out of
    scope — this is the container/framing layer only."""
    i = _skip_id3(payload)
    n = len(payload)
    frames = 0
    bitrates: list[int] = []
    sr_out = None
    spf_out = 1152
    xing_frames = None
    xing_vbr = False
    first = True
    while i + 4 <= n:
        if payload[i] != 0xFF or (payload[i + 1] & 0xE0) != 0xE0:
            break
        version, spf, bitrate, sr, flen = _mp3_frame_params(
            payload[i + 1], payload[i + 2])
        if i + flen > n:
            break                        # truncated final frame
        if first:
            first = False
            xo = i + _xing_offset(version, payload[i + 3])
            tag = payload[xo:xo + 4]
            if tag in (b"Xing", b"Info") and xo + 8 <= i + flen:
                (flags,) = struct.unpack(">I", payload[xo + 4:xo + 8])
                if flags & 1 and xo + 12 <= i + flen:
                    (xing_frames,) = struct.unpack(
                        ">I", payload[xo + 8:xo + 12])
                    xing_vbr = tag == b"Xing"
                sr_out = sr
                spf_out = spf
                i += flen
                continue                 # tag frame: not audio
        if sr_out is None:
            sr_out = sr
            spf_out = spf
        frames += 1
        bitrates.append(bitrate)
        i += flen
    if frames == 0 and xing_frames is None:
        raise ValueError("corrupt MP3: no valid frames")
    n_frames = xing_frames if xing_frames is not None else frames
    return {
        "n_frames": int(n_frames),
        "sample_rate": int(sr_out),
        "duration_sec": n_frames * float(spf_out) / sr_out,
        "bitrate_mean": float(np.mean(bitrates)) if bitrates
        else 0.0,
        "vbr": xing_vbr or len(set(bitrates)) > 1,
    }


def synth_mp3(seed: int, *, n_frames: int = 16,
              bitrate_kbps: int = 128, sample_rate: int = 44100,
              vbr: bool = False, version: int = 1,
              xing: int | None = None) -> bytes:
    """Valid Layer III frame-header sequence with deterministic junk
    payload (NOT decodable audio — framing only), for exercising
    parse_mp3 exactly. ``version``: 1 (default), 2 or 25 (MPEG-2.5).
    ``xing``: emit a leading Xing (if ``vbr``) / Info tag frame
    declaring that frame count."""
    from hashlib import md5

    if version == 1:
        sr_idx = _MP3_SAMPLERATES.index(sample_rate)
        ver_bits, brs, factor = 3, _MP3_BITRATES, 144
    elif version == 2:
        sr_idx = _MP3_SAMPLERATES_V2.index(sample_rate)
        ver_bits, brs, factor = 2, _MP3_BITRATES_V2, 72
    else:
        sr_idx = _MP3_SAMPLERATES_V25.index(sample_rate)
        ver_bits, brs, factor = 0, _MP3_BITRATES_V2, 72
    b1 = 0xE0 | (ver_bits << 3) | (1 << 1) | 1   # sync|ver|L3|no-crc

    def frame(kb: int, body: bytes | None, i: int) -> bytes:
        br_idx = brs.index(kb)
        hdr = bytes([0xFF, b1, (br_idx << 4) | (sr_idx << 2), 0xC0])
        flen = factor * kb * 1000 // sample_rate
        if body is None:
            body = b"".join(
                md5(f"{seed}:{i}:{b}".encode()).digest()
                for b in range((flen - 4 + 15) // 16))[:flen - 4]
        return hdr + body[:flen - 4].ljust(flen - 4, b"\x00")

    out = bytearray()
    if xing is not None:
        side = (17 if version == 1 else 9)       # mono (b3=0xC0)
        tag = b"Xing" if vbr else b"Info"
        body = bytes(side) + tag + struct.pack(">II", 1, int(xing))
        out += frame(bitrate_kbps, body, -1)
    for i in range(n_frames):
        kb = bitrate_kbps
        if vbr and xing is None and i % 3 == 1:
            kb = 192 if bitrate_kbps != 192 else 128
        out += frame(kb, None, i)
    return bytes(out)


# -- WebM / Matroska (EBML) -------------------------------------------------
#
# EBML (RFC 8794) is length-prefixed TLV: [vint id][vint size][body].
# The container layer — DocType, Info timescale/duration, TrackEntry
# geometry/codec, Cluster/SimpleBlock framing — parses with bytes
# alone; the codec payload inside SimpleBlocks (VP8/VP9/AV1...) stays
# out of scope like MP4's.

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def sniff_webm(payload: bytes) -> bool:
    return payload[:4] == _EBML_MAGIC


def _read_vint(data: bytes, i: int, keep_marker: bool):
    """EBML variable-length integer at data[i]; returns (value,
    next_index). IDs keep the length-marker bit, sizes strip it."""
    if i >= len(data):
        raise ValueError("corrupt EBML: vint past EOF")
    first = data[i]
    if first == 0:
        raise ValueError("corrupt EBML: >8-byte vint")
    length = 8 - first.bit_length() + 1
    if i + length > len(data):
        raise ValueError("corrupt EBML: vint past EOF")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for b in data[i + 1:i + length]:
        v = (v << 8) | b
    return v, i + length


def _walk_ebml(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for the elements in
    data[start:end]. An unknown-size element (all-ones size vint)
    extends to the enclosing scope's end."""
    i = start
    while i < end:
        eid, i = _read_vint(data, i, keep_marker=True)
        size_start = i
        size, i = _read_vint(data, i, keep_marker=False)
        n_size_bytes = i - size_start
        if size == (1 << (7 * n_size_bytes)) - 1:   # unknown size
            body_end = end
        else:
            body_end = i + size
        if body_end > end:
            raise ValueError("corrupt EBML: element past scope")
        yield eid, i, body_end
        i = body_end


def parse_webm(payload: bytes) -> dict:
    """Matroska/WebM structural parse -> dict with doctype,
    duration_sec (Info TimestampScale x Duration), the first video
    track's geometry + codec id, and the flattened frame table: one
    (offset, size) byte range per SimpleBlock / Block across all
    clusters (the codec bitstream the decode pool would consume —
    decoding it is out of scope, no codec libs)."""
    if not sniff_webm(payload):
        raise ValueError("not an EBML payload")
    end = len(payload)
    doctype = "matroska"
    out: dict = {"doctype": doctype, "duration_sec": None,
                 "width": None, "height": None, "codec": None}
    offs: list[int] = []
    sizes: list[int] = []
    segment = None
    for eid, b0, b1 in _walk_ebml(payload, 0, end):
        if eid == 0x1A45DFA3:                      # EBML header
            for hid, h0, h1 in _walk_ebml(payload, b0, b1):
                if hid == 0x4282:                  # DocType
                    out["doctype"] = payload[h0:h1].decode(
                        "ascii", "replace").rstrip("\x00")
        elif eid == 0x18538067:                    # Segment
            segment = (b0, b1)
    if segment is None:
        raise ValueError("corrupt EBML: no Segment")
    timescale = 1_000_000                          # ns/tick default
    duration_ticks = None
    s0, s1 = segment
    for eid, b0, b1 in _walk_ebml(payload, s0, s1):
        if eid == 0x1549A966:                      # Info
            for iid, i0, i1 in _walk_ebml(payload, b0, b1):
                if iid == 0x2AD7B1:                # TimestampScale
                    timescale = int.from_bytes(payload[i0:i1], "big")
                elif iid == 0x4489:                # Duration (float)
                    raw = payload[i0:i1]
                    duration_ticks = struct.unpack(
                        ">f" if len(raw) == 4 else ">d", raw)[0]
        elif eid == 0x1654AE6B:                    # Tracks
            for tid, t0, t1 in _walk_ebml(payload, b0, b1):
                if tid != 0xAE:                    # TrackEntry
                    continue
                codec = None
                w = h = None
                for fid, f0, f1 in _walk_ebml(payload, t0, t1):
                    if fid == 0x86:                # CodecID
                        codec = payload[f0:f1].decode(
                            "ascii", "replace").rstrip("\x00")
                    elif fid == 0xE0:              # Video
                        for vid, v0, v1 in _walk_ebml(payload, f0,
                                                      f1):
                            if vid == 0xB0:        # PixelWidth
                                w = int.from_bytes(payload[v0:v1],
                                                   "big")
                            elif vid == 0xBA:      # PixelHeight
                                h = int.from_bytes(payload[v0:v1],
                                                   "big")
                if out["codec"] is None and codec is not None:
                    out["codec"] = codec
                if w is not None and out["width"] is None:
                    out["width"], out["height"] = w, h
        elif eid == 0x1F43B675:                    # Cluster
            for cid, c0, c1 in _walk_ebml(payload, b0, b1):
                if cid == 0xA3:                    # SimpleBlock
                    # header: track vint + 2B timestamp + 1B flags
                    _tn, p = _read_vint(payload, c0, False)
                    p += 3
                    if p > c1:
                        raise ValueError(
                            "corrupt EBML: SimpleBlock underflow")
                    offs.append(p)
                    sizes.append(c1 - p)
                elif cid == 0xA0:                  # BlockGroup
                    for gid, g0, g1 in _walk_ebml(payload, c0, c1):
                        if gid == 0xA1:            # Block
                            _tn, p = _read_vint(payload, g0, False)
                            p += 3
                            if p > g1:
                                raise ValueError(
                                    "corrupt EBML: Block underflow")
                            offs.append(p)
                            sizes.append(g1 - p)
    if duration_ticks is not None:
        out["duration_sec"] = float(duration_ticks) * timescale / 1e9
    out["n_blocks"] = len(offs)
    out["block_offsets"] = np.asarray(offs, np.int64)
    out["block_sizes"] = np.asarray(sizes, np.int64)
    return out


def sample_webm_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """N evenly-spaced BLOCK payloads (raw codec bitstream) via the
    parsed cluster/SimpleBlock table — same contract as
    :func:`sample_mp4_frames`."""
    info = parse_webm(payload)
    n = info["n_blocks"]
    if n == 0:
        raise ValueError("corrupt EBML: no blocks")
    picks = np.unique(np.linspace(0, n - 1, max(1, min(n_frames, n)),
                                  dtype=np.int64))
    return [payload[int(info["block_offsets"][i]):
                    int(info["block_offsets"][i])
                    + int(info["block_sizes"][i])]
            for i in picks]


def _ebml_elem(eid: int, body: bytes) -> bytes:
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    # size vint: use the shortest length that fits with marker bit
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            size = (1 << (7 * ln)) | n
            return id_bytes + size.to_bytes(ln, "big") + body
    raise ValueError("element too large")


def synth_webm(seed: int, *, n_blocks: int = 6, width: int = 320,
               height: int = 240, block_ms: int = 40) -> bytes:
    """Minimal valid WebM: EBML header (DocType webm), Segment with
    Info (TimestampScale 1e6, Duration = n_blocks*block_ms ticks),
    one video TrackEntry (codec V_FAKE — payloads are md5-chain junk,
    NOT real bitstream), and one Cluster of SimpleBlocks with
    deterministic sizes/bytes for exact parser verification."""
    from hashlib import md5

    header = _ebml_elem(0x1A45DFA3, b"".join([
        _ebml_elem(0x4286, b"\x01"),               # EBMLVersion
        _ebml_elem(0x4282, b"webm"),               # DocType
    ]))
    info = _ebml_elem(0x1549A966, b"".join([
        _ebml_elem(0x2AD7B1, (1_000_000).to_bytes(3, "big")),
        _ebml_elem(0x4489, struct.pack(
            ">d", float(n_blocks * block_ms))),
    ]))
    video = _ebml_elem(0xE0, b"".join([
        _ebml_elem(0xB0, width.to_bytes(2, "big")),
        _ebml_elem(0xBA, height.to_bytes(2, "big")),
    ]))
    track = _ebml_elem(0xAE, b"".join([
        _ebml_elem(0xD7, b"\x01"),                 # TrackNumber
        _ebml_elem(0x83, b"\x01"),                 # TrackType video
        _ebml_elem(0x86, b"V_FAKE"),
        video,
    ]))
    tracks = _ebml_elem(0x1654AE6B, track)
    blocks = []
    for i in range(n_blocks):
        sz = 12 + (md5(f"{seed}:w{i}".encode()).digest()[0] % 40)
        body = b"".join(md5(f"{seed}:w{i}:{b}".encode()).digest()
                        for b in range((sz + 15) // 16))[:sz]
        ts = (i * block_ms).to_bytes(2, "big")
        blocks.append(_ebml_elem(0xA3, b"\x81" + ts + b"\x80" + body))
    cluster = _ebml_elem(0x1F43B675,
                         _ebml_elem(0xE7, b"\x00") + b"".join(blocks))
    segment = _ebml_elem(0x18538067, info + tracks + cluster)
    return header + segment


# -- ID3v2 text tags --------------------------------------------------------


def parse_id3_tags(payload: bytes) -> dict:
    """ID3v2.3/2.4 text-frame extraction (the metadata layer audio
    curation filters on): returns {frame_id: text} for the T***
    frames in a leading ID3v2 tag (TIT2 title, TPE1 artist, TALB
    album, ...). Empty dict when no tag. Text encodings 0 (latin-1)
    and 3 (utf-8) are decoded; 1/2 (UTF-16 variants) too via codecs.
    Unsynchronisation and extended headers are out of scope (rare in
    the wild for v2.3+ text frames)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return {}
    size = ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14) \
        | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
    end = min(10 + size, len(payload))
    out: dict = {}
    i = 10
    while i + 10 <= end:
        fid = payload[i:i + 4]
        if not fid.strip(b"\x00"):
            break
        (fsize,) = struct.unpack(">I", payload[i + 4:i + 8])
        # v2.4 uses syncsafe frame sizes; v2.3 plain. Heuristic used
        # by real parsers: syncsafe if the version byte says 4
        if payload[3] >= 4:
            fsize = ((payload[i + 4] & 0x7F) << 21) \
                | ((payload[i + 5] & 0x7F) << 14) \
                | ((payload[i + 6] & 0x7F) << 7) \
                | (payload[i + 7] & 0x7F)
        body = payload[i + 10:i + 10 + fsize]
        i += 10 + fsize
        if not fid.startswith(b"T") or not body:
            continue
        enc, text = body[0], body[1:]
        try:
            if enc == 0:
                val = text.decode("latin-1")
            elif enc == 1:
                val = text.decode("utf-16")
            elif enc == 2:
                val = text.decode("utf-16-be")
            else:
                val = text.decode("utf-8")
        except UnicodeDecodeError:
            continue
        out[fid.decode("ascii")] = val.rstrip("\x00")
    return out


def synth_id3_mp3(seed: int, *, title: str, artist: str,
                  n_frames: int = 4) -> bytes:
    """MP3 payload with a leading ID3v2.3 tag carrying TIT2/TPE1 text
    frames (latin-1), followed by a valid frame sequence."""
    def tframe(fid: bytes, text: str) -> bytes:
        body = b"\x00" + text.encode("latin-1")
        return fid + struct.pack(">I", len(body)) + b"\x00\x00" + body

    frames = tframe(b"TIT2", title) + tframe(b"TPE1", artist)
    size = len(frames)
    hdr = b"ID3\x03\x00\x00" + bytes([
        (size >> 21) & 0x7F, (size >> 14) & 0x7F,
        (size >> 7) & 0x7F, size & 0x7F])
    return hdr + frames + synth_mp3(seed, n_frames=n_frames)
