"""Multimodal actor-pool stages (image/audio as opaque binary columns).

The container has no image/audio codec LIBRARIES, but the dominant
decode paths are fully REAL via the stdlib: PCM WAV audio (``wave``),
PNG/BMP/PPM images (``selma_ray.stages.imagecodec``, zlib + numpy) and
baseline + progressive JPEG (``selma_ray.stages.jpegcodec``, Huffman +
vectorized IDCT). Payloads in those formats decode for real; the rest
(MP3/MP4) have no pure-stdlib decode, so `decode_impl` raises
NotImplementedError for them unless ``fake=True``, in which case a
deterministic fake
(crc32-seeded feature vector) stands in so the Ray-side plumbing —
schema, batch size, actor signature, output layout — is real and tested
end-to-end regardless.

At scale: binary payloads are large, so callers must use small
``batch_size`` (default 16) and a fixed actor pool sized to the node; the
output feature column is fixed-width list<float32> which downstream ANN
stages (selma_ray.pipelines.similarity) consume directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa


class DecodeImageFeatures:
    """map_batches actor: binary image column -> feature vector column.

    PNG/BMP/PPM/baseline-JPEG payloads get a REAL decode (pure-stdlib
    codecs in ``selma_ray.stages.imagecodec`` /
    ``selma_ray.stages.jpegcodec``) and a deterministic classic
    feature vector: [log1p(h), log1p(w), channels, mean, std,
    horizontal edge energy, vertical edge energy, dynamic range] plus a
    (dim-8)-bin normalized luminance histogram — the cheap visual
    frontend used for near-dup/quality triage before a learned model.
    A learned encoder would load ONCE here in __init__ (per actor);
    __call__ then runs batched inference. Unrecognized formats
    (MP3/MP4 containers, arithmetic-coded/12-bit JPEG) raise
    unless ``fake=True`` (crc32-seeded stand-in).
    """

    def __init__(self, data_col: str = "data", out_col: str = "features",
                 dim: int = 64, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.dim = dim
        self.fake = fake
        # model/codec load would go here (once per actor)

    def _featurize(self, img: np.ndarray) -> np.ndarray:
        if self.dim < 9:
            raise ValueError(
                "real image featurization needs dim >= 9 "
                "(8 stats + >=1 luminance-histogram bin)")
        h, w, c = img.shape
        x = img.astype(np.float32)
        # Rec.601 luminance over the first 3 channels (tile gray)
        rgb = x[:, :, :3] if c >= 3 else np.repeat(x[:, :, :1], 3, axis=2)
        lum = rgb @ np.array([0.299, 0.587, 0.114], np.float32)
        eh = float(np.abs(np.diff(lum, axis=1)).mean()) if w > 1 else 0.0
        ev = float(np.abs(np.diff(lum, axis=0)).mean()) if h > 1 else 0.0
        head = np.array([np.log1p(h), np.log1p(w), c,
                         lum.mean() / 255.0, lum.std() / 255.0,
                         eh / 255.0, ev / 255.0,
                         (lum.max() - lum.min()) / 255.0], np.float32)
        hist, _ = np.histogram(lum, bins=self.dim - 8, range=(0.0, 256.0))
        hist = hist.astype(np.float32) / max(1, lum.size)
        return np.concatenate([head, hist])

    def decode_impl(self, payload: bytes) -> np.ndarray:
        from selma_ray.stages.imagecodec import decode_image, sniff_format

        payload = payload or b""
        if sniff_format(payload) is not None:
            try:
                return self._featurize(decode_image(payload))
            # fake=True must survive corrupt payloads that pass the
            # magic-byte sniff (truncated IDAT -> zlib.error, bad
            # structure -> ValueError) and sniffable-but-out-of-scope
            # variants (arithmetic-coded JPEG -> NotImplementedError),
            # not just unknown formats
            except (ValueError, zlib.error, IndexError,
                    NotImplementedError):
                if not self.fake:
                    raise
        elif not self.fake:
            raise NotImplementedError(
                "only PNG/BMP/PPM/JPEG decode in this "
                "environment (no image codec libraries); run with "
                "fake=True for the deterministic stand-in on other "
                "formats")
        # deterministic fake: crc32-seeded pseudo-features
        seed = zlib.crc32(payload)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decode_impl(p) for p in
                 batch.column(self.data_col).to_pylist()]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), self.dim)
        return batch.append_column(self.out_col, arr)


class SampleVideoFrames:
    """map_batches actor: binary video column -> list of frame payloads.

    Animated GIF payloads get a REAL decode → evenly-spaced frame
    sample → PNG re-encode (pure-stdlib LZW codec,
    `selma_ray.stages.gifcodec`). Other container formats (mp4/webm
    etc. — no codec libs ship here) fall back to the deterministic fake
    (payload sliced into ``n_frames`` chunks) or raise when
    ``fake=False``.
    """

    def __init__(self, data_col: str = "data", out_col: str = "frames",
                 n_frames: int = 4, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.n_frames = n_frames
        self.fake = fake

    def sample_impl(self, payload: bytes) -> list[bytes]:
        from selma_ray.stages.gifcodec import sample_gif_frames, sniff_gif
        from selma_ray.stages.mediacontainers import (sample_mp4_frames,
                                                      sniff_mp4)
        from selma_ray.stages.mediacontainers import \
            sniff_webm as _sniff_webm

        payload = payload or b""
        if sniff_gif(payload):
            try:
                return sample_gif_frames(payload, self.n_frames)
            # corrupt-but-sniffable GIFs must not kill a fake=True run
            except (ValueError, zlib.error, IndexError):
                if not self.fake:
                    raise
        elif sniff_mp4(payload) or _sniff_webm(payload):
            # REAL container-level sampling: evenly-spaced samples by
            # byte range via the parsed sample tables (ISO-BMFF
            # stsz/stsc/stco, or Matroska Cluster/SimpleBlock). The
            # returned payloads are raw codec bitstream (no video
            # codec libs here) — exactly what a decoder pool's input
            # stage ships.
            try:
                if sniff_mp4(payload):
                    return sample_mp4_frames(payload, self.n_frames)
                from selma_ray.stages.mediacontainers import \
                    sample_webm_frames

                return sample_webm_frames(payload, self.n_frames)
            # struct.error is NOT a ValueError subclass: a truncated
            # mvhd/Duration body raises it from struct.unpack and a
            # fake=True run must survive corrupt-but-sniffable input
            except (ValueError, IndexError, NotImplementedError,
                    struct.error):
                if not self.fake:
                    raise
        elif not self.fake:
            raise NotImplementedError(
                "non-GIF/MP4/WebM video containers are not available "
                "in this environment")
        k = max(1, len(payload) // max(1, self.n_frames))
        return [payload[i * k:(i + 1) * k] for i in range(self.n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = [self.sample_impl(p)
                  for p in batch.column(self.data_col).to_pylist()]
        return batch.append_column(
            self.out_col, pa.array(frames, pa.list_(pa.binary())))


class ResizeImage:
    """map_batches actor: binary image column -> resized binary column
    plus (width, height) metadata.

    PNG/BMP/PPM payloads get a REAL decode → nearest-neighbor resize →
    PNG re-encode round trip (pure-stdlib codec). Other formats
    raise unless ``fake=True`` (tile/truncate stand-in). Codec state is
    per-actor; callers must keep ``batch_size`` small — output bytes
    stay O(w*h) per row regardless of input size, which is the property
    downstream stages rely on.
    """

    def __init__(self, data_col: str = "data", out_col: str = "resized",
                 w: int = 64, h: int = 64, fake: bool = True,
                 out_format: str = "png", quality: int = 85):
        if out_format not in ("png", "jpeg"):
            raise ValueError("out_format must be 'png' or 'jpeg'")
        self.data_col = data_col
        self.out_col = out_col
        self.w = w
        self.h = h
        self.fake = fake
        self.out_format = out_format
        self.quality = quality
        # codec init would go here (once per actor)

    def _reencode(self, img) -> bytes:
        if self.out_format == "jpeg":
            from selma_ray.stages.jpegcodec import encode_jpeg

            return encode_jpeg(img, quality=self.quality)
        from selma_ray.stages.imagecodec import encode_png

        return encode_png(img)

    def resize_impl(self, payload: bytes) -> bytes:
        from selma_ray.stages.imagecodec import (decode_image,
                                                 nearest_resize,
                                                 sniff_format)

        payload = payload or b"\0"
        if sniff_format(payload) is not None:
            try:
                return self._reencode(
                    nearest_resize(decode_image(payload), self.w, self.h))
            # corrupt-but-sniffable images (and out-of-scope variants
            # like arithmetic-coded JPEG) must not kill a fake=True run
            except (ValueError, zlib.error, IndexError,
                    NotImplementedError):
                if not self.fake:
                    raise
        elif not self.fake:
            raise NotImplementedError(
                "only PNG/BMP/PPM/JPEG decode in this "
                "environment (no image codec libraries); run with "
                "fake=True for the deterministic stand-in on other "
                "formats")
        need = self.w * self.h
        reps = -(-need // len(payload))  # ceil
        return (payload * reps)[:need]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.resize_impl(p)
               for p in batch.column(self.data_col).to_pylist()]
        n = batch.num_rows
        return (batch
                .append_column(self.out_col, pa.array(out, pa.binary()))
                .append_column("width", pa.array([self.w] * n, pa.int32()))
                .append_column("height", pa.array([self.h] * n, pa.int32())))


class ImagePHashBands:
    """map_batches actor: binary image column -> 4 (band_key, id,
    simhash) rows carrying the image's 64-bit AVERAGE HASH (aHash).

    aHash = decode -> Rec.601 luminance -> nearest-resize to 8x8 ->
    bit per cell (lum > mean) — the classic perceptual fingerprint
    that survives re-encoding (PNG vs JPEG of the same raster hash
    identically at sane qualities) and small quality changes, which
    exact byte/md5 dedup cannot see. Emitting the same (band_key, id,
    simhash) rows as the text SimHash stage lets the hamming-banded
    bucket machinery (4x16-bit bands => hamming<=3 guarantees a
    band collision) run unchanged downstream. Undecodable payloads
    raise unless ``fake=True`` (crc32-seeded stand-in hash).
    """

    def __init__(self, id_col: str = "doc_id", data_col: str = "data",
                 fake: bool = False):
        self.id_col = id_col
        self.data_col = data_col
        self.fake = fake

    def phash_impl(self, payload: bytes) -> int:
        from selma_ray.stages.imagecodec import (decode_image,
                                                 nearest_resize,
                                                 sniff_format)

        payload = payload or b""
        if sniff_format(payload) is not None:
            try:
                img = decode_image(payload)
                x = img.astype(np.float32)
                rgb = x[:, :, :3] if img.shape[2] >= 3 else \
                    np.repeat(x[:, :, :1], 3, axis=2)
                lum = rgb @ np.array([0.299, 0.587, 0.114], np.float32)
                cell = nearest_resize(lum[:, :, None].astype(np.uint8),
                                      8, 8)[:, :, 0].astype(np.float32)
                bits = (cell > cell.mean()).flatten()
                return int(np.packbits(bits).view(">u8")[0])
            except (ValueError, zlib.error, IndexError,
                    NotImplementedError):
                if not self.fake:
                    raise
        elif not self.fake:
            raise NotImplementedError(
                "only PNG/BMP/PPM/JPEG decode in this "
                "environment; run with fake=True for the deterministic "
                "stand-in on other formats")
        return zlib.crc32(payload) * 0x9E3779B97F4A7C15 % (1 << 64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        out_key, out_id, out_h = [], [], []
        for i, p in zip(ids, batch.column(self.data_col).to_pylist()):
            h = self.phash_impl(p)
            for b in range(4):
                out_key.append((b << 16) | ((h >> (16 * b)) & 0xFFFF))
                out_id.append(i)
                out_h.append(h)
        return pa.table({
            "band_key": pa.array(out_key, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "simhash": pa.array(out_h, pa.uint64()),
        })


def multimodal_stage(ds, cls=DecodeImageFeatures, *, batch_size: int = 16,
                     concurrency=(1, 16), **ctor_kwargs):
    """Attach a multimodal actor-pool stage; small batches because binary
    payloads are large (batch bytes, not rows, is the real budget)."""
    return ds.map_batches(cls, fn_constructor_kwargs=ctor_kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class ParsePdfText:
    """map_batches actor: binary PDF column -> per-page text + layout.

    The north-rule's "PDF/layout parse" leg. ``%PDF-`` payloads get a
    REAL parse via the pure-stdlib parser in
    ``selma_ray.stages.pdfcodec`` (object scan, FlateDecode inflate,
    Tj/TJ/'/" text operators with Td/TD/T*/Tm positioning, page-tree
    ordering, per-page text-run bbox envelope). Unsupported PDF
    variants (encrypted, object-stream xref, non-Flate filters) and
    non-PDF payloads raise NotImplementedError unless ``fake=True``,
    where a deterministic stand-in (payload split into pseudo-pages
    with synthetic bboxes) exercises the same Ray plumbing: per-actor
    parser init, bytes-aware small batches, and the list<struct>
    page/layout output schema downstream text stages consume (page
    text feeds the same block/quality filters as HTML).
    """

    PAGE_TYPE = pa.list_(pa.struct([
        ("page", pa.int32()),
        ("text", pa.string()),
        ("bbox", pa.list_(pa.float32(), 4)),
    ]))

    def __init__(self, data_col: str = "data", out_col: str = "pages",
                 page_bytes: int = 1024, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.page_bytes = page_bytes
        self.fake = fake
        # real impl: load the PDF parser / layout model ONCE per actor

    def parse_impl(self, payload: bytes) -> list[dict]:
        import zlib

        payload = payload or b""
        if payload[:5] == b"%PDF-":
            from selma_ray.stages.pdfcodec import parse_pdf_pages

            try:
                return parse_pdf_pages(payload)
            # fake=True must survive CORRUPT pdfs too (truncated
            # Flate stream -> zlib.error, malformed structure ->
            # ValueError), not just unsupported variants
            except (NotImplementedError, ValueError, zlib.error,
                    KeyError, IndexError):
                if not self.fake:
                    raise
        if not self.fake:
            raise NotImplementedError(
                "only classic uncompressed/FlateDecode text PDFs parse "
                "in this environment (no PDF library); run with "
                "fake=True for the deterministic stand-in")
        pages = []
        for i in range(0, max(1, len(payload)), self.page_bytes):
            chunk = payload[i:i + self.page_bytes]
            pages.append({
                "page": i // self.page_bytes,
                "text": chunk.decode("latin-1"),
                "bbox": [0.0, float(i), 612.0, float(i + len(chunk))],
            })
        return pages

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages = [self.parse_impl(p) for p in
                 batch.column(self.data_col).to_pylist()]
        return batch.append_column(self.out_col,
                                   pa.array(pages, self.PAGE_TYPE))


def synth_wav(seed: int, *, sr: int = 8000, secs: float = 0.5,
              amp: float = 0.5) -> bytes:
    """Deterministic 16-bit PCM mono WAV bytes: two sine tones keyed off
    ``seed``. Test/bench payload generator for the real decode path —
    stdlib ``wave`` only, no external codecs."""
    import io
    import wave

    f1 = 220.0 + (seed % 16) * 55.0
    f2 = 110.0 + (seed % 7) * 110.0
    t = np.arange(int(sr * secs), dtype=np.float64) / sr
    sig = 0.7 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    pcm = np.clip(sig * amp * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class DecodeAudioFeatures:
    """map_batches actor: binary audio column -> frame-level feature
    matrix (list<float32> per window) + duration metadata.

    The audio leg of the multimodal suite. PCM WAV payloads (RIFF/WAVE,
    8/16-bit, any channel count — stdlib ``wave``) get a REAL windowed
    featurizer: per non-overlapping window of ``win_samples``,
    [rms, zcr, peak] + (dim-3) log1p mean-|rfft| band energies — the
    classic cheap audio frontend. Other formats have no codec in this
    container, so they raise NotImplementedError unless ``fake=True``,
    where a deterministic stand-in (crc32-seeded windows at a fixed
    byte hop) exercises the same Ray plumbing: actor-pool construction,
    small-batch sizing (audio payloads are MBs), and the
    (n_windows x dim) ragged output layout downstream poolers consume.
    A heavier featurizer (e.g. a log-mel frontend) would load ONCE here
    in __init__, per actor.
    """

    def __init__(self, data_col: str = "data", out_col: str = "frames",
                 dim: int = 32, hop_bytes: int = 1024, fake: bool = True,
                 win_samples: int = 256):
        if dim < 4:
            raise ValueError("dim must be >= 4 (rms, zcr, peak + bands)")
        self.data_col = data_col
        self.out_col = out_col
        self.dim = dim
        self.hop_bytes = hop_bytes
        self.fake = fake
        self.win_samples = win_samples
        # heavier codec/featurizer load would go here (once per actor)

    def _decode_wav(self, payload: bytes) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 2:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif width == 1:  # 8-bit WAV is unsigned
            x = (np.frombuffer(raw, np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        else:
            raise NotImplementedError(
                f"{8 * width}-bit PCM is not supported (8/16-bit only)")
        if n_ch > 1:
            x = x[:len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
        win = self.win_samples
        if len(x) < win:
            x = np.pad(x, (0, win - len(x)))
        n_win = len(x) // win
        frames = x[:n_win * win].reshape(n_win, win)
        rms = np.sqrt((frames ** 2).mean(axis=1))
        zcr = (np.signbit(frames[:, 1:]) != np.signbit(frames[:, :-1])) \
            .mean(axis=1)
        peak = np.abs(frames).max(axis=1)
        mag = np.abs(np.fft.rfft(frames, axis=1))
        n_bands = self.dim - 3
        bands = np.array_split(mag, n_bands, axis=1)
        band_feats = np.stack([np.log1p(b.mean(axis=1)) for b in bands],
                              axis=1)
        return np.column_stack([rms, zcr, peak, band_feats]) \
            .astype(np.float32)

    def decode_impl(self, payload: bytes) -> np.ndarray:
        payload = payload or b""
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        if not self.fake:
            raise NotImplementedError(
                "only PCM WAV decodes in this environment (no external "
                "audio codecs); run with fake=True for the deterministic "
                "stand-in on other formats")
        payload = payload or b"\0"
        n_win = max(1, len(payload) // self.hop_bytes)
        rng = np.random.default_rng(zlib.crc32(payload))
        return rng.standard_normal((n_win, self.dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mats = [self.decode_impl(p)
                for p in batch.column(self.data_col).to_pylist()]
        frames = pa.array([m.tolist() for m in mats],
                          pa.list_(pa.list_(pa.float32(), self.dim)))
        n_win = pa.array([m.shape[0] for m in mats], pa.int32())
        return (batch
                .append_column(self.out_col, frames)
                .append_column("n_windows", n_win))


class ProbeMediaMetadata:
    """map_batches actor: binary media column -> typed metadata columns
    (the ffprobe-style triage pass a 100 TB media crawl runs FIRST,
    before any decode pool): ``media_format`` (string),
    ``media_width`` / ``media_height`` / ``media_units`` (nullable
    int64; units = video samples / audio frames / GIF frames / PDF
    pages) and ``media_duration`` (nullable float64 seconds).

    Every probed field is REAL — container/header layer only, no codec
    decode: ISO-BMFF box walk + sample tables (mp4), MPEG frame-header
    walk (mp3), RIFF header (wav), GIF logical screen + frame blocks,
    PNG IHDR / BMP header / PPM header / JPEG SOF scan, PDF page
    parse. Unknown or corrupt payloads probe to format
    'unknown'/'corrupt' with null fields rather than raising — a probe
    pass must classify everything, not crash on anything.
    """

    FIELDS = ("media_format", "media_width", "media_height",
              "media_units", "media_duration")

    def __init__(self, data_col: str = "data"):
        self.data_col = data_col

    @staticmethod
    def _jpeg_dims(payload: bytes):
        import struct as _s

        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                break
            m = payload[i + 1]
            i += 2
            if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
                continue
            if m == 0xD9:
                break
            (ln,) = _s.unpack(">H", payload[i:i + 2])
            if m in (0xC0, 0xC1, 0xC2):
                h, w = _s.unpack(">HH", payload[i + 3:i + 7])
                return w, h
            i += ln
        raise ValueError("no SOF")

    def probe_impl(self, payload: bytes) -> dict:
        import io
        import struct as _s
        import wave

        from selma_ray.stages.gifcodec import decode_gif, sniff_gif
        from selma_ray.stages.imagecodec import sniff_format
        from selma_ray.stages.mediacontainers import (parse_mp3,
                                                      parse_mp4,
                                                      parse_webm,
                                                      sniff_mp3,
                                                      sniff_mp4,
                                                      sniff_webm)

        payload = payload or b""
        out = {"media_format": "unknown", "media_width": None,
               "media_height": None, "media_units": None,
               "media_duration": None}
        try:
            if sniff_mp4(payload):
                info = parse_mp4(payload)
                trk = next((t for t in info["tracks"]
                            if "n_samples" in t), {})
                out.update(media_format="mp4",
                           media_width=trk.get("width"),
                           media_height=trk.get("height"),
                           media_units=trk.get("n_samples"),
                           media_duration=info["duration_sec"])
            elif sniff_webm(payload):
                info = parse_webm(payload)
                out.update(media_format="webm"
                           if info["doctype"] == "webm" else "mkv",
                           media_width=info["width"],
                           media_height=info["height"],
                           media_units=info["n_blocks"],
                           media_duration=info["duration_sec"])
            elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                with wave.open(io.BytesIO(payload), "rb") as wv:
                    nf = wv.getnframes()
                    sr = wv.getframerate()
                    if sr <= 0:
                        # stdlib wave accepts a declared rate of 0;
                        # a probe must classify, never divide by it
                        raise ValueError("corrupt WAV: zero rate")
                    out.update(media_format="wav", media_units=nf,
                               media_duration=nf / sr)
            elif sniff_mp3(payload):
                info = parse_mp3(payload)
                out.update(media_format="mp3",
                           media_units=info["n_frames"],
                           media_duration=info["duration_sec"])
            elif sniff_gif(payload):
                w, h = _s.unpack("<HH", payload[6:10])
                frames, delays = decode_gif(payload)
                out.update(media_format="gif", media_width=w,
                           media_height=h, media_units=len(frames),
                           media_duration=sum(delays) / 100.0)
            elif payload[:5] == b"%PDF-":
                from selma_ray.stages.pdfcodec import parse_pdf_pages

                pages = parse_pdf_pages(payload)
                out.update(media_format="pdf",
                           media_units=len(pages))
            elif sniff_format(payload) is not None:
                fmt = sniff_format(payload)
                if fmt == "png":
                    w, h = _s.unpack(">II", payload[16:24])
                elif fmt == "bmp":
                    w, h = _s.unpack("<ii", payload[18:26])
                    h = abs(h)
                elif fmt == "jpeg":
                    w, h = self._jpeg_dims(payload)
                else:                        # ppm ASCII header
                    toks = payload[2:64].split()
                    w, h = int(toks[0]), int(toks[1])
                out.update(media_format=fmt, media_width=int(w),
                           media_height=int(h), media_units=1)
        except (ValueError, zlib.error, IndexError, KeyError,
                NotImplementedError, EOFError, _s.error, wave.Error):
            out["media_format"] = "corrupt"
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self.probe_impl(p)
                for p in batch.column(self.data_col).to_pylist()]
        batch = batch.append_column(
            "media_format",
            pa.array([r["media_format"] for r in rows], pa.string()))
        for col, typ in (("media_width", pa.int64()),
                         ("media_height", pa.int64()),
                         ("media_units", pa.int64())):
            batch = batch.append_column(
                col, pa.array([r[col] for r in rows], typ))
        return batch.append_column(
            "media_duration",
            pa.array([r["media_duration"] for r in rows],
                     pa.float64()))
