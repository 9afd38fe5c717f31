"""Multimodal actor-pool stages (image/audio as opaque binary columns).

The container has no image/audio codecs, so the DECODE step is stubbed:
`decode_impl` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake (crc32-seeded feature vector) stands in so the
Ray-side plumbing — schema, batch size, actor signature, output layout —
is real and tested end-to-end.

At scale: binary payloads are large, so callers must use small
``batch_size`` (default 16) and a fixed actor pool sized to the node; the
output feature column is fixed-width list<float32> which downstream ANN
stages (selma_ray.pipelines.similarity) consume directly.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


class DecodeImageFeatures:
    """map_batches actor: binary image column -> feature vector column.

    Real decode/resize/feature-extract would load the model ONCE here in
    __init__ (per actor); __call__ then runs batched inference.
    """

    def __init__(self, data_col: str = "data", out_col: str = "features",
                 dim: int = 64, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.dim = dim
        self.fake = fake
        # model/codec load would go here (once per actor)

    def decode_impl(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "run with fake=True for the deterministic stand-in")
        # deterministic fake: crc32-seeded pseudo-features
        seed = zlib.crc32(payload or b"")
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

    Deterministic fake: slices the payload into ``n_frames`` chunks. Real
    frame sampling would seek keyframes via a codec loaded in __init__.
    """

    def __init__(self, data_col: str = "data", out_col: str = "frames",
                 n_frames: int = 4, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.n_frames = n_frames
        self.fake = fake

    def sample_impl(self, payload: bytes) -> list[bytes]:
        if not self.fake:
            raise NotImplementedError(
                "video codecs are not available in this environment")
        payload = payload or b""
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

    Deterministic fake: truncates/tiles the payload to ``w*h`` bytes (a
    stand-in for a real decoded-resize-reencode round trip). A real
    implementation loads the codec ONCE in __init__ and must keep
    ``batch_size`` small — output bytes stay O(w*h) per row regardless
    of input size, which is the property downstream stages rely on.
    """

    def __init__(self, data_col: str = "data", out_col: str = "resized",
                 w: int = 64, h: int = 64, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.w = w
        self.h = h
        self.fake = fake
        # codec init would go here (once per actor)

    def resize_impl(self, payload: bytes) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "run with fake=True for the deterministic stand-in")
        payload = payload or b"\0"
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


def multimodal_stage(ds, cls=DecodeImageFeatures, *, batch_size: int = 16,
                     concurrency=(1, 16), **ctor_kwargs):
    """Attach a multimodal actor-pool stage; small batches because binary
    payloads are large (batch bytes, not rows, is the real budget)."""
    return ds.map_batches(cls, fn_constructor_kwargs=ctor_kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class ParsePdfText:
    """map_batches actor: binary PDF column -> per-page text + layout.

    The north-rule's "PDF/layout parse" leg. No PDF library ships in
    this container, so ``parse_impl`` raises NotImplementedError unless
    ``fake=True``, where a deterministic stand-in (payload split into
    pseudo-pages with synthetic bboxes) exercises the real Ray plumbing:
    per-actor parser init, bytes-aware small batches, and the
    list<struct> page/layout output schema downstream text stages
    consume (page text feeds the same block/quality filters as HTML).
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
        if not self.fake:
            raise NotImplementedError(
                "no PDF parser is available in this environment; "
                "run with fake=True for the deterministic stand-in")
        payload = payload or b""
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


class DecodeAudioFeatures:
    """map_batches actor: binary audio column -> frame-level feature
    matrix (list<float32> per window) + duration metadata.

    The audio leg of the multimodal suite. No audio codecs ship in this
    container, so ``decode_impl`` raises NotImplementedError unless
    ``fake=True``, where a deterministic stand-in (crc32-seeded windows
    at a fixed hop) exercises the real Ray plumbing: actor-pool
    construction, small-batch sizing (audio payloads are MBs), and the
    (n_windows x dim) ragged output layout downstream poolers consume.
    A real implementation loads the codec + featurizer (e.g. a
    log-mel frontend) ONCE here in __init__.
    """

    def __init__(self, data_col: str = "data", out_col: str = "frames",
                 dim: int = 32, hop_bytes: int = 1024, fake: bool = True):
        self.data_col = data_col
        self.out_col = out_col
        self.dim = dim
        self.hop_bytes = hop_bytes
        self.fake = fake
        # codec + featurizer load would go here (once per actor)

    def decode_impl(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "audio codecs are not available in this environment; "
                "run with fake=True for the deterministic stand-in")
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
