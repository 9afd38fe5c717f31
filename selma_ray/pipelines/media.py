"""Composed media curation: probe → select → extract frames.

The multimodal counterpart of :mod:`.curate` — the pipeline a media
crawl runs before any expensive decode pool: a cheap container-layer
probe classifies every payload (real parsers,
:class:`..stages.multimodal.ProbeMediaMetadata`), a map-only filter
keeps the formats/durations worth decoding, and the frame stage
extracts evenly-spaced samples (REAL byte-range extraction for MP4 via
the ISO-BMFF sample tables, real decode + PNG re-encode for GIF).
Stage boundaries checkpoint to parquet with done markers (same
`_STAGE_DONE` protocol as curate_corpus), so a restarted job skips
finished stages.

Payloads here are synthesized deterministically from doc ids (this
sandbox has no media corpus); checkpoints therefore store only ids +
probe metadata and the frame stage re-synthesizes payloads on demand.
At real scale the same shape stores object-store POINTERS in the
checkpoints and the frame stage fetches bytes by pointer — the
pipeline structure (probe first, filter before decode, frames as an
actor pool over small batches) is exactly what ships.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from .curate import DONE, _fresh_dir, _mark_done, _stage_done


def synth_media_payload(doc_id: int) -> bytes:
    """The deterministic per-doc payload mix (mp4 / mp3 / wav / gif /
    webm round-robin) shared by the media queries and this
    pipeline."""
    from ..stages.gifcodec import synth_gif
    from ..stages.mediacontainers import (synth_mp3, synth_mp4,
                                          synth_webm)
    from ..stages.multimodal import synth_wav

    d = int(doc_id)
    if d % 5 == 0:
        return synth_mp4(d, n_samples=4 + d % 7)
    if d % 5 == 1:
        return synth_mp3(d, n_frames=8 + d % 9)
    if d % 5 == 2:
        return synth_wav(d, secs=0.1 + (d % 7) * 0.05)
    if d % 5 == 3:
        return synth_gif(d, n_frames=2 + d % 7)
    return synth_webm(d, n_blocks=3 + d % 6)


def _attach_payloads(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "data": pa.array([synth_media_payload(d) for d in ids],
                         pa.binary()),
    })


def curate_media(docs_path: str, out_root: str, *,
                 min_duration: float = 0.2, n_frames: int = 3,
                 batch_size: int = 32, concurrency=(1, 8),
                 resume: bool = True) -> dict:
    """Run (or resume) the probe → select → frames pipeline over the
    documents parquet at ``docs_path``. Returns per-stage metrics."""
    import ray.data

    from ..stages.multimodal import (ProbeMediaMetadata,
                                     SampleVideoFrames,
                                     multimodal_stage)

    summary: dict = {"stages": {}}

    # -- stage 1: container probe (real parsers, never raises) ----------
    pr_dir = os.path.join(out_root, "probed")
    t0 = time.perf_counter()
    if not (resume and _stage_done(pr_dir)):
        ds = ray.data.read_parquet(docs_path, columns=["doc_id"]) \
            .map_batches(_attach_payloads, batch_format="pyarrow")
        probed = multimodal_stage(ds, ProbeMediaMetadata,
                                  batch_size=batch_size,
                                  concurrency=concurrency) \
            .drop_columns(["data"])
        _fresh_dir(pr_dir)
        probed.write_parquet(pr_dir, min_rows_per_file=16384)
        _mark_done(pr_dir, {
            "rows": ray.data.read_parquet(pr_dir).count()})
    with open(os.path.join(pr_dir, DONE)) as f:
        summary["stages"]["probe"] = {
            **json.load(f), "sec": round(time.perf_counter() - t0, 3)}

    # -- stage 2: select decodable visual media above min duration ------
    sel_dir = os.path.join(out_root, "selected")
    t0 = time.perf_counter()
    if not (resume and _stage_done(sel_dir)):
        def keep(batch: pa.Table) -> pa.Table:
            fmt = batch.column("media_format")
            dur = batch.column("media_duration")
            mask = pc.and_(
                pc.is_in(fmt, value_set=pa.array(
                    ["mp4", "gif", "webm"])),
                pc.and_(pc.is_valid(dur),
                        pc.greater_equal(dur, pa.scalar(
                            float(min_duration), pa.float64()))))
            return batch.filter(mask)

        ray.data.read_parquet(pr_dir) \
            .map_batches(keep, batch_format="pyarrow") \
            .write_parquet(_fresh_dir(sel_dir) or sel_dir,
                           min_rows_per_file=16384)
        _mark_done(sel_dir, {
            "rows": ray.data.read_parquet(sel_dir).count()})
    with open(os.path.join(sel_dir, DONE)) as f:
        summary["stages"]["select"] = {
            **json.load(f), "sec": round(time.perf_counter() - t0, 3)}

    # -- stage 3: frame extraction over the selected slice ---------------
    fr_dir = os.path.join(out_root, "frames")
    t0 = time.perf_counter()
    if not (resume and _stage_done(fr_dir)):
        sel = ray.data.read_parquet(
            sel_dir, columns=["doc_id", "media_format"])
        with_payloads = sel.map_batches(
            lambda b: _attach_payloads(b).append_column(
                "media_format", b.column("media_format")),
            batch_format="pyarrow")
        sampled = multimodal_stage(with_payloads, SampleVideoFrames,
                                   batch_size=batch_size, fake=False,
                                   n_frames=n_frames,
                                   concurrency=concurrency)

        def shape(batch: pa.Table) -> pa.Table:
            frames = batch.column("frames")
            if isinstance(frames, pa.ChunkedArray):
                frames = frames.combine_chunks()
            n = pc.list_value_length(frames)
            sizes = pc.binary_length(pc.list_flatten(frames))
            # per-row total bytes: sum the flat sizes back per list
            idx = pc.list_parent_indices(frames)
            t = pa.table({"i": idx, "s": sizes})
            agg = t.group_by("i").aggregate([("s", "sum")])
            tot = {r["i"]: r["s_sum"] for r in agg.to_pylist()}
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "media_format": batch.column("media_format"),
                "n_frames": pc.cast(n, pa.int64()),
                "frame_bytes": pa.array(
                    [int(tot.get(i, 0))
                     for i in range(batch.num_rows)], pa.int64()),
            })

        sampled.map_batches(shape, batch_format="pyarrow") \
            .write_parquet(_fresh_dir(fr_dir) or fr_dir,
                           min_rows_per_file=16384)
        _mark_done(fr_dir, {
            "rows": ray.data.read_parquet(fr_dir).count()})
    with open(os.path.join(fr_dir, DONE)) as f:
        summary["stages"]["frames"] = {
            **json.load(f), "sec": round(time.perf_counter() - t0, 3)}

    return summary
