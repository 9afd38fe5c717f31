"""Flagship pipeline: main-content extraction over transcript Parquet.

    read_parquet(columns pruned)
      → [skew salt / repartition]
      → map_batches(ExtractTurns actor pool, batch_format="pyarrow")
      → sort(conv_id, turn_idx)            # stable per-conversation order
      → write_parquet(partition_cols=[shard]) + manifest record per shard

Scale design (100 TB, 256 nodes):
- The ONLY wide operation is the final ordering sort; extraction itself
  is map-only and streams block-by-block with backpressure.
- Shards are file-level: deterministic ids from input file names, so a
  restarted run recomputes the same ids and `resume=True` skips finished
  shards without reading their data (selma_ray.state.manifest).
- Metrics are aggregated from the WRITTEN output with a column-pruned
  read-back (bytes_in/bytes_out/hits_* only) — the main pipeline never
  re-executes and never materializes in full.
- Skew: per-row cost is O(bytes), so `batch_size` is modest; Ray's
  dynamic block splitting plus `override_num_blocks` on read spreads
  MB-scale payload rows; conversations never need co-location during
  extraction (per-turn transform), only at the final sort.
"""

from __future__ import annotations

import os
import posixpath

import pyarrow as pa

from ..stages.extract import extract_stage
from ..state.manifest import Manifest

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def extract_transcripts(ds, *, sanitizer_config=None, keep_html=False,
                        keep_spans=True, batch_size=64, concurrency=None,
                        sort=True):
    """Dataset → Dataset with extraction columns, optionally order-stable."""
    out = extract_stage(ds, sanitizer_config=sanitizer_config,
                        keep_html=keep_html, keep_spans=keep_spans,
                        batch_size=batch_size, concurrency=concurrency)
    if sort:
        out = out.sort(["conv_id", "turn_idx"])
    return out


def _shard_id_rel(path: str, root: str) -> str:
    """Shard id from the path RELATIVE to the input root.

    Basename-only ids silently COLLIDE for hive layouts
    (date=2020/part-0.parquet vs date=2021/part-0.parquet -> both
    'part-0'), dropping input files from the run. The 's-' prefix
    keeps digit-only ids (0001.parquet) from being inferred back as
    integers by the hive-partition read in the metrics roll-up, which
    would break the string-keyed mark-done matching."""
    rel = path[len(root):].lstrip("/") if path.startswith(root) \
        else posixpath.basename(path)
    rel = rel.replace(".parquet", "")
    return "s-" + rel.replace("/", "__").replace("=", "-").replace(".", "_")


def list_input_shards(input_path: str) -> dict[str, str]:
    """Deterministic shard-id → file map from the input layout. Ids
    derive from root-relative paths (collision-free for nested/hive
    layouts); files keep the input's URI scheme so remote (s3://, ...)
    paths stay readable downstream."""
    import pyarrow.fs as pafs

    scheme = input_path.split("://", 1)[0] if "://" in input_path else ""
    fs, root = pafs.FileSystem.from_uri(
        input_path if "://" in input_path else f"file://{os.path.abspath(input_path)}")
    info = fs.get_file_info(root)
    if info.type == pafs.FileType.File:
        files = [root]
        root = posixpath.dirname(root)
    else:
        files = [f.path for f in fs.get_file_info(
            pafs.FileSelector(root, recursive=True))
            if f.type == pafs.FileType.File and f.path.endswith(".parquet")]
    out = {}
    for p in sorted(files):
        sid = _shard_id_rel(p, root)
        if sid in out:
            raise ValueError(
                f"shard id collision: {out[sid]!r} and {p!r} both map "
                f"to {sid!r}")
        # re-attach the scheme: pafs strips it, and a scheme-less
        # remote path would be (mis)read as a local one downstream
        out[sid] = f"{scheme}://{p}" if scheme and scheme != "file" else p
    return out


def build_path_to_shard(todo: dict[str, str]) -> dict[str, str]:
    """Invert shard→file into a lookup keyed by BOTH the scheme-qualified
    path and the scheme-stripped form: ``include_paths=True`` surfaces
    ``fragment.path``, which pyarrow filesystems report WITHOUT the URI
    scheme — so for remote inputs (s3://bucket/key) the batch column
    carries ``bucket/key`` while ``list_input_shards`` returns
    ``s3://bucket/key``. Registering both forms keeps the lookup exact
    for local and remote layouts alike."""
    out: dict[str, str] = {}
    for sid, p in todo.items():
        out[p] = sid
        if "://" in p:
            out[p.split("://", 1)[1]] = sid
    return out


class _AttachShard:
    """Vectorized path→shard-id mapping (the small side is a plain dict
    shipped once in the task closure, not per batch)."""

    def __init__(self, path_to_shard: dict[str, str]):
        self.path_to_shard = path_to_shard

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        shards = [self.path_to_shard[p] for p in paths]
        batch = batch.drop_columns(["path"])
        return batch.append_column("shard", pa.array(shards, pa.string()))


def run_extraction(input_path: str, out_dir: str, *,
                   manifest_dir: str | None = None, resume: bool = True,
                   sanitizer_config=None, keep_html: bool = False,
                   keep_spans: bool = True, batch_size: int = 64,
                   concurrency=None, columns=None) -> dict:
    """Run (or resume) the extraction job over a parquet path.

    Returns a summary dict {shards_total, shards_skipped, shards_done,
    rows, metrics}. Output layout: ``out_dir/shard=<id>/*.parquet`` —
    one directory per input shard, so a failed run re-does only the
    shards missing from the manifest.
    """
    import ray.data

    manifest = Manifest(manifest_dir or os.path.join(out_dir, "_manifest"))
    shard_map = list_input_shards(input_path)
    done = manifest.completed() if resume else set()
    todo = {sid: p for sid, p in shard_map.items() if sid not in done}
    summary = {
        "shards_total": len(shard_map),
        "shards_skipped": len(shard_map) - len(todo),
        "shards_done": 0,
        "rows": 0,
        "metrics": {},
    }
    if not todo:
        summary["metrics"] = manifest.summary()["metrics"]
        return summary

    # Idempotent recompute: a shard being (re)done must not leave stale
    # files from a previous attempt next to the new ones (write_parquet
    # appends new uniquely-named files; it never cleans).
    import shutil

    for sid in todo:
        shard_dir = os.path.join(out_dir, f"shard={sid}")
        if os.path.isdir(shard_dir):
            shutil.rmtree(shard_dir)

    path_to_shard = build_path_to_shard(todo)
    ds = ray.data.read_parquet(
        list(todo.values()),
        columns=columns or TRANSCRIPT_COLUMNS,   # prune at the read
        include_paths=True,
    )
    ds = ds.map_batches(_AttachShard(path_to_shard), batch_format="pyarrow")
    ds = extract_stage(ds, sanitizer_config=sanitizer_config,
                       keep_html=keep_html, keep_spans=keep_spans,
                       batch_size=batch_size, concurrency=concurrency)
    # Streaming write: blocks land under out_dir/shard=<id>/ as they finish.
    ds.write_parquet(out_dir, partition_cols=["shard"])

    # Metrics roll-up from the written output: column-pruned, tiny scan.
    stats = ray.data.read_parquet(
        out_dir, columns=["shard", "bytes_in", "bytes_out",
                          "hits_strip", "hits_title", "hits_meta",
                          "hits_unwrap"],
    ).groupby("shard").sum(
        ["bytes_in", "bytes_out", "hits_strip", "hits_title", "hits_meta",
         "hits_unwrap"])
    counts = ray.data.read_parquet(out_dir, columns=["shard"]) \
        .groupby("shard").count()
    count_map = {r["shard"]: r["count()"] for r in counts.take_all()}

    for row in stats.take_all():
        sid = row["shard"]
        if sid not in todo:
            continue  # output from a previous (already-recorded) run
        turns = int(count_map.get(sid, 0))
        metrics = {
            "turns_processed": turns,
            "bytes_in": int(row["sum(bytes_in)"]),
            "bytes_out": int(row["sum(bytes_out)"]),
            "bytes_stripped": int(row["sum(bytes_in)"] - row["sum(bytes_out)"]),
            "hits_strip": int(row["sum(hits_strip)"]),
            "hits_title": int(row["sum(hits_title)"]),
            "hits_meta": int(row["sum(hits_meta)"]),
            "hits_unwrap": int(row["sum(hits_unwrap)"]),
        }
        manifest.mark_done(sid, metrics=metrics,
                           lineage={"input_file": todo[sid],
                                    "output_dir": f"{out_dir}/shard={sid}"})
        summary["shards_done"] += 1
        summary["rows"] += turns
    summary["metrics"] = manifest.summary()["metrics"]
    return summary
