"""Multi-format transcript ingestion -> one normalized Dataset schema.

The engine's canonical input is the transcript table of the target
pipeline (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]). Real corpora arrive as Parquet, JSONL
crawl dumps, or CSV exports; ``read_transcripts`` reads any of them
column-pruned where the format supports it and normalizes dtypes in one
vectorized cast pass, so every downstream stage sees a single schema.

Scale notes: Parquet is the only format with real projection/row-group
pruning — JSONL/CSV read whole objects/lines and should be converted to
Parquet at ingest (write_parquet of this dataset IS that converter).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.large_string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_COLUMNS = [f.name for f in TRANSCRIPT_SCHEMA]


def normalize_transcripts(batch: pa.Table) -> pa.Table:
    """Cast/select a raw batch to TRANSCRIPT_SCHEMA (missing optional
    columns materialize as typed nulls; extras are dropped)."""
    n = batch.num_rows
    cols = {}
    names = set(batch.column_names)
    for field in TRANSCRIPT_SCHEMA:
        if field.name in names:
            col = batch.column(field.name)
            if pa.types.is_timestamp(field.type) and (
                    pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type)):
                # ISO-8601 strings (JSON/CSV) -> timestamp[us]; the
                # native cast accepts both whole-second and fractional
                # forms (Arrow strftime's %S emits subseconds for
                # sub-second units, so round-trips produce the latter)
                col = pc.cast(col, pa.timestamp("us"))
            cols[field.name] = pc.cast(col, field.type)
        else:
            cols[field.name] = pa.nulls(n, field.type)
    return pa.table(cols)


def read_orc(path, *, columns: list[str] | None = None, **read_kwargs):
    """ORC reader (Ray Data ships none): a FileBasedDatasource that
    streams one block per ORC stripe, with column projection pushed
    into the stripe read — only requested columns are decoded, the
    ORC analogue of ``read_parquet(columns=...)`` pruning. Stripes are
    the parallelism unit, so a multi-stripe file fans out like parquet
    row groups."""
    import ray.data
    from ray.data.datasource import FileBasedDatasource

    class OrcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["orc"]

        def __init__(self, paths, *, columns=None, **kw):
            super().__init__(paths, **kw)
            self._columns = columns

        def _open_input_source(self, filesystem, path, **open_args):
            # ORC footers require random access, not a byte stream
            return filesystem.open_input_file(path)

        def _read_stream(self, f, path):
            import pyarrow.orc as orc

            reader = orc.ORCFile(f)
            cols = self._columns
            if cols is not None:
                avail = set(reader.schema.names)
                cols = [c for c in cols if c in avail]
            for i in range(reader.nstripes):
                stripe = reader.read_stripe(i, columns=cols)
                if isinstance(stripe, pa.RecordBatch):
                    yield pa.Table.from_batches([stripe])
                else:
                    yield stripe

    return ray.data.read_datasource(OrcDatasource(path, columns=columns),
                                    **read_kwargs)


def write_orc(ds, path: str, **write_kwargs):
    """ORC sink: one file per block via BlockBasedFileDatasink (same
    resumable file-per-block layout as the jsonl/csv sinks); ORC keeps
    timestamps natively, so no lossy stringification."""
    from ray.data.datasource import BlockBasedFileDatasink

    class OrcDatasink(BlockBasedFileDatasink):
        def __init__(self, p, **kw):
            super().__init__(p, file_format="orc", **kw)

        def write_block_to_file(self, block, file):
            import pyarrow.orc as orc

            orc.write_table(block.to_arrow(), file)

    ds.write_datasink(OrcDatasink(path, **write_kwargs))


def read_transcripts(path: str, *, format: str = "parquet", **read_kwargs):
    """Read a transcript corpus in any supported format, normalized.

    format="parquet" prunes to the schema columns at the read (only
    those bytes leave storage); json/csv parse whole records then
    normalize. Extra ``read_kwargs`` pass through to the Ray reader
    (e.g. override_num_blocks).
    """
    import ray.data

    if format == "parquet":
        # prune to schema ∩ file columns (missing optionals materialize
        # as typed nulls in normalize); peeking one footer is O(1)
        import glob
        import os

        import pyarrow.parquet as pq

        first = path
        if os.path.isdir(path):
            found = sorted(
                glob.glob(os.path.join(path, "*.parquet"))
                or glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))
            if not found:
                raise FileNotFoundError(f"no parquet files under {path}")
            first = found[0]
        avail = set(pq.read_schema(first).names)
        cols = [c for c in _COLUMNS if c in avail]
        ds = ray.data.read_parquet(path, columns=cols, **read_kwargs)
    elif format in ("json", "jsonl"):
        ds = ray.data.read_json(path, **read_kwargs)
    elif format == "csv":
        ds = ray.data.read_csv(path, **read_kwargs)
    elif format == "orc":
        ds = read_orc(path, columns=_COLUMNS, **read_kwargs)
    else:
        raise ValueError(f"unsupported transcript format: {format!r}")
    return ds.map_batches(normalize_transcripts, batch_format="pyarrow")


def write_outputs(ds, path: str, *, format: str = "parquet",
                  partition_cols: list[str] | None = None, **write_kwargs):
    """Write a Dataset in any supported sink format — the other half of
    :func:`read_transcripts`.

    format="parquet" is the scale path (columnar, partitionable via
    ``partition_cols`` so failed runs can skip finished partitions);
    jsonl/csv are interchange sinks (one file per block, no partition
    layout — downstream-tool handoff, not the 100 TB path, and large
    binary columns belong in parquet). Timestamp columns are serialized
    as ISO strings for jsonl/csv (Arrow JSON writers reject them
    otherwise).
    """
    if format == "parquet":
        kw = dict(write_kwargs)
        if partition_cols:
            kw["partition_cols"] = partition_cols
        ds.write_parquet(path, **kw)
        return
    if partition_cols:
        raise ValueError(f"partition_cols requires parquet, got {format!r}")
    if format == "orc":
        write_orc(ds, path, **write_kwargs)
        return

    def stringify_ts(batch: pa.Table) -> pa.Table:
        for i, f in enumerate(batch.schema):
            if pa.types.is_timestamp(f.type):
                batch = batch.set_column(
                    i, f.name,
                    pc.strftime(batch.column(f.name), "%Y-%m-%dT%H:%M:%S"))
        return batch

    flat = ds.map_batches(stringify_ts, batch_format="pyarrow")
    if format in ("json", "jsonl"):
        flat.write_json(path, **write_kwargs)
    elif format == "csv":
        flat.write_csv(path, **write_kwargs)
    else:
        raise ValueError(f"unsupported output format: {format!r}")


def union_by_name(dss: list):
    """UNION ALL BY NAME across Datasets with differing schemas —
    Ray's ``Dataset.union`` requires identical schemas, so this aligns
    first: the union schema is the name-keyed union of all input
    schemas (type from the first dataset that has the column; later
    conflicting types are cast to it), missing columns materialize as
    typed nulls. The align step is map-only; the union itself is a
    zero-copy block concatenation.

    The schema-evolution reader: crawls/exports accumulated over time
    rarely share an exact schema.
    """
    if not dss:
        raise ValueError("union_by_name needs at least one dataset")
    fields: dict = {}
    for ds in dss:
        s = ds.schema()
        for name, t in zip(s.names, s.types):
            fields.setdefault(name, t)

    def align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = set(batch.column_names)
        cols = {}
        for name, t in fields.items():
            if name in names:
                col = batch.column(name)
                cols[name] = col if col.type == t else pc.cast(col, t)
            else:
                cols[name] = pa.nulls(n, t)
        return pa.table(cols)

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in dss]
    out = aligned[0]
    for a in aligned[1:]:
        out = out.union(a)
    return out


def cluster_bounds(ds, *, key_col: str, num_ranges: int = 16) -> list:
    """Equal-row range boundaries (upper-inclusive keys) for
    :func:`write_clustered` — compute ONCE per corpus family and pass
    to every table you want co-partitioned (shared boundaries are what
    make :func:`clustered_merge_join` exchange-free)."""
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select([key_col]).group_by(key_col).aggregate(
            [(key_col, "count")])
        return pa.table({
            key_col: agg.column(key_col),
            "pn": pc.cast(agg.column(f"{key_col}_count"), pa.int64()),
        })

    hist = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(key_col).aggregate(Sum("pn")).take_all()
    pairs = sorted((r[key_col], r["sum(pn)"]) for r in hist)
    total = sum(c for _, c in pairs)
    per_range = max(1, total // num_ranges)
    bounds: list = []
    cum = 0
    for v, c in pairs:
        cum += c
        if cum >= (len(bounds) + 1) * per_range \
                and len(bounds) < num_ranges - 1:
            bounds.append(v)
    return bounds


def write_clustered(ds, out_dir: str, *, key_col: str,
                    num_ranges: int = 16, bounds: list | None = None):
    """CLUSTER BY layout: write parquet range-partitioned AND sorted on
    ``key_col`` -> one ``range=K`` directory per key range, rows inside
    each file in key order. Readers then get partition pruning on the
    key range AND row-group skipping within files — the layout that
    makes a 100 TB corpus cheap to point-query / merge-join later.

    Shape: pass 1 builds the key-value histogram (per-batch value
    counts -> tiny groupby, the rank_rows idiom) and the driver picks
    ~equal-row boundaries; pass 2 assigns range ids map-side and ONE
    groupby(range) sorts + writes each range in its own task (file name
    deterministic per range -> idempotent on retry). Returns a manifest
    Dataset (range_id, n_rows, key_min, key_max, path).
    """
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    if bounds is None:
        bounds = cluster_bounds(ds, key_col=key_col,
                                num_ranges=num_ranges)

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        rid = np.searchsorted(np.array(bounds), keys, side="left") \
            if bounds else np.zeros(len(keys), dtype=np.int64)
        return batch.append_column("range_id",
                                   pa.array(rid.astype("int64")))

    os.makedirs(out_dir, exist_ok=True)

    def write_range(group: pd.DataFrame) -> pd.DataFrame:
        rid = int(group["range_id"].iloc[0])
        g = group.sort_values(key_col).drop(columns=["range_id"])
        d = os.path.join(out_dir, f"range={rid}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-0.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       path)
        return pd.DataFrame({
            "range_id": [rid],
            "n_rows": [len(g)],
            "key_min": [g[key_col].iloc[0]],
            "key_max": [g[key_col].iloc[-1]],
            "path": [path],
        })

    return ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("range_id").map_groups(write_range,
                                        batch_format="pandas")


def clustered_merge_join(dir_a: str, dir_b: str, *, key_col: str,
                         suffix_b: str = "_b"):
    """Partition-aligned inner join over two :func:`write_clustered`
    layouts with the SAME key boundaries -> joined Dataset, NO shuffle:
    range K of A only ever joins range K of B, so each range pair is
    one independent task reading two locally-sorted files and doing an
    in-task merge join. This is the payoff of clustering: co-partitioned
    joins at 100 TB cost zero exchange.

    Both layouts must have been written with identical ``num_ranges``
    and key distribution (same corpus snapshot family); ranges missing
    on either side contribute nothing (inner semantics).
    """
    import glob
    import os

    import ray.data

    def ranges_of(d: str) -> dict[int, list[str]]:
        # accumulate EVERY part file per range (a single-file overwrite
        # would silently drop rows from externally-produced multi-file
        # ranges — same accumulation bucketed_hash_join.buckets_of does)
        out: dict[int, list[str]] = {}
        for p in sorted(glob.glob(os.path.join(d, "range=*", "*.parquet"))):
            rid = int(os.path.basename(os.path.dirname(p)).split("=")[1])
            out.setdefault(rid, []).append(p)
        return out

    ra, rb = ranges_of(dir_a), ranges_of(dir_b)
    common = sorted(set(ra) & set(rb))

    def join_range(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for rid in batch.column("rid").to_pylist():
            a = pa.concat_tables([pq.read_table(p) for p in ra[rid]])
            b = pa.concat_tables([pq.read_table(p) for p in rb[rid]])
            b = b.rename_columns([
                c if c == key_col else c + suffix_b
                for c in b.column_names])
            outs.append(a.join(b, keys=key_col, join_type="inner"))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(
        [{"rid": r} for r in common],
        override_num_blocks=max(1, len(common))) \
        .map_batches(join_range, batch_size=1, batch_format="pyarrow")


def _part1by1(x: "np.ndarray") -> "np.ndarray":
    """Spread the low 32 bits of each uint64 into even bit positions."""
    import numpy as np

    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_key(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Vectorized 2-D Morton (Z-order) code: interleaves the bits of two
    non-negative int columns (< 2^31 each) into an int64 that is
    monotone in BOTH coordinates — so any axis-aligned box's codes lie
    inside [morton(x_min,y_min), morton(x_max,y_max)], which is what
    makes conservative file pruning on the code interval sound."""
    import numpy as np

    if len(x) and (int(x.min()) < 0 or int(y.min()) < 0
                   or int(x.max()) >= 2**31 or int(y.max()) >= 2**31):
        raise ValueError("morton_key needs 0 <= values < 2^31")
    z = _part1by1(x.astype(np.uint64)) | \
        (_part1by1(y.astype(np.uint64)) << np.uint64(1))
    return z.astype(np.int64)


def write_zordered(ds, out_dir: str, *, x_col: str, y_col: str,
                   num_ranges: int = 16):
    """Z-ORDER BY (x_col, y_col) layout: append a Morton ``zkey`` column
    map-side and reuse :func:`write_clustered` on it, giving range
    directories whose [key_min, key_max] intervals carve the 2-D key
    space into locality-preserving tiles. Multi-column point/box reads
    then prune files on ONE sortable key instead of needing a layout
    per column — the standard lakehouse trick for two-dimensional
    access patterns. Returns the manifest Dataset."""

    def add_key(batch: pa.Table) -> pa.Table:
        import numpy as np

        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        return batch.append_column("zkey", pa.array(morton_key(x, y),
                                                    pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return write_clustered(keyed, out_dir, key_col="zkey",
                           num_ranges=num_ranges)


def zordered_box_read(out_dir: str, manifest, *, x_col: str, y_col: str,
                      x_range: tuple, y_range: tuple):
    """Box query over a :func:`write_zordered` layout: files whose
    [key_min, key_max] interval misses [morton(lo), morton(hi)] are
    never opened (the manifest is the prune index); survivors get an
    exact vectorized in-task filter. Returns (dataset, n_files_read,
    n_files_total)."""
    import numpy as np
    import ray.data

    lo = int(morton_key(np.array([x_range[0]]), np.array([y_range[0]]))[0])
    hi = int(morton_key(np.array([x_range[1]]), np.array([y_range[1]]))[0])
    rows = manifest.take_all() if hasattr(manifest, "take_all") else manifest
    paths = [r["path"] for r in rows
             if not (int(r["key_max"]) < lo or int(r["key_min"]) > hi)]

    def exact(batch: pa.Table) -> pa.Table:
        import numpy as np

        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        keep = (x >= x_range[0]) & (x <= x_range[1]) & \
               (y >= y_range[0]) & (y <= y_range[1])
        return batch.filter(pa.array(keep, pa.bool_()))

    if not paths:
        empty = ray.data.from_arrow(pa.table({x_col: pa.array([], pa.int64()),
                                              y_col: pa.array([], pa.int64())}))
        return empty, 0, len(rows)
    ds = ray.data.read_parquet(paths).map_batches(
        exact, batch_format="pyarrow")
    return ds, len(paths), len(rows)


def bucket_of(keys: "np.ndarray", n_buckets: int) -> "np.ndarray":
    """Deterministic hash bucket of an int64 key array (Knuth
    multiplicative mix on the unsigned view — stable across runs and
    processes, unlike salted ``hash()``)."""
    import numpy as np

    u = keys.astype(np.uint64)
    mixed = (u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (mixed % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, out_dir: str, *, key_col: str,
                   n_buckets: int = 16):
    """HASH-bucketed parquet layout (the third canonical layout next
    to range-clustered and Z-ordered): rows land in
    ``bucket=K/part-*.parquet`` by a stable hash of ``key_col``.

    What it buys at 100 TB: (a) point lookups read ONE bucket
    (:func:`read_bucket_for_key`); (b) two tables bucketed with the
    same (key, n_buckets) join with ZERO exchange
    (:func:`bucketed_hash_join`) — the hash analog of
    clustered_merge_join, without needing a global sort to write.
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        b = bucket_of(keys.to_numpy(zero_copy_only=False), n_buckets)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])


def read_bucket_for_key(out_dir: str, key, *, key_col: str,
                        n_buckets: int = 16):
    """Point-lookup read: open ONLY the bucket that can contain
    ``key`` and filter to it — 1/n_buckets of the layout's bytes."""
    import numpy as np

    import ray.data

    b = int(bucket_of(np.array([key], np.int64), n_buckets)[0])
    ds = ray.data.read_parquet(f"{out_dir}/bucket={b}")
    return ds.filter(expr=f"{key_col} == {key!r}")


def bucketed_hash_join(dir_a: str, dir_b: str, *, key_col: str,
                       suffix_b: str = "_b"):
    """Exchange-free inner join over two :func:`write_bucketed`
    layouts with the same (key_col, n_buckets): bucket K of A only
    ever joins bucket K of B, one independent task per bucket pair —
    the hash-layout counterpart of :func:`clustered_merge_join`."""
    import glob
    import os

    import ray.data

    def buckets_of(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for p in glob.glob(os.path.join(d, "bucket=*", "*.parquet")):
            bid = int(os.path.basename(os.path.dirname(p)).split("=")[1])
            out.setdefault(bid, []).append(p)
        return out

    ba, bb = buckets_of(dir_a), buckets_of(dir_b)
    common = sorted(set(ba) & set(bb))

    def join_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for bid in batch.column("bid").to_pylist():
            a = pa.concat_tables([pq.read_table(p) for p in ba[bid]])
            b = pa.concat_tables([pq.read_table(p) for p in bb[bid]])
            b = b.rename_columns([
                c if c == key_col else c + suffix_b
                for c in b.column_names])
            outs.append(a.join(b, keys=key_col, join_type="inner"))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(
        [{"bid": b} for b in common],
        override_num_blocks=max(1, len(common))) \
        .map_batches(join_bucket, batch_size=1, batch_format="pyarrow")


def collect_file_stats(path: str, *, columns: list[str]):
    """Zonemap manifest for a parquet directory: one row per file with
    row_count and per-column (min, max), read from FOOTERS ONLY — no
    data pages are touched, so this is cheap even over a 100 TB
    layout. Returns a list of dicts (driver-sized: one entry per
    file)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))
    for f in files:
        md = pq.read_metadata(f)
        ent = {"file": f, "rows": md.num_rows}
        names = md.schema.to_arrow_schema().names
        for c in columns:
            ci = names.index(c)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            ent[f"{c}_min"] = lo
            ent[f"{c}_max"] = hi
        out.append(ent)
    return out


def read_with_zonemap(path: str, *, col: str, lo, hi,
                      stats: list | None = None):
    """Range read through the zonemap: open ONLY files whose
    [min, max] interval for ``col`` intersects [lo, hi], then apply
    the exact in-task filter. Files without footer stats are read
    (correctness over pruning). The generic-directory counterpart of
    the clustered/Z-order pruned reads — works on ANY parquet layout,
    pruning as well as the data happens to be clustered."""
    import ray.data

    stats = stats if stats is not None else collect_file_stats(
        path, columns=[col])
    keep = [s["file"] for s in stats
            if s[f"{col}_min"] is None
            or not (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)]
    if not keep:
        # preserve the layout's full schema so downstream column
        # selection works on the empty result
        import pyarrow.parquet as pq

        schema = pq.read_schema(stats[0]["file"]) if stats else             pa.schema([(col, pa.int64())])
        return ray.data.from_arrow(schema.empty_table())
    ds = ray.data.read_parquet(keep)
    return ds.filter(expr=f"{col} >= {lo!r} and {col} <= {hi!r}")


def compact_small_files(path: str, out_dir: str, *,
                        target_rows: int = 1_000_000):
    """Storage maintenance: rewrite a fragmented parquet directory
    (thousands of tiny part files — the residue of incremental
    ingest/retries) into ~``target_rows``-row files -> returns
    (files_before, files_after, rows).

    Planning is FOOTER-ONLY (row counts from metadata, no data read);
    the plan greedily bins consecutive files into groups of ~target
    rows, then one task per group streams its files into one output —
    each group is independent, so compaction parallelizes across the
    layout and a failed run can re-run per group (deterministic output
    names). Data pages are read exactly once.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    import ray.data

    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))
    counts = [pq.read_metadata(f).num_rows for f in files]
    groups: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for f, n in zip(files, counts):
        cur.append(f)
        acc += n
        if acc >= target_rows:
            groups.append(cur)
            cur, acc = [], 0
    if cur:
        groups.append(cur)
    os.makedirs(out_dir, exist_ok=True)

    def compact(batch: pa.Table) -> pa.Table:
        gids = batch.column("gid").to_pylist()
        rows_out = []
        for gid in gids:
            tabs = [pq.read_table(f) for f in groups[gid]]
            t = pa.concat_tables(tabs, promote_options="default")
            pq.write_table(t, os.path.join(out_dir,
                                           f"part-{gid:05d}.parquet"))
            rows_out.append(t.num_rows)
        return pa.table({"gid": pa.array(gids, pa.int64()),
                         "rows": pa.array(rows_out, pa.int64())})

    manifest = ray.data.from_items(
        [{"gid": i} for i in range(len(groups))],
        override_num_blocks=max(1, len(groups))) \
        .map_batches(compact, batch_size=1, batch_format="pyarrow")
    total = manifest.sum("rows") or 0
    return {"files_before": len(files), "files_after": len(groups),
            "rows": int(total)}


def read_text_corpus(path: str, *, min_chars: int = 1, **read_kwargs):
    """Raw text-file ingestion -> documents-shaped Dataset (doc_id,
    text, source, n_chars): one row per non-empty line, ids assigned
    deterministically from (file path, line offset within file) so a
    re-run (or a resumed run) produces identical ids on any
    partitioning — never a global counter.

    Built on ray.data.read_binary_files (one row per FILE, so line
    offsets are computed with the whole file in hand — a block-split
    file can never double-assign ids); the id is
    (md5(file)[:10 hex] << 20) | line_index — 60 bits, int64-safe,
    collision-free under ~2^20 files x 2^20 lines. One task per file: fine for text
    corpora (shard giant files upstream).
    """
    import hashlib

    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True,
                                    **read_kwargs)

    def shape(batch: pa.Table) -> pa.Table:
        out_id, out_tx, out_src = [], [], []
        for p, blob in zip(batch.column("path").to_pylist(),
                           batch.column("bytes").to_pylist()):
            fid = int(hashlib.md5(p.encode()).hexdigest()[:10], 16)
            lines = blob.decode("utf-8", "replace").splitlines()
            if len(lines) > (1 << 20):
                # the id packs the line number into 20 bits; past that
                # it would CARRY into the file-hash bits and collide
                # with another file's ids — fail loudly instead
                raise ValueError(
                    f"{p}: {len(lines)} lines exceeds the 2^20-per-file "
                    "doc-id budget; split the file or widen the id")
            for i, line in enumerate(lines):
                if len(line) < min_chars:
                    continue
                out_id.append((fid << 20) | i)
                out_tx.append(line)
                out_src.append(p)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_tx, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array([len(t) for t in out_tx], pa.int64()),
        })

    return ds.map_batches(shape, batch_format="pyarrow")


def pin_snapshot(path: str) -> dict:
    """Pin the CURRENT file set of a parquet directory -> {files,
    rows, pinned_at-free deterministic manifest}: a reproducible-read
    contract. Concurrent ingest appends new files; a job that re-reads
    the directory mid-run sees a different table. Pin once at job
    start, read through the pin everywhere (footer row counts only —
    no data read)."""
    stats = collect_file_stats(path, columns=[])
    return {"files": [s["file"] for s in stats],
            "rows": int(sum(s["rows"] for s in stats))}


def read_pinned(snapshot: dict, **read_kwargs):
    """Read exactly the pinned file set (files added after
    :func:`pin_snapshot` are invisible; files removed raise — a loud
    failure beats silently dropping history)."""
    import ray.data

    return ray.data.read_parquet(snapshot["files"], **read_kwargs)


def parquet_footprint(paths) -> "ray.data.Dataset":
    """Storage-health report over parquet files -> one row per
    (file, row_group, column chunk): value count, compressed and
    uncompressed bytes, and the compression ratio — what a 100 TB lake
    audits before re-layout (which columns dominate bytes, where
    compression underperforms, whether row groups are sized for
    pruning).

    Footer-only: each task opens files' METADATA (a few KB at the
    tail), never column data — at scale this is one cheap task per
    file fanned over the cluster. ``paths``: a file, a list of files,
    or a directory of ``.parquet`` files."""
    import os

    import ray.data

    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".parquet"))
        else:
            files = [paths]
    else:
        files = list(paths)

    def probe(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = {"file_name": [], "row_group_id": [], "column": [],
               "n_values": [], "compressed_bytes": [],
               "uncompressed_bytes": []}
        for path in batch.column("path").to_pylist():
            md = pq.ParquetFile(path).metadata
            base = os.path.basename(path)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    out["file_name"].append(base)
                    out["row_group_id"].append(rg)
                    out["column"].append(c.path_in_schema)
                    out["n_values"].append(int(c.num_values))
                    out["compressed_bytes"].append(
                        int(c.total_compressed_size))
                    out["uncompressed_bytes"].append(
                        int(c.total_uncompressed_size))
        t = pa.table({
            "file_name": pa.array(out["file_name"], pa.string()),
            "row_group_id": pa.array(out["row_group_id"], pa.int64()),
            "column": pa.array(out["column"], pa.string()),
            "n_values": pa.array(out["n_values"], pa.int64()),
            "compressed_bytes": pa.array(out["compressed_bytes"],
                                         pa.int64()),
            "uncompressed_bytes": pa.array(out["uncompressed_bytes"],
                                           pa.int64()),
        })
        ratio = pc.divide(
            pc.cast(t.column("compressed_bytes"), pa.float64()),
            pc.cast(pc.max_element_wise(
                t.column("uncompressed_bytes"),
                pa.scalar(1, pa.int64())), pa.float64()))
        return t.append_column("value_ratio", ratio)

    return ray.data.from_arrow(pa.table({
        "path": pa.array(files, pa.string())})) \
        .map_batches(probe, batch_format="pyarrow", batch_size=1)
