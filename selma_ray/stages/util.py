"""Shared stage helpers: block coalescing and pool sizing.

Ray's sort-based shuffle pays a per-block scheduling cost, so a groupby
fed by many KB-sized blocks (the normal shape after per-batch partial
aggregation) wastes tens of seconds on metadata. Coalescing by target
rows keeps the fix scale-aware: tiny intermediates collapse to a handful
of blocks, large ones keep enough blocks for parallel reduce.
"""

from __future__ import annotations


def coalesce_small(ds, target_rows: int = 65536):
    """Merge small blocks before a wide op (streaming, not a shuffle).

    Two streaming steps because Ray 2.49 has no single op that does
    both: an identity ``map_batches`` with ``batch_size`` MERGES — Ray
    bundles consecutive small blocks into one task input, so a
    128-tiny-block intermediate (the normal shape after per-batch
    partial aggregation) collapses to ~rows/target_rows blocks instead
    of paying O(blocks^2) tiny-object transfers in the next shuffle —
    and ``repartition(target_num_rows_per_block=...)`` SPLITS oversized
    blocks (it never merges small ones; measured) so large inputs keep
    enough blocks for parallel reduce."""
    return ds.map_batches(lambda b: b, batch_format="pyarrow",
                          batch_size=target_rows) \
        .repartition(target_num_rows_per_block=target_rows)


def split_blocks(ds, target_rows: int = 16384):
    """Split-only sibling of coalesce_small: slice oversized blocks so
    the next shuffle/map_groups gets enough parallelism, WITHOUT the
    merge pass (which copies every row — wasted work when the input is
    a wide or already-well-blocked stream, e.g. banded minhash
    signatures feeding a per-band map_groups)."""
    return ds.repartition(target_num_rows_per_block=target_rows)


def default_pool_size(fraction: float | None = None, floor: int = 2) -> int:
    """Fixed actor-pool size from cluster CPUs, leaving headroom so
    read/write tasks are never starved (a pool == all CPUs deadlocks the
    streaming executor's other operators).

    Headroom is a small ABSOLUTE reserve (max(2, cpus//8)), not a
    fraction: the read/write side of a map-heavy pipeline needs a
    near-constant couple of cores regardless of cluster size, and a 25%
    reserve at 32 cpus measurably starves the pool (24 vs 28 actors is
    a 2x wall-time difference on the extraction benchmark). Pass
    ``fraction`` to override with the old proportional sizing.
    """
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = float(ray.cluster_resources().get("CPU", 8.0))
    if fraction is not None:
        return max(floor, int(cpus * fraction))
    return max(floor, int(cpus) - max(2, int(cpus) // 8))


_SPLITMIX_C1 = 0xBF58476D1CE4E5B9
_SPLITMIX_C2 = 0x94D049BB133111EB
SPLITMIX_GAMMA = 0x9E3779B97F4A7C15


def splitmix64(v):
    """Vectorized splitmix64 finalizer over a uint64 ndarray."""
    import numpy as np

    v = (v ^ (v >> np.uint64(30))) * np.uint64(_SPLITMIX_C1)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(_SPLITMIX_C2)
    return v ^ (v >> np.uint64(31))


def key_u64(arr):
    """uint64 representation of a key column (vectorized, process-
    independent): plain int64 cast for integer types (callers mix it
    with :func:`splitmix64` — dense TPC-H ids map contiguously raw),
    pandas' fixed-key siphash for everything else.

    Nulls in an integer column map to a fixed sentinel BEFORE the
    numpy conversion: a null-bearing arrow int column otherwise
    converts via float64, which both hits an undefined NaN->uint64
    cast and silently rounds every key above 2^53."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        if pa.types.is_unsigned_integer(arr.type):
            # bit-preserving widen: a checked cast to int64 raises
            # ArrowInvalid for uint64 values above 2^63; going through
            # uint64 then viewing the bits keeps every width exact
            arr = arr.cast(pa.uint64())
            if arr.null_count:
                arr = arr.fill_null((1 << 63) + 41)
            return arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        arr = arr.cast(pa.int64())
        if arr.null_count:
            arr = arr.fill_null(-(1 << 62) + 41)
        return arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    from pandas.util import hash_array

    return hash_array(arr.to_pandas().to_numpy(), categorize=False) \
        .astype(np.uint64)


def key_buckets(arr, num_buckets: int):
    """Deterministic hash bucket per key value: splitmix64 over
    :func:`key_u64` (a second finalizer pass over the siphash branch is
    harmless). Returns int32."""
    import numpy as np

    return (splitmix64(key_u64(arr)) % np.uint64(num_buckets)) \
        .astype(np.int32)


def _key_hash_fold(batch, cols):
    """Composite-key uint64 hash per row: per-column key_u64 hashes
    folded through splitmix64 (the same fold ``bucketed_map_groups``
    uses for bucket assignment)."""
    acc = None
    for c in cols:
        h = splitmix64(key_u64(batch.column(c)))
        acc = h if acc is None else splitmix64(acc ^ h)
    return acc


def cap_hot_keys(ds, key_col, *, max_key_rows: int, sample_col: str,
                 target_rows: int = 65536):
    """Safety valve for degenerate keys feeding a per-key exchange:
    deterministically subsample any key whose global row count exceeds
    ``max_key_rows`` down to ~``max_key_rows`` rows BEFORE the shuffle,
    so no bucket task ever has to hold an unbounded group (e.g. one
    LSH band collecting an all-identical corpus).

    Two passes: (1) a slim count pass (per-batch key-count combiner ->
    one groupby sum over DISTINCT keys) finds the hot keys — few by
    definition — whose per-key keep thresholds broadcast via
    ``ray.put``; (2) a map-only filter keeps a hot key's row iff
    ``splitmix64(keyhash ^ hash(sample_col))`` falls under
    ``2^64 * max_key_rows / count`` — a deterministic, partition- and
    order-invariant uniform subsample of expected size
    ``max_key_rows`` (binomial concentration keeps the realized size
    within a few percent at valve scales). ``sample_col`` names the
    per-row identity column (e.g. the doc id) that seeds the draw.

    TRUNCATION SEMANTICS (documented contract): keys over the cap are
    processed over the sampled subset only — for pair miners that
    yields pairs among ~max_key_rows representative members (the
    cluster stays connected through them); exactness below the cap is
    untouched. Returns the (materialized) input unchanged when no key
    is hot.

    COST: the input is MATERIALIZED once so the count pre-pass and
    the filtered real pass don't each re-execute expensive upstream
    map stages (e.g. MinHash signature computation); the armed valve
    therefore trades object-store space for upstream compute, on top
    of the slim count shuffle.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    cols = [key_col] if isinstance(key_col, str) else list(key_col)
    ds = ds.materialize()   # consumed twice: count pass + subsample

    def count_partial(batch: "pa.Table") -> "pa.Table":
        kh = _key_hash_fold(batch, cols)
        t = pa.table({"kh": pa.array(kh, pa.uint64()),
                      "pn": pa.array(np.ones(len(kh), np.int64))})
        c = t.group_by("kh").aggregate([("pn", "sum")])
        return pa.table({"kh": c.column("kh"),
                         "pn": pc.cast(c.column("pn_sum"), pa.int64())})

    def over_cap(batch: "pa.Table") -> "pa.Table":
        n = batch.column("sum(pn)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = n > max_key_rows
        return pa.table({
            "kh": batch.column("kh").filter(pa.array(keep)),
            "n": pa.array(n[keep], pa.int64()),
        })

    hot_rows = coalesce_small(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        target_rows) \
        .groupby("kh").aggregate(Sum("pn")) \
        .map_batches(over_cap, batch_format="pyarrow").take_all()
    if not hot_rows:
        return ds
    thresholds = {
        int(r["kh"]): np.uint64(
            min(int((1 << 64) * max_key_rows / int(r["n"])),
                (1 << 64) - 1))
        for r in hot_rows}
    thr_ref = ray.put(thresholds)

    def subsample(batch: "pa.Table") -> "pa.Table":
        thr = ray.get(thr_ref)
        kh = _key_hash_fold(batch, cols)
        draw = splitmix64(splitmix64(kh)
                          ^ splitmix64(key_u64(
                              batch.column(sample_col))))
        lim = np.full(len(kh), np.uint64(0xFFFFFFFFFFFFFFFF),
                      np.uint64)
        for h, t in thr.items():
            lim[kh == np.uint64(h)] = t
        return batch.filter(pa.array(draw < lim))

    return ds.map_batches(subsample, batch_format="pyarrow")


def per_key_in_buckets(ds, key_col, fn, *, num_buckets: int = 256,
                       target_rows: int = 65536, min_rows: int = 1,
                       max_key_rows: int | None = None,
                       sample_col: str | None = None):
    """Per-KEY ``map_groups`` semantics at per-BUCKET task cost.

    ``fn`` keeps the exact ``groupby(key).map_groups`` contract — it
    receives an Arrow table holding ONE key's rows and returns a
    table — but instead of launching one Ray task per entity, the
    stream shuffles on ``hash(key) % num_buckets``, each bucket task
    sorts by the key once, slices at key boundaries (zero-copy), and
    calls ``fn`` in-process per slice. Entity cardinality therefore
    never appears in the task count: per-entity overhead drops from a
    task launch (~tens of microseconds at best) to a function call,
    and the reducer fan-in is bounded by ``num_buckets`` at any scale.
    ``key_col`` may be a single column name or a list (composite key).
    ``min_rows`` skips key groups smaller than it WITHOUT calling
    ``fn`` — set it when small groups provably contribute nothing
    (pair mining needs >= 2 rows per bucket key; most band keys are
    singletons, and per-singleton fn/empty-table churn dominates
    otherwise). One representative call on a sub-threshold slice
    supplies the output schema when every group was skipped.
    ``max_key_rows`` (requires ``sample_col``) arms the hot-key safety
    valve: keys whose global row count exceeds it are deterministically
    subsampled to the cap via :func:`cap_hot_keys` BEFORE the shuffle
    (so one degenerate key can never blow a bucket task's memory) and
    exactly truncated to the cap inside the bucket — opt-in because
    the count pre-pass costs one extra slim shuffle; arm it on pair
    miners exposed to adversarial/degenerate corpora.
    Use for per-entity ops whose fn is not worth hand-vectorizing
    across entities; use :func:`bucketed_map_groups` directly when it
    is."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = [key_col] if isinstance(key_col, str) else list(key_col)

    if max_key_rows is not None:
        if sample_col is None:
            raise ValueError("max_key_rows requires sample_col (the "
                             "per-row identity column seeding the "
                             "deterministic subsample)")
        ds = cap_hot_keys(ds, cols, max_key_rows=max_key_rows,
                          sample_col=sample_col,
                          target_rows=target_rows)

    def _truncate(slice_tbl: "pa.Table") -> "pa.Table":
        # exact in-bucket cap: the pre-shuffle subsample is expected-
        # size, so trim any residue above the cap deterministically by
        # the SAME per-row draw cap_hot_keys thresholds on (smallest
        # draws win — the two stages keep one consistent sample)
        if max_key_rows is None or slice_tbl.num_rows <= max_key_rows:
            return slice_tbl
        kh = _key_hash_fold(slice_tbl, cols)
        draw = splitmix64(splitmix64(kh)
                          ^ splitmix64(key_u64(
                              slice_tbl.column(sample_col))))
        keep = np.argsort(draw, kind="stable")[:max_key_rows]
        return slice_tbl.take(pa.array(np.sort(keep)))

    def run(tbl: "pa.Table") -> "pa.Table":
        order = pc.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in cols])
        g = tbl.take(order)
        n = g.num_rows
        edge = np.zeros(max(n - 1, 0), bool)
        for c in cols:
            kv = g.column(c).to_numpy(zero_copy_only=False)
            edge |= kv[1:] != kv[:-1]
        bounds = np.nonzero(np.concatenate(([True], edge, [True])))[0]
        outs = [fn(_truncate(g.slice(s, e - s)))
                for s, e in zip(bounds[:-1], bounds[1:])
                if e - s >= min_rows]
        if not outs:
            # schema-only: fn of a sub-threshold slice yields its
            # (empty) output table
            outs = [fn(g.slice(0, min(n, max(min_rows - 1, 1))))]
        return pa.concat_tables(outs, promote_options="default")

    return bucketed_map_groups(ds, cols, run,
                               num_buckets=num_buckets,
                               target_rows=target_rows)


def bucketed_map_groups(ds, key_col: str, fn, *, num_buckets: int = 256,
                        target_rows: int = 65536):
    """Exact per-key reduction WITHOUT a per-key global shuffle.

    Ray's sort-based aggregate costs seconds of fixed overhead per
    ~100k distinct keys (boundary sampling + an all-to-all with one
    range per reducer). When the per-key reduction is expressible as
    vectorized Arrow/numpy over a slice of rows, it is much cheaper to
    shuffle on ``hash(key) % num_buckets`` — a LOW-cardinality groupby
    — and run the exact reduction inside each bucket group: the hash
    guarantees every row of a key lands in the same group, and
    ``num_buckets`` bounds both reducer count and skew independently
    of key cardinality (at 100 TB raise it; each bucket must fit one
    task's heap). ``fn`` receives all rows of one bucket (the key
    column included, ``_bucket`` already dropped) and returns any
    reduced table. ``key_col`` may be a single name or a list
    (composite key: per-column hashes fold through splitmix64)."""
    import numpy as np
    import pyarrow as pa

    cols = [key_col] if isinstance(key_col, str) else list(key_col)

    def tag(batch: "pa.Table") -> "pa.Table":
        acc = None
        for c in cols:
            h = splitmix64(key_u64(batch.column(c)))
            acc = h if acc is None else splitmix64(acc ^ h)
        b = (acc % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b, pa.int32()))

    def run(group: "pa.Table") -> "pa.Table":
        return fn(group.drop_columns(["_bucket"]))

    tagged = coalesce_small(ds.map_batches(tag, batch_format="pyarrow"),
                            target_rows)
    return tagged.groupby("_bucket").map_groups(
        run, batch_format="pyarrow")
