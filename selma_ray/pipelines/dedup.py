"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All stages stream over Arrow batches; the only wide ops are the
hash-keyed groupbys, each preceded by per-batch work that shrinks the
shuffle payload:

- exact:    md5(text) per row -> per-batch partial (min id per hash)
            -> groupby(hash) global min/count. The shuffle carries one
            row per distinct hash per batch, not one per input row.
- minhash:  shingle->signature per row in an actor pool (coefficients
            built once per actor), exploded to `bands` small rows
            (band_key, id, sig) -> groupby(band_key) -> within-bucket
            pairwise signature comparison. Bucket sizes are tiny by
            construction (hash of a signature band); a size cap guards
            against degenerate buckets (all-identical corpora).
- simhash:  64-bit signature -> 4 x 16-bit bands; Hamming<=3 dups are
            guaranteed to collide in >=1 band (pigeonhole).
- n-gram Jaccard: exact pairwise over a bounded id range, with the
  comparison side broadcast once via ray.put (never re-shipped per
  batch).

Dropping duplicates uses the "keep the smallest id in each duplicate
pair/cluster" rule. The cheap path (minhash_dedup) drops any doc that
is the larger id of some pair — deterministic, no iteration. The exact
path (connected_components / near_dup_clusters at the bottom of this
module) runs Hash-Min label propagation as iterated Ray Data
join+groupby rounds and yields true transitive clusters plus a
canonical ``keep`` flag per doc.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    jaccard,
    md5_64,
    md5_64_signed,
    minhash_signatures,
    shingle_hashes,
    simhash64,
)
from ..stages.util import (coalesce_small, per_key_in_buckets,
                           split_blocks)

# RE2's Perl \s (used by pyarrow split_pattern_regex and DuckDB
# regexp_*) is exactly [\t\n\f\r ]; Python's \s adds \v (and more
# under Unicode). Python-side tokenizers that must agree with an
# Arrow/SQL split use THIS class, never re's \s.
_RE2_WS = re.compile(r"[ \t\n\f\r]+")

PAIR_SCHEMA = pa.schema([
    ("id_a", pa.int64()),
    ("id_b", pa.int64()),
    ("similarity", pa.float64()),
    ("method", pa.string()),
])


def _with_schema_anchor(out, empty: pa.Table):
    """Union an empty typed block so a 0-row result keeps its schema:
    Ray's aggregate of a 0-row stream emits no blocks, leaving
    ``Dataset.schema()`` None and ``to_pandas()`` columnless (the
    dup_spans bug class — a corpus with no matches must still yield
    the operator's output schema)."""
    import ray.data

    return out.union(ray.data.from_arrow(empty))


def _empty_pairs(id_type=pa.int64()) -> pa.Table:
    if pa.types.is_int64(id_type):
        return PAIR_SCHEMA.empty_table()
    return pa.schema([("id_a", id_type), ("id_b", id_type),
                      ("similarity", pa.float64()),
                      ("method", pa.string())]).empty_table()


# -- exact ---------------------------------------------------------------


def add_md5(batch: pa.Table, text_col: str = "text",
            out_col: str = "text_hash") -> pa.Table:
    hs = [hashlib.md5((t or "").encode("utf-8", "surrogatepass")).hexdigest()
          for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(hs, pa.string()))


class _PartialExact:
    """Per-batch combiner: one (hash, min_id, count) row per distinct
    hash in the batch — shrinks the groupby shuffle to distinct keys."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = add_md5(batch, self.text_col)
        t = batch.select([self.id_col, "text_hash"])
        agg = t.group_by("text_hash").aggregate(
            [(self.id_col, "min"), (self.id_col, "count")])
        return pa.table({
            "text_hash": agg.column("text_hash"),
            "partial_min": agg.column(f"{self.id_col}_min"),
            "partial_n": pc.cast(agg.column(f"{self.id_col}_count"), pa.int64()),
        })


def exact_dedup_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset -> (text_hash, keep_id, n_dups): the survivor and group
    size per distinct text. SQL-oracle-checkable."""
    from ray.data.aggregate import Min, Sum

    partial = ds.map_batches(_PartialExact(id_col, text_col),
                             batch_format="pyarrow")
    agg = coalesce_small(partial).groupby("text_hash").aggregate(
        Min("partial_min"), Sum("partial_n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": batch.column("text_hash"),
            "keep_id": pc.cast(batch.column("min(partial_min)"), pa.int64()),
            "n_dups": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def _keep_winner_rows(ds, winners, *, id_col: str,
                      max_broadcast_ids: int, num_partitions: int,
                      text_col: str | None = None):
    """Survivor filter shared by the slim-exchange dedup ops: keep the
    rows of ``ds`` whose ``id_col`` is in the (materialized) winners
    dataset's ``keep`` column — broadcast ``ray.put`` + vectorized
    ``is_in`` while the winner count fits ``max_broadcast_ids``, a
    native hash-partitioned ``left_semi`` join past it. With
    ``text_col`` set, survivors get the recomputed ``text_hash``
    appended (exact_dedup's output contract)."""
    import ray

    def tag_hash(batch: pa.Table) -> pa.Table:
        return add_md5(batch, text_col)

    n_winners = winners.count()
    if n_winners == 0:
        # empty corpus: nothing to keep, nothing to join against
        return ds.map_batches(tag_hash, batch_format="pyarrow") \
            if text_col else ds
    if n_winners <= max_broadcast_ids:
        keep_ref = ray.put(pa.concat_tables(
            ray.get(winners.to_arrow_refs())).column("keep")
            .combine_chunks())

        def filt(batch: pa.Table) -> pa.Table:
            keep = ray.get(keep_ref)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            kept = batch.filter(pc.is_in(ids, value_set=keep))
            return add_md5(kept, text_col) if text_col else kept

        return ds.map_batches(filt, batch_format="pyarrow")

    sch = winners.schema()
    probe = _with_null_sentinel(
        winners, "keep", dict(zip(sch.names, sch.types))["keep"])
    joined = ds.join(probe, join_type="left_semi",
                     num_partitions=num_partitions,
                     on=(id_col,), right_on=("keep",))
    return joined.map_batches(tag_hash, batch_format="pyarrow") \
        if text_col else joined


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                max_broadcast_ids: int = 5_000_000,
                num_partitions: int = 8,
                hash_col: str | None = None,
                winner_input=None,
                materialize_input: bool = False):
    """Dataset -> Dataset with exactly one (min-id) row per distinct
    text (output schema = input + ``text_hash``; when ``hash_col`` is
    given the input already carries the hash, so the schema is
    unchanged).

    Text never rides a shuffle. Pass 1 reduces each block to its
    distinct (text_hash, min_id) pairs — tens of bytes per row — and a
    bucketed per-hash min yields the global winner id per distinct
    text. Pass 2 re-streams the input and keeps winner rows map-only:
    the winner-id set (one id per DISTINCT text) broadcasts via
    ``ray.put`` + vectorized ``is_in`` while it fits
    (``max_broadcast_ids``); past that the filter switches to a native
    hash-partitioned ``left_semi`` join on id. Compared to shipping
    min-id candidate ROWS through the exchange (the previous shape),
    the shuffle shrinks by the average row width — ~1000x for
    web-document text — at the cost of hashing the text twice (cheap,
    map-side, embarrassingly parallel).

    Slim-read hooks for checkpointed inputs:

    ``hash_col``
        Name of a PRECOMPUTED md5-hex column already in ``ds`` (and in
        ``winner_input`` if given). Skips all re-hashing: pass 1 groups
        on the stored column and pass 2 keeps it as-is — at 100 TB this
        removes the only per-row Python work in the operator.
    ``winner_input``
        Optional slim Dataset carrying at least (``id_col``,
        ``hash_col``) used for pass 1 INSTEAD of ``ds`` — typically a
        column-pruned ``read_parquet(ckpt, columns=[id, hash])`` over
        the same checkpoint ``ds`` reads in full, so the winner pass
        decodes ~2% of the bytes. Caller contract: same rows as ``ds``.
        Requires ``hash_col`` (a slim projection has no text to hash).
    ``materialize_input``
        ``ds`` is consumed twice (winner pass + filter pass), so the
        upstream pipeline must be deterministic — which every operator
        in this repo already guarantees (the partition-invariance
        contract). For a NON-deterministic upstream (unseeded external
        source, stateful tagger), set ``materialize_input=True``: the
        input is pinned to the object store once and both passes read
        the same blocks. Off by default — at 100 TB you want the
        checkpointed-parquet shape instead, not a full-corpus pin.
    """
    from ..stages.util import bucketed_map_groups

    if winner_input is not None and hash_col is None:
        raise ValueError("winner_input requires hash_col: a slim "
                         "projection has no text column to hash")
    if materialize_input:
        ds = ds.materialize()

    def slim(batch: pa.Table) -> pa.Table:
        if hash_col is None:
            b = add_md5(batch, text_col)
            hc = "text_hash"
        else:
            b, hc = batch, hash_col
        t = b.select([id_col, hc])
        agg = t.group_by(hc).aggregate([(id_col, "min")])
        return pa.table({
            "text_hash": agg.column(hc),
            "cand": agg.column(f"{id_col}_min"),
        })

    def min_in_bucket(bucket: pa.Table) -> pa.Table:
        agg = bucket.group_by("text_hash").aggregate([("cand", "min")])
        return pa.table({"keep": agg.column("cand_min")})

    src = ds if winner_input is None else winner_input
    winners = bucketed_map_groups(
        src.map_batches(slim, batch_format="pyarrow"),
        "text_hash", min_in_bucket).materialize()

    return _keep_winner_rows(ds, winners, id_col=id_col,
                             max_broadcast_ids=max_broadcast_ids,
                             num_partitions=num_partitions,
                             text_col=None if hash_col else text_col)


def exact_dedup_combine_batch(batch: pa.Table, *, id_col: str = "doc_id",
                              text_col: str = "text") -> pa.Table:
    """Pre-shuffle combiner for exact_dedup: keep the min-id row per
    distinct text WITHIN one block. Exposed so tests can assert the
    row reduction the shuffle sees."""
    batch = add_md5(batch, text_col)
    order = pc.sort_indices(
        batch, sort_keys=[("text_hash", "ascending"),
                          (id_col, "ascending")])
    srt = batch.take(order)
    hs = srt.column("text_hash").to_numpy(zero_copy_only=False)
    first = np.ones(len(hs), bool)
    first[1:] = hs[1:] != hs[:-1]
    return srt.filter(pa.array(first))


# -- MinHash + LSH ---------------------------------------------------------


class MinHashBandStage:
    """Actor: text -> MinHash signature -> `bands` (band_key, id, sig) rows.

    Coefficients are derived once per actor in __init__ (deterministic
    seed, so every actor agrees). Output rows are small (key + k*8B
    signature), which is what travels through the band groupby shuffle —
    the document text never shuffles.
    """

    def __init__(self, *, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 128, bands: int = 16, ngram: int = 3):
        assert k % bands == 0
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.bands = bands
        self.ngram = ngram
        # touch the coefficient cache once per actor
        minhash_signatures([np.empty(0, dtype=np.uint64)], k=k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        hash_sets = [shingle_hashes(t or "", self.ngram) for t in texts]
        sigs = minhash_signatures(hash_sets, k=self.k)
        rows = self.k // self.bands
        out_key, out_id, out_sig = [], [], []
        for i, doc_id in enumerate(ids):
            sig_bytes = sigs[i].tobytes()
            for b in range(self.bands):
                # md5 over the band's HEX form (not raw bytes): ASCII-
                # safe so the DuckDB oracle can mirror the key exactly
                # (md5(VARCHAR) only); same bucketing semantics.
                band = sigs[i, b * rows:(b + 1) * rows].tobytes().hex()
                key = (bytes([b])
                       + hashlib.md5(band.encode()).digest()[:8]).hex()
                out_key.append(key)
                out_id.append(doc_id)
                out_sig.append(sig_bytes)
        return pa.table({
            "band_key": pa.array(out_key, pa.string()),
            "id": pa.array(out_id, batch.column(self.id_col).type),
            "sig": pa.array(out_sig, pa.binary()),
        })


# per-worker stage cache: stateless map_batches tasks reuse Ray's warm
# worker processes, so a parameter-keyed module cache gives the same
# build-once behavior an actor pool would — without pool spin-up
_STAGE_CACHE: dict = {}


def _cached_stage(cls, **kw):
    key = (cls.__name__,) + tuple(sorted(kw.items()))
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE.setdefault(key, cls(**kw))
    return st


def _minhash_band_fn(batch: pa.Table, **kw) -> pa.Table:
    return _cached_stage(MinHashBandStage, **kw)(batch)


def _simhash_band_fn(batch: pa.Table, **kw) -> pa.Table:
    return _cached_stage(SimHashBandStage, **kw)(batch)


def _bucket_pairs_fn(k: int, threshold: float, max_bucket: int):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        id_type = group.column("id").type
        if n < 2:
            return _empty_pairs(id_type)
        order = pc.sort_indices(group.column("id"))
        ids = pc.take(group.column("id"), order).to_pylist()
        sig_col = pc.take(group.column("sig"), order).to_pylist()
        if n > max_bucket:
            # degenerate bucket (e.g. an all-identical corpus): compare
            # everything to the smallest id only — still links every
            # member to the cluster representative, O(n) not O(n^2).
            sigs = np.frombuffer(b"".join(sig_col), dtype=np.uint64
                                 ).reshape(n, k)
            est = (sigs[1:] == sigs[0]).mean(axis=1)
            mask = est >= threshold
            return pa.table({
                "id_a": pa.array([ids[0]] * int(mask.sum()), id_type),
                "id_b": pa.array([i for i, m in zip(ids[1:], mask) if m],
                                 id_type),
                "similarity": pa.array(est[mask], pa.float64()),
                "method": pa.array(["minhash_lsh"] * int(mask.sum())),
            })
        sigs = np.frombuffer(b"".join(sig_col), dtype=np.uint64).reshape(n, k)
        a_out, b_out, s_out = [], [], []
        for i in range(n - 1):
            est = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            for j in np.nonzero(est >= threshold)[0]:
                a_out.append(ids[i])
                b_out.append(ids[i + 1 + j])
                s_out.append(float(est[j]))
        return pa.table({
            "id_a": pa.array(a_out, id_type),
            "id_b": pa.array(b_out, id_type),
            "similarity": pa.array(s_out, pa.float64()),
            "method": pa.array(["minhash_lsh"] * len(a_out)),
        })
    return bucket_pairs


def minhash_lsh_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 128, bands: int = 16, ngram: int = 3,
                      threshold: float = 0.7, max_bucket: int = 2000,
                      max_band_rows: int | None = None,
                      concurrency=None, id_type=None):
    """Dataset -> candidate duplicate pairs (id_a < id_b, est-Jaccard >=
    threshold), deduplicated across bands.

    Runs as STATELESS tasks, not an actor pool: the per-worker state
    (minhash coefficients, word-hash cache) is microseconds to build and
    lives in module-level caches that warm Ray's reused worker processes
    — an actor pool would pay its spin-up (~2s for a wide pool) on every
    small/interactive input for no setup amortization. Pass
    ``concurrency`` to cap in-flight tasks if the stage must share a
    cluster with heavier neighbors.

    ``max_band_rows`` arms the hot-key safety valve on the band
    exchange: a degenerate band key (e.g. an all-identical corpus
    collapsing into ONE band bucket) is deterministically subsampled
    to that many member rows BEFORE the shuffle, bounding bucket-task
    memory; pairs are then mined among the ~max_band_rows sampled
    members (documented truncation — ``max_bucket``'s representative
    linking still applies inside). Opt-in (one extra slim count
    shuffle); set it when the corpus may be adversarially repetitive.
    """
    kwargs = dict(fn_kwargs=dict(
        id_col=id_col, text_col=text_col, k=k, bands=bands, ngram=ngram),
        batch_format="pyarrow")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    banded = ds.map_batches(_minhash_band_fn, **kwargs)
    pairs = per_key_in_buckets(
        banded, "band_key", _bucket_pairs_fn(k, threshold, max_bucket),
        target_rows=16384, min_rows=2,
        max_key_rows=max_band_rows,
        sample_col="id" if max_band_rows is not None else None)
    # a pair can surface in several bands: keep one copy (aggregate, not
    # per-group map_groups — pairs are tiny but numerous)
    return _dedup_pairs(pairs, "minhash_lsh", id_type)


def _dedup_pairs(pairs, method: str, id_type=None):
    """Keep one copy per (id_a, id_b): groupby + max(similarity).
    ``id_type`` types the empty-result schema anchor (defaults to the
    module's int64 PAIR_SCHEMA contract — pass the corpus id type for
    non-int64 ids so a no-match result reports the right schema)."""
    from ray.data.aggregate import Max

    agg = split_blocks(pairs, target_rows=65536) \
        .groupby(["id_a", "id_b"]).aggregate(Max("similarity"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "similarity": batch.column("max(similarity)"),
            "method": pa.array([method] * batch.num_rows, pa.string()),
        })

    return _with_schema_anchor(
        agg.map_batches(rename, batch_format="pyarrow"),
        _empty_pairs(id_type or pa.int64()))


def drop_ids_from_pairs(pairs) -> "set[int]":
    """Survivor rule: drop the larger id of every pair. The pairs table
    is tiny relative to the corpus (dups only), so collecting ids to the
    driver/broadcast is fine; past ``max_broadcast_ids``
    :func:`minhash_dedup` routes the same rule through
    :func:`anti_join_survivors` instead of this collect."""
    return {r["id_b"] for r in pairs.select_columns(["id_b"]).take_all()}


def _with_null_sentinel(ds2, col: str, dtype: "pa.DataType"):
    # An all-empty join side leaves Ray's hash-shuffle partitions
    # schemaless and Acero rejects the key ref; one NULL-keyed row
    # (null never equals anything in a hash join) pins the schema.
    import ray.data

    sentinel = ray.data.from_arrow(
        pa.table({col: pa.array([None], dtype)}))
    return ds2.union(sentinel)


def anti_join_survivors(ds, pairs, *, id_col: str = "doc_id",
                        num_partitions: int = 8):
    """Survivor filter at fact scale: distinct drop ids (the ``id_b``
    of every pair) feed a native hash-partitioned ``left_anti`` join
    against the corpus — no driver collect, no broadcast. Right shape
    when the pair set itself is too big for the object-store broadcast
    (a dup-heavy crawl at 100 TB); the join shuffles the corpus once,
    keyed on id."""

    def slim(batch: pa.Table) -> pa.Table:
        ids = batch.column("id_b")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"id_b": pc.unique(ids)})

    drop_keys = _with_null_sentinel(
        pairs.map_batches(slim, batch_format="pyarrow"),
        "id_b", pa.int64())
    return ds.join(drop_keys, join_type="left_anti",
                   num_partitions=num_partitions,
                   on=(id_col,), right_on=("id_b",))


def minhash_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  max_broadcast_ids: int = 2_000_000,
                  num_partitions: int = 8, **kw):
    """Dataset -> Dataset with near-duplicates (larger ids) removed.

    Picks the survivor-filter shape from the measured pair count: up to
    ``max_broadcast_ids`` pairs the drop-id set collects to the driver
    and broadcasts (``ray.put`` once, map-only filter — corpus text
    never rides a shuffle); past it the filter switches automatically
    to :func:`anti_join_survivors`, the hash-partitioned ``left_anti``
    join the incremental path (:func:`dedup_against`) uses, so a
    dup-heavy corpus can never outgrow the driver. The pairs dataset is
    materialized once (dup-pairs only, far smaller than the corpus)
    and feeds whichever path is chosen."""
    import ray

    pairs = minhash_lsh_pairs(ds, id_col=id_col, text_col=text_col,
                              **kw).materialize()
    if pairs.count() > max_broadcast_ids:
        return anti_join_survivors(ds, pairs, id_col=id_col,
                                   num_partitions=num_partitions)
    drop = drop_ids_from_pairs(pairs)
    drop_ref = ray.put(drop)

    def filt(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if not d:
            return batch
        mask = [i not in d for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(filt, batch_format="pyarrow")


# -- SimHash ---------------------------------------------------------------


class SimHashBandStage:
    """Actor: text -> 64-bit SimHash -> 4 (band_key, id, sim) rows.
    Hamming distance <= 3 guarantees a collision in >= 1 of the 4
    16-bit bands."""

    def __init__(self, *, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_key, out_id, out_sim = [], [], []
        for doc_id, t in zip(ids, texts):
            h = simhash64(t or "")
            for b in range(4):
                band_val = (h >> (16 * b)) & 0xFFFF
                out_key.append((b << 16) | band_val)
                out_id.append(doc_id)
                out_sim.append(h)
        return pa.table({
            "band_key": pa.array(out_key, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "simhash": pa.array(out_sim, pa.uint64()),
        })


def _simhash_bucket_pairs(max_dist: int, max_bucket: int):
    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        id_type = group.column("id").type
        if n < 2:
            return _empty_pairs(id_type)
        order = pc.sort_indices(group.column("id"))
        ids = np.asarray(pc.take(group.column("id"), order))
        sims = np.asarray(pc.take(group.column("simhash"), order))
        if n > max_bucket:
            # degenerate bucket: compare everything to the smallest id
            # only (O(n)) — same representative-linking rule as the
            # minhash path, so no member silently escapes dedup the
            # way plain truncation would drop rows past the cap
            x = sims[1:] ^ sims[0]
            dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                 axis=1).sum(axis=1)
            keep = np.nonzero(dist <= max_dist)[0]
            return pa.table({
                "id_a": pa.array([int(ids[0])] * keep.size, pa.int64()),
                "id_b": pa.array([int(ids[1 + j]) for j in keep],
                                 pa.int64()),
                "similarity": pa.array(
                    [1.0 - dist[j] / 64.0 for j in keep], pa.float64()),
                "method": pa.array(["simhash"] * keep.size),
            })
        a_out, b_out, d_out = [], [], []
        for i in range(n - 1):
            x = sims[i + 1:] ^ sims[i]
            # vectorized popcount via uint8 view
            dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                 axis=1).sum(axis=1)
            for j in np.nonzero(dist <= max_dist)[0]:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[i + 1 + j]))
                d_out.append(1.0 - dist[j] / 64.0)
        return pa.table({
            "id_a": pa.array(a_out, pa.int64()),
            "id_b": pa.array(b_out, pa.int64()),
            "similarity": pa.array(d_out, pa.float64()),
            "method": pa.array(["simhash"] * len(a_out)),
        })
    return bucket_pairs


def simhash_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  max_dist: int = 3, max_bucket: int = 5000,
                  concurrency=None, id_type=None):
    """Stateless-task banding for the same reason as minhash_lsh_pairs."""
    kwargs = dict(fn_kwargs=dict(id_col=id_col, text_col=text_col),
                  batch_format="pyarrow")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    banded = ds.map_batches(_simhash_band_fn, **kwargs)
    pairs = per_key_in_buckets(
        banded, "band_key", _simhash_bucket_pairs(max_dist, max_bucket),
        min_rows=2)
    return _dedup_pairs(pairs, "simhash", id_type)


def image_phash_pairs(ds, *, id_col: str = "doc_id",
                      data_col: str = "data", max_dist: int = 3,
                      max_bucket: int = 5000, concurrency=(1, 8),
                      batch_size: int = 16, fake: bool = False):
    """IMAGE near-duplicate candidate pairs (id_a < id_b, similarity =
    1 - hamming/64 with hamming <= max_dist) over a binary image
    column — the multimodal dedup tier byte-exact dedup cannot see
    (the same photo re-encoded PNG vs JPEG, or at two qualities,
    hashes identically under aHash but never under md5).

    Composition: a decode actor pool (``ImagePHashBands``, small
    batches because payloads are big) emits the same banded rows as
    the text SimHash stage, then the identical hamming-bucket
    machinery runs — only 26-byte band rows ride the shuffle, never
    image bytes. Partitioning assumption: as with simhash, a band
    bucket (images sharing one 16-bit hash band) fits a task; the
    degenerate-bucket cap compares against the smallest id past
    ``max_bucket``.
    """
    from ..stages.multimodal import ImagePHashBands

    banded = ds.map_batches(
        ImagePHashBands,
        fn_constructor_kwargs=dict(id_col=id_col, data_col=data_col,
                                   fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    pairs = per_key_in_buckets(
        banded, "band_key", _simhash_bucket_pairs(max_dist, max_bucket),
        min_rows=2)
    return _dedup_pairs(pairs, "image_phash")


# -- exact n-gram Jaccard ----------------------------------------------------


def ngram_jaccard_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                        ngram: int = 3, threshold: float = 0.5,
                        max_id: int | None = None):
    """Exact word-n-gram Jaccard pairs (id_a < id_b, jaccard >= threshold).

    The comparison side (optionally bounded to id < max_id) is broadcast
    ONCE via ray.put and read inside every task — O(n^2) similarity work
    is distributed across batches of the left side while the right side
    never re-ships per batch. SQL-oracle-checkable (DuckDB list algebra).
    """
    import ray

    if max_id is None:
        sub = ds
    else:
        def _below(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less(batch.column(id_col),
                                        pa.scalar(max_id)))
        sub = ds.map_batches(_below, batch_format="pyarrow")

    def to_hashes(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hs = [shingle_hashes(t or "", ngram) for t in texts]
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "hashes": pa.array([h.tolist() for h in hs],
                               pa.list_(pa.uint64())),
        })

    hashed = sub.map_batches(to_hashes, batch_format="pyarrow")
    # small side by construction (bounded id range): broadcast once
    right = hashed.take_all()
    right_ids = np.array([r["id"] for r in right], dtype=np.int64)
    right_hs = [np.array(r["hashes"], dtype=np.uint64) for r in right]
    ref = ray.put((right_ids, right_hs))

    def pairs_fn(batch: pa.Table) -> pa.Table:
        r_ids, r_hs = ray.get(ref)
        a_out, b_out, s_out = [], [], []
        for rid, hs in zip(batch.column("id").to_pylist(),
                           batch.column("hashes").to_pylist()):
            ha = np.array(hs, dtype=np.uint64)
            for j in np.nonzero(r_ids > rid)[0]:
                sim = jaccard(ha, r_hs[j])
                if sim >= threshold:
                    a_out.append(rid)
                    b_out.append(int(r_ids[j]))
                    s_out.append(sim)
        return pa.table({
            "id_a": pa.array(a_out, pa.int64()),
            "id_b": pa.array(b_out, pa.int64()),
            "similarity": pa.array(s_out, pa.float64()),
            "method": pa.array(["ngram_jaccard"] * len(a_out)),
        })

    return hashed.map_batches(pairs_fn, batch_format="pyarrow")


def connected_components(pairs_ds, *, num_partitions: int = 8,
                         max_iters: int = 50):
    """Connected components over an undirected pair list via Hash-Min
    label propagation: every node repeatedly adopts the smallest label
    among itself and its neighbors until nothing changes.

    Returns a Dataset (node:int64, label:int64) covering every node that
    appears in at least one pair; ``label`` is the smallest node id in
    the component.

    Scale shape (the standard big-data CC algorithm — Hash-Min of
    Rastogi et al., "Finding Connected Components in Map-Reduce",
    ICDE'13 — re-expressed as Ray Data rounds):

    - the symmetrized edge table is materialized ONCE and re-read from
      the object store every round (never recomputed, never collected);
    - each round is one hash-partitioned join (labels into edges, keyed
      by src) + one groupby-min over (neighbor labels ∪ own labels);
      nothing driver-side but a per-round int64 convergence scalar;
    - only the label table (O(#nodes) rows) materializes per round, to
      truncate lineage; rounds needed = the largest component's
      diameter. Near-dup clusters are dense and shallow (2-4 rounds);
      pathological chain graphs are bounded by ``max_iters``;
    - sum(label) decreases monotonically, so an unchanged sum is the
      fixpoint — an exact integer test, no tolerance.
    """
    import ray.data
    from ray.data.aggregate import Min

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"src": np.concatenate([a, b]),
                         "dst": np.concatenate([b, a])})

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    # round 0 fused into init: label[node] = min(node, min neighbor)
    def init_label(batch: pa.Table) -> pa.Table:
        node = pc.cast(batch.column("src"), pa.int64())
        mn = pc.cast(batch.column("min(dst)"), pa.int64())
        return pa.table({"node": node,
                         "label": pc.min_element_wise(node, mn)})

    labels = edges.groupby("src").aggregate(Min("dst")) \
        .map_batches(init_label, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    def as_node(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(batch.column("dst"), pa.int64()),
                         "label": pc.cast(batch.column("label"),
                                          pa.int64())})

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(batch.column("node"), pa.int64()),
                         "label": pc.cast(batch.column("min(label)"),
                                          pa.int64())})

    for _ in range(max_iters):
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=num_partitions,
                          on=("src",), right_on=("node",)) \
            .map_batches(as_node, batch_format="pyarrow")
        labels_new = msgs.union(labels).groupby("node") \
            .aggregate(Min("label")) \
            .map_batches(fin, batch_format="pyarrow").materialize()
        new_sum = labels_new.sum("label")
        labels = labels_new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    # the hash aggregate can emit schema-less EMPTY blocks on sparse
    # partitions; a downstream acero join rejects them ("no match for
    # FieldRef"). The streaming repartition merges them away.
    return coalesce_small(labels)


def near_dup_clusters(docs_ds, pairs_ds, *, id_col: str = "doc_id",
                      num_partitions: int = 8):
    """End-to-end near-dup clustering: (doc_id, cluster_id, keep) for
    every input doc. ``cluster_id`` is the connected-component id over
    the pair graph (smallest member id); docs in no pair are their own
    singleton cluster; ``keep`` marks the canonical (minimum-id) member
    — filtering on it yields the deduplicated corpus.

    The doc side streams: components (small — only pair endpoints) are
    attached with a left-outer hash join, so the full corpus is never
    collected or broadcast.
    """
    comp = connected_components(pairs_ds, num_partitions=num_partitions)

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch.column(id_col),
                                           pa.int64())})

    # hash-shuffling a 0-row join side yields schema-less partitions
    # acero rejects; no pairs means every doc is its own cluster anyway.
    # (The count costs one pass over the SMALL label table, not docs.)
    if comp.count() == 0:
        def singleton(batch: pa.Table) -> pa.Table:
            doc = pc.cast(batch.column(id_col), pa.int64())
            return pa.table({
                "doc_id": doc, "cluster_id": doc,
                "keep": pa.array(np.ones(len(doc), dtype=bool)),
            })
        return docs_ds.map_batches(singleton, batch_format="pyarrow")

    def fin(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id")
        cid = pc.coalesce(batch.column("label"), doc)
        return pa.table({"doc_id": doc, "cluster_id": cid,
                         "keep": pc.equal(cid, doc)})

    return docs_ds.map_batches(slim, batch_format="pyarrow") \
        .join(comp, join_type="left_outer", num_partitions=num_partitions,
              on=("doc_id",), right_on=("node",)) \
        .map_batches(fin, batch_format="pyarrow")


def dup_span_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   window: int = 16, stride: int = 8,
                   max_id: int | None = None,
                   max_bucket: int | None = None):
    """Exact duplicate-span detection (the substring-dedup family of
    Lee et al. 2021, windowed form): cross-doc pairs (id_a < id_b,
    n_shared) that share >= 1 exact ``window``-token span, counted over
    distinct spans.

    Per batch each doc emits the md5 digest of every token window at
    ``stride`` offsets, deduped within the doc — 16-byte-digest rows ride
    the shuffle, never window text. The wide ops are one groupby(digest)
    whose buckets emit cross-doc pairs (same bucket shape as LSH banding;
    a digest shared by many docs IS a duplication cluster — cap blowup
    with ``max_bucket`` at corpus scale) and one (id_a,id_b) groupby-count.
    Production-scale variant: swap md5 for a 64-bit rolling hash and
    stride 1 for exact substring coverage.
    """
    import hashlib as _hl

    def windows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        h_out: list[str] = []
        d_out: list[int] = []
        for did, text in zip(ids, texts):
            if max_id is not None and did >= max_id:
                continue
            toks = (text or "").split()
            n = len(toks)
            if n == 0:
                # an empty doc must not emit md5("") — every empty doc
                # would land in ONE bucket and pair O(m^2) while
                # claiming a shared 16-token span (oracle mirrors this)
                continue
            seen: set[str] = set()
            for j in range(0, max(n - (window - 1), 1), stride):
                win = " ".join(toks[j:j + window])
                dig = _hl.md5(win.encode()).hexdigest()
                if dig not in seen:
                    seen.add(dig)
                    h_out.append(dig)
                    d_out.append(did)
        return pa.table({"h": pa.array(h_out, pa.string()),
                         "doc": pa.array(d_out, pa.int64())})

    def bucket_pairs(group):
        import pandas as pd

        docs = sorted(set(group["doc"].tolist()))
        if max_bucket is not None:
            docs = docs[:max_bucket]
        a_out, b_out = [], []
        for i in range(len(docs) - 1):
            for j in range(i + 1, len(docs)):
                a_out.append(docs[i])
                b_out.append(docs[j])
        return pd.DataFrame({"id_a": pd.array(a_out, dtype="int64"),
                             "id_b": pd.array(b_out, dtype="int64")})

    from ray.data.aggregate import Count

    wins = coalesce_small(ds.map_batches(windows, batch_format="pyarrow"))
    pairs = per_key_in_buckets(
        wins, "h",
        lambda t: pa.Table.from_pandas(bucket_pairs(t.to_pandas()),
                                       preserve_index=False),
        min_rows=2)
    agg = coalesce_small(pairs).groupby(["id_a", "id_b"]) \
        .aggregate(Count())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "n_shared": pc.cast(batch.column("count()"), pa.int64()),
        })

    return _with_schema_anchor(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("n_shared", pa.int64())]).empty_table())


# -- incremental dedup vs a prior snapshot --------------------------------


def snapshot_hashes(snapshot_ds, *, text_col: str = "text") -> "np.ndarray":
    """Sorted uint64 md5 fingerprints of every distinct text in
    ``snapshot_ds`` — the broadcast side of :func:`dedup_against`.

    Per-batch dedup shrinks the collected payload to distinct hashes; the
    driver only ever holds 8 bytes per distinct snapshot doc (a 1B-doc
    snapshot is 8 GB — at that point use ``mode="antijoin"`` instead)."""

    def digest(batch: pa.Table) -> pa.Table:
        hs = {md5_64((t or "").encode("utf-8", "surrogatepass"))
              for t in batch.column(text_col).to_pylist()}
        return pa.table({"h": pa.array(np.fromiter(hs, dtype=np.uint64,
                                                   count=len(hs)))})

    parts = [b.column("h").to_numpy(zero_copy_only=False)
             for b in snapshot_ds.map_batches(
                 digest, batch_format="pyarrow").iter_batches(
                     batch_size=None, batch_format="pyarrow")]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    out = np.unique(np.concatenate(parts))
    return out


def _bloom_positions(texts, m_bits) -> "np.ndarray":
    """(n, k) uint64 bit positions via md5 double hashing:
    pos_j = (h1 + j*h2) mod m, h1/h2 = the two md5 digest halves
    (Kirsch-Mitzenmacher: k independent-enough probes from one hash)."""
    js = np.arange(_BLOOM_K, dtype=np.uint64)
    out = np.empty((len(texts), _BLOOM_K), dtype=np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5((t or "").encode("utf-8", "surrogatepass")).digest()
        h1 = np.uint64(int.from_bytes(d[:8], "little"))
        h2 = np.uint64(int.from_bytes(d[8:], "little") | 1)
        out[i] = h1 + js * h2  # uint64 wraparound is part of the hash
    return out % np.uint64(m_bits)


_BLOOM_K = 7
_BLOOM_SEGMENT_BITS = 1 << 20  # 128 KiB bitmap segment per shuffle group


def snapshot_bloom(snapshot_ds, *, text_col: str = "text",
                   m_bits: int = 1 << 23) -> "np.ndarray":
    """Distributed Bloom-filter build over a snapshot corpus: a packed
    uint8 bitmap of ``m_bits`` bits (k=7 probes per doc).

    Scale shape: the corpus pass emits only 8-byte bit POSITIONS
    (deduped per batch); one groupby(segment) shuffle assembles each
    128 KiB bitmap segment in its own task (OR-ing happens where the
    positions land, never on the driver); the driver then concatenates
    exactly ``m_bits/8`` bytes regardless of snapshot row count. Unlike
    :func:`snapshot_hashes` the broadcast side is CONSTANT-size (1 MiB
    default), the trade being a false-drop rate of
    ``(1 - e^(-k*n/m))^k`` — size ``m_bits`` ~10 bits/doc for ~1%%.
    """
    def positions_fn(batch: pa.Table) -> "np.ndarray":
        return _bloom_positions(batch.column(text_col).to_pylist(),
                                np.uint64(m_bits))

    return bloom_from_positions(snapshot_ds, positions_fn, m_bits=m_bits)


def bloom_from_positions(ds, positions_fn, *, m_bits: int) -> "np.ndarray":
    """Segment-assembled distributed Bloom build from any vectorized
    probe-position function (batch -> (n, k) uint64 positions).

    Shared scale shape (see :func:`snapshot_bloom`): the corpus pass
    ships only deduped 8-byte positions, one groupby(segment) shuffle
    ORs each 128 KiB bitmap segment in its own task, the driver
    concatenates exactly ``m_bits/8`` bytes."""
    import pandas as pd

    seg_bits = min(m_bits, _BLOOM_SEGMENT_BITS)
    assert m_bits % seg_bits == 0 and seg_bits % 8 == 0

    def positions(batch: pa.Table) -> pa.Table:
        pos = np.unique(positions_fn(batch))
        return pa.table({
            "seg": pa.array((pos // seg_bits).astype(np.int64)),
            "pos": pa.array(pos.astype(np.int64)),
        })

    def build_segment(group: "pd.DataFrame") -> "pd.DataFrame":
        seg = int(group["seg"].iloc[0])
        local = group["pos"].to_numpy() - seg * seg_bits
        bits = np.zeros(seg_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(bits, local >> 3,
                         np.uint8(1) << (local & 7).astype(np.uint8))
        return pd.DataFrame({"seg": [seg], "bits": [bits.tobytes()]})

    segs = ds.map_batches(positions, batch_format="pyarrow") \
        .groupby("seg").map_groups(build_segment)
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in segs.take_all():
        i = row["seg"] * (seg_bits // 8)
        out[i:i + seg_bits // 8] = np.frombuffer(row["bits"], dtype=np.uint8)
    assert len(out) == m_bits // 8
    return out


def dedup_against(incoming_ds, snapshot_ds, *, text_col: str = "text",
                  mode: str = "broadcast", num_partitions: int = 8,
                  id_col: str = "doc_id", bloom_m_bits: int = 1 << 23):
    """Incremental dedup: drop incoming docs whose exact text already
    exists in a prior corpus snapshot (cross-run dedup — the "don't
    retrain on last month's crawl" op). Keeps the incoming schema.

    ``mode="broadcast"`` (default): the snapshot collapses to a sorted
    uint64 md5-fingerprint array, ``ray.put`` once, binary-searched
    zero-copy inside a map-only filter pass — incoming text never rides
    a shuffle. Right shape while the snapshot digest array fits the
    object store (8 bytes/doc). 64-bit fingerprints make a false drop a
    ~2^-64-per-pair event (the SQL oracle uses full md5; any mismatch at
    test scale would surface there).

    ``mode="bloom"``: the snapshot collapses to a CONSTANT-size packed
    Bloom bitmap (:func:`snapshot_bloom`, 1 MiB default) instead of an
    8-bytes-per-doc array — the broadcast stays bounded no matter how
    large the snapshot grows, at the price of a tunable false-DROP rate
    ``(1-e^(-kn/m))^k`` (never false keeps). Pick this when the
    snapshot is too big for ``broadcast`` but an occasional extra drop
    is acceptable (it usually is for training data).

    ``mode="antijoin"``: both sides reduced to (id, hash) / (hash), then
    a native hash-partitioned ``left_anti`` join keyed on the hash, then
    a ``left_semi`` join back to the full incoming rows by id — the
    fact-scale path when the snapshot itself is too big to broadcast.
    Three slim shuffles; text rides none of them except the final semi
    probe output.
    """
    import ray

    if mode == "broadcast":
        ref = ray.put(snapshot_hashes(snapshot_ds, text_col=text_col))

        def keep_new(batch: pa.Table) -> pa.Table:
            snap = ray.get(ref)
            hs = np.fromiter(
                (md5_64((t or "").encode("utf-8", "surrogatepass"))
                 for t in batch.column(text_col).to_pylist()),
                dtype=np.uint64, count=batch.num_rows)
            if snap.size:
                pos = np.searchsorted(snap, hs)
                pos[pos == snap.size] = 0
                mask = snap[pos] != hs
            else:
                mask = np.ones(len(hs), dtype=bool)
            return batch.filter(pa.array(mask))

        return incoming_ds.map_batches(keep_new, batch_format="pyarrow")

    if mode == "bloom":
        bloom_ref = ray.put(snapshot_bloom(snapshot_ds, text_col=text_col,
                                           m_bits=bloom_m_bits))

        def keep_probably_new(batch: pa.Table) -> pa.Table:
            bits = ray.get(bloom_ref)
            m_bits = np.uint64(bits.size * 8)
            pos = _bloom_positions(
                batch.column(text_col).to_pylist(), m_bits)
            # row is dropped only if ALL k probed bits are set
            probed = bits[(pos >> np.uint64(3)).astype(np.int64)]
            hit = (probed & (np.uint8(1) << (pos & np.uint64(7))
                             .astype(np.uint8))) != 0
            return batch.filter(pa.array(~hit.all(axis=1)))

        return incoming_ds.map_batches(keep_probably_new,
                                       batch_format="pyarrow")

    if mode != "antijoin":
        raise ValueError(f"unknown mode {mode!r}")

    def slim_in(batch: pa.Table) -> pa.Table:
        hs = [md5_64_signed((t or "").encode("utf-8", "surrogatepass"))
              for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col),
                         "h": pa.array(hs, pa.int64())})

    def slim_snap(batch: pa.Table) -> pa.Table:
        hs = {md5_64_signed((t or "").encode("utf-8", "surrogatepass"))
              for t in batch.column(text_col).to_pylist()}
        return pa.table({"snap_h": pa.array(sorted(hs), pa.int64())})

    snap_keys = _with_null_sentinel(
        snapshot_ds.map_batches(slim_snap, batch_format="pyarrow"),
        "snap_h", pa.int64())
    new_ids = incoming_ds.map_batches(slim_in, batch_format="pyarrow") \
        .join(snap_keys, join_type="left_anti",
              num_partitions=num_partitions,
              on=("h",), right_on=("snap_h",))
    probe = _with_null_sentinel(new_ids.select_columns([id_col]),
                                id_col, pa.int64())
    return incoming_ds.join(probe, join_type="left_semi",
                            num_partitions=num_partitions,
                            on=(id_col,))


# -- global passage-level exact dedup (keep first occurrence) -------------
#
# Substring-dedup family (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better") at passage granularity: the corpus is
# cut into disjoint ``chunk_words``-word passages; every passage that
# already occurred earlier in corpus order (doc_id, chunk_idx) is
# removed, and the surviving passages are re-joined per doc. Unlike
# dup_span_pairs (detection only) this MATERIALIZES the deduped text.


def _passage_chunks(text: str, size: int) -> "list[str]":
    toks = (text or "").split()
    return [" ".join(toks[i:i + size]) for i in range(0, len(toks), size)]


def passage_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  chunk_words: int = 8, num_partitions: int = 8):
    """Dataset -> (doc_id, text_dedup, n_kept): corpus-wide keep-first
    exact dedup of disjoint ``chunk_words``-word passages.

    Scale shape — passage TEXT never rides a shuffle:
      1. map: explode each doc into (h=md5_64(passage), pos) where
         pos = doc_id * 2^20 + chunk_idx packs the corpus-order rank
         into one int64 (24 bytes/passage on the wire);
      2. groupby(h).min(pos): the keep-first winner per distinct passage;
      3. groupby(doc_id) over winners: sorted surviving chunk indexes
         per doc (an int64 list, tiny);
      4. one hash join of the original docs with the keep-lists, then an
         in-task re-split + re-join of the text.
    Docs whose every passage lost (or with empty text) survive with
    ``text_dedup = ''`` via the left_outer join.

    Requires chunk_idx < 2^20 (a 2^20-chunk doc at 8 words/chunk is an
    ~8M-word single document — reject above that rather than corrupt
    the packing).
    """
    from ray.data.aggregate import Min

    shift = np.int64(1) << np.int64(20)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hs: list[int] = []
        pos: list[int] = []
        for did, t in zip(ids, texts):
            chunks = _passage_chunks(t, chunk_words)
            if len(chunks) >= (1 << 20):
                raise ValueError(
                    f"doc {did}: {len(chunks)} chunks >= 2^20; raise "
                    f"chunk_words or split the doc upstream")
            base = did << 20
            for i, c in enumerate(chunks):
                hs.append(md5_64_signed(c.encode("utf-8", "surrogatepass")))
                pos.append(base + i)
        return pa.table({"h": pa.array(hs, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    winners = coalesce_small(
        ds.map_batches(explode, batch_format="pyarrow")
    ).groupby("h").aggregate(Min("pos"))

    def unpack(batch: pa.Table) -> pa.Table:
        pos = batch.column("min(pos)").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(pos // shift, pa.int64()),
            "chunk_idx": pa.array(pos % shift, pa.int64()),
        })

    def collect(df):
        # Acero joins reject list-typed payload columns, so the sorted
        # surviving indexes ride the join as one comma-joined string.
        return df[[id_col]].iloc[:1].assign(
            keep_idx=",".join(map(str, sorted(df["chunk_idx"].tolist()))))

    keep_lists = per_key_in_buckets(
        winners.map_batches(unpack, batch_format="pyarrow"), id_col,
        lambda t: pa.Table.from_pandas(collect(t.to_pandas()),
                                       preserve_index=False))

    joined = ds.select_columns([id_col, text_col]).join(
        keep_lists, join_type="left_outer",
        num_partitions=num_partitions, on=(id_col,))

    def reassemble(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        keeps = batch.column("keep_idx").to_pylist()
        out, n_kept = [], []
        for t, ki in zip(texts, keeps):
            if not ki:
                out.append("")
                n_kept.append(0)
                continue
            idx = [int(s) for s in ki.split(",")]
            chunks = _passage_chunks(t, chunk_words)
            out.append(" ".join(chunks[i] for i in idx))
            n_kept.append(len(idx))
        return pa.table({
            id_col: batch.column(id_col),
            "text_dedup": pa.array(out, pa.large_string()),
            "n_kept": pa.array(n_kept, pa.int64()),
        })

    return joined.map_batches(reassemble, batch_format="pyarrow")


def near_dedup_against(incoming_ds, snapshot_ds, *, text_col: str = "text",
                       k: int = 128, bands: int = 16, ngram: int = 3,
                       m_bits: int = 1 << 23):
    """Incremental NEAR-dup dedup: drop incoming docs that LSH-collide
    with ANY doc of a prior snapshot — the cross-crawl counterpart of
    :func:`minhash_lsh_pairs` ("don't retrain on last month's crawl,
    including its light rewrites").

    Composition of two existing primitives: the snapshot's MinHash band
    keys (same signatures as `minhash_lsh_pairs`, so within-corpus and
    cross-corpus dedup agree on what "near" means) are folded into the
    CONSTANT-size Bloom bitmap of :func:`snapshot_bloom`'s machinery —
    the broadcast side stays ``m_bits/8`` bytes no matter how many docs
    the snapshot accumulates across months. The incoming pass is
    map-only: band keys per doc, drop on any bloom hit.

    Semantics are LSH-candidate-level (conservative): a collision in
    one band is enough to drop, matching the pair-candidacy rule of
    `minhash_lsh_pairs` BEFORE its similarity refinement — plus the
    bloom's own false-hit rate. Both err toward dropping, never toward
    keeping a near-dup. Verified two ways: against `minhash_lsh_pairs`
    semantics in tests/test_curation_ops.py, and bit-for-bit against a
    DuckDB oracle (the hex band keys exist precisely so md5(VARCHAR)
    can mirror them — `_near_dedup_incremental_oracle` in
    __ray_entry__.py reproduces signatures, band keys, and bloom
    probes exactly in SQL).
    """
    import ray

    def _band_positions(batch: pa.Table, col: str) -> "np.ndarray":
        banded = _minhash_band_fn(
            pa.table({"doc_id": pa.array(
                np.zeros(batch.num_rows, dtype=np.int64)),
                "text": batch.column(col)}),
            id_col="doc_id", text_col="text", k=k, bands=bands, ngram=ngram)
        keys = banded.column("band_key").to_pylist()
        pos = np.empty(len(keys), dtype=np.uint64)
        for i, key in enumerate(keys):
            d = hashlib.md5(key.encode()).digest()
            pos[i] = int.from_bytes(d[:8], "little")
        return pos % np.uint64(m_bits)

    bloom_ref = ray.put(bloom_from_positions(
        snapshot_ds, lambda b: _band_positions(b, text_col),
        m_bits=m_bits))

    def keep_far(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        pos = _band_positions(batch, text_col).reshape(
            batch.num_rows, bands)
        probed = bits[(pos >> np.uint64(3)).astype(np.int64)]
        hit = (probed & (np.uint8(1) << (pos & np.uint64(7))
                         .astype(np.uint8))) != 0
        return batch.filter(pa.array(~hit.any(axis=1)))

    return incoming_ds.map_batches(keep_far, batch_format="pyarrow")


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance <= 1 check (no DP table needed)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_pairs(ds, *, col: str = "p_name"):
    """Edit-distance-1 string-pair mining (typo-dedup candidates) via
    SymSpell-style deletion-neighborhood hashing -> one row per
    unordered DISTINCT-string pair with levenshtein == 1.

    Completeness: two strings at distance 1 always share a key in
    {s} U Del1(s) (substitutions collide on a common deletion;
    insert/delete pairs collide on the shorter string itself), so
    bucketing on those keys misses nothing; every candidate is then
    VERIFIED with an exact distance check in-task — no false positives
    either.

    Scale shape: corpus rows collapse to distinct strings first
    (per-batch unique combiner -> one groupby), so only the distinct-
    string neighborhood (|s|+1 keys per string) rides the candidate
    shuffle; bucket fan-in is the neighborhood collision count, tiny
    for natural-language strings. Skew note: very short strings make
    hot buckets (e.g. every 1-char string shares the '' key) — length-
    filter or cap buckets for corpora of short tokens. Output pairs
    are deduped by a final (name_a, name_b) groupby.
    """
    from ..stages.util import coalesce_small

    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"name": pc.unique(batch.column(col))})

    distinct = per_key_in_buckets(
        ds.map_batches(batch_distinct, batch_format="pyarrow"),
        "name", lambda g: g.slice(0, 1))

    def expand(batch: pa.Table) -> pa.Table:
        keys, names = [], []
        for s in batch.column("name").to_pylist():
            for v in {s} | {s[:i] + s[i + 1:] for i in range(len(s))}:
                keys.append(v)
                names.append(s)
        return pa.table({"k": pa.array(keys, pa.large_string()),
                         "name": pa.array(names, pa.large_string())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        names = sorted(set(group.column("name").to_pylist()))
        a_out, b_out = [], []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if _ed_le1(names[i], names[j]):
                    a_out.append(names[i])
                    b_out.append(names[j])
        return pa.table({"name_a": pa.array(a_out, pa.large_string()),
                         "name_b": pa.array(b_out, pa.large_string())})

    cand = per_key_in_buckets(
        distinct.map_batches(expand, batch_format="pyarrow"),
        "k", bucket_pairs, min_rows=2)

    def finish(group: pa.Table) -> pa.Table:
        g = group.slice(0, 1)
        return pa.table({
            "name_a": g.column("name_a"),
            "name_b": g.column("name_b"),
            "dist": pa.array([1], pa.int64()),
        })

    return per_key_in_buckets(cand, ["name_a", "name_b"], finish)


def corpus_diff(new_ds, old_ds, *, id_col: str = "doc_id",
                text_col: str = "text", num_partitions: int = 8):
    """Snapshot diff between two corpus versions -> one row per id with
    status in {added, removed, changed, unchanged} — the data-versioning
    primitive behind incremental recrawls and delta publishing.

    Scale shape: both sides collapse map-side to slim (id, md5) rows —
    the text never rides the shuffle — then ONE native full_outer hash
    join on id resolves presence, and a vectorized compare classifies.
    ~48 bytes/doc through the exchange regardless of document size.
    """
    from ..stages.util import coalesce_small

    def slim(tag: str):
        def f(batch: pa.Table) -> pa.Table:
            fps = [hashlib.md5((t or "").encode()).hexdigest()
                   for t in batch.column(text_col).to_pylist()]
            return pa.table({
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                f"fp_{tag}": pa.array(fps, pa.string()),
            })
        return f

    new_slim = coalesce_small(
        new_ds.map_batches(slim("new"), batch_format="pyarrow"))
    old_slim = coalesce_small(
        old_ds.map_batches(slim("old"), batch_format="pyarrow"))
    joined = new_slim.join(old_slim, join_type="full_outer",
                           num_partitions=num_partitions, on=(id_col,))

    def classify(batch: pa.Table) -> pa.Table:
        fn = batch.column("fp_new")
        fo = batch.column("fp_old")
        status = pc.if_else(
            pc.is_null(fo), pa.scalar("added"),
            pc.if_else(pc.is_null(fn), pa.scalar("removed"),
                       pc.if_else(pc.equal(fn, fo),
                                  pa.scalar("unchanged"),
                                  pa.scalar("changed"))))
        return pa.table({id_col: batch.column(id_col), "status": status})

    return joined.map_batches(classify, batch_format="pyarrow")


def cross_corpus_pairs(ds_a, ds_b, *, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 128,
                       bands: int = 16, ngram: int = 3,
                       threshold: float = 0.7, max_bucket: int = 2000,
                       id_type=None):
    """MinHash-LSH near-duplicate pairs ACROSS two corpora (id_a from
    A, id_b from B, est-Jaccard >= threshold) — the cross-crawl /
    cross-snapshot duplication analysis where within-corpus pairs are
    noise and only A-x-B matches matter.

    Same banding machinery as minhash_lsh_pairs; each side is tagged
    map-side and each band bucket compares only across the tag, so a
    bucket of n_a + n_b members costs n_a*n_b signature compares, not
    (n_a+n_b)^2/2. Shuffle shape is one groupby(band_key) over both
    banded streams plus the final pair-dedupe groupby.
    """
    kwargs = dict(id_col=id_col, text_col=text_col, k=k, bands=bands,
                  ngram=ngram)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8)))
        return f

    banded = ds_a.map_batches(_minhash_band_fn, fn_kwargs=kwargs,
                              batch_format="pyarrow") \
        .map_batches(tag(0), batch_format="pyarrow").union(
            ds_b.map_batches(_minhash_band_fn, fn_kwargs=kwargs,
                             batch_format="pyarrow")
            .map_batches(tag(1), batch_format="pyarrow"))

    def bucket_cross(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_numpy(zero_copy_only=False)
        n = group.num_rows
        id_type = group.column("id").type
        if n < 2 or sides.min() == sides.max():
            return pa.schema([("id_a", id_type), ("id_b", id_type),
                              ("similarity", pa.float64()),
                              ("method", pa.string())]).empty_table()
        if n > max_bucket:
            # cap DETERMINISTICALLY and keep BOTH sides: the smallest
            # max_bucket/2 ids per side. A plain slice(0, max_bucket)
            # keeps whatever rows the shuffle happened to order first —
            # it can drop one side entirely and differs run to run.
            ids_np = group.column("id").to_numpy(zero_copy_only=False)
            half = max(1, max_bucket // 2)
            keep = [si[np.argsort(ids_np[si], kind="stable")][:half]
                    for si in (np.nonzero(sides == 0)[0],
                               np.nonzero(sides == 1)[0])]
            sel = np.sort(np.concatenate(keep))
            group = group.take(pa.array(sel))
            sides = sides[sel]
            n = len(sel)
        ids = group.column("id").to_pylist()
        sigs = np.frombuffer(
            b"".join(group.column("sig").to_pylist()),
            dtype=np.uint64).reshape(n, k)
        a_idx = np.nonzero(sides == 0)[0]
        b_idx = np.nonzero(sides == 1)[0]
        a_out, b_out, s_out = [], [], []
        for i in a_idx:
            est = (sigs[b_idx] == sigs[i]).mean(axis=1)
            for j in np.nonzero(est >= threshold)[0]:
                a_out.append(ids[i])
                b_out.append(ids[b_idx[j]])
                s_out.append(float(est[j]))
        return pa.table({
            "id_a": pa.array(a_out, id_type),
            "id_b": pa.array(b_out, id_type),
            "similarity": pa.array(s_out, pa.float64()),
            "method": pa.array(["minhash_cross"] * len(a_out)),
        })

    pairs = per_key_in_buckets(banded, "band_key", bucket_cross,
                               target_rows=16384, min_rows=2)
    return _dedup_pairs(pairs, "minhash_cross", id_type)


def dup_family_histogram(ds, *, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Exact-duplicate FAMILY-SIZE histogram -> (family_size:int64,
    n_families:int64): "how duplicated is this corpus?" as one small
    table (size 1 = unique docs, the tail = copypasta).

    Three-level reduction, each stage smaller than the last: per-batch
    (hash, count) combiner -> groupby(hash) sum = family sizes -> a
    per-batch size-count combiner -> groupby(family_size) sum. Text
    never shuffles; the second shuffle carries one row per distinct
    SIZE per block.
    """
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_md5(batch, text_col)
        agg = batch.select(["text_hash"]).group_by("text_hash") \
            .aggregate([([], "count_all")])
        return pa.table({
            "text_hash": agg.column("text_hash"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    fams = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("text_hash").aggregate(Sum("partial_n"))

    def size_partial(batch: pa.Table) -> pa.Table:
        agg = pa.table({"family_size": batch.column("sum(partial_n)")}) \
            .group_by("family_size").aggregate([([], "count_all")])
        return pa.table({
            "family_size": agg.column("family_size"),
            "partial_f": pc.cast(agg.column("count_all"), pa.int64()),
        })

    out = coalesce_small(
        fams.map_batches(size_partial, batch_format="pyarrow")) \
        .groupby("family_size").aggregate(Sum("partial_f"))

    return out.map_batches(
        lambda b: pa.table({
            "family_size": b.column("family_size"),
            "n_families": pc.cast(b.column("sum(partial_f)"), pa.int64()),
        }), batch_format="pyarrow")


def cross_source_dup_matrix(ds, *, source_col: str = "source",
                            text_col: str = "text"):
    """Cross-source duplicate-leakage matrix -> (source_a, source_b,
    n_shared:int64): for every source pair, how many distinct texts
    appear in BOTH — the audit that catches one crawl mirroring
    another before dedup priorities are chosen. Includes the diagonal
    (a == b) = distinct texts per source.

    Shape: per-batch distinct (hash, source) pairs -> groupby(hash)
    emits each hash's distinct source combinations (<= sources^2 rows
    per hash, usually 1) -> tiny groupby(pair) sum. Text never
    shuffles; the wide step carries 16-byte hash+source rows.
    """
    from itertools import combinations

    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_md5(batch, text_col)
        return batch.select(["text_hash", source_col]) \
            .group_by(["text_hash", source_col]).aggregate([])

    def pairs(group: pa.Table) -> pa.Table:
        srcs = sorted(set(group.column(source_col).to_pylist()))
        a, b = [], []
        for s in srcs:                       # diagonal
            a.append(s)
            b.append(s)
        for x, y in combinations(srcs, 2):   # off-diagonal, x < y
            a.append(x)
            b.append(y)
        return pa.table({
            "source_a": pa.array(a, pa.string()),
            "source_b": pa.array(b, pa.string()),
            "partial_n": pa.array([1] * len(a), pa.int64()),
        })

    # NOTE: no min_rows skip — a single-(hash, source) group still
    # contributes its diagonal (s, s) row
    per_hash = per_key_in_buckets(
        ds.map_batches(partial, batch_format="pyarrow"),
        "text_hash", pairs)

    out = coalesce_small(per_hash).groupby(["source_a", "source_b"]) \
        .aggregate(Sum("partial_n"))

    return out.map_batches(
        lambda b: pa.table({
            "source_a": b.column("source_a"),
            "source_b": b.column("source_b"),
            "n_shared": pc.cast(b.column("sum(partial_n)"), pa.int64()),
        }), batch_format="pyarrow")


def jaccard_prefix_join(ds, *, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        max_id: int | None = None):
    """EXACT word-set Jaccard self-join via PPJoin-style prefix
    filtering -> (id_a, id_b, jaccard >= threshold) — the scale path
    next to ngram_jaccard_pairs' broadcast brute force: no side is
    broadcast and no O(n^2) loop exists; candidates are generated only
    where two docs SHARE a token inside their (1-t)-length rarest-token
    prefix (a completeness guarantee, not a heuristic: any pair at
    jaccard >= t must collide on some prefix token).

    Stages: (1) token df pass (term_frequencies-shaped combiner) ->
    broadcast df-ascending rank dict (driver-sized vocab assumption —
    cap/hash-rank the tail at larger vocabs); (2) per doc: distinct
    tokens as sorted rank arrays, emit one row per PREFIX token;
    (3) groupby(prefix token): in-bucket pairs verified EXACTLY with
    one sorted-array intersection; (4) pair dedup (a pair may collide
    in several buckets) via keep-first groupby. Rank arrays ride the
    bucket shuffle (the LSH analog ships signatures); bucket size is
    bounded by the df of the prefix token, and rare-first ordering
    makes hot buckets rare by construction.
    """
    import ray

    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    if max_id is not None:
        def _below(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less(batch.column(id_col),
                                        pa.scalar(max_id)))
        ds = ds.map_batches(_below, batch_format="pyarrow")

    # stage 1: global df ranks (rare first; ties by term for determinism)
    def df_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("")), r"\s+")
        words = pc.list_flatten(toks)
        words = words.filter(pc.not_equal(words, pa.scalar("")))
        agg = pa.table({"term": words}).group_by("term") \
            .aggregate([([], "count_all")])
        return pa.table({
            "term": agg.column("term"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    df_rows = coalesce_small(
        ds.map_batches(df_partial, batch_format="pyarrow")) \
        .groupby("term").aggregate(Sum("partial_n")).take_all()
    order = sorted((r["sum(partial_n)"], r["term"]) for r in df_rows)
    rank = {t: i for i, (_, t) in enumerate(order)}
    rref = ray.put(rank)

    # MUST split exactly like stage 1's RE2 \s+: RE2's Perl class is
    # [\t\n\f\r ] — it has NO \v, and Python's ASCII \s does, so a
    # doc with a vertical tab would emit stage-2 tokens stage 1 never
    # ranked -> KeyError (and Unicode \s would add \xa0 on top)
    ws_re = _RE2_WS

    def prefixes(batch: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        out_tok, out_id, out_set = [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = {w for w in ws_re.split(t or "") if w}
            if not toks:
                continue
            ranks = np.sort(np.array([rk[w] for w in toks], np.int64))
            plen = len(ranks) - int(np.ceil(threshold * len(ranks))) + 1
            for r in ranks[:plen]:
                out_tok.append(int(r))
                out_id.append(i)
                out_set.append(ranks.tolist())
        return pa.table({
            "ptok": pa.array(out_tok, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "rset": pa.array(out_set, pa.list_(pa.int64())),
        })

    cand = ds.map_batches(prefixes, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_pylist()
        sets = [np.array(s, np.int64)
                for s in group.column("rset").to_pylist()]
        a_out, b_out, j_out = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                ia, ib = ids[x], ids[y]
                if ia == ib:
                    continue
                inter = np.intersect1d(sets[x], sets[y],
                                       assume_unique=True).size
                union = sets[x].size + sets[y].size - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    lo, hi = (ia, ib) if ia < ib else (ib, ia)
                    a_out.append(lo)
                    b_out.append(hi)
                    j_out.append(j)
        return pa.table({
            "id_a": pa.array(a_out, pa.int64()),
            "id_b": pa.array(b_out, pa.int64()),
            "jaccard": pa.array(j_out, pa.float64()),
        })

    pairs = per_key_in_buckets(cand, "ptok", bucket_pairs,
                               min_rows=2)

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return _with_schema_anchor(
        per_key_in_buckets(pairs, ["id_a", "id_b"], first),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("jaccard", pa.float64())]).empty_table())


def containment_prefix_join(ds, *, id_col: str = "doc_id",
                            text_col: str = "text",
                            threshold: float = 0.8,
                            max_id: int | None = None):
    """Directional EXACT word-set CONTAINMENT self-join -> (id_a,
    id_b, containment) for every ordered pair with
    |A ∩ B| / |A| >= threshold — "doc A's vocabulary is (mostly)
    inside doc B's", the asymmetric sibling of jaccard_prefix_join
    that catches subset/quote/excerpt duplication resemblance misses
    (a short excerpt has low Jaccard against its source but full
    containment).

    Prefix completeness holds only for the CONTAINED side: if
    |A ∩ B| >= ceil(t|A|) then one of A's (|A| - ceil(t|A|) + 1)
    rarest tokens is in B — so A prunes to that prefix, but B must
    post EVERY distinct token (containment puts no lower bound on
    |B|). Each doc therefore emits one row per distinct token with an
    ``is_prefix`` flag; a token bucket verifies x→y exactly (sorted
    rank-array intersection) whenever x's row is a prefix row. Bucket
    fan-in is bounded by token df — heavier than the resemblance
    join's prefix×prefix buckets by construction; at web scale run it
    over a df-capped vocabulary slice or the LSH candidates.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    if max_id is not None:
        def _below(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less(batch.column(id_col),
                                        pa.scalar(max_id)))
        ds = ds.map_batches(_below, batch_format="pyarrow")

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("")), r"\s+")
        words = pc.list_flatten(toks)
        words = words.filter(pc.not_equal(words, pa.scalar("")))
        agg = pa.table({"term": words}).group_by("term") \
            .aggregate([([], "count_all")])
        return pa.table({
            "term": agg.column("term"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    df_rows = coalesce_small(
        ds.map_batches(df_partial, batch_format="pyarrow")) \
        .groupby("term").aggregate(Sum("partial_n")).take_all()
    order = sorted((r["sum(partial_n)"], r["term"]) for r in df_rows)
    rank = {t: i for i, (_, t) in enumerate(order)}
    rref = ray.put(rank)

    ws_re = _RE2_WS   # same RE2-\s parity note as jaccard_prefix_join

    def postings(batch: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        out_tok, out_id, out_set, out_pf = [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = {w for w in ws_re.split(t or "") if w}
            if not toks:
                continue
            ranks = np.sort(np.array([rk[w] for w in toks], np.int64))
            plen = len(ranks) - int(np.ceil(threshold * len(ranks))) \
                + 1
            for j, r in enumerate(ranks):
                out_tok.append(int(r))
                out_id.append(i)
                out_set.append(ranks.tolist())
                out_pf.append(j < plen)
        return pa.table({
            "ptok": pa.array(out_tok, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "rset": pa.array(out_set, pa.list_(pa.int64())),
            "is_prefix": pa.array(out_pf, pa.bool_()),
        })

    cand = ds.map_batches(postings, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_pylist()
        sets = [np.array(s, np.int64)
                for s in group.column("rset").to_pylist()]
        pref = group.column("is_prefix").to_pylist()
        a_out, b_out, c_out = [], [], []
        seen = set()
        for x in range(len(ids)):
            if not pref[x]:
                continue
            for y in range(len(ids)):
                if ids[x] == ids[y] or (ids[x], ids[y]) in seen:
                    continue
                inter = np.intersect1d(sets[x], sets[y],
                                       assume_unique=True).size
                c = inter / sets[x].size
                if c >= threshold:
                    seen.add((ids[x], ids[y]))
                    a_out.append(ids[x])
                    b_out.append(ids[y])
                    c_out.append(c)
        return pa.table({
            "id_a": pa.array(a_out, pa.int64()),
            "id_b": pa.array(b_out, pa.int64()),
            "containment": pa.array(c_out, pa.float64()),
        })

    pairs = per_key_in_buckets(cand, "ptok", bucket_pairs, min_rows=2)

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return _with_schema_anchor(
        per_key_in_buckets(pairs, ["id_a", "id_b"], first),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("containment", pa.float64())]).empty_table())


def exact_dedup_keep_best(ds, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          score_col: str = "n_chars",
                          max_broadcast_ids: int = 5_000_000,
                          num_partitions: int = 8,
                          hash_col: str | None = None,
                          winner_input=None,
                          materialize_input: bool = False):
    """Exact dedup that keeps the BEST copy per text family (highest
    ``score_col``, ties -> lowest id) instead of the first-by-id —
    what curation actually wants when duplicates differ in metadata
    quality (longer canonical copy, better source).

    Text never rides the shuffle (the exact_dedup shape): a per-batch
    combiner reduces each block to slim (text_hash, score, id)
    candidate triples — one best per hash per block — a bucketed
    per-hash argmax picks the global winner ids, and a second map-only
    pass keeps winner rows (broadcast ``is_in`` below
    ``max_broadcast_ids`` winners, native ``left_semi`` join past it).
    ``ds`` is consumed twice; deterministic upstreams required (the
    repo-wide partition-invariance contract). ``hash_col`` /
    ``winner_input`` / ``materialize_input`` behave exactly as on
    :func:`exact_dedup` (precomputed hash column; column-pruned slim
    dataset for the winner pass — must also carry ``score_col``; pin
    a non-deterministic input once for both passes).
    """
    from ..stages.util import bucketed_map_groups

    if winner_input is not None and hash_col is None:
        raise ValueError("winner_input requires hash_col: a slim "
                         "projection has no text column to hash")
    if materialize_input:
        ds = ds.materialize()

    def slim(batch: pa.Table) -> pa.Table:
        if hash_col is None:
            b = add_md5(batch, text_col)
            hc = "text_hash"
        else:
            b, hc = batch, hash_col
        order = pc.sort_indices(
            b, sort_keys=[(hc, "ascending"),
                          (score_col, "descending"),
                          (id_col, "ascending")])
        srt = b.take(order).select([hc, score_col, id_col])
        if hc != "text_hash":
            srt = srt.rename_columns(["text_hash", score_col, id_col])
        hs = srt.column("text_hash").to_numpy(zero_copy_only=False)
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        return srt.filter(pa.array(first))

    def best_in_bucket(bucket: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            bucket, sort_keys=[("text_hash", "ascending"),
                               (score_col, "descending"),
                               (id_col, "ascending")])
        srt = bucket.take(order)
        hs = srt.column("text_hash").to_numpy(zero_copy_only=False)
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        return pa.table({
            "keep": srt.column(id_col).filter(pa.array(first)),
        })

    src = ds if winner_input is None else winner_input
    winners = bucketed_map_groups(
        src.map_batches(slim, batch_format="pyarrow"),
        "text_hash", best_in_bucket).materialize()

    return _keep_winner_rows(ds, winners, id_col=id_col,
                             max_broadcast_ids=max_broadcast_ids,
                             num_partitions=num_partitions)


def dedup_comparison(ds, *, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Side-by-side dedup-method report -> (method, docs_in,
    docs_kept, value_reduction): exact (md5), MinHash-LSH, and SimHash
    run over the SAME corpus — the triage table curation teams build
    before choosing a dedup tier (exact is the floor; the fuzzy rows
    show the extra near-dup mass each family finds).

    Composes the existing operators; one row per method. docs_in is
    counted once and shared.
    """
    import ray.data

    n = ds.count()
    rows = []

    kept_exact = exact_dedup(ds, id_col=id_col, text_col=text_col).count()
    rows.append(("exact_md5", kept_exact))

    kept_minhash = minhash_dedup(ds, id_col=id_col,
                                 text_col=text_col).count()
    rows.append(("minhash_lsh", kept_minhash))

    pairs = simhash_pairs(ds, id_col=id_col, text_col=text_col)
    drop = drop_ids_from_pairs(pairs)
    rows.append(("simhash", n - len(drop)))

    return ray.data.from_arrow(pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "docs_in": pa.array([n] * len(rows), pa.int64()),
        "docs_kept": pa.array([r[1] for r in rows], pa.int64()),
        "value_reduction": pa.array(
            [1.0 - r[1] / n for r in rows], pa.float64()),
    }))
