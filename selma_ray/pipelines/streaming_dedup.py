"""Streaming (ingest-order) exact dedup via a sharded mutable hash
index — the one op in this repo that genuinely needs raw Ray actors.

Every other dedup here is a batch job (hash -> groupby -> keep min id:
`dedup.exact_dedup`). That shape requires seeing the whole corpus
before emitting anything. A CONTINUOUS-INGEST pipeline ("drop rows
whose text we have ever admitted before, admit the rest NOW") needs a
shared mutable membership index that every map task can consult and
update — exactly the case the Dataset API cannot express and the
design brief reserves raw actors for.

Design:
- K ``_HashShard`` actors each own a disjoint slice of the 64-bit
  fingerprint space (``hash % K``). State per entry is 8 bytes; one
  shard holds ~n/K entries, so capacity scales horizontally with K and
  no single actor is a hot spot (md5 spreads keys uniformly).
- The dataset side stays ``map_batches``: each task fingerprints its
  batch (vectorized md5 -> uint64), buckets the hashes by shard,
  issues ONE ``check_and_add`` RPC per shard per batch (k RPCs of
  ~rows/K hashes each, not one per row), and keeps the rows whose
  fingerprint was new. In-batch duplicates are resolved locally
  (first occurrence wins) before the RPC.
- ``check_and_add`` is atomic per shard (actor = single-threaded), so
  exactly ONE row per distinct text survives across all tasks — the
  SURVIVOR SET of texts is deterministic and equal to DISTINCT(text),
  which is what the SQL oracle checks. WHICH duplicate row survives
  follows task arrival order and is NOT deterministic under
  parallelism — callers that need the min-id survivor use the batch
  `exact_dedup` instead; this op is for ingest streams where "first
  arrival" is the business rule.

Scale notes: at 10^12 turns a set of 64-bit ints (~8 B + overhead per
distinct doc) outgrows python sets — shards then swap their state for
a spillable store (sorted run files + bloom front, same interface);
the pipeline shape is unchanged. Fingerprints are 64-bit md5 halves
(collision ~n^2/2^65 — at 1e9 distinct docs that is ~3%% odds of ONE
lost doc corpus-wide; acceptable for dedup, and the full-md5 SQL
oracle would surface it at test scale).

No reference equivalent (SURVEY.md §2.5 — training-data addition).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_64


def _fingerprints(texts: list) -> "np.ndarray":
    return np.fromiter(
        (md5_64((t or "").encode("utf-8", "surrogatepass")) for t in texts),
        dtype=np.uint64, count=len(texts))


class _HashShard:
    """One slice of the global membership index (a raw Ray actor)."""

    def __init__(self):
        self.seen: set[int] = set()

    def check_and_add(self, hashes: "np.ndarray") -> "np.ndarray":
        seen = self.seen
        out = np.empty(len(hashes), dtype=bool)
        for i, h in enumerate(hashes.tolist()):
            if h in seen:
                out[i] = False
            else:
                seen.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self.seen)

    def dump(self, path: str) -> int:
        """Checkpoint this shard's fingerprints to one parquet file
        (sorted -> deterministic bytes; idempotent overwrite)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        arr = np.fromiter(self.seen, dtype=np.uint64,
                          count=len(self.seen))
        arr.sort()
        pq.write_table(pa.table({"fp": pa.array(arr, pa.uint64())}), path)
        return len(arr)

    def load(self, path: str) -> int:
        """Restore (merge) fingerprints from a checkpoint file."""
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["fp"])
        self.seen.update(t.column("fp").to_numpy().tolist())
        return len(self.seen)


def streaming_exact_dedup(ds, *, text_col: str = "text",
                          num_shards: int = 8):
    """Dataset -> Dataset keeping the first-arriving row per distinct
    ``text_col`` value, filtered against a live shared index.

    Returns (deduped_ds, shards) — callers keep ``shards`` alive while
    the (lazy) dataset executes, can reuse them across MULTIPLE
    datasets (cross-stream dedup), and can read ``size()`` afterwards
    for admitted-count metrics.
    """
    import ray

    shard_cls = ray.remote(num_cpus=0.1)(_HashShard)
    shards = [shard_cls.remote() for _ in range(num_shards)]

    def filter_new(batch: pa.Table) -> pa.Table:
        fps = _fingerprints(batch.column(text_col).to_pylist())
        # resolve in-batch duplicates locally: only first occurrences
        # are offered to the index
        first_idx = np.unique(fps, return_index=True)[1]
        is_first = np.zeros(len(fps), dtype=bool)
        is_first[first_idx] = True
        keep = np.zeros(len(fps), dtype=bool)
        shard_of = (fps % np.uint64(num_shards)).astype(np.int64)
        pending = []
        for k in range(num_shards):
            sel = np.flatnonzero(is_first & (shard_of == k))
            if sel.size:
                pending.append((sel, shards[k].check_and_add.remote(fps[sel])))
        for sel, ref in pending:
            keep[sel] = ray.get(ref)
        return batch.filter(pa.array(keep))

    return ds.map_batches(filter_new, batch_format="pyarrow"), shards


def checkpoint_index(shards, out_dir: str) -> int:
    """Persist the live dedup index: every shard dumps its slice to
    ``out_dir/shard-K.parquet`` IN PARALLEL (sorted fingerprints ->
    deterministic, idempotent files). Returns total fingerprints.

    With this, streaming ingest becomes restartable: checkpoint after
    each ingest batch/epoch, and on restart ``restore_index`` rebuilds
    the exact membership state before new data flows — the shared-
    mutable-state complement of the per-partition output manifest.
    """
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    refs = [s.dump.remote(os.path.join(out_dir, f"shard-{k}.parquet"))
            for k, s in enumerate(shards)]
    return sum(ray.get(refs))


def restore_index(shards, out_dir: str) -> int:
    """Load a :func:`checkpoint_index` directory back into live shards
    (merging with anything already present). Shard count must match
    the checkpoint's (fingerprints are sharded by hash % num_shards)."""
    import glob
    import os

    import ray

    found = glob.glob(os.path.join(out_dir, "shard-*.parquet"))
    if len(found) != len(shards):
        raise ValueError(
            f"checkpoint has {len(found)} shards, index has "
            f"{len(shards)} — shard count must match")
    # route file K to shard K BY INDEX, exactly as checkpoint_index
    # named them: a lexicographic sort puts shard-10 before shard-2,
    # silently loading fingerprints into the wrong actors for >= 10
    # shards (every hash%N lookup then misses and re-admits dups)
    paths = [os.path.join(out_dir, f"shard-{k}.parquet")
             for k in range(len(shards))]
    missing = [p for p in paths if p not in set(found)]
    if missing:
        raise ValueError(f"checkpoint is missing shard files: {missing}")
    refs = [s.load.remote(p) for s, p in zip(shards, paths)]
    return sum(ray.get(refs))
