"""Distributed cardinality sketch: KMV (k-minimum-values) distinct
count.

The classic mergeable sketch (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"): hash every value to a uniform
64-bit integer, keep only the k smallest distinct hashes. The k-th
smallest hash h_k estimates cardinality as ``(k-1) * 2^64 / h_k``;
below saturation the sketch is exact.

Scale shape: per-batch combiners prune to <= k hashes per group before
anything leaves the task, so the groupby shuffle carries
``k x groups x blocks`` 8-byte hashes, never raw values — the whole
point of a sketch at 100 TB. Merging per-batch k-min sets preserves the
global k minimum (the k smallest overall survive every local prune).

Determinism / oracle parity: the hash is the low 64 bits of
``md5(str(value))`` in DuckDB's byte order (``md5_number_lower`` =
little-endian bytes 8..16 of the digest), and the estimate uses only
IEEE basic ops evaluated in the same order as the SQL expression — so
the DuckDB oracle reproduces the ESTIMATE bit-for-bit, not just
approximately (see ``__ray_entry__.oracle_sql()['distinct_users_kmv']``).

No reference equivalent (SURVEY.md §2.5: Selma has no wide ops); this
is one of the training-data-scale additions.
"""

from __future__ import annotations

import struct
from hashlib import md5

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TWO64 = 2.0 ** 64


def kmv_hash64(value) -> int:
    """Low 64 bits of md5(str(value)), DuckDB ``md5_number_lower``
    byte order (little-endian digest[8:16])."""
    return struct.unpack("<Q", md5(str(value).encode()).digest()[8:])[0]


class _PartialKmv:
    """Per-batch combiner: the k smallest distinct hashes per group."""

    def __init__(self, group_col: str, value_col: str, k: int):
        self.group_col = group_col
        self.value_col = value_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # distinct (group, value) first so each value hashes once
        pairs = batch.select([self.group_col, self.value_col]) \
            .group_by([self.group_col, self.value_col]).aggregate([])
        per_group: dict = {}
        for g, v in zip(pairs.column(self.group_col).to_pylist(),
                        pairs.column(self.value_col).to_pylist()):
            per_group.setdefault(g, set()).add(kmv_hash64(v))
        out_g, out_h = [], []
        for g, hs in per_group.items():
            for h in sorted(hs)[:self.k]:
                out_g.append(g)
                out_h.append(h)
        return pa.table({
            self.group_col: pa.array(out_g),
            "h": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
        })


def kmv_distinct(ds, *, group_col: str, value_col: str, k: int = 64,
                 est_col: str = "est_distinct"):
    """Dataset -> (group, est_distinct float64, sketch_size int64):
    estimated distinct ``value_col`` per ``group_col``.

    Exact below saturation (fewer than k distinct values); otherwise the
    KMV estimator ``(k-1) * 2^64 / h_k`` with relative error
    ~ 1/sqrt(k-2). Raise k for tighter bounds — the shuffle grows
    linearly in k and is independent of data volume."""
    import pandas as pd

    def final(group: pd.DataFrame) -> pd.DataFrame:
        hs = np.unique(group["h"].to_numpy())  # sorted distinct
        nd = hs.size
        if nd < k:
            est = float(nd)
        else:
            est = (k - 1) * _TWO64 / float(hs[k - 1])
        return pd.DataFrame({
            group_col: [group[group_col].iloc[0]],
            est_col: np.array([est], dtype=np.float64),
            "sketch_size": np.array([min(nd, k)], dtype=np.int64),
        })

    partial = ds.map_batches(_PartialKmv(group_col, value_col, k),
                             batch_format="pyarrow")
    return partial.groupby(group_col).map_groups(
        final, batch_format="pandas")


# -- Misra-Gries heavy hitters ---------------------------------------------


class _PartialMG:
    """Per-batch combiner: exact in-batch term counts compressed to at
    most ``capacity`` (term, cnt) rows by one Misra-Gries decrement
    step, plus one marker row (term='', cnt=0, dec=D) recording the
    decrement this batch applied ('' is never a token — tokens are \\S+
    runs). Everything the shuffle carries is bounded by capacity+1 rows
    per batch regardless of batch size."""

    def __init__(self, text_col: str, capacity: int):
        self.text_col = text_col
        self.capacity = capacity

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for t in batch.column(self.text_col).to_pylist():
            counts.update((t or "").split())
        dec = 0
        if len(counts) > self.capacity:
            # subtract the (capacity+1)-th largest count from everything;
            # at most `capacity` strictly-positive counters remain
            dec = sorted(counts.values(), reverse=True)[self.capacity]
            counts = Counter({t: c - dec for t, c in counts.items()
                              if c - dec > 0})
        terms = list(counts.keys()) + [""]
        cnts = list(counts.values()) + [0]
        decs = [0] * (len(terms) - 1) + [dec]
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
            "dec": pa.array(decs, pa.int64()),
        })


def heavy_hitters(ds, *, text_col: str = "text", capacity: int = 256,
                  min_count: int = 2):
    """Dataset -> (term, count, err_bound): corpus-wide frequent terms
    via a distributed Misra-Gries summary.

    ``count`` is a LOWER bound on the true frequency and
    ``count <= true <= count + err_bound``, where ``err_bound`` is the
    sum of the per-batch decrements (0 - i.e. EXACT, and bit-identical
    to the SQL oracle - whenever no batch holds more than ``capacity``
    distinct terms). Every term whose true count exceeds ``err_bound``
    is guaranteed to be reported. Terms are whitespace runs (\\S+).

    Scale shape: the shuffle sees <= (capacity+1) x blocks 16-byte-ish
    rows - bounded by configuration, independent of corpus size, the
    point of a mergeable sketch at 100 TB. The post-groupby finalize
    runs on <= capacity x blocks rows coalesced to one partition (tiny
    by construction), never on raw data.
    """
    from ray.data.aggregate import Sum

    agg = ds.map_batches(_PartialMG(text_col, capacity),
                         batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("cnt"), Sum("dec"))

    def finalize(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        cnts = batch.column("sum(cnt)").to_pylist()
        decs = batch.column("sum(dec)").to_pylist()
        total_dec = 0
        rows = []
        for t, c, d in zip(terms, cnts, decs):
            if t == "":
                total_dec += d
            else:
                rows.append((t, c))
        keep = [(t, c) for t, c in rows if c + total_dec >= min_count
                and c > 0]
        keep.sort(key=lambda r: (-r[1], r[0]))
        return pa.table({
            "term": pa.array([t for t, _ in keep], pa.string()),
            "count": pa.array([c for _, c in keep], pa.int64()),
            "err_bound": pa.array([total_dec] * len(keep), pa.int64()),
        })

    return agg.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                          batch_size=None)


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (deterministic compaction variant)
# ---------------------------------------------------------------------------

class KllSketch:
    """One-pass mergeable quantile summary (Karnin-Lang-Liberty shape:
    weighted compactor levels, level i items carry weight 2^i).

    Deviation from the paper: compaction keeps alternating parities via
    a per-level counter instead of a random coin, so the sketch is a
    DETERMINISTIC function of (input order, k). That trades the
    randomized rank-error guarantee for reproducibility — the right
    trade for a data-validation pass that must be stable run-to-run;
    the observed error on smooth distributions stays ~1/k. Use the
    exact histogram-refine path (events_quantiles_scalable) when you
    need guarantees.
    """

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.flips: list[int] = [0]

    def _cap(self, lvl: int) -> int:
        # geometrically shrinking capacities, floor of k/2^(depth-lvl)
        depth = len(self.levels)
        c = int(self.k * (2.0 / 3.0) ** (depth - 1 - lvl))
        return max(c, 8)

    def _compact(self) -> None:
        for i in range(len(self.levels)):
            if len(self.levels[i]) <= self._cap(i):
                continue
            v = np.sort(self.levels[i])
            parity = self.flips[i] & 1
            self.flips[i] += 1
            if len(v) & 1:
                # odd length: leave one item behind so total weight is
                # preserved exactly; alternate which end to avoid bias
                if parity:
                    leftover, v = v[:1], v[1:]
                else:
                    leftover, v = v[-1:], v[:-1]
            else:
                leftover = v[:0]
            keep = v[parity::2]
            self.levels[i] = leftover
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.flips.append(0)
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], keep])

    def add(self, values: np.ndarray) -> "KllSketch":
        values = np.asarray(values, np.float64)
        # nulls arrive as NaN (arrow->numpy float conversion); NaN sorts
        # to the top compactor ranks and silently poisons every high
        # quantile, so drop them here — quantiles are over OBSERVED
        # values, matching SQL aggregate null semantics
        if np.isnan(values).any():
            values = values[~np.isnan(values)]
        cap = self._cap(0)
        for start in range(0, len(values), cap):
            self.levels[0] = np.concatenate(
                [self.levels[0], values[start:start + cap]])
            self._compact()
        return self

    def merge(self, other: "KllSketch") -> "KllSketch":
        for i, lv in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.flips.append(0)
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()
        return self

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """(values, weights), unsorted."""
        vals = [lv for lv in self.levels if len(lv)]
        wts = [np.full(len(lv), 1 << i, np.int64)
               for i, lv in enumerate(self.levels) if len(lv)]
        if not vals:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        return np.concatenate(vals), np.concatenate(wts)

    def n(self) -> int:
        v, w = self.items()
        return int(w.sum())

    def quantile(self, q: float) -> float:
        v, w = self.items()
        if not len(v):
            raise ValueError("empty sketch")
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(v[np.searchsorted(cum, target)])

    def to_row(self) -> dict:
        return {"levels": [lv.tolist() for lv in self.levels],
                "flips": list(self.flips)}

    @classmethod
    def from_row(cls, row: dict, k: int) -> "KllSketch":
        s = cls(k)
        s.levels = [np.asarray(lv, np.float64) for lv in row["levels"]]
        s.flips = list(row["flips"])
        if not s.levels:
            s.levels = [np.empty(0, np.float64)]
            s.flips = [0]
        return s


def kll_quantiles(ds, *, value_col: str, qs: tuple = (0.1, 0.5, 0.9, 0.99),
                  k: int = 200):
    """One-pass approximate quantiles of a numeric column ->
    (q:float64, value:float64) Dataset.

    Scale shape: every block reduces to ONE sketch row of <= ~2k
    floats regardless of block size — that is all that leaves the
    task; the driver folds block sketches in block order and answers
    every quantile from the final ~2k-item summary. No shuffle at all
    (vs. the exact histogram-refine path's one tiny groupby). Error is
    ~1/k in rank on smooth data; the sketch is deterministic for a
    fixed partitioning.
    """
    import ray.data

    def summarize(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        s = KllSketch(k).add(v)
        row = s.to_row()
        return pa.table({
            "levels": pa.array([row["levels"]],
                               pa.list_(pa.list_(pa.float64()))),
            "flips": pa.array([row["flips"]], pa.list_(pa.int64())),
        })

    parts = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    acc = KllSketch(k)
    for row in parts:
        acc.merge(KllSketch.from_row(row, k))
    return ray.data.from_arrow(pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "value": pa.array([acc.quantile(q) for q in qs], pa.float64()),
    }))


def kll_quantiles_by_group(ds, *, key_col: str, value_col: str,
                           qs: tuple = (0.5, 0.9, 0.99), k: int = 200):
    """Per-group approximate quantiles -> (key, q, value) Dataset.

    The fully distributed KLL composition (vs ``kll_quantiles``'s
    driver fold): every block reduces to ONE sketch row per group it
    touches, then a groupby(key) shuffle moves only those ~2k-float
    rows — the per-group merge-and-finalize runs in the group task, so
    the driver never sees per-group state. At 100 TB with G groups and
    B blocks the shuffle carries <= G x B sketch rows regardless of
    row count; value data never leaves its block.
    """
    import pandas as pd

    def summarize(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        order = pc.sort_indices(keys)
        srt = batch.take(order)
        karr = np.asarray(srt.column(key_col).to_pylist(), dtype=object)
        vals = srt.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        uniq, starts = np.unique(karr, return_index=True)
        bounds = np.append(starts, len(karr))
        rows_k, rows_l, rows_f = [], [], []
        for i, key in enumerate(uniq):
            s = KllSketch(k).add(vals[bounds[i]:bounds[i + 1]])
            row = s.to_row()
            rows_k.append(key)
            rows_l.append(row["levels"])
            rows_f.append(row["flips"])
        return pa.table({
            key_col: pa.array(rows_k),
            "levels": pa.array(rows_l, pa.list_(pa.list_(pa.float64()))),
            "flips": pa.array(rows_f, pa.list_(pa.int64())),
        })

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        acc = KllSketch(k)
        for _, row in group.iterrows():
            acc.merge(KllSketch.from_row(
                {"levels": list(row["levels"]), "flips": list(row["flips"])},
                k))
        return pd.DataFrame({
            key_col: [group[key_col].iloc[0]] * len(qs),
            "q": list(qs),
            "value": [acc.quantile(q) for q in qs],
        })

    return ds.map_batches(summarize, batch_format="pyarrow") \
        .groupby(key_col).map_groups(merge, batch_format="pandas")


def _kmin_hashes(ds, *, value_col: str, k: int) -> np.ndarray:
    """Distributed k smallest distinct md5-low-64 hashes of a column:
    per-batch combiners prune to <= k hashes each (8 bytes apiece is
    all that leaves a task); the driver folds the <= k x blocks
    partials. Sorted uint64 array, length <= k."""
    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.unique(batch.column(value_col)).to_pylist()
        hs = sorted({kmv_hash64(v) for v in vals})[:k]
        return pa.table({"h": pa.array(np.array(hs, np.uint64),
                                       pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.unique(np.array([r["h"] for r in parts], np.uint64))
    return merged[:k]


def kmv_overlap(ds_a, ds_b, *, value_col: str, k: int = 16384):
    """Distinct-set overlap of one column across two datasets ->
    single row (est_a, est_b, est_union, est_intersection, jaccard),
    all float64.

    The KMV set-operation estimator: the k smallest hashes of A∪B are
    a uniform sample of the union, so jaccard ≈ matches/|U| and
    est_intersection = jaccard * est_union. Below saturation (fewer
    than k distinct values in the union) every quantity is EXACT and
    the SQL oracle reproduces it bit-for-bit — the corpus-overlap
    audit ("how many users/docs do these two slices share?") without
    ever shuffling raw values: each side ships <= k 8-byte hashes per
    block, nothing else.
    """
    import ray.data

    sa = _kmin_hashes(ds_a, value_col=value_col, k=k)
    sb = _kmin_hashes(ds_b, value_col=value_col, k=k)

    def est(s: np.ndarray) -> float:
        return float(len(s)) if len(s) < k \
            else (k - 1) * _TWO64 / float(s[k - 1])

    union = np.unique(np.concatenate([sa, sb]))[:k]
    matches = np.intersect1d(union, np.intersect1d(sa, sb)).size
    if len(union) < k:
        est_union = float(len(union))
        est_inter = float(matches)
    else:
        est_union = (k - 1) * _TWO64 / float(union[k - 1])
        est_inter = (matches / float(len(union))) * est_union
    jacc = (est_inter / est_union) if est_union else 0.0
    return ray.data.from_arrow(pa.table({
        "est_a": pa.array([est(sa)], pa.float64()),
        "est_b": pa.array([est(sb)], pa.float64()),
        "est_union": pa.array([est_union], pa.float64()),
        "est_intersection": pa.array([est_inter], pa.float64()),
        "jaccard": pa.array([jacc], pa.float64()),
    }))


class _PartialMGByGroup:
    """Per-batch, per-group Misra-Gries compression: each group's
    in-batch term counts collapse to <= capacity rows + one decrement
    marker row per group ('' is never a token). The shuffle carries
    <= (capacity+1) x groups x blocks rows — configuration-bounded."""

    def __init__(self, group_col: str, text_col: str, capacity: int):
        self.group_col = group_col
        self.text_col = text_col
        self.capacity = capacity

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        per_group: dict = {}
        for g, t in zip(batch.column(self.group_col).to_pylist(),
                        batch.column(self.text_col).to_pylist()):
            per_group.setdefault(g, Counter()).update((t or "").split())
        out_g, out_t, out_c, out_d = [], [], [], []
        for g, counts in per_group.items():
            dec = 0
            if len(counts) > self.capacity:
                dec = sorted(counts.values(),
                             reverse=True)[self.capacity]
                counts = Counter({t: c - dec for t, c in counts.items()
                                  if c - dec > 0})
            for t, c in counts.items():
                out_g.append(g)
                out_t.append(t)
                out_c.append(c)
                out_d.append(0)
            out_g.append(g)
            out_t.append("")
            out_c.append(0)
            out_d.append(dec)
        return pa.table({
            self.group_col: pa.array(out_g),
            "term": pa.array(out_t, pa.string()),
            "cnt": pa.array(out_c, pa.int64()),
            "dec": pa.array(out_d, pa.int64()),
        })


def heavy_hitters_by_group(ds, *, group_col: str = "lang",
                           text_col: str = "text", capacity: int = 256,
                           min_count: int = 2):
    """Per-group frequent terms -> (group, term, count, err_bound):
    the heavy_hitters sketch partitioned by a key (trending terms per
    language / per source). Same guarantees per group as the global
    op: count <= true <= count + err_bound, exact (err_bound 0) while
    no batch exceeds ``capacity`` distinct terms in that group; the
    finalize runs per group over the already-reduced aggregate."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(_PartialMGByGroup(group_col, text_col, capacity),
                         batch_format="pyarrow") \
        .groupby([group_col, "term"]).aggregate(Sum("cnt"), Sum("dec"))

    def finalize(group: pa.Table) -> pa.Table:
        g = group.column(group_col)[0].as_py()
        terms = group.column("term").to_pylist()
        cnts = group.column("sum(cnt)").to_pylist()
        decs = group.column("sum(dec)").to_pylist()
        total_dec = sum(d for t, d in zip(terms, decs) if t == "")
        keep = [(t, c) for t, c in zip(terms, cnts)
                if t != "" and c > 0 and c + total_dec >= min_count]
        keep.sort(key=lambda r: (-r[1], r[0]))
        return pa.table({
            group_col: pa.array([g] * len(keep)),
            "term": pa.array([t for t, _ in keep], pa.string()),
            "count": pa.array([c for _, c in keep], pa.int64()),
            "err_bound": pa.array([total_dec] * len(keep), pa.int64()),
        })

    return agg.groupby(group_col).map_groups(finalize,
                                             batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, with the standard small-range
# linear-counting correction)
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(values, *, p: int = 12) -> np.ndarray:
    """uint8 register array (m = 2^p) for an iterable of values; hash
    = md5 low 64 (same deterministic hash as the KMV sketch)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    shift = 64 - p
    for v in values:
        h = kmv_hash64(v)
        idx = h >> shift
        rest = (h << p) & ((1 << 64) - 1)
        # rho = leading zeros of the remaining 64-p bits, +1
        rho = 1
        mask = 1 << 63
        while rho <= 64 - p and not (rest & mask):
            rest <<= 1
            rho += 1
        if rho > regs[idx]:
            regs[idx] = rho
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    est = _hll_alpha(m) * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))   # linear counting
    return float(est)


def hll_distinct(ds, *, group_col: str, value_col: str, p: int = 12,
                 est_col: str = "est_distinct"):
    """Per-group HyperLogLog distinct count -> (group, est float64):
    the constant-memory cardinality sketch (2^p one-byte registers per
    group, ~1.04/sqrt(2^p) relative error; p=12 -> 4 KiB / ~1.6%).

    vs the KMV sketch (`kmv_distinct`): HLL shuffles a FIXED 2^p-byte
    blob per (group, block) regardless of k-vs-cardinality, merges by
    elementwise register max (associative + idempotent — safe under
    retries), and never stores hashes. Per-batch combiner -> one
    groupby(group) -> register fold + estimate in the group task.
    """
    import pandas as pd

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        per_group: dict = {}
        for g, v in zip(keys, vals):
            per_group.setdefault(g, []).append(v)
        gs, blobs = [], []
        for g, vs in per_group.items():
            gs.append(g)
            blobs.append(hll_registers(vs, p=p).tobytes())
        return pa.table({group_col: pa.array(gs),
                         "regs": pa.array(blobs, pa.binary())})

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, np.uint8)
        for blob in group["regs"]:
            acc = np.maximum(acc, np.frombuffer(blob, np.uint8))
        return pd.DataFrame({
            group_col: [group[group_col].iloc[0]],
            est_col: [hll_estimate(acc)],
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(fold, batch_format="pandas")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def _cms_indices(term: str, depth: int, width: int) -> list[int]:
    """One md5 per term supplies all row indices (digest sliced per
    row) — deterministic across processes."""
    dig = md5(term.encode()).digest()
    out = []
    for r in range(depth):
        chunk = dig[(4 * r) % 16:(4 * r) % 16 + 4]
        out.append((int.from_bytes(chunk, "little") + r * 0x9E3779B9)
                   % width)
    return out


def cms_term_counts(ds, *, text_col: str = "text", query_terms: list,
                    depth: int = 4, width: int = 4096):
    """Count-Min point-frequency estimates -> (term, est_count) for
    each requested term: the bounded-memory answer to "how often does
    THIS term appear?" (vs Misra-Gries' "which terms are frequent?").
    Estimates never UNDERcount; overcount <= 2N/width with prob
    1 - 2^-depth.

    Each block reduces to one depth x width int64 counter table
    (flattened blob); merge is elementwise ADD — one `sum` over
    blocks x (depth*width) cells via a single-column aggregate, no
    groupby at all. The query lookup (min over depth rows) happens
    driver-side on the merged table."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: "Counter" = Counter()
        for t in batch.column(text_col).to_pylist():
            counts.update((t or "").split())
        tab = np.zeros((depth, width), np.int64)
        for term, c in counts.items():
            for r, idx in enumerate(_cms_indices(term, depth, width)):
                tab[r, idx] += c
        return pa.table({"cell": pa.array(np.arange(depth * width),
                                          pa.int64()),
                         "v": pa.array(tab.ravel(), pa.int64())})

    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    merged = coalesce_small(
        ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("cell").aggregate(Sum("v")).take_all()
    tab = np.zeros(depth * width, np.int64)
    for r in merged:
        tab[r["cell"]] = r["sum(v)"]
    tab = tab.reshape(depth, width)

    ests = []
    for term in query_terms:
        idxs = _cms_indices(term, depth, width)
        ests.append(int(min(tab[r, i] for r, i in enumerate(idxs))))
    return ray.data.from_arrow(pa.table({
        "term": pa.array(list(query_terms), pa.string()),
        "est_count": pa.array(ests, pa.int64()),
    }))


def kll_calibration(ds, *, value_col: str,
                    qs: tuple = (0.1, 0.5, 0.9, 0.99), k: int = 200):
    """Sketch-accuracy report -> (q, exact, sketch, value_abs_err):
    the KLL estimate next to the EXACT quantile (from the cents
    histogram) for each requested q — run this before trusting a k
    setting on a new distribution; widen k until value_abs_err is in
    budget. Both sides are existing operators; the exact side's one
    tiny groupby and the sketch's zero-shuffle fold share the same
    single read."""
    import ray.data

    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    # exact via cents histogram (value-distribution bounded)
    def hist_partial(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column(value_col),
                                         pa.scalar(100.0))), pa.int64())
        agg = pa.table({"c": c}).group_by("c").aggregate(
            [([], "count_all")])
        return pa.table({"c": agg.column("c"),
                         "partial_n": pc.cast(agg.column("count_all"),
                                              pa.int64())})

    hist = coalesce_small(
        ds.map_batches(hist_partial, batch_format="pyarrow")) \
        .groupby("c").aggregate(Sum("partial_n")).take_all()
    pairs = sorted((r["c"], r["sum(partial_n)"]) for r in hist)
    vals = np.array([p[0] for p in pairs], np.int64)
    cum = np.cumsum([p[1] for p in pairs])
    n = int(cum[-1])

    sketch = kll_quantiles(ds, value_col=value_col, qs=qs, k=k) \
        .to_pandas().set_index("q")["value"].to_dict()

    out_q, out_e, out_s = [], [], []
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        exact = float(vals[np.searchsorted(cum, target)]) / 100.0
        out_q.append(q)
        out_e.append(exact)
        out_s.append(float(sketch[q]))
    return ray.data.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "exact": pa.array(out_e, pa.float64()),
        "sketch": pa.array(out_s, pa.float64()),
        "value_abs_err": pa.array(
            [abs(e - s) for e, s in zip(out_e, out_s)], pa.float64()),
    }))
