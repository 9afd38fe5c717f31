"""Deterministic content-hash sampling and pattern redaction.

Training-data curation ops that must be reproducible across re-runs and
resumable restarts, so both are keyed on content hashes / fixed regexes
rather than RNG state:

- ``stratified_hash_sample``: keep a row iff the first 8 hex digits of
  ``md5(key)`` fall below a per-stratum threshold. Map-only (no shuffle,
  no RNG); the same row is kept or dropped identically on every run and
  on every cluster size — the property a 100 TB resumable pipeline needs.
- ``redact_batch`` / ``redact_pii``: vectorized regex redaction via
  ``pyarrow.compute.replace_substring_regex`` (RE2, the same engine
  DuckDB's ``regexp_replace`` uses, so oracles match exactly). Built-in
  pattern library covers emails, phone-ish runs, and digit runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 8-hex-digit md5 prefix space.
_HASH_SPACE = 16 ** 8

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
    "number": r"\d+",
}


def rate_to_hex_threshold(rate: float) -> str:
    """Lowercase 8-digit hex string t: keep iff md5(key)[:8] < t.

    rate >= 1.0 returns "g", which sorts after every hex digit, so the
    comparison keeps all rows (a 9-digit "100000000" would sort BEFORE
    most 8-digit prefixes and silently drop ~94% instead).
    """
    t = max(0, min(_HASH_SPACE, int(rate * _HASH_SPACE)))
    if t >= _HASH_SPACE:
        return "g"
    return format(t, "08x")


def hash_sample_batch(batch: pa.Table, *, key_col: str, strat_col: str,
                      rates: dict[str, float], default_rate: float,
                      fp_col: str = "fp") -> pa.Table:
    """Filter one batch to the deterministic sample; appends md5 ``fp``."""
    keys = batch.column(key_col).to_pylist()
    strata = (batch.column(strat_col).to_pylist() if strat_col
              else [None] * len(keys))
    thresholds = {s: rate_to_hex_threshold(r) for s, r in rates.items()}
    default_thresh = rate_to_hex_threshold(default_rate)
    fps, keep = [], []
    for key, stratum in zip(keys, strata):
        fp = hashlib.md5((key or "").encode()).hexdigest()
        fps.append(fp)
        keep.append(fp[:8] < thresholds.get(stratum, default_thresh))
    out = batch.append_column(fp_col, pa.array(fps, pa.string()))
    return out.filter(pa.array(keep, pa.bool_()))


def stratified_hash_sample(ds, *, key_col: str = "text",
                           strat_col: str = "lang",
                           rates: dict[str, float] | None = None,
                           default_rate: float = 0.5):
    """Deterministic per-stratum subsample keyed on md5 of ``key_col``."""
    return ds.map_batches(
        hash_sample_batch,
        fn_kwargs=dict(key_col=key_col, strat_col=strat_col,
                       rates=rates or {}, default_rate=default_rate),
        batch_format="pyarrow")


def redact_batch(col: pa.ChunkedArray | pa.Array, pattern: str,
                 replacement: str) -> tuple[pa.Array, pa.Array]:
    """(redacted_text, n_redactions) — both fully vectorized (RE2)."""
    redacted = pc.replace_substring_regex(col, pattern=pattern,
                                          replacement=replacement)
    counts = pc.cast(pc.count_substring_regex(col, pattern=pattern),
                     pa.int64())
    return redacted, counts


def redact_pii(ds, *, text_col: str, patterns: list[str] | None = None,
               replacement: str = "<PII>", out_col: str | None = None):
    """Append ``{text_col}_redacted`` + ``n_redactions`` columns.

    ``patterns`` are names from PII_PATTERNS or raw regexes; they are
    OR-joined into one RE2 alternation so the column is scanned once.
    """
    pats = [PII_PATTERNS.get(p, p) for p in (patterns or ["email", "phone"])]
    alternation = "|".join(f"(?:{p})" for p in pats)
    target = out_col or f"{text_col}_redacted"

    def fn(batch: pa.Table) -> pa.Table:
        redacted, counts = redact_batch(batch.column(text_col), alternation,
                                        replacement)
        return (batch.append_column(target, redacted)
                .append_column("n_redactions", counts))

    return ds.map_batches(fn, batch_format="pyarrow")


def _budget_bucket_partials(batch: pa.Table, *, id_col: str,
                            source_col: str, text_col: str) -> pa.Table:
    """Per-batch combiner for mixture sampling pass 1: partial token sums
    per (source, hash-prefix bucket)."""
    from ..functions.text import token_count_batch

    toks = pc.cast(token_count_batch(batch.column(text_col)),
                   pa.int64()).to_pylist()
    srcs = batch.column(source_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    acc: dict = {}
    for s, i, n in zip(srcs, ids, toks):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        acc[(s, b)] = acc.get((s, b), 0) + n
    return pa.table({
        source_col: pa.array([k[0] for k in acc]),
        "bucket": pa.array([k[1] for k in acc], pa.int32()),
        "partial_tokens": pa.array(list(acc.values()), pa.int64()),
    })


def mixture_sample_by_budget(ds, *, default_budget: int,
                             budgets: dict | None = None,
                             id_col: str = "doc_id",
                             source_col: str = "source",
                             text_col: str = "text"):
    """Token-budget mixture sampling (the data-mixing op): per source,
    keep documents in deterministic md5(id) order until the source's
    token budget fills. A doc is kept iff the token sum of all
    hash-earlier docs of its source is < budget. -> (id, source,
    n_tokens). Exactly SQL-checkable (window sum over hash order).

    Scale shape (same histogram-refine discipline as
    ``events_quantiles_scalable``): pass 1 sums tokens per (source,
    256-way hash-prefix bucket) through a per-batch combiner — the
    groupby output is 256 x sources rows, driver-sized. The driver
    finds each source's BOUNDARY bucket (where the cumulative crosses
    the budget). Pass 2 streams: docs in earlier buckets are kept
    map-only (NO shuffle — the bulk of the sample), later buckets are
    dropped in-batch, and only the ~1/256 boundary slice rides a
    groupby(source) for the exact ordered scan. Budget >> corpus keeps
    everything; budget 0 keeps nothing.
    """
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    budgets = budgets or {}

    partial = ds.map_batches(
        _budget_bucket_partials,
        fn_kwargs={"id_col": id_col, "source_col": source_col,
                   "text_col": text_col},
        batch_format="pyarrow")
    hist = coalesce_small(partial).groupby([source_col, "bucket"]) \
        .aggregate(Sum("partial_tokens")).take_all()

    per_src: dict = {}
    for r in hist:
        per_src.setdefault(r[source_col], []).append(
            (r["bucket"], r["sum(partial_tokens)"]))
    # boundary[s] = (boundary_bucket_or_None_if_all_kept, tokens_before_it)
    boundary: dict = {}
    for s, pairs in per_src.items():
        budget = budgets.get(s, default_budget)
        cum = 0
        bnd = None
        for b, n in sorted(pairs):
            if cum + n >= budget:
                bnd = b
                break
            cum += n
        boundary[s] = (bnd, cum)

    def annotate(batch: pa.Table) -> pa.Table:
        from ..functions.text import token_count_batch

        toks = pc.cast(token_count_batch(batch.column(text_col)), pa.int64())
        t = pa.table({
            id_col: batch.column(id_col),
            source_col: batch.column(source_col),
            "n_tokens": toks,
        })
        hks = [hashlib.md5(str(i).encode()).hexdigest()
               for i in t.column(id_col).to_pylist()]
        return t.append_column("hk", pa.array(hks, pa.string()))

    def annotate_route(batch: pa.Table) -> pa.Table:
        # route: 0 = bulk keep (earlier bucket), 1 = boundary bucket
        # (needs the exact ordered scan), 2 = drop (later bucket)
        t = annotate(batch)
        route = []
        for s, hk in zip(t.column(source_col).to_pylist(),
                         t.column("hk").to_pylist()):
            bnd, _ = boundary.get(s, (None, 0))
            if bnd is None or int(hk[:2], 16) < bnd:
                route.append(0)
            elif int(hk[:2], 16) == bnd:
                route.append(1)
            else:
                route.append(2)
        return t.append_column("route", pa.array(route, pa.int8()))

    def exact_scan(group):
        import pandas as pd  # noqa: F401

        g = group.sort_values("hk").reset_index(drop=True)
        s = g[source_col].iloc[0]
        bnd, cum = boundary[s]
        budget = budgets.get(s, default_budget)
        before = cum + g["n_tokens"].cumsum().shift(fill_value=0)
        return g.loc[before < budget,
                     [id_col, source_col, "n_tokens"]]

    # annotate ONCE: tokenize + hash each doc a single time, then route
    # from the slim (text-free) table — two annotate passes would
    # re-execute the input and re-tokenize the full corpus per consumer
    slim = ds.map_batches(annotate_route, batch_format="pyarrow")

    def strip(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["hk", "route"])

    if all(bnd is None for bnd, _ in boundary.values()):
        # budget exceeds every source: single consumer, stay lazy
        return slim.map_batches(strip, batch_format="pyarrow")
    slim = slim.materialize()    # consumed twice; tiny rows, no text
    bulk = slim.filter(expr="route == 0") \
        .map_batches(strip, batch_format="pyarrow")
    bound = slim.filter(expr="route == 1") \
        .map_batches(lambda b: b.drop_columns(["route"]),
                     batch_format="pyarrow") \
        .groupby(source_col).map_groups(exact_scan, batch_format="pandas")
    return bulk.union(bound)


def weighted_sample(ds, *, k: int = 25, id_col: str = "doc_id",
                    weight_col: str = "n_chars"):
    """Efraimidis–Spirakis weighted sampling without replacement
    (A-Res, 2006): each row gets key = u^(1/w) with u a deterministic
    md5-uniform of its id; the global top-``k`` keys ARE a weighted
    sample. -> (id, es_key), key DESC.

    Distributed shape: each batch prunes itself to its local top-k (the
    classic k-prune combiner), so the final exact sort+limit runs over
    <= k x blocks rows — never the corpus. Deterministic: u comes from
    ``md5_number_lower`` (no RNG state), and u^(1/w) goes through
    ``math.pow``, bit-identical to DuckDB ``pow`` on this toolchain, so
    even the float sort keys hash-match the SQL oracle. Rows with
    weight <= 0 or null are excluded (zero weight = never sampled)."""
    import math

    from .sketches import kmv_hash64

    two64 = 2.0 ** 64

    def prune(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ws = batch.column(weight_col).to_pylist()
        rows = []
        for i, w in zip(ids, ws):
            if w is not None and w > 0:
                u = kmv_hash64(i) / two64
                rows.append((math.pow(u, 1.0 / float(w)), i))
        rows.sort(key=lambda r: (-r[0], r[1]))
        rows = rows[:k]
        return pa.table({
            id_col: pa.array([i for _, i in rows], pa.int64()),
            "es_key": pa.array([x for x, _ in rows], pa.float64()),
        })

    return ds.map_batches(prune, batch_format="pyarrow") \
        .sort(["es_key", id_col], descending=[True, False]).limit(k)


# -- per-group quota capping ------------------------------------------------


def cap_per_group(ds, *, group_col: str, id_col: str = "doc_id",
                  key_col: str = "text", k: int = 10,
                  keep_cols: list[str] | None = None):
    """Quota sampling: keep at most ``k`` rows per ``group_col`` (the
    'cap documents per domain/source' crawl-curation op), selected
    deterministically as the k smallest ``md5(key)`` values (ties by
    ``id_col``) — an unbiased, run-stable k-subset of each group with no
    RNG state.

    Two-phase like every rollup here: the per-batch combiner prunes each
    batch to <= k rows per group (hash + id + kept columns only), so the
    groupby shuffle carries <= k x groups x blocks rows; the final
    map_groups re-applies the same head-k. SQL-oracle-checkable via
    row_number() OVER (PARTITION BY group ORDER BY md5(key), id).
    """
    import pandas as pd  # noqa: F401

    keep_cols = keep_cols or []
    cols = list(dict.fromkeys([group_col, id_col] + keep_cols))

    def prune(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode("utf-8", "surrogatepass"))
              .hexdigest() for t in batch.column(key_col).to_pylist()]
        df = batch.select(cols).to_pandas()
        df["__h"] = hs
        df = df.sort_values([group_col, "__h", id_col])
        # dropna=False: pandas silently EXCLUDES NaN groups by default,
        # which would delete every null-group row here instead of
        # capping them as their own group
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False, dropna=False).head(k),
            preserve_index=False)

    def final(group):
        g = group.sort_values(["__h", id_col]).head(k)
        return g[cols].reset_index(drop=True)

    return ds.map_batches(prune, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final, batch_format="pandas")


# -- deterministic epoch shuffle --------------------------------------------


def epoch_shuffle(ds, *, id_col: str = "doc_id", seed: int = 0,
                  num_buckets: int = 256):
    """Assign every row its position in a deterministic, seed-keyed
    global permutation — the 'shuffle the corpus for epoch N' op, with
    NO global sort and no RNG state: position = rank of
    ``md5(f"{seed}:{id}")`` (ties by id).

    Scale shape (the id-range-bucket prefix-sum idiom, same as
    pack_sequences_global): bucket = first byte of the hash;
      pass 1: per-batch bucket histograms -> the driver folds
              ``num_buckets`` int64s into an exclusive scan (broadcast
              back via ray.put);
      pass 2: groupby(bucket).map_groups sorts each bucket locally by
              (hash, id) and emits offset+local_rank.
    Only (bucket, hash, id) triples ride the shuffle; md5 uniformity
    keeps buckets balanced at ~n/256 rows regardless of skew in the
    data. Re-running any partition reproduces identical positions
    (resumable). Note pass 1 re-executes the (lazy) input — feed a
    parquet-backed dataset, as with strip_common_lines.

    Returns (id_col, position:int64).
    """
    import numpy as np
    import pandas as pd
    import ray

    prefix_len = 2  # hex chars -> 256 buckets
    assert num_buckets == 256, "bucket count is fixed by the hash prefix"

    def key_of(i) -> str:
        return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()

    def histogram(batch: pa.Table) -> pa.Table:
        counts = np.zeros(num_buckets, dtype=np.int64)
        for i in batch.column(id_col).to_pylist():
            counts[int(key_of(i)[:prefix_len], 16)] += 1
        return pa.table({
            "bucket": pa.array(np.arange(num_buckets, dtype=np.int32)),
            "n": pa.array(counts),
        })

    from ray.data.aggregate import Sum

    hist = ds.select_columns([id_col]).map_batches(
        histogram, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n")).take_all()
    counts = np.zeros(num_buckets, dtype=np.int64)
    for r in hist:
        counts[r["bucket"]] = r["sum(n)"]
    offsets = np.zeros(num_buckets, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    oref = ray.put(offsets)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [key_of(i) for i in ids]
        return pa.table({
            id_col: batch.column(id_col),
            "h": pa.array(keys, pa.string()),
            "bucket": pa.array([int(kk[:prefix_len], 16) for kk in keys],
                               pa.int32()),
        })

    def rank(group: "pd.DataFrame") -> "pd.DataFrame":
        off = ray.get(oref)
        g = group.sort_values(["h", id_col]).reset_index(drop=True)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "position": off[int(g["bucket"].iloc[0])]
            + np.arange(len(g), dtype=np.int64),
        })

    return ds.select_columns([id_col]) \
        .map_batches(keyed, batch_format="pyarrow") \
        .groupby("bucket").map_groups(rank, batch_format="pandas")


def train_val_test_split(ds, *, key_col: str = "doc_id",
                         test_frac: float = 0.1, val_frac: float = 0.1,
                         split_col: str = "split"):
    """Deterministic train/val/test assignment: the first 8 hex digits
    of ``md5(str(key))`` place each row on [0,1); rows below
    ``test_frac`` are 'test', the next ``val_frac`` are 'val', the rest
    'train'. Map-only (no shuffle), reproducible across runs and
    cluster sizes, and stable under corpus growth — a row's split never
    changes when other rows are added, the property that keeps eval
    sets honest across crawl refreshes. SQL-oracle-checkable."""
    t_test = rate_to_hex_threshold(test_frac)
    t_val = rate_to_hex_threshold(test_frac + val_frac)

    def assign(batch: pa.Table) -> pa.Table:
        splits = []
        for k in batch.column(key_col).to_pylist():
            fp8 = hashlib.md5(str(k).encode()).hexdigest()[:8]
            splits.append("test" if fp8 < t_test
                          else "val" if fp8 < t_val else "train")
        return batch.append_column(split_col,
                                   pa.array(splits, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def sample_exact_n(ds, *, n: int, id_col: str = "doc_id", seed: int = 0):
    """EXACTLY-n uniform sample without replacement, deterministic and
    seed-keyed: keep the rows whose position in the epoch_shuffle
    permutation (rank of md5(f"{seed}:{id}"), ties by id) is < n —
    ``ds.random_sample`` gives only an approximate fraction and no
    seed-stable membership; this gives a reproducible exact-count
    sample any worker can recompute.

    Shuffle shape = epoch_shuffle (bucket histogram + per-bucket local
    rank; only (bucket, hash, id) triples move), then a broadcast-free
    map-only filter on position.
    """
    pos = epoch_shuffle(ds, id_col=id_col, seed=seed)
    keep = pos.filter(expr=f"position < {n}") \
        .select_columns([id_col, "position"])
    return keep


def temperature_sample(ds, *, alpha: float = 0.5, coeff: float = 2.0,
                       key_col: str = "text", strat_col: str = "source",
                       id_col: str = "doc_id"):
    """Temperature-flattened mixture resampling: each stratum keeps a
    deterministic md5 fraction  rate_s = min(1, coeff * n_s^(alpha-1)),
    the per-source keep-rate shape of sampling sources proportional to
    n^alpha (the usual multilingual/data-mixing temperature trick —
    alpha<1 upweights small sources; the normalizer is folded into
    ``coeff`` so the rate is a pure per-source expression with no
    cross-source float sum, keeping the math bit-mirrorable in SQL).

    Scale shape: stratum sizes come from one tiny groupby(count); the
    sample itself is the map-only md5-threshold filter (membership is
    stable under corpus growth for fixed rates, same as hash_sample).
    Returns (id_col, strat_col, fp).
    """
    import math

    sizes = ds.groupby(strat_col).count().take_all()
    rates = {r[strat_col]: min(1.0, coeff * math.pow(r["count()"],
                                                     alpha - 1.0))
             for r in sizes}
    slim = ds.select_columns([id_col, strat_col, key_col])
    kept = slim.map_batches(
        hash_sample_batch,
        fn_kwargs=dict(key_col=key_col, strat_col=strat_col,
                       rates=rates, default_rate=0.0),
        batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, strat_col, "fp"])

    return kept.map_batches(project, batch_format="pyarrow")


def interleave_sources(ds, *, id_col: str = "doc_id",
                       source_col: str = "source",
                       bucket_width: int = 4096):
    """Deterministic round-robin source interleaving for training
    mixes: (id, source, global_pos) where ordering by ``global_pos``
    reads the corpus one-source-at-a-time in rotation —
    ``global_pos = per_source_rank * num_sources + source_rank`` (a
    strict total order; when sources are unequal sizes the exhausted
    sources just leave gaps, which preserves the rotation for the
    rest).

    A per-source ORDERED RANK is the hard part at 100 TB: a
    groupby(source).map_groups would land an entire source in one task.
    Instead, the pack_sequences_global bucket-histogram shape, keyed by
    (source, id-range bucket):

    - pass 1: per-batch count per (source, bucket) -> one tiny groupby
      -> driver exclusive scan per source gives every (source, bucket)
      its starting rank (n_buckets x n_sources driver rows).
    - pass 2: only (id, source, bucket) triples shuffle on bucket; each
      group sorts by (source, id), local-cumsums within its source
      runs, adds the broadcast offsets. Group size <= bucket_width
      regardless of source skew.
    """
    import numpy as np

    import ray

    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def hist_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        t = pa.table({
            source_col: batch.column(source_col),
            "bucket": pc.cast(
                pc.divide(ids, pa.scalar(bucket_width, pa.int64())),
                pa.int64()),
        })
        agg = t.group_by([source_col, "bucket"]).aggregate([([], "count_all")])
        return pa.table({
            source_col: agg.column(source_col),
            "bucket": agg.column("bucket"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    hist = coalesce_small(
        ds.map_batches(hist_partial, batch_format="pyarrow")) \
        .groupby([source_col, "bucket"]).aggregate(Sum("partial_n")) \
        .take_all()

    sources = sorted({r[source_col] for r in hist})
    srank = {s: i for i, s in enumerate(sources)}
    nsrc = len(sources)
    offsets: dict[tuple, int] = {}
    cum: dict[str, int] = {s: 0 for s in sources}
    for r in sorted(hist, key=lambda r: (r[source_col], r["bucket"])):
        offsets[(r[source_col], r["bucket"])] = cum[r[source_col]]
        cum[r[source_col]] += r["sum(partial_n)"]
    bc = ray.put((offsets, srank, nsrc))

    def slim(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids,
            source_col: batch.column(source_col),
            "bucket": pc.cast(
                pc.divide(ids, pa.scalar(bucket_width, pa.int64())),
                pa.int64()),
        })

    def rank(group: pa.Table) -> pa.Table:
        offs, sr, n = ray.get(bc)
        g = group.sort_by([(source_col, "ascending"), (id_col, "ascending")])
        srcs = np.asarray(g.column(source_col).to_pylist(), dtype=object)
        bucket = int(g.column("bucket")[0].as_py())
        # per-source local rank within this bucket
        _, starts = np.unique(srcs, return_index=True)
        seg_start = np.zeros(len(srcs), np.int64)
        seg_start[starts] = starts
        seg_start = np.maximum.accumulate(seg_start)
        local = np.arange(len(srcs), dtype=np.int64) - seg_start
        base = np.array([offs[(s, bucket)] for s in srcs], np.int64)
        sranks = np.array([sr[s] for s in srcs], np.int64)
        gpos = (base + local) * n + sranks
        return pa.table({
            id_col: g.column(id_col),
            source_col: g.column(source_col),
            "global_pos": pa.array(gpos, pa.int64()),
        })

    return ds.map_batches(slim, batch_format="pyarrow") \
        .groupby("bucket").map_groups(rank, batch_format="pyarrow")


def shuffle_quality(ds, *, pos_col: str = "position",
                    group_col: str = "source",
                    bucket_width: int = 4096):
    """Shuffle-mixedness audit -> one row (n_pairs, same_group_pairs,
    value_same_rate): over the shuffled ORDER (``pos_col``), what
    fraction of adjacent pairs come from the same ``group_col`` — a
    well-mixed epoch should sit near sum(share^2) (the HHI), a lazy
    shuffle near 1.

    Exact global adjacency WITHOUT a global sort, via HALO buckets:
    row at position p ships to bucket p//W and, when it straddles a
    boundary, to (p+1)//W as well — every adjacent pair is co-located
    in exactly one bucket task, none double-counted. Per-bucket
    (pairs, same) partials sum to the global answer.
    """
    from ray.data.aggregate import Sum

    W = bucket_width

    def halo(batch: pa.Table) -> pa.Table:
        pos = batch.column(pos_col).to_numpy(zero_copy_only=False)
        grp = np.asarray(batch.column(group_col).to_pylist(),
                         dtype=object)
        b1 = pos // W
        out_p = [pos, ]
        out_g = [grp, ]
        out_b = [b1, ]
        straddle = (pos + 1) // W != b1
        out_p.append(pos[straddle])
        out_g.append(grp[straddle])
        out_b.append(b1[straddle] + 1)
        return pa.table({
            "pos": pa.array(np.concatenate(out_p), pa.int64()),
            # explicit type (the INPUT column's): an empty block would
            # otherwise infer grp as null-typed and break schema
            # unification with the real blocks at the groupby
            "grp": pa.array(np.concatenate(out_g),
                            batch.schema.field(group_col).type),
            "bucket": pa.array(np.concatenate(out_b), pa.int64()),
        })

    def pairs(group: pa.Table) -> pa.Table:
        g = group.sort_by([("pos", "ascending")])
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        grp = np.asarray(g.column("grp").to_pylist(), dtype=object)
        bucket = int(g.column("bucket")[0].as_py())
        adj = pos[1:] == pos[:-1] + 1
        # count a pair only in the bucket of its SECOND element, so a
        # straddling pair (counted in the halo bucket) is never doubled
        owns = (pos[1:] // W) == bucket
        use = adj & owns
        same = (grp[1:] == grp[:-1]) & use
        return pa.table({
            "p_pairs": pa.array([int(use.sum())], pa.int64()),
            "p_same": pa.array([int(same.sum())], pa.int64()),
        })

    agg = ds.map_batches(halo, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pyarrow") \
        .sum(["p_pairs", "p_same"])

    import ray.data

    # .sum() returns None on a fully empty dataset
    n_pairs = int(agg["sum(p_pairs)"]) if agg else 0
    same = int(agg["sum(p_same)"]) if agg else 0
    return ray.data.from_arrow(pa.table({
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "same_group_pairs": pa.array([same], pa.int64()),
        "value_same_rate": pa.array(
            [same / n_pairs if n_pairs else 0.0], pa.float64()),
    }))


# -- DSIR-style importance scoring -----------------------------------------


def _hashed_bigram_features(batch: pa.Table, text_col: str,
                            dim: int):
    """(parent_row_indices, bucket_ids) for every within-doc word
    bigram in the batch, hashed with the DuckDB-parity md5 low-64
    (``md5_number_lower(w1 || ' ' || w2) % dim``). Tokenization is the
    engine-standard whitespace split (edge-empties filtered, adjacency
    preserved)."""
    from ..pipelines.sketches import kmv_hash64

    toks = batch.column(text_col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = pc.utf8_split_whitespace(toks)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    p = parent.to_numpy(zero_copy_only=False)
    n = len(p)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    same = pa.array(p[1:] == p[:-1])
    grams = pc.binary_join_element_wise(
        flat.slice(0, n - 1).filter(same),
        flat.slice(1, n - 1).filter(same), " ").to_pylist()
    bkts = np.fromiter((kmv_hash64(g) % dim for g in grams),
                       np.int64, count=len(grams))
    return p[:-1][p[1:] == p[:-1]].astype(np.int64), bkts


def dsir_importance(ds, *, text_col: str = "text",
                    target_col: str = "lang",
                    target_value: str = "en",
                    dim: int = 4096):
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") ->
    (doc_id..., n_feats, value_score): per document, the hashed-bigram
    log importance weight

        score = sum_b  ln p_target(b) - ln p_raw(b)

    over the doc's hashed word-bigram occurrences, where both unigram
    models over the ``dim`` feature buckets are add-1 smoothed counts
    from (a) the target slice (``target_col == target_value``) and (b)
    the WHOLE corpus. High scores = "looks like the target domain";
    resample/filter on them to shift a raw crawl toward a target
    distribution. Docs with no bigram features are dropped (score
    undefined).

    Scale shape: one dim-bounded count reduction (per-batch bucket
    combiner -> groupby(bucket) sums -> the two count vectors
    broadcast via ``ray.put``), then a map-only vectorized scoring
    pass (np.add.at over the broadcast weight vector). The corpus is
    consumed twice (counts + scoring); deterministic upstreams
    required, as everywhere in this repo. Hash is the DuckDB-parity
    md5 low-64, so the whole op is SQL-oracle-checkable."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def count_partial(batch: pa.Table) -> pa.Table:
        parent, bkts = _hashed_bigram_features(batch, text_col, dim)
        # fill_null(False): a null target value yields a null boolean,
        # which converts to an object-dtype mask numpy can't index with
        is_t = pc.fill_null(pc.equal(batch.column(target_col),
                                     pa.scalar(target_value)), False) \
            .to_numpy(zero_copy_only=False)
        if len(bkts) == 0:
            return pa.table({
                "bkt": pa.array([], pa.int64()),
                "pt": pa.array([], pa.int64()),
                "pr": pa.array([], pa.int64()),
            })
        t_mask = is_t[parent]
        nr = np.bincount(bkts, minlength=dim)
        nt = np.bincount(bkts[t_mask], minlength=dim)
        used = np.nonzero(nr)[0]
        return pa.table({
            "bkt": pa.array(used, pa.int64()),
            "pt": pa.array(nt[used], pa.int64()),
            "pr": pa.array(nr[used], pa.int64()),
        })

    counts = coalesce_small(
        ds.map_batches(count_partial, batch_format="pyarrow")) \
        .groupby("bkt").aggregate(Sum("pt"), Sum("pr")).take_all()
    nt = np.zeros(dim, np.int64)
    nr = np.zeros(dim, np.int64)
    for r in counts:
        nt[int(r["bkt"])] = int(r["sum(pt)"])
        nr[int(r["bkt"])] = int(r["sum(pr)"])
    tt = int(nt.sum())
    tr = int(nr.sum())
    w = np.log((nt + 1.0) / (tt + dim)) - np.log((nr + 1.0)
                                                 / (tr + dim))
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        parent, bkts = _hashed_bigram_features(batch, text_col, dim)
        scores = np.zeros(batch.num_rows, np.float64)
        nf = np.zeros(batch.num_rows, np.int64)
        if len(bkts):
            np.add.at(scores, parent, wv[bkts])
            nf = np.bincount(parent,
                             minlength=batch.num_rows).astype(np.int64)
        out = batch.drop_columns([text_col]) \
            .append_column("n_feats", pa.array(nf, pa.int64())) \
            .append_column("value_score",
                           pa.array(scores, pa.float64()))
        return out.filter(pc.greater(out.column("n_feats"),
                                     pa.scalar(0, pa.int64())))

    return ds.map_batches(score, batch_format="pyarrow")
