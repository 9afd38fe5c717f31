"""Corpus-wide cleaning/statistics ops: frequent-line boilerplate
removal (CCNet-style line dedup), term frequencies (word count),
TF-IDF salient terms, and an inverted-index builder.

All are multi-phase wide ops with per-batch combiners so shuffles
carry distinct keys, not raw occurrences:

- ``strip_common_lines``: pass 1 counts normalized line occurrences
  across the corpus (per-batch partial counts -> one groupby(line_hash)
  sum); lines seen >= ``min_count`` times are boilerplate. Pass 2
  re-streams the corpus and drops those lines from every document.
  The frequent-line set is broadcast via ``ray.put`` — boilerplate is
  by definition FEW DISTINCT lines with high counts, so the broadcast
  side stays small even at 100 TB (at extreme cardinality the same
  pass-2 filter runs as a hash join of exploded lines against the
  frequent table instead; the pass-1 shape is unchanged).
- ``term_frequencies``: the canonical wordcount. Tokenization and the
  per-batch partial count are fully Arrow-vectorized
  (utf8_split_whitespace -> list_flatten -> hash groupby per batch),
  then one global groupby(term) sum. The final sort+limit runs on the
  already-aggregated distinct-term table (tiny relative to the corpus).

No reference equivalent (Selma has no corpus-level ops — SURVEY.md
§2.5); these are the training-data additions around the engine.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_small


def _line_digest(norm: str) -> bytes:
    return md5(norm.encode("utf-8", "surrogatepass")).digest()


class _PartialLineCounts:
    """Per-batch combiner: one (line_hash, partial_n) row per distinct
    qualifying normalized line in the batch."""

    def __init__(self, text_col: str, min_len: int):
        self.text_col = text_col
        self.min_len = min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: dict[bytes, int] = {}
        min_len = self.min_len
        for t in batch.column(self.text_col).to_pylist():
            for line in (t or "").split("\n"):
                norm = line.strip()
                if len(norm) >= min_len:
                    d = _line_digest(norm)
                    counts[d] = counts.get(d, 0) + 1
        return pa.table({
            "line_hash": pa.array(list(counts.keys()), pa.binary()),
            "partial_n": pa.array(list(counts.values()), pa.int64()),
        })


def frequent_line_hashes(ds, *, text_col: str = "text", min_count: int = 3,
                         min_len: int = 4) -> frozenset[bytes]:
    """Corpus pass 1: md5 digests of normalized lines (``str.strip``,
    length >= ``min_len``) occurring >= ``min_count`` times corpus-wide."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(_PartialLineCounts(text_col, min_len),
                             batch_format="pyarrow")
    agg = coalesce_small(partial).groupby("line_hash").aggregate(
        Sum("partial_n"))

    def freq_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("sum(partial_n)"),
                                pa.scalar(min_count))
        return batch.filter(keep).select(["line_hash"])

    out = agg.map_batches(freq_only, batch_format="pyarrow")
    return frozenset(r["line_hash"] for r in out.take_all())


def strip_common_lines(ds, *, text_col: str = "text", min_count: int = 3,
                       min_len: int = 4, out_col: str = "clean_text"):
    """Dataset -> Dataset with corpus-frequent lines removed per doc.

    Appends ``out_col`` (large_string: surviving lines joined by
    newline), ``n_lines`` and ``n_removed`` (int64). A line is removed
    when its stripped form has length >= ``min_len`` AND occurs >=
    ``min_count`` times across the whole corpus. Line text itself never
    rides a shuffle — only 16-byte digests move. SQL-oracle-checkable.

    Note: pass 2 re-executes the (lazy) input pipeline; feed it a
    materialized/parquet-backed dataset so pass 1 and pass 2 read the
    same bytes once each from storage.
    """
    import ray

    ref = ray.put(frequent_line_hashes(ds, text_col=text_col,
                                       min_count=min_count,
                                       min_len=min_len))

    def clean(batch: pa.Table) -> pa.Table:
        freq = ray.get(ref)
        cleaned, n_lines, n_removed = [], [], []
        for t in batch.column(text_col).to_pylist():
            lines = (t or "").split("\n")
            kept = [ln for ln in lines
                    if not (len(ln.strip()) >= min_len
                            and _line_digest(ln.strip()) in freq)]
            cleaned.append("\n".join(kept))
            n_lines.append(len(lines))
            n_removed.append(len(lines) - len(kept))
        return (batch
                .append_column(out_col, pa.array(cleaned, pa.large_string()))
                .append_column("n_lines", pa.array(n_lines, pa.int64()))
                .append_column("n_removed", pa.array(n_removed, pa.int64())))

    return ds.map_batches(clean, batch_format="pyarrow")


def _partial_terms(batch: pa.Table, text_col: str) -> pa.Table:
    """Vectorized per-batch wordcount combiner: (term, partial_n) per
    distinct token in the batch. Matches ``regexp_extract_all(text,
    '\\S+')`` tokenization (whitespace runs; empties filtered)."""
    toks = pc.utf8_split_whitespace(batch.column(text_col))
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
    agg = pa.table({"term": flat}).group_by("term").aggregate(
        [("term", "count")])
    return pa.table({
        "term": agg.column("term"),
        "partial_n": pc.cast(agg.column("term_count"), pa.int64()),
    })


def term_frequencies(ds, *, text_col: str = "text", top_n: int | None = None):
    """Dataset -> (term, n) corpus-wide token counts.

    ``top_n`` keeps the most frequent terms with a deterministic
    (n DESC, term ASC) tie-break; the sort runs on the post-aggregate
    distinct-term table, never on corpus rows.
    """
    from ray.data.aggregate import Sum

    partial = ds.map_batches(_partial_terms, fn_kwargs={"text_col": text_col},
                             batch_format="pyarrow")
    agg = coalesce_small(partial).groupby("term").aggregate(Sum("partial_n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": batch.column("term"),
            "n": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })

    out = agg.map_batches(rename, batch_format="pyarrow")
    if top_n is not None:
        out = out.sort(["n", "term"], descending=[True, False]).limit(top_n)
    return out


def _doc_term_tf(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Explode a doc batch into its (doc_id, term, tf) triples.

    Fully Arrow-vectorized: utf8_split_whitespace -> list_parent_indices
    maps every flat token back to its source row, then one hash groupby
    per batch collapses to per-doc term counts. Rows are globally
    distinct on (doc_id, term) because each document lives whole in one
    input row."""
    toks = batch.column(text_col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lists = pc.utf8_split_whitespace(toks)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    doc_ids = ids.take(parent)
    keep = pc.not_equal(flat, pa.scalar(""))
    pairs = pa.table({"doc_id": doc_ids.filter(keep),
                      "term": flat.filter(keep)})
    agg = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
    return pa.table({
        "doc_id": pc.cast(agg.column("doc_id"), pa.int64()),
        "term": agg.column("term"),
        "tf": pc.cast(agg.column("term_count"), pa.int64()),
    })


def document_frequencies(ds, *, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Dataset -> (term, df) where df = number of distinct docs
    containing the term. Per-batch combiner emits one row per distinct
    (doc, term), collapsed to per-batch partial dfs before the one
    groupby(term) shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        tf = _doc_term_tf(batch, id_col, text_col)
        agg = tf.group_by("term").aggregate([("doc_id", "count")])
        return pa.table({
            "term": agg.column("term"),
            "partial_df": pc.cast(agg.column("doc_id_count"), pa.int64()),
        })

    agg = coalesce_small(
        ds.map_batches(partial, batch_format="pyarrow")
    ).groupby("term").aggregate(Sum("partial_df"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": batch.column("term"),
            "df": pc.cast(batch.column("sum(partial_df)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def tfidf_top_terms(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 5, num_partitions: int = 16):
    """Dataset -> (doc_id, term, tf, score): each doc's top-``k`` terms
    by TF-IDF, score = tf * ln(N / df), ties broken by term ASC.

    Shape: the corpus explodes once into (doc_id, term, tf) triples and
    once into the (term, df) table (a per-batch-combined groupby whose
    output is vocabulary-sized, tiny next to the corpus); Ray's native
    hash-partitioned join co-locates them on term; scoring is a
    streaming map; the final per-doc top-k reuses the k-prune combiner
    (no global sort). The input pipeline executes twice (df pass + probe
    pass) — feed a parquet-backed dataset so both passes stream from
    storage.

    Float determinism: idf goes through ``math.log`` (platform libm),
    which is bit-identical to DuckDB's ``ln`` on this toolchain —
    ``np.log`` is NOT (SIMD rounding differs) — so score ties are exact
    in both engines and the term tie-break yields identical top-k sets.
    """
    import math

    from .relational import top_k_per_group

    n_docs = float(ds.count())
    df_tbl = document_frequencies(ds, id_col=id_col, text_col=text_col)
    tf_tbl = ds.map_batches(_doc_term_tf,
                            fn_kwargs={"id_col": id_col,
                                       "text_col": text_col},
                            batch_format="pyarrow")
    joined = tf_tbl.join(df_tbl, join_type="inner",
                         num_partitions=num_partitions, on=("term",))

    def score(batch: pa.Table) -> pa.Table:
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        tfv = batch.column("tf").to_numpy(zero_copy_only=False)
        idf = {d: math.log(n_docs / d) for d in np.unique(dfv)}
        s = tfv.astype(np.float64) * np.array([idf[d] for d in dfv])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "term": batch.column("term"),
            "tf": batch.column("tf"),
            "score": pa.array(s, pa.float64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")
    return top_k_per_group(scored, group_col="doc_id", order_col="score",
                           k=k, tie_col="term", keep_cols=["tf"])


def inverted_index(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   max_df: int | None = None):
    """Dataset -> (term, df, postings): sorted distinct doc-id posting
    lists per term (postings = comma-joined ascending doc_ids).

    Two-pass so stopword-class terms never ride the heavy shuffle:
    pass 1 computes (term, df) (per-batch combiner -> tiny groupby) and
    collects ONLY the over-``max_df`` terms — by Zipf's law a short
    list — into a broadcast skip-set; pass 2 explodes (term, doc_id)
    pairs, drops skipped terms in-batch, and assembles posting lists
    per TERM-HASH BUCKET (sort by (term, doc_id) inside the bucket,
    one join per segment) — never one task or pandas frame per term,
    so the assembly stays bounded at any vocabulary size. With
    ``max_df=None`` pass 1 is skipped entirely and every term is
    indexed (fine at test scale; cap it in production)."""
    import ray

    from ..stages.util import bucketed_map_groups

    skip_ref = None
    if max_df is not None:
        dfs = document_frequencies(ds, id_col=id_col, text_col=text_col)
        hot = dfs.map_batches(
            lambda b: b.filter(pc.greater(b.column("df"),
                                          pa.scalar(max_df))).select(
                ["term"]),
            batch_format="pyarrow")
        skip_ref = ray.put(frozenset(r["term"] for r in hot.take_all()))

    def pairs(batch: pa.Table) -> pa.Table:
        t = _doc_term_tf(batch, id_col, text_col).select(["doc_id", "term"])
        if skip_ref is not None:
            skip = ray.get(skip_ref)
            if skip:
                mask = pa.array([s not in skip
                                 for s in t.column("term").to_pylist()],
                                pa.bool_())
                t = t.filter(mask)
        return t

    def assemble_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl, sort_keys=[("term", "ascending"),
                            ("doc_id", "ascending")])
        g = tbl.take(order)
        terms = g.column("term").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(terms)
        if n == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.string())})
        bounds = np.nonzero(np.concatenate(
            ([True], terms[1:] != terms[:-1], [True])))[0]
        out_t, out_d, out_p = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            out_t.append(terms[s])
            out_d.append(e - s)
            out_p.append(",".join(str(i) for i in ids[s:e]))
        return pa.table({
            "term": pa.array(out_t, pa.string()),
            "df": pa.array(out_d, pa.int64()),
            "postings": pa.array(out_p, pa.string()),
        })

    return bucketed_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow"),
        "term", assemble_bucket)


def length_percentile_filter(ds, *, q: float = 0.99, id_col: str = "doc_id",
                             text_col: str = "text"):
    """Corpus-adaptive outlier filter: keep docs whose whitespace token
    count is <= the corpus's exact ``q``-quantile (quantile_disc
    semantics: the actual element at index ceil(q*n)-1 of the sorted
    counts, so the threshold — and therefore the result set — is
    bit-exactly SQL-checkable). -> (id, n_tokens).

    Scale shape: token counts are small discrete ints, so pass 1 is a
    per-batch value-count combiner + one tiny groupby(n_tokens) — the
    histogram is O(distinct lengths), not O(docs). The driver walks the
    cumulative histogram to the threshold; pass 2 is a broadcast-free
    map-only filter (the threshold is one int in the task closure)."""
    import math

    from ray.data.aggregate import Sum

    from ..functions.text import token_count_batch
    from ..stages.util import coalesce_small

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.cast(token_count_batch(batch.column(text_col)), pa.int64())
        agg = pa.table({"n_tokens": toks}).group_by("n_tokens") \
            .aggregate([("n_tokens", "count")])
        return pa.table({
            "n_tokens": agg.column("n_tokens"),
            "partial_n": pc.cast(agg.column("n_tokens_count"), pa.int64()),
        })

    hist = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("n_tokens").aggregate(Sum("partial_n")).take_all()
    pairs = sorted((r["n_tokens"], r["sum(partial_n)"]) for r in hist)
    n = sum(c for _, c in pairs)
    if n == 0:
        return ds.map_batches(
            lambda b: pa.table({id_col: b.column(id_col),
                                "n_tokens": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    target = math.ceil(q * n)  # 1-based rank of the quantile element
    cum = 0
    thr = pairs[-1][0]
    for v, c in pairs:
        cum += c
        if cum >= target:
            thr = v
            break

    def keep(batch: pa.Table) -> pa.Table:
        toks = pc.cast(token_count_batch(batch.column(text_col)), pa.int64())
        t = pa.table({id_col: batch.column(id_col), "n_tokens": toks})
        return t.filter(pc.less_equal(t.column("n_tokens"),
                                      pa.scalar(thr, pa.int64())))

    return ds.map_batches(keep, batch_format="pyarrow")


def chunk_documents(ds, *, chunk_tokens: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split docs into overlapping token chunks (embedding / RAG prep):
    one output row per chunk -> (id, chunk_idx, tok_start, n_chunk_tokens,
    chunk_text). Chunk k covers tokens [k*stride, k*stride+chunk_tokens);
    the final chunk may be short; empty docs produce no chunks.

    Pure in-batch fan-out (map_batches emitting more rows than it
    reads) — no shuffle, streams at any scale; overlap = chunk_tokens -
    stride. SQL-checkable (range + 1-based list slices)."""
    if stride <= 0:
        raise ValueError("stride must be positive")

    def fan_out(batch: pa.Table) -> pa.Table:
        ids_out, cidx, tstart, ntok, ctext = [], [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            n = len(toks)
            for k, start in enumerate(range(0, n, stride)):
                piece = toks[start:start + chunk_tokens]
                ids_out.append(i)
                cidx.append(k)
                tstart.append(start)
                ntok.append(len(piece))
                ctext.append(" ".join(piece))
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "tok_start": pa.array(tstart, pa.int64()),
            "n_chunk_tokens": pa.array(ntok, pa.int64()),
            "chunk_text": pa.array(ctext, pa.large_string()),
        })

    return ds.map_batches(fan_out, batch_format="pyarrow")


def corpus_profile(ds, *, group_cols: tuple = ("lang", "source"),
                   text_col: str = "text"):
    """Corpus profiling rollup: per group -> (group..., n_docs,
    total_tokens, total_chars, mean_tokens). Means are computed as ONE
    division of exact int64 sums (never a running float mean), so the
    float column is bit-identical to SQL's sum()::DOUBLE / count(*)."""
    from ray.data.aggregate import Sum

    from ..functions.text import token_count_batch

    cols = list(group_cols)

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.cast(token_count_batch(batch.column(text_col)), pa.int64())
        chars = pc.cast(pc.utf8_length(batch.column(text_col)), pa.int64())
        t = pa.table({**{c: batch.column(c) for c in cols},
                      "tok": toks, "chr": chars})
        agg = t.group_by(cols).aggregate(
            [("tok", "sum"), ("chr", "sum"), ("tok", "count")])
        return pa.table({
            **{c: agg.column(c) for c in cols},
            "tok": agg.column("tok_sum"),
            "chr": agg.column("chr_sum"),
            "n": pc.cast(agg.column("tok_count"), pa.int64()),
        })

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(cols).aggregate(Sum("tok"), Sum("chr"), Sum("n"))

    def final(batch: pa.Table) -> pa.Table:
        tok = batch.column("sum(tok)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            **{c: batch.column(c) for c in cols},
            "n_docs": pa.array(n, pa.int64()),
            "total_tokens": pa.array(tok, pa.int64()),
            "total_chars": pc.cast(batch.column("sum(chr)"), pa.int64()),
            "mean_tokens": pa.array(tok.astype(np.float64)
                                    / n.astype(np.float64), pa.float64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def ngram_frequencies(ds, *, n: int = 2, text_col: str = "text",
                      top_n: int | None = None, min_count: int = 1):
    """Corpus-wide word n-gram counts -> (gram, cnt): the canonical
    n-gram LM count job. Same two-phase shape as ``term_frequencies``
    (per-batch Counter combiner -> one groupby(gram) sum); ``min_count``
    prunes the long tail AFTER the exact aggregate, ``top_n`` sorts only
    the post-aggregate distinct-gram table. Grams are space-joined
    tokens (whitespace tokenization, SQL-oracle parity)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        join = " ".join
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            for i in range(len(toks) - n + 1):
                g = join(toks[i:i + n])
                counts[g] = counts.get(g, 0) + 1
        return pa.table({
            "gram": pa.array(list(counts.keys()), pa.large_string()),
            "partial_n": pa.array(list(counts.values()), pa.int64()),
        })

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("gram").aggregate(Sum("partial_n"))

    def finish(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "gram": batch.column("gram"),
            "cnt": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })
        if min_count > 1:
            t = t.filter(pc.greater_equal(t.column("cnt"),
                                          pa.scalar(min_count)))
        return t

    out = agg.map_batches(finish, batch_format="pyarrow")
    if top_n is not None:
        out = out.sort(["cnt", "gram"], descending=[True, False]).limit(top_n)
    return out


def unigram_logprob(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    model_ds=None, vocab_top: int | None = None,
                    alpha: float = 0.5):
    """CCNet-style unigram language-model scoring: train token counts
    over ``model_ds`` (default: the scored corpus itself), broadcast a
    (term -> log p) table, and emit per-document mean negative
    log-probability — the classic LM-perplexity quality signal used to
    bucket web text against a trusted corpus.

    Output: (id_col, n_tokens:int64, avg_nll:double), one row per
    document that has >= 1 token. Lower avg_nll = more typical text.

    Model: add-``alpha`` smoothed unigram,
    ``log((n + alpha) / (N + alpha * (V + 1)))`` with N = total tokens,
    V = vocabulary size; out-of-vocabulary tokens get the n=0 slot.
    ``math.log`` on the driver for bit-parity with DuckDB ``ln``.

    Scale shape: the count pass is ``term_frequencies`` (per-batch
    Arrow combiner, one groupby(term) shuffle of distinct terms). The
    trained table is materialized ONCE (post-aggregate, distinct terms
    only) and bounded by ``vocab_top`` — at 100 TB you cap the vocab
    (e.g. 1e6 rows, ~30 MB broadcast) and the OOV slot absorbs the
    tail. The scoring pass is map-only: per batch, tokens are exploded
    vectorized (utf8_split_whitespace -> list_parent_indices), hash-
    joined against the broadcast vocab (pyarrow Acero join), and
    collapsed back per doc with one in-batch groupby. No reference
    equivalent (SURVEY.md §2.5 — training-data addition).
    """
    import math

    import ray
    from ray.data.aggregate import Count, Sum

    tf = term_frequencies(model_ds if model_ds is not None else ds,
                          text_col=text_col).materialize()
    stats = tf.aggregate(Sum("n"), Count())
    n_total = float(stats["sum(n)"])
    v_size = float(stats["count()"])
    denom = n_total + alpha * (v_size + 1.0)
    vocab = tf if vocab_top is None else (
        tf.sort(["n", "term"], descending=[True, False]).limit(vocab_top))
    blocks = [b for b in ray.get(vocab.to_arrow_refs()) if b.num_rows]
    vt = (pa.concat_tables(blocks) if blocks else
          pa.table({"term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64())}))
    logp = pa.array([math.log((float(n) + alpha) / denom)
                     for n in vt.column("n").to_pylist()], pa.float64())
    lookup_ref = ray.put(pa.table({"term": pc.cast(vt.column("term"),
                                                   pa.large_string()),
                                   "logp": logp}))
    oov_logp = math.log(alpha / denom)

    def score(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        toks = batch.column(text_col)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lists = pc.utf8_split_whitespace(toks)
        flat = pc.cast(pc.list_flatten(lists), pa.large_string())
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, pa.scalar("", pa.large_string()))
        pairs = pa.table({"row": parent.filter(keep),
                          "term": flat.filter(keep)})
        joined = pairs.join(lookup, keys="term", join_type="left outer")
        filled = pc.fill_null(joined.column("logp"), oov_logp)
        joined = joined.set_column(
            joined.schema.get_field_index("logp"), "logp", filled)
        agg = joined.group_by("row").aggregate(
            [("logp", "sum"), ("logp", "count")])
        rows = pc.cast(agg.column("row"), pa.int64()).to_numpy()
        sums = agg.column("logp_sum").to_numpy(zero_copy_only=False)
        cnts = agg.column("logp_count").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(rows)),
            "n_tokens": pa.array(cnts.astype("int64")),
            "avg_nll": pa.array(-sums / cnts, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def pmi_collocations(ds, *, text_col: str = "text", min_count: int = 2,
                     top_n: int | None = None, num_partitions: int = 8):
    """Pointwise-mutual-information collocation mining over word
    bigrams -> (gram, cnt, pmi): the classic phrase-discovery signal
    (Mikolov et al. 2013 word2phrase uses the same count ratio).

    pmi(x,y) = ln( p(x,y) / (p(x) p(y)) ) with p(x,y) = c_xy / N2 and
    p(x) = c_x / N1, evaluated as
    ``ln((c_xy * N1 * N1) / (c_x * c_y * N2))`` in IEEE double with a
    fixed association order, so the score is bit-identical to a DuckDB
    ``ln`` oracle writing the same expression.

    Scale shape: two exact count passes (``term_frequencies`` +
    ``ngram_frequencies``: per-batch combiners, one distinct-key groupby
    each); both post-aggregate tables are vocabulary-sized and are
    materialized once. The bigram table then picks up c_x / c_y via two
    native hash joins on the split words; ``min_count`` prunes rare
    bigrams BEFORE the joins (Zipf tail never rides them). N1/N2 are
    driver-side sums of the post-aggregate tables.
    """
    import math

    big_all = ngram_frequencies(ds, n=2, text_col=text_col).materialize()
    uni = term_frequencies(ds, text_col=text_col).materialize()
    n1 = uni.sum("n") or 0
    n2 = big_all.sum("cnt") or 0
    # size the join shuffle to the vocabulary: sparse key sets leave
    # hash partitions empty, which Acero's join rejects (schemaless
    # concat); vocab-sized sides need few partitions anyway
    n_terms = uni.count()
    num_partitions = max(1, min(num_partitions, n_terms // 50_000 + 1))

    def split(batch: pa.Table) -> pa.Table:
        parts = pc.utf8_split_whitespace(batch.column("gram"))
        return pa.table({
            "gram": batch.column("gram"),
            "cnt": batch.column("cnt"),
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
        })

    big = big_all.filter(
        expr=f"cnt >= {min_count}") if min_count > 1 else big_all
    # coalesce_small also folds away empty (schemaless) blocks the
    # aggregate can emit on sparse partitions — Acero joins reject them
    big = coalesce_small(big.map_batches(split, batch_format="pyarrow"))

    def as_side(col: str):
        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({col: batch.column("term"),
                             f"n_{col}": batch.column("n")})
        return rename

    j1 = big.join(
        coalesce_small(uni.map_batches(as_side("w1"),
                                       batch_format="pyarrow")),
        join_type="inner", num_partitions=num_partitions, on=("w1",))
    j2 = j1.join(
        coalesce_small(uni.map_batches(as_side("w2"),
                                       batch_format="pyarrow")),
        join_type="inner", num_partitions=num_partitions, on=("w2",))

    def score(batch: pa.Table) -> pa.Table:
        cnts = batch.column("cnt").to_pylist()
        cxs = batch.column("n_w1").to_pylist()
        cys = batch.column("n_w2").to_pylist()
        pmi = [math.log((float(c) * n1 * n1) / ((float(cx) * cy) * n2))
               for c, cx, cy in zip(cnts, cxs, cys)]
        return pa.table({
            "gram": batch.column("gram"),
            "cnt": pc.cast(batch.column("cnt"), pa.int64()),
            "pmi": pa.array(pmi, pa.float64()),
        })

    out = j2.map_batches(score, batch_format="pyarrow")
    if top_n is not None:
        out = out.sort(["pmi", "gram"], descending=[True, False]) \
            .limit(top_n)
    return out


_CDC_B = np.uint64(0x100000001B3)          # odd -> invertible mod 2^64
_CDC_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _cdc_boundaries(data: bytes, *, window: int, mask: int,
                    min_size: int, max_size: int) -> list[int]:
    """Content-defined cut points (end offsets) for one document.

    Fully vectorized Karp-Rabin: with prefix sums
    S_i = sum_j c_j * B^-j (uint64 wraparound), the hash of window
    [i-w, i) is (S_i - S_{i-w}) * B^i — three numpy passes, no Python
    byte loop. A position is a candidate cut when the low ``mask``
    bits are all set (expected gap = mask+1 bytes); min/max sizes are
    then enforced with a walk over the sparse candidate list only.
    """
    n = len(data)
    if n == 0:
        return []
    if n <= min_size:
        return [n]
    c = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    binv_pow = np.multiply.accumulate(np.full(n, _CDC_BINV, np.uint64))
    b_pow = np.multiply.accumulate(np.full(n, _CDC_B, np.uint64))
    s = np.cumsum(c * binv_pow)
    w = np.empty(n, np.uint64)
    w[:window] = np.uint64(0)
    w[window:] = (s[window:] - s[:-window]) * b_pow[window:]
    m = np.uint64(mask)
    cand = np.nonzero((w & m) == m)[0] + 1   # cut AFTER position i
    cuts, cur, ci = [], 0, 0
    while cur < n:
        lo, hi = cur + min_size, min(cur + max_size, n)
        while ci < len(cand) and cand[ci] < lo:
            ci += 1
        cut = int(cand[ci]) if ci < len(cand) and cand[ci] < hi else hi
        cuts.append(cut)
        cur = cut
    return cuts


def cdc_chunks(ds, *, id_col: str = "doc_id", text_col: str = "text",
               window: int = 16, mask_bits: int = 8, min_size: int = 64,
               max_size: int = 1024):
    """Content-defined chunking (Rabin/FastCDC family) -> one row per
    chunk: (id, chunk_idx, start:int64, length:int64, chunk_md5).

    Cut points depend only on local content, so an insertion near the
    head re-chunks O(1) chunks and every later chunk keeps its hash —
    the property that makes CDC the storage/dedup-friendly splitter
    (vs fixed-size chunks, where one inserted byte shifts every
    boundary). Expected chunk ~= 2^mask_bits bytes between min/max.

    Map-only in-batch fan-out — no shuffle; pair with a
    groupby(chunk_md5) for corpus-wide chunk-level dedup (the
    passage_dedup shape).
    """
    mask = (1 << mask_bits) - 1

    def fan(batch: pa.Table) -> pa.Table:
        ids, cidx, starts, lens, hashes = [], [], [], [], []
        for rid, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            data = (t or "").encode("utf-8", "surrogatepass")
            prev = 0
            for k, cut in enumerate(_cdc_boundaries(
                    data, window=window, mask=mask,
                    min_size=min_size, max_size=max_size)):
                ids.append(rid)
                cidx.append(k)
                starts.append(prev)
                lens.append(cut - prev)
                hashes.append(md5(data[prev:cut]).hexdigest())
                prev = cut
        return pa.table({
            id_col: pa.array(ids, batch.column(id_col).type),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "chunk_md5": pa.array(hashes, pa.string()),
        })

    return ds.map_batches(fan, batch_format="pyarrow")


def ngram_overlap(ds, *, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 8):
    """Per-document n-gram overlap with the REST of the corpus ->
    (id, n_grams, n_shared, shared_frac): the fraction of a doc's
    distinct word n-grams that appear in at least one other document —
    the novelty / near-boilerplate / memorization-risk score
    (decontaminate's corpus-internal sibling).

    Scale shape: docs explode to DISTINCT (id, gram) pairs in-batch;
    one groupby(gram) count gives document frequencies; a native hash
    join ships each pair its df; a per-batch combiner + groupby(id)
    folds the per-doc fractions. Gram strings ride the shuffles here
    for SQL-oracle parity — at 100 TB swap them for 8-byte digests
    (functions/hashing.md5_64) on both explode and df sides, which
    changes nothing structurally. Docs with < n tokens emit no rows.
    """
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, grams = [], []
        join = " ".join
        for rid, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            seen = {join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}
            ids_out.extend([rid] * len(seen))
            grams.extend(seen)
        return pa.table({
            id_col: pa.array(ids_out, batch.column(id_col).type),
            "gram": pa.array(grams, pa.large_string()),
        })

    # ex feeds BOTH the df build and the join probe: materialize so the
    # per-doc explode (the expensive pass) and the upstream read run
    # once, not once per consumer — same pattern as pmi_collocations /
    # unigram_logprob in this file
    ex = coalesce_small(
        ds.map_batches(explode, batch_format="pyarrow")).materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["gram"]).group_by("gram").aggregate(
            [("gram", "count")])
        return pa.table({
            "gram": g.column("gram"),
            "pdf": pc.cast(g.column("gram_count"), pa.int64()),
        })

    df_tbl = coalesce_small(
        ex.map_batches(df_partial, batch_format="pyarrow")) \
        .groupby("gram").aggregate(Sum("pdf"))

    def df_rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            # the shuffle can narrow large_string -> string; re-widen so
            # the join key types agree with the exploded side
            "gram": pc.cast(batch.column("gram"), pa.large_string()),
            "df": pc.cast(batch.column("sum(pdf)"), pa.int64()),
        })

    joined = ex.join(
        coalesce_small(df_tbl.map_batches(df_rename,
                                          batch_format="pyarrow")),
        join_type="inner", num_partitions=num_partitions, on=("gram",))

    def fold_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: batch.column(id_col),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "sh": pc.cast(pc.greater_equal(batch.column("df"),
                                           pa.scalar(2, pa.int64())),
                          pa.int64()),
        })
        g = t.group_by(id_col).aggregate([("one", "sum"), ("sh", "sum")])
        return pa.table({
            id_col: g.column(id_col),
            "pn": pc.cast(g.column("one_sum"), pa.int64()),
            "psh": pc.cast(g.column("sh_sum"), pa.int64()),
        })

    agg = coalesce_small(
        joined.map_batches(fold_partial, batch_format="pyarrow")) \
        .groupby(id_col).aggregate(Sum("pn"), Sum("psh"))

    def finish(batch: pa.Table) -> pa.Table:
        ng = pc.cast(batch.column("sum(pn)"), pa.int64())
        sh = pc.cast(batch.column("sum(psh)"), pa.int64())
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": ng,
            "n_shared": sh,
            "shared_frac": pc.divide(pc.cast(sh, pa.float64()),
                                     pc.cast(ng, pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def source_vocab_overlap(ds, *, group_col: str = "source",
                         text_col: str = "text",
                         num_partitions: int = 8):
    """Pairwise vocabulary Jaccard between groups (sources, crawls,
    snapshots) -> (src_a, src_b, n_common:int64, jaccard:float64) for
    every unordered group pair sharing >= 1 term — the corpus-drift /
    domain-similarity matrix.

    Scale shape: the corpus collapses to DISTINCT (group, term) pairs
    (per-batch set combiner -> one groupby de-dupe); intersections come
    from a native self-join on term (fan-out per term is #groups²
    worst-case — bounded by the GROUP count, not the corpus); group
    vocabulary sizes are a driver-sized broadcast (one int per group).
    jaccard = |A∩B| / (|A| + |B| - |A∩B|), exact ints -> one division,
    bit-exact vs SQL.
    """
    import ray

    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        seen = set()
        for g, t in zip(batch.column(group_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for w in set((t or "").split()):
                seen.add((g, w))
        gs, ws = zip(*seen) if seen else ((), ())
        return pa.table({
            "grp": pa.array(list(gs), pa.string()),
            "term": pa.array(list(ws), pa.large_string()),
        })

    def drop_count(batch: pa.Table) -> pa.Table:
        return batch.select(["grp", "term"])

    # distinct via groupby().count() (vectorized sort-based aggregate),
    # not per-group map_groups slices — the key set is vocab x groups
    # cardinality and the per-group path pays a Python call per pair
    distinct = coalesce_small(
        ds.map_batches(pairs, batch_format="pyarrow")) \
        .groupby(["grp", "term"]).count() \
        .map_batches(drop_count, batch_format="pyarrow") \
        .materialize()

    # per-group vocab sizes: tiny (one row per group) -> broadcast
    sizes = {}
    def size_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["grp"]).group_by("grp").aggregate(
            [("grp", "count")])
        return pa.table({
            "grp": g.column("grp"),
            "pn": pc.cast(g.column("grp_count"), pa.int64()),
        })
    for r in coalesce_small(distinct.map_batches(
            size_partial, batch_format="pyarrow")) \
            .groupby("grp").aggregate(Sum("pn")).take_all():
        sizes[r["grp"]] = r["sum(pn)"]
    size_ref = ray.put(sizes)

    side_b = distinct.map_batches(
        lambda b: pa.table({"grp_b": b.column("grp"),
                            "term": b.column("term")}),
        batch_format="pyarrow")
    joined = distinct.join(side_b, join_type="inner",
                           num_partitions=num_partitions, on=("term",))

    def inter_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less(batch.column("grp"),
                                 batch.column("grp_b")))
        g = t.select(["grp", "grp_b"]).group_by(["grp", "grp_b"]) \
            .aggregate([("grp", "count")])
        return pa.table({
            "src_a": g.column("grp"),
            "src_b": g.column("grp_b"),
            "pn": pc.cast(g.column("grp_count"), pa.int64()),
        })

    agg = coalesce_small(
        joined.map_batches(inter_partial, batch_format="pyarrow")) \
        .groupby(["src_a", "src_b"]).aggregate(Sum("pn"))

    def finish(batch: pa.Table) -> pa.Table:
        sz = ray.get(size_ref)
        a = batch.column("src_a").to_pylist()
        b = batch.column("src_b").to_pylist()
        inter = pc.cast(batch.column("sum(pn)"), pa.int64()).to_pylist()
        jac = [i / (sz[x] + sz[y] - i)
               for x, y, i in zip(a, b, inter)]
        return pa.table({
            "src_a": pa.array(a, pa.string()),
            "src_b": pa.array(b, pa.string()),
            "n_common": pa.array(inter, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def doc_ttr(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document lexical-diversity stats -> (id, n_tokens,
    n_distinct, ttr:float64): type-token ratio, the cheap
    quality/degeneracy signal (near-0 TTR = repetition loops).

    Map-only and fully Arrow-vectorized: utf8_split_whitespace ->
    list_parent_indices ties tokens to rows, one in-batch hash groupby
    per (row, term) gives distincts — no Python per row, no shuffle at
    all. Empty docs emit (0, 0, 0.0).
    """
    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("")), r"\s+")
        # split on regex can give empty strings at the edges; count
        # non-empty tokens only (mirrors DuckDB regexp_extract_all \S+)
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        parent = pc.list_parent_indices(flat)
        words = pc.list_flatten(flat)
        keep = pc.not_equal(words, pa.scalar(""))
        parent = parent.filter(keep)
        words = words.filter(keep)
        pairs = pa.table({"row": parent, "w": words})
        per_row = pairs.group_by(["row", "w"]).aggregate([([], "count_all")])
        # n_tokens per row and n_distinct per row
        tok_counts = pairs.group_by("row").aggregate([([], "count_all")])
        dis_counts = per_row.group_by("row").aggregate([([], "count_all")])
        n = batch.num_rows
        ntok = np.zeros(n, np.int64)
        ntok[tok_counts.column("row").to_numpy(zero_copy_only=False)] = \
            tok_counts.column("count_all").to_numpy(zero_copy_only=False)
        ndis = np.zeros(n, np.int64)
        ndis[dis_counts.column("row").to_numpy(zero_copy_only=False)] = \
            dis_counts.column("count_all").to_numpy(zero_copy_only=False)
        ttr = np.where(ntok > 0, ndis / np.maximum(ntok, 1), 0.0)
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(ntok, pa.int64()),
            "n_distinct": pa.array(ndis, pa.int64()),
            "ttr": pa.array(ttr, pa.float64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def span_corruption(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    mask_rate: float = 0.15, mean_span: int = 3):
    """T5-style span-corruption pretraining prep -> (id, inputs,
    targets, n_masked): contiguous token spans are replaced by
    sentinel tokens ``<extra_id_K>`` in the inputs and emitted (with
    the same sentinels) as the targets.

    Deterministic WITHOUT RNG state: span starts/lengths derive from
    md5(doc_id, position) — the same doc always corrupts identically
    on every run, on any partitioning, after any retry (the property
    curation reruns need; seeds-in-actor-state would break it).
    Map-only, no shuffle. ~``mask_rate`` of tokens masked in spans of
    ~``mean_span`` tokens.
    """
    from ..functions.hashing import md5_hex

    def corrupt(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_in, out_tg, out_n = [], [], []
        for i, t in zip(ids, texts):
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                out_in.append("")
                out_tg.append("")
                out_n.append(0)
                continue
            masked = np.zeros(n, bool)
            budget = int(np.floor(mask_rate * n))
            pos = 0
            k = 0
            used = 0
            while used < budget and pos < n:
                h = int(md5_hex(f"{i}:{pos}")[:8], 16)
                # geometric-ish gap then a span of 1..2*mean_span-1
                gap = h % (2 * int(mean_span / mask_rate) + 1)
                start = pos + gap
                if start >= n:
                    break
                ln = 1 + (h >> 8) % (2 * mean_span - 1)
                ln = min(ln, budget - used, n - start)
                masked[start:start + ln] = True
                used += ln
                pos = start + ln + 1
                k += 1
            inputs, targets = [], []
            sid = 0
            j = 0
            while j < n:
                if masked[j]:
                    sent = f"<extra_id_{sid}>"
                    inputs.append(sent)
                    targets.append(sent)
                    while j < n and masked[j]:
                        targets.append(toks[j])
                        j += 1
                    sid += 1
                else:
                    inputs.append(toks[j])
                    j += 1
            out_in.append(" ".join(inputs))
            out_tg.append(" ".join(targets))
            out_n.append(int(masked.sum()))
        return pa.table({
            id_col: batch.column(id_col),
            "inputs": pa.array(out_in, pa.string()),
            "targets": pa.array(out_tg, pa.string()),
            "n_masked": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(corrupt, batch_format="pyarrow")


def contrastive_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                      chunk_tokens: int = 32, neg_pool: int = 256):
    """Contrastive-training pair prep -> (anchor_id, chunk_idx,
    anchor, positive, negative): anchor/positive are ADJACENT chunks
    of the same document (the standard in-doc positive), negative is
    a deterministic draw from a broadcast cross-corpus pool.

    Positives need no shuffle at all (adjacency lives inside the row);
    negatives come from a small pool sampled by lowest md5(doc_id)
    (any corpus-wide deterministic sample works) broadcast ONCE via
    ray.put — the classic big-corpus pattern: never shuffle the corpus
    to pair rows with random other rows. Negative choice is
    md5(doc_id, chunk_idx)-keyed, skipping self-document collisions.
    """
    import ray

    from ..functions.hashing import md5_hex

    def pool_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        scored = sorted((md5_hex(str(i)), i, (t or ""))
                        for i, t in zip(ids, texts))[:neg_pool]
        return pa.table({
            "h": pa.array([s[0] for s in scored], pa.string()),
            "pid": pa.array([s[1] for s in scored], pa.int64()),
            "ptx": pa.array([s[2] for s in scored], pa.string()),
        })

    parts = ds.map_batches(pool_partial, batch_format="pyarrow").take_all()
    pool = sorted(((r["h"], r["pid"], r["ptx"]) for r in parts))[:neg_pool]
    pool_ids = [p[1] for p in pool]
    pool_chunks = []
    for _, pid, ptx in pool:
        toks = ptx.split()
        pool_chunks.append((pid, " ".join(toks[:chunk_tokens]) or ptx))
    pref = ray.put(pool_chunks)

    def pairs(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        out_id, out_ci, out_a, out_p, out_n = [], [], [], [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            chunks = [" ".join(toks[j:j + chunk_tokens])
                      for j in range(0, len(toks), chunk_tokens)]
            for ci in range(len(chunks) - 1):
                h = int(md5_hex(f"{i}:{ci}")[:8], 16)
                nid, ntx = pl[h % len(pl)]
                if nid == i:                      # self-collision: step
                    nid, ntx = pl[(h + 1) % len(pl)]
                    if nid == i:
                        continue
                out_id.append(i)
                out_ci.append(ci)
                out_a.append(chunks[ci])
                out_p.append(chunks[ci + 1])
                out_n.append(ntx)
        return pa.table({
            "anchor_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_ci, pa.int64()),
            "anchor": pa.array(out_a, pa.string()),
            "positive": pa.array(out_p, pa.string()),
            "negative": pa.array(out_n, pa.string()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


def length_buckets(ds, *, text_col: str = "text"):
    """Padding-efficiency report for length-bucketed batching ->
    (bucket, cap, n_docs, sum_tokens, padded_tokens, waste_ratio):
    docs are assigned to power-of-two length buckets (bucket b holds
    docs with 2^b <= n_tokens < 2^(b+1); cap = 2^(b+1)-1) and each
    bucket reports how many pad tokens naive to-cap padding would
    burn — the dynamic-batching planning table (tight buckets = less
    waste = more real tokens per step).

    Per-batch (bucket, n, tokens) combiner -> one tiny groupby; all
    integers exact, the ratio is one exact division at the end.
    """
    from ray.data.aggregate import Sum

    from ..functions.text import token_count_batch

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.cast(token_count_batch(
            pc.coalesce(batch.column(text_col), pa.scalar(""))),
            pa.int64()).to_numpy(zero_copy_only=False)
        keep = toks > 0
        toks = toks[keep]
        if not len(toks):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64()),
                             "pt": pa.array([], pa.int64())})
        buckets = np.floor(np.log2(toks)).astype(np.int64)
        t = pa.table({"bucket": pa.array(buckets, pa.int64()),
                      "one": pa.array(np.ones(len(toks), np.int64)),
                      "tok": pa.array(toks, pa.int64())})
        agg = t.group_by("bucket").aggregate([("one", "sum"),
                                              ("tok", "sum")])
        return pa.table({
            "bucket": agg.column("bucket"),
            "pn": pc.cast(agg.column("one_sum"), pa.int64()),
            "pt": pc.cast(agg.column("tok_sum"), pa.int64()),
        })

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("bucket").aggregate(Sum("pn"), Sum("pt"))

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        n = pc.cast(batch.column("sum(pn)"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pc.cast(batch.column("sum(pt)"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cap = (1 << (b + 1)) - 1
        padded = n * cap
        return pa.table({
            "bucket": pa.array(b, pa.int64()),
            "cap": pa.array(cap, pa.int64()),
            "n_docs": pa.array(n, pa.int64()),
            "sum_tokens": pa.array(t, pa.int64()),
            "padded_tokens": pa.array(padded, pa.int64()),
            "waste_ratio": pa.array((padded - t) / padded, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def vocab_coverage(ds, *, text_col: str = "text",
                   ks: tuple = (10, 100, 1000, 10000)):
    """Vocabulary coverage curve -> (k, covered_tokens, total_tokens,
    value_coverage): what fraction of all corpus token OCCURRENCES the
    top-k most frequent terms cover — the tokenizer/vocab-size
    planning table (the knee of this curve is where a bigger vocab
    stops paying).

    Rides the term_frequencies reduction (combiner -> groupby(term)).
    Coverage at k is a sum over the k LARGEST counts, so terms are
    irrelevant past the reduction (tied counts at the k boundary
    contribute the same sum whichever tied term is "in"): a per-block
    top-max(ks) COUNT prune (np.partition, counts only — no strings)
    plus a per-block total row is all that leaves each vocab block.
    The driver folds <= blocks x max(ks) pruned counts — bounded by
    layout, never by vocabulary size (the previous shape repartition(1)'d
    the full distinct vocab into one task, ~10^9 rows at 100 TB).
    Exact integers, one final division.
    """
    from ray.data.aggregate import Sum

    import ray.data

    partial = ds.map_batches(_partial_terms,
                             fn_kwargs={"text_col": text_col},
                             batch_format="pyarrow")
    agg = coalesce_small(partial).groupby("term") \
        .aggregate(Sum("partial_n"))
    kmax = max(ks)

    def prune(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(partial_n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        total = int(n.sum())
        if len(n) > kmax:
            n = -np.partition(-n, kmax - 1)[:kmax]
        # top counts (kind=0) + one block-total row (kind=1)
        return pa.table({
            "cnt": pa.array(np.concatenate([n, [total]]), pa.int64()),
            "kind": pa.array([0] * len(n) + [1], pa.int8()),
        })

    top_counts, total = [], 0
    for b in agg.map_batches(prune, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        total += int(cnt[kind == 1].sum())
        top_counts.append(cnt[kind == 0])
    merged = np.sort(np.concatenate(top_counts))[::-1] if top_counts \
        else np.array([], np.int64)
    cum = np.cumsum(merged[:kmax])
    out_k = list(ks)
    out_c = [int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
             for k in ks]
    return ray.data.from_arrow(pa.table({
        "k": pa.array(out_k, pa.int64()),
        "covered_tokens": pa.array(out_c, pa.int64()),
        "total_tokens": pa.array([total] * len(ks), pa.int64()),
        "value_coverage": pa.array(
            [c / total if total else 0.0 for c in out_c], pa.float64()),
    }))


def feature_hash_audit(ds, *, text_col: str = "text",
                       dims: tuple = (256, 1024, 4096)):
    """Hashing-trick collision audit -> (dim, n_terms, buckets_used,
    value_collision_rate): for each candidate feature dimension, how
    many distinct terms collide when hashed into ``dim`` buckets —
    run BEFORE committing a corpus to hashed features.

    Hash = md5 low-64 (the KMV sketch's DuckDB-parity hash) mod dim.
    Distinct terms reduce via the usual combiner + groupby; the audit
    itself is a SECOND bounded reduction, never a full-vocab task:
    each vocab block emits its distinct (dim, bucket) pairs (<=
    sum(dims)+1 rows per block, independent of block size) plus a
    sentinel row carrying the block's term count; one tiny
    groupby(dim, bucket) dedups the pairs globally, and the driver
    folds <= sum(dims)+1 result rows. collision_rate =
    1 - buckets_used / n_terms (0 = injective on this corpus).
    """
    from ray.data.aggregate import Sum

    import ray.data

    from ..pipelines.sketches import kmv_hash64

    partial = ds.map_batches(_partial_terms,
                             fn_kwargs={"text_col": text_col},
                             batch_format="pyarrow")
    vocab = coalesce_small(partial).groupby("term") \
        .aggregate(Sum("partial_n"))

    def prune(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        hs = np.array([kmv_hash64(t) for t in terms], np.uint64)
        out_d, out_b, out_n = [], [], []
        for d in dims:
            bs = np.unique(hs % np.uint64(d)) if len(hs) else \
                np.array([], np.uint64)
            out_d.extend([int(d)] * len(bs))
            out_b.extend(int(x) for x in bs)
            out_n.extend([0] * len(bs))
        # sentinel (dim=-1, bucket=0): block term count, sums globally
        out_d.append(-1)
        out_b.append(0)
        out_n.append(len(terms))
        return pa.table({
            "dim": pa.array(out_d, pa.int64()),
            "bucket": pa.array(out_b, pa.int64()),
            "pn": pa.array(out_n, pa.int64()),
        })

    used = coalesce_small(vocab.map_batches(prune, batch_format="pyarrow")) \
        .groupby(["dim", "bucket"]).aggregate(Sum("pn")).take_all()
    n = sum(r["sum(pn)"] for r in used if r["dim"] == -1)
    by_dim = {int(d): 0 for d in dims}
    for r in used:
        if r["dim"] != -1:
            by_dim[int(r["dim"])] += 1
    out_d = [int(d) for d in dims]
    out_u = [by_dim[d] for d in out_d]
    return ray.data.from_arrow(pa.table({
        "dim": pa.array(out_d, pa.int64()),
        "n_terms": pa.array([n] * len(dims), pa.int64()),
        "buckets_used": pa.array(out_u, pa.int64()),
        "value_collision_rate": pa.array(
            [1.0 - u / n if n else 0.0 for u in out_u], pa.float64()),
    }))


def corpus_card(ds, *, text_col: str = "text"):
    """One-row corpus data card -> (n_docs, n_tokens, n_chars,
    n_langs, n_sources, distinct_texts, value_dup_rate): the summary
    block of a dataset card, computed in three bounded passes — a
    map-only counters pass (one partial row per block), a tiny
    distinct pass over (lang, source), and the usual hash-distinct
    pass for the exact duplicate rate. All integers; the dup rate is
    one exact division.
    """
    from hashlib import md5 as _md5

    from ray.data.aggregate import Sum

    from ..functions.text import token_count_batch

    def counters(batch: pa.Table) -> pa.Table:
        toks = pc.sum(pc.cast(token_count_batch(
            pc.coalesce(batch.column(text_col), pa.scalar(""))),
            pa.int64())).as_py() or 0
        chars = pc.sum(pc.utf8_length(
            pc.coalesce(batch.column(text_col),
                        pa.scalar("")))).as_py() or 0
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "t": pa.array([int(toks)], pa.int64()),
            "c": pa.array([int(chars)], pa.int64()),
        })

    totals = coalesce_small(
        ds.map_batches(counters, batch_format="pyarrow")) \
        .sum(["n", "t", "c"])

    def cats(batch: pa.Table) -> pa.Table:
        return batch.select(["lang", "source"]) \
            .group_by(["lang", "source"]).aggregate([])

    cat_rows = coalesce_small(
        ds.map_batches(cats, batch_format="pyarrow")) \
        .groupby(["lang", "source"]).count().take_all()
    n_langs = len({r["lang"] for r in cat_rows})
    n_sources = len({r["source"] for r in cat_rows})

    def hashes(batch: pa.Table) -> pa.Table:
        hs = [_md5((t or "").encode("utf-8", "surrogatepass"))
              .hexdigest() for t in batch.column(text_col).to_pylist()]
        return pa.table({"h": pa.array(sorted(set(hs)), pa.string())})

    distinct = coalesce_small(
        ds.map_batches(hashes, batch_format="pyarrow")) \
        .groupby("h").count().count()

    import ray.data

    n = int(totals["sum(n)"])
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_tokens": pa.array([int(totals["sum(t)"])], pa.int64()),
        "n_chars": pa.array([int(totals["sum(c)"])], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "distinct_texts": pa.array([int(distinct)], pa.int64()),
        "value_dup_rate": pa.array([1.0 - distinct / n], pa.float64()),
    }))


def vocab_growth(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 bucket_docs: int = 50):
    """Vocabulary growth curve (Heaps-law view) -> (bucket, new_terms,
    cum_vocab): how many never-seen-before terms each successive
    ``bucket_docs``-doc slice of the corpus (ordered by id)
    contributes — flattening curve = diminishing vocab returns.

    Exact and shuffle-light: per-batch distinct (term, min bucket)
    partials -> one groupby(term) min = each term's FIRST bucket ->
    a bucket histogram of first-appearances -> in-task cumsum over the
    tiny curve.
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("")), r"\s+")
        parent = pc.list_parent_indices(toks)
        words = pc.list_flatten(toks)
        keep = pc.not_equal(words, pa.scalar(""))
        parent = parent.filter(keep)
        words = words.filter(keep)
        buckets = pc.cast(pc.divide(
            pc.take(ids, parent), pa.scalar(bucket_docs, pa.int64())),
            pa.int64())
        t = pa.table({"term": words, "b": buckets})
        agg = t.group_by("term").aggregate([("b", "min")])
        return pa.table({"term": agg.column("term"),
                         "p_min": agg.column("b_min")})

    first = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("term").aggregate(Min("p_min"))

    def hist(batch: pa.Table) -> pa.Table:
        agg = pa.table({"bucket": batch.column("min(p_min)")}) \
            .group_by("bucket").aggregate([([], "count_all")])
        return pa.table({
            "bucket": agg.column("bucket"),
            "p_new": pc.cast(agg.column("count_all"), pa.int64()),
        })

    curve = coalesce_small(first.map_batches(hist, batch_format="pyarrow")) \
        .groupby("bucket").aggregate(Sum("p_new"))

    def finish(batch: pa.Table) -> pa.Table:
        g = batch.sort_by([("bucket", "ascending")])
        new = g.column("sum(p_new)").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": g.column("bucket"),
            "new_terms": pa.array(new, pa.int64()),
            "cum_vocab": pa.array(np.cumsum(new), pa.int64()),
        })

    return curve.repartition(1).map_batches(finish, batch_format="pyarrow",
                                            batch_size=None)


def distinctive_terms(ds, *, group_col: str = "lang",
                      text_col: str = "text", top_k: int = 5,
                      alpha: float = 0.01):
    """Most characteristic terms per group by log-odds ratio with an
    informative Dirichlet prior (Monroe, Colaresi & Quinn 2008 —
    "Fightin' Words") -> (group, term, n_in, n_out, value_zeta):
    the top-``top_k`` terms per group by the z-scored log-odds of
    in-group vs out-of-group usage, with the corpus itself as the
    prior (the standard fix for raw PMI's rare-term explosion).

    One (group, term) count reduction (per-batch combiner -> groupby),
    materialized once and consumed twice:
    - a tiny per-block combiner folds the per-GROUP totals (n_groups
      rows at the driver; the only driver-side state);
    - the zeta math runs per TERM-hash bucket (bucketed_map_groups —
      all rows of a term co-locate, y_all is a vectorized
      transform-sum), with an in-bucket per-group top-k prune, so no
      task ever holds more than one bucket (~vocab/num_buckets rows)
      and the final per-group selection sees only
      buckets x groups x top_k pruned rows.
    np.log/np.sqrt keep IEEE parity with the SQL formula — checked
    at atol.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..stages.util import bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("")), r"\s+")
        parent = pc.list_parent_indices(toks)
        words = pc.list_flatten(toks)
        keep = pc.not_equal(words, pa.scalar(""))
        parent = parent.filter(keep)
        words = words.filter(keep)
        groups = pc.take(batch.column(group_col), parent)
        t = pa.table({"g": groups, "term": words})
        agg = t.group_by(["g", "term"]).aggregate([([], "count_all")])
        return pa.table({
            "g": agg.column("g"),
            "term": agg.column("term"),
            "p_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["g", "term"]).aggregate(Sum("p_n")) \
        .materialize()   # consumed twice: group totals, then zeta pass

    def grp_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["g", "sum(p_n)"]).group_by("g") \
            .aggregate([("sum(p_n)", "sum")])
        return pa.table({
            "g": agg.column("g"),
            "gp_n": pc.cast(agg.column("sum(p_n)_sum"), pa.int64()),
        })

    tot_rows = coalesce_small(
        counts.map_batches(grp_partial, batch_format="pyarrow")) \
        .groupby("g").aggregate(Sum("gp_n")).take_all()
    tot_grp = {r["g"]: int(r["sum(gp_n)"]) for r in tot_rows}
    total = sum(tot_grp.values())
    a0 = alpha * total

    def select_topk(df: pd.DataFrame) -> pd.DataFrame:
        # rank by ROUNDED zeta (half-away) so the top-k boundary is
        # engine-stable; ties break by term
        df = df.assign(_r=np.floor(df["value_zeta"].to_numpy() * 1e6
                                   + 0.5) / 1e6)
        df = df.sort_values(["grp", "_r", "term"],
                            ascending=[True, False, True])
        return df.groupby("grp", sort=False).head(top_k) \
            .drop(columns="_r")

    def zeta_bucket(tbl: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "grp": tbl.column("g").to_pylist(),
            "term": tbl.column("term").to_pylist(),
            "n": tbl.column("sum(p_n)").to_pylist(),
        })
        y_i = df["n"].to_numpy(np.float64)
        y_all = df.groupby("term")["n"].transform("sum") \
            .to_numpy(np.float64)
        y_j = y_all - y_i
        ni = df["grp"].map(tot_grp).to_numpy(np.float64)
        nj = total - ni
        a_w = alpha * y_all
        li = np.log((y_i + a_w) / (ni + a0 - y_i - a_w))
        lj = np.log((y_j + a_w) / (nj + a0 - y_j - a_w))
        var = 1.0 / (y_i + a_w) + 1.0 / (y_j + a_w)
        df = pd.DataFrame({
            "grp": df["grp"],
            "term": df["term"],
            "n_in": df["n"].astype("int64"),
            "n_out": y_j.astype(np.int64),
            "value_zeta": (li - lj) / np.sqrt(var),
        })
        # in-bucket prune: the global per-group top-k is a subset of
        # the union of per-bucket top-ks (every term lives wholly in
        # one bucket, and (rounded zeta desc, term asc) totally orders)
        out = select_topk(df)
        return pa.table({
            "grp": pa.array(out["grp"].tolist()),
            "term": pa.array(out["term"].tolist(), pa.string()),
            "n_in": pa.array(out["n_in"].tolist(), pa.int64()),
            "n_out": pa.array(out["n_out"].tolist(), pa.int64()),
            "value_zeta": pa.array(out["value_zeta"].tolist(),
                                   pa.float64()),
        })

    pruned = bucketed_map_groups(counts, "term", zeta_bucket)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return select_topk(group)

    return pruned.groupby("grp").map_groups(final, batch_format="pandas")


def term_burstiness(ds, *, text_col: str = "text"):
    """Term burstiness -> (term, n_total, value_fano): the Fano factor
    (variance-to-mean, population, over per-document counts with
    zero-docs included) of each term — bursty content words score
    >> 1, evenly-sprinkled function words ~<= 1 (Church & Gale's
    burstiness, the classic stopword/content discriminator that
    needs no stopword list).

    Exact: per-batch (term, sum c, sum c^2, docs-in-batch) partials ->
    one groupby(term); fano = (D*Q - S^2) / (D*S) evaluates from
    exact integer moments with ONE float division. Zero-count docs
    contribute through D without ever materializing zeros.

    Scale shape: the reduced moment table is materialized once, the
    single marker row ('' term, global doc count D) is read with a
    tiny filtered pass, and the fano fold runs VECTORIZED per block
    with D in the closure — per-term independent, so no task ever
    holds the full vocabulary (the previous shape repartition(1)'d it).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.arange(batch.num_rows, dtype=np.int64)
        toks = pc.split_pattern_regex(
            pc.coalesce(batch.column(text_col), pa.scalar("")), r"\s+")
        parent = pc.list_parent_indices(toks)
        words = pc.list_flatten(toks)
        keep = pc.not_equal(words, pa.scalar(""))
        parent = parent.filter(keep)
        words = words.filter(keep)
        t = pa.table({"row": parent, "term": words})
        per_doc = t.group_by(["row", "term"]).aggregate([([], "count_all")])
        c = pc.cast(per_doc.column("count_all"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t2 = pa.table({
            "term": per_doc.column("term"),
            "s": pa.array(c, pa.int64()),
            "q": pa.array(c * c, pa.int64()),
        })
        agg = t2.group_by("term").aggregate([("s", "sum"), ("q", "sum")])
        out = pa.table({
            "term": agg.column("term"),
            "p_s": pc.cast(agg.column("s_sum"), pa.int64()),
            "p_q": pc.cast(agg.column("q_sum"), pa.int64()),
            "p_d": pa.array(np.zeros(agg.num_rows, np.int64), pa.int64()),
        })
        # one marker row carries the batch's doc count ('' never a token)
        marker = pa.table({
            "term": pa.array([""], pa.string()),
            "p_s": pa.array([0], pa.int64()),
            "p_q": pa.array([0], pa.int64()),
            "p_d": pa.array([batch.num_rows], pa.int64()),
        })
        return pa.concat_tables([out, marker])

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("term").aggregate(Sum("p_s"), Sum("p_q"), Sum("p_d")) \
        .materialize()   # consumed twice: marker-row read, fano fold

    def marker_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("term"), pa.scalar("")))

    marker = agg.map_batches(marker_only, batch_format="pyarrow").take_all()
    D = sum(int(r["sum(p_d)"]) for r in marker)

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("term"), pa.scalar(""))
        b = batch.filter(keep)
        s = b.column("sum(p_s)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = b.column("sum(p_q)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # exact integer moments, one float division. int64 vector math
        # holds while D*q and s^2 fit 2^63; past that (planet-scale
        # counts) fall back to Python's arbitrary-precision ints so the
        # numerator stays exact before the single division
        qmax = int(q.max()) if len(q) else 0
        smax = int(s.max()) if len(s) else 0
        if D * qmax < (1 << 62) and smax * smax < (1 << 62):
            fano = (D * q - s * s).astype(np.float64) / (D * s)
        else:
            fano = np.array(
                [(D * int(qq) - int(ss) * int(ss)) / (D * int(ss))
                 for ss, qq in zip(s, q)], np.float64)
        return pa.table({
            "term": b.column("term").cast(pa.string()),
            "n_total": pa.array(s, pa.int64()),
            "value_fano": pa.array(fano, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _partial_bigrams(batch: pa.Table, group_col: str,
                     text_col: str) -> pa.Table:
    """Vectorized per-batch bigram combiner: (g, w1, w2, partial_n)
    per distinct within-doc word bigram in the batch. Tokenization
    matches Python ``str.split()`` / SQL ``regexp_extract_all('\\S+')``:
    utf8_split_whitespace only emits empty tokens at string edges
    (interior runs collapse), so filtering empties from the flat
    token stream preserves adjacency; bigrams are then the
    (flat[i], flat[i+1]) pairs whose parent row matches."""
    toks = batch.column(text_col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    g = batch.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    lists = pc.utf8_split_whitespace(toks)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    p = parent.to_numpy(zero_copy_only=False)
    n = len(p)
    empty = pa.table({
        "g": pa.array([], g.type),
        "w1": pa.array([], pa.large_string()),
        "w2": pa.array([], pa.large_string()),
        "partial_n": pa.array([], pa.int64()),
    })
    if n < 2:
        return empty
    same = pa.array(p[1:] == p[:-1])
    w1 = flat.slice(0, n - 1).filter(same)
    if len(w1) == 0:
        return empty
    tb = pa.table({
        "g": g.take(pa.array(p[:-1][p[1:] == p[:-1]])),
        "w1": w1.cast(pa.large_string()),
        "w2": flat.slice(1, n - 1).filter(same).cast(pa.large_string()),
    })
    agg = tb.group_by(["g", "w1", "w2"]).aggregate([("w2", "count")])
    return pa.table({
        "g": agg.column("g"),
        "w1": agg.column("w1"),
        "w2": agg.column("w2"),
        "partial_n": pc.cast(agg.column("w2_count"), pa.int64()),
    })


def bigram_entropy_by_group(ds, *, group_col: str = "lang",
                            text_col: str = "text"):
    """Per-group bigram conditional entropy -> (group, n_bigrams,
    value_entropy): H(next | current) in nats over each group's
    within-doc word bigrams — the predictability/repetitiveness signal
    (templated or looping text scores near 0; diverse prose higher).

    Fully decomposed — no task ever holds a group's bigram table
    (unbounded at web scale: ~10^10 distinct bigrams per major
    language). H = -(1/N) [sum_xy n_xy ln n_xy - sum_x n_x. ln n_x.]
    splits into per-(g, w1) partial terms:

      1. vectorized per-batch (g, w1, w2) combiner -> groupby sum
         gives exact global bigram counts n_xy, one row each;
      2. per-row n ln n, combined per (g, w1) -> groupby(g, w1) sums
         yield n_x. and sum_y n_xy ln n_xy per prefix word;
      3. per-(g, w1) partial = sum_nlogn - n_x. ln n_x., combined per
         g -> groupby(g) sums give the numerator and N;
      4. H = -numerator / N.

    Every shuffle after step 1 carries per-prefix (then per-group)
    scalars, so task memory is bounded by block size at any corpus
    size. np.log throughout for SQL ln parity (fp-order differences
    vs the oracle's single-expression fold are ~1e-12 relative).
    """
    from ray.data.aggregate import Sum

    agg = coalesce_small(
        ds.map_batches(_partial_bigrams, batch_format="pyarrow",
                       fn_kwargs={"group_col": group_col,
                                  "text_col": text_col})) \
        .groupby(["g", "w1", "w2"]).aggregate(Sum("partial_n"))

    def w1_partial(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(partial_n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nf = n.astype(np.float64)
        tb = pa.table({
            "g": batch.column("g"),
            "w1": batch.column("w1"),
            "pn": pa.array(n, pa.int64()),
            "pnlogn": pa.array(nf * np.log(nf), pa.float64()),
        })
        c = tb.group_by(["g", "w1"]).aggregate(
            [("pn", "sum"), ("pnlogn", "sum")])
        return pa.table({
            "g": c.column("g"),
            "w1": c.column("w1"),
            "pn": pc.cast(c.column("pn_sum"), pa.int64()),
            "pnlogn": c.column("pnlogn_sum"),
        })

    agg2 = coalesce_small(
        agg.map_batches(w1_partial, batch_format="pyarrow")) \
        .groupby(["g", "w1"]).aggregate(Sum("pn"), Sum("pnlogn"))

    def g_partial(batch: pa.Table) -> pa.Table:
        nx = batch.column("sum(pn)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        snl = batch.column("sum(pnlogn)").to_numpy(zero_copy_only=False)
        nxf = nx.astype(np.float64)
        tb = pa.table({
            "g": batch.column("g"),
            "pN": pa.array(nx, pa.int64()),
            "pnum": pa.array(snl - nxf * np.log(nxf), pa.float64()),
        })
        c = tb.group_by("g").aggregate([("pN", "sum"), ("pnum", "sum")])
        return pa.table({
            "g": c.column("g"),
            "pN": pc.cast(c.column("pN_sum"), pa.int64()),
            "pnum": c.column("pnum_sum"),
        })

    agg3 = coalesce_small(
        agg2.map_batches(g_partial, batch_format="pyarrow")) \
        .groupby("g").aggregate(Sum("pN"), Sum("pnum"))

    def finish(batch: pa.Table) -> pa.Table:
        N = batch.column("sum(pN)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        num = batch.column("sum(pnum)").to_numpy(zero_copy_only=False)
        h = np.where(N > 0, -(num / np.maximum(N, 1)), 0.0)
        return pa.table({
            "grp": batch.column("g"),
            "n_bigrams": pa.array(N, pa.int64()),
            "value_entropy": pa.array(h + 0.0, pa.float64()),
        })

    return agg3.map_batches(finish, batch_format="pyarrow")


def _partial_group_terms(batch: pa.Table, group_col: str,
                         text_col: str) -> pa.Table:
    """Vectorized per-batch (g, term, partial_n) combiner — the
    group-keyed sibling of ``_partial_terms``: utf8_split_whitespace
    -> list_flatten + list_parent_indices (maps each token back to
    its row's group value) -> one hash groupby per batch."""
    toks = batch.column(text_col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    g = batch.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    lists = pc.utf8_split_whitespace(toks)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    tb = pa.table({
        "g": g.take(parent),
        "term": flat.cast(pa.large_string()),
    })
    agg = tb.group_by(["g", "term"]).aggregate([("term", "count")])
    return pa.table({
        "g": agg.column("g"),
        "term": agg.column("term"),
        "partial_n": pc.cast(agg.column("term_count"), pa.int64()),
    })


def source_cross_entropy(ds, *, group_col: str = "source",
                         text_col: str = "text",
                         num_buckets: int = 64):
    """Pairwise unigram cross-entropy matrix -> (src_a, src_b,
    value_ce): H(P_a, Q_b) = -sum_w p_a(w) ln q_b(w) with add-1
    smoothing over the JOINT vocab — "how surprising is corpus A
    under corpus B's unigram LM", the distributional counterpart of
    source_vocab_overlap's set view (low off-diagonal = transferable).

    Fully decomposed — no task ever holds the joint vocabulary (~10^9
    distinct tokens at 100 TB). The fold uses the algebraic split

      H(P_a, Q_b) = ln(T_b + V) - (1/T_a) * S(a, b),
      S(a, b)     = sum_w n_a(w) * ln(n_b(w) + 1),

    where only terms present in BOTH corpora contribute to S
    (n_b = 0 gives ln 1 = 0), T_g are per-group token totals and V is
    the joint distinct-vocab size. Execution shape:

      1. vectorized per-batch (g, term) combiner -> groupby(g, term)
         sum: exact global counts, one row per (group, term);
      2. per-group totals T_g via a per-batch combiner + tiny
         groupby(g) sum (G rows to the driver);
      3. ONE bucketed exchange on term (``bucketed_map_groups``): each
         bucket task self-joins its slice of the count table on term —
         per-term work is |groups containing the term|^2, G-bounded —
         emitting per-bucket partial S(a, b) sums in the group
         column's NATIVE type (string and integer group keys both
         work);
      4. V from a distinct-count pass over the same materialized
         count table, then a groupby over the G^2-sized partial table
         and a driver-side assembly of the G x G matrix from the tiny
         S / T / V aggregates.

    Task memory is bounded by vocab x G / num_buckets (raise
    ``num_buckets`` at scale); the shuffles after step 1 carry
    G^2 + bucket-count rows. np.log for SQL ln parity.
    """
    from ray.data.aggregate import Sum

    import ray.data as rd

    from ..stages.util import bucketed_map_groups

    agg = coalesce_small(
        ds.map_batches(_partial_group_terms, batch_format="pyarrow",
                       fn_kwargs={"group_col": group_col,
                                  "text_col": text_col})) \
        .groupby(["g", "term"]).aggregate(Sum("partial_n")) \
        .materialize()   # consumed twice: totals + the S fold

    def tot_partial(batch: pa.Table) -> pa.Table:
        tb = pa.table({
            "g": batch.column("g"),
            "pt": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })
        c = tb.group_by("g").aggregate([("pt", "sum")])
        return pa.table({
            "g": c.column("g"),
            "pt": pc.cast(c.column("pt_sum"), pa.int64()),
        })

    totals_rows = coalesce_small(
        agg.map_batches(tot_partial, batch_format="pyarrow")) \
        .groupby("g").aggregate(Sum("pt")).take_all()
    totals = {r["g"]: int(r["sum(pt)"]) for r in totals_rows}

    # V = exact joint-vocab size: a distinct-count pass over the same
    # materialized count table (vocab-bounded rows, never the corpus)
    v = agg.groupby("term").count().count()

    def fold(bucket: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "g": bucket.column("g").to_pylist(),
            "term": bucket.column("term").to_pylist(),
            "n": bucket.column("sum(partial_n)").to_pylist(),
        })
        m = df.merge(df, on="term", suffixes=("_a", "_b"))
        s = m["n_a"].to_numpy(np.float64) \
            * np.log(m["n_b"].to_numpy(np.float64) + 1.0)
        part = pd.DataFrame({
            "src_a": m["g_a"], "src_b": m["g_b"], "s": s,
        }).groupby(["src_a", "src_b"], as_index=False)["s"].sum()
        return pa.table({
            "src_a": pa.array(list(part["src_a"])),
            "src_b": pa.array(list(part["src_b"])),
            "partial_s": pa.array(list(part["s"]), pa.float64()),
        })

    reduced = bucketed_map_groups(agg, "term", fold,
                                  num_buckets=num_buckets) \
        .groupby(["src_a", "src_b"]) \
        .aggregate(Sum("partial_s")).take_all()
    s_map = {(r["src_a"], r["src_b"]): float(r["sum(partial_s)"])
             for r in reduced}

    groups = sorted(totals)
    out_a, out_b, out_ce = [], [], []
    for a in groups:
        ta = totals[a]
        for b in groups:
            out_a.append(a)
            out_b.append(b)
            out_ce.append(
                float(np.log(totals[b] + v)
                      - s_map.get((a, b), 0.0) / ta))
    return rd.from_arrow(pa.table({
        "src_a": pa.array(out_a),
        "src_b": pa.array(out_b),
        "value_ce": pa.array(out_ce, pa.float64()),
    }) if groups else pa.table({
        "src_a": pa.array([], pa.string()),
        "src_b": pa.array([], pa.string()),
        "value_ce": pa.array([], pa.float64()),
    }))
