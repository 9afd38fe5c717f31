"""Corpus-wide cleaning/statistics ops: frequent-line boilerplate
removal (CCNet-style line dedup) and term frequencies (word count).

Both are two-phase wide ops with per-batch combiners so the shuffle
carries distinct keys, not raw occurrences:

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
