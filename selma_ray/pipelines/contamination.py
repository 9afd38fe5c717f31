"""Benchmark decontamination: n-gram overlap against an eval set.

The standard training-data hygiene op (GPT-3 appendix C / PaLM / Llama
style): a document is contaminated when it shares at least one exact
word-``ngram`` with any document of a held-out benchmark/eval set.

Scale shape:
- the EVAL side is small by definition (benchmark suites are 10^4..10^6
  n-grams, kilobyte-to-megabyte scale) — its distinct gram digests are
  collected once and broadcast via ``ray.put``, read inside every task,
  never re-shipped per batch;
- the CORPUS side streams: one ``map_batches`` pass computes per-doc
  overlap counts against the broadcast set. No shuffle at all.
- digests are 16-byte md5 of the space-joined gram — collision-safe at
  any realistic eval-set size (the corpus side is never hashed into a
  shared table, so corpus scale does not raise collision odds).

The reference engine has no corpus-level ops (SURVEY.md §2.5); this is
one of the training-data additions layered around it.
"""

from __future__ import annotations

from hashlib import md5

import pyarrow as pa


def _gram_digests(text: str, ngram: int) -> set[bytes]:
    """Distinct md5 digests of all word-``ngram`` shingles of ``text``.

    Tokenization is whitespace-split (``\\S+`` runs) — identical to
    DuckDB ``regexp_extract_all(text, '\\S+')`` for oracle parity.
    """
    toks = (text or "").split()
    n = len(toks)
    if n < ngram:
        return set()
    join = " ".join
    return {md5(join(toks[i:i + ngram]).encode("utf-8", "surrogatepass"))
            .digest() for i in range(n - ngram + 1)}


def _distinct_grams_batch(batch: pa.Table, text_col: str,
                          ngram: int) -> pa.Table:
    """Per-batch distinct gram digests (the per-batch combiner: dedup
    before anything leaves the task)."""
    out: set[bytes] = set()
    for t in batch.column(text_col).to_pylist():
        out |= _gram_digests(t, ngram)
    return pa.table({"g": pa.array(sorted(out), pa.binary())})


def eval_gram_set(eval_ds, *, text_col: str = "text", ngram: int = 8):
    """Collect the eval set's distinct gram digests into one frozenset.

    The eval side is broadcast-sized by definition; each batch dedups
    locally so ``take_all`` moves only distinct digests. Returns a
    plain frozenset (callers ``ray.put`` it once).
    """
    parts = eval_ds.map_batches(
        _distinct_grams_batch,
        fn_kwargs={"text_col": text_col, "ngram": ngram},
        batch_format="pyarrow")
    return frozenset(r["g"] for r in parts.take_all())


def decontaminate_stats(docs_ds, eval_ds, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        eval_text_col: str | None = None, ngram: int = 8):
    """Dataset -> (id, n_overlap, contaminated) per corpus doc.

    ``n_overlap`` counts the doc's DISTINCT grams that occur anywhere
    in the eval set; ``contaminated`` is ``n_overlap > 0``.
    SQL-oracle-checkable (DuckDB list algebra over the same grams).
    """
    import ray

    ref = ray.put(eval_gram_set(eval_ds, text_col=eval_text_col or text_col,
                                ngram=ngram))

    def stats(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        ids = batch.column(id_col).to_pylist()
        n_over = [len(_gram_digests(t, ngram) & grams)
                  for t in batch.column(text_col).to_pylist()]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_overlap": pa.array(n_over, pa.int64()),
            "contaminated": pa.array([n > 0 for n in n_over], pa.bool_()),
        })

    return docs_ds.map_batches(stats, batch_format="pyarrow")


def decontaminate(docs_ds, eval_ds, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  eval_text_col: str | None = None, ngram: int = 8):
    """Dataset -> the corpus with contaminated docs dropped (single
    streaming pass; rows with zero eval-gram overlap survive with all
    their columns)."""
    import ray

    ref = ray.put(eval_gram_set(eval_ds, text_col=eval_text_col or text_col,
                                ngram=ngram))

    def filt(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        mask = [not (_gram_digests(t, ngram) & grams)
                for t in batch.column(text_col).to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return docs_ds.map_batches(filt, batch_format="pyarrow")
