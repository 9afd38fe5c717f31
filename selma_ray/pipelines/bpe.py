"""Distributed BPE vocabulary training + tokenization.

Classic Sennrich-style byte-pair-encoding learned from a corpus word
histogram. The scale-heavy step — collapsing the corpus to (word, count)
— is the existing distributed ``term_frequencies`` pass (per-block
combiner -> one groupby(term) -> bounded top-N); the merge loop itself
runs on the driver over that vocab-sized histogram with incremental
pair-count maintenance, which is how production BPE trainers work (the
corpus is never re-scanned per merge). Tokenization is a map-only
actor-pool stage with the learned merge ranks broadcast once and a
per-actor word->tokens memo, so each distinct word is encoded once per
actor regardless of corpus size.

Reference parity model: selector-automaton compile-once / apply-per-row
discipline (reference rewriter.rs:34-47 clones compiled state out of
handlers the same way the merge table is frozen before the map pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

END = "▁"  # end-of-word marker (U+2581, SentencePiece-style)


def _pair_stats(words: list[tuple[str, ...]], counts: list[int]):
    """pair -> total count, and pair -> set of word indices containing it."""
    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (w, c) in enumerate(zip(words, counts)):
        for a, b in zip(w, w[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + c
            index.setdefault((a, b), set()).add(wi)
    return stats, index


def _merge_word(w: tuple[str, ...], pair: tuple[str, str],
                glued: str) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(w):
        if i + 1 < len(w) and w[i] == pair[0] and w[i + 1] == pair[1]:
            out.append(glued)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def learn_bpe_from_histogram(hist: list[tuple[str, int]],
                             n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a (word, count) histogram.

    Deterministic: the next merge is the pair with the highest total
    count, ties broken by lexicographically smallest (left, right).
    Incremental: after a merge only the words that contained the pair
    are re-counted, so the loop is O(merges x affected-words), not
    O(merges x vocab).
    """
    words = [tuple(w) + (END,) for w, _ in hist]
    counts = [int(c) for _, c in hist]
    stats, index = _pair_stats(words, counts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, n in stats.items():
            if n <= 0:
                continue
            if best is None or n > stats[best] or \
                    (n == stats[best] and p < best):
                best = p
        if best is None:
            break
        merges.append(best)
        glued = best[0] + best[1]
        affected = list(index.get(best, ()))
        for wi in affected:
            old = words[wi]
            c = counts[wi]
            for a, b in zip(old, old[1:]):
                stats[(a, b)] -= c
                s = index.get((a, b))
                if s is not None:
                    s.discard(wi)
            new = _merge_word(old, best, glued)
            words[wi] = new
            for a, b in zip(new, new[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
                index.setdefault((a, b), set()).add(wi)
        stats.pop(best, None)
        index.pop(best, None)
    return merges


def train_bpe(ds, *, n_merges: int = 200, vocab_top: int = 20000,
              text_col: str = "text", return_hist: bool = False):
    """Learn BPE merges from a document Dataset. Returns
    (merges_ds, merges) where merges_ds has (rank:int64, left, right)
    and merges is the ordered python list of pairs (plus the histogram
    when ``return_hist`` — for vocab construction).

    Scale shape: the corpus collapses to its bounded word histogram via
    the distributed term-frequency pass (ONE shuffle, top-``vocab_top``
    by (count DESC, term ASC)); only that vocab-sized table reaches the
    driver. ``vocab_top`` is the standard trainer bound — rare tail
    words can't win a merge anyway.
    """
    import ray.data

    from .corpus import term_frequencies

    hist_rows = term_frequencies(ds, text_col=text_col,
                                 top_n=vocab_top).take_all()
    hist = [(r["term"], int(r["n"])) for r in hist_rows]
    merges = learn_bpe_from_histogram(hist, n_merges)
    tbl = pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
    })
    if return_hist:
        return ray.data.from_arrow(tbl), merges, hist
    return ray.data.from_arrow(tbl), merges


def bpe_vocab(hist: list[tuple[str, int]],
              merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic token -> id map: base symbols (sorted distinct
    characters of the histogram words, plus the end-of-word marker)
    take ids 0..B-1 in codepoint order, then each merge's glued string
    takes B+rank. If two merges glue to the same string (possible:
    (a,bc) and (ab,c)), the FIRST occurrence keeps the id — mirrored
    by min(vid) in the SQL oracle."""
    base = {END}
    for w, _ in hist:
        base.update(w)
    vocab: dict[str, int] = {}
    for i, sym in enumerate(sorted(base)):
        vocab[sym] = i
    nb = len(vocab)
    for r, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, nb + r)
    return vocab


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word."""
    w = list(word) + [END]
    while len(w) > 1:
        best_i = -1
        best_r = None
        for i in range(len(w) - 1):
            r = ranks.get((w[i], w[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r = r
                best_i = i
        if best_i < 0:
            break
        w[best_i:best_i + 2] = [w[best_i] + w[best_i + 1]]
    return w


class BpeTokenCounter:
    """Actor-pool stage: per-doc BPE token counts.

    The merge table is built once per actor in __init__ (from the
    broadcast merges list, never re-shipped per batch); a word->len
    memo makes each distinct word cost one encode per actor. Emits
    (doc_id:int64, n_words:int64, n_bpe_tokens:int64).
    """

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.id_col = id_col
        self.text_col = text_col
        self.memo: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        n = self.memo.get(w)
        if n is None:
            n = len(encode_word(w, self.ranks))
            self.memo[w] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        tok_lens = np.fromiter(
            (self._word_len(w) for w in flat.to_pylist()),
            dtype=np.int64, count=len(flat))
        n_rows = len(batch)
        n_words = np.zeros(n_rows, dtype=np.int64)
        n_bpe = np.zeros(n_rows, dtype=np.int64)
        if len(parent):
            np.add.at(n_words, parent[keep], 1)
            np.add.at(n_bpe, parent[keep], tok_lens[keep])
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
        })


def bpe_token_counts(ds, merges: list[tuple[str, str]], *,
                     id_col: str = "doc_id", text_col: str = "text",
                     concurrency: int = 4):
    """Map-only BPE token counting with the learned merges broadcast
    once (ray.put) and compiled per actor."""
    import ray

    ref = ray.put([list(m) for m in merges])
    return ds.map_batches(
        BpeTokenCounter,
        fn_constructor_kwargs=dict(merges_ref=ref, id_col=id_col,
                                   text_col=text_col),
        concurrency=concurrency, batch_format="pyarrow")


class BpeTokenizer:
    """Actor-pool stage: per-doc BPE token-ID sequences — the actual
    training-prep output (vs BpeTokenCounter's counts).

    Merge ranks + vocab are built once per actor in __init__ from the
    broadcast (merges, vocab) pair; a word->ids memo makes each
    distinct word cost one encode per actor. Tokens outside the vocab
    (characters never seen in training) map to -1 (UNK). Emits
    (doc_id:int64, n_bpe_tokens:int64, token_ids:string —
    comma-joined ids in document order)."""

    def __init__(self, merges_ref, vocab_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) \
            else vocab_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.vocab = vocab
        self.id_col = id_col
        self.text_col = text_col
        self.memo: dict[str, list[int]] = {}

    def _word_ids(self, w: str) -> list[int]:
        ids = self.memo.get(w)
        if ids is None:
            ids = [self.vocab.get(t, -1)
                   for t in encode_word(w, self.ranks)]
            self.memo[w] = ids
        return ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_n, out_ids = [], []
        for t in batch.column(self.text_col).to_pylist():
            ids: list[int] = []
            for w in (t or "").split():
                ids.extend(self._word_ids(w))
            out_n.append(len(ids))
            out_ids.append(",".join(str(i) for i in ids))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bpe_tokens": pa.array(out_n, pa.int64()),
            "token_ids": pa.array(out_ids, pa.string()),
        })


def bpe_tokenize(ds, merges: list[tuple[str, str]],
                 vocab: dict[str, int], *, id_col: str = "doc_id",
                 text_col: str = "text", concurrency: int = 4):
    """Map-only BPE tokenization to id sequences; merges + vocab
    broadcast once (ray.put) and compiled per actor."""
    import ray

    mref = ray.put([list(m) for m in merges])
    vref = ray.put(vocab)
    return ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs=dict(merges_ref=mref, vocab_ref=vref,
                                   id_col=id_col, text_col=text_col),
        concurrency=concurrency, batch_format="pyarrow")
