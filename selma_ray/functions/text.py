"""Text-analysis functions over Arrow batches.

All batch-level entry points take/return pyarrow structures and stay
vectorized (pyarrow.compute / pandas C kernels) — no per-row Python in
the counting paths. Per-row Python appears only in the language-ID
heuristic, which is set-membership over already-split tokens.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\S+")

# Tiny stopword lists for the n-gram/stopword language-ID heuristic.
# Public knowledge (most-frequent function words per language).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
           "von", "mit", "nicht", "im", "auf"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los",
           "las", "por", "con", "para"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "que",
           "dans", "pour", "sur", "avec"},
    "zh": set(),  # handled by the CJK codepoint ratio below
}


def token_count_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace-token counts; matches DuckDB
    ``len(regexp_extract_all(text, '\\S+'))``. Uses pyarrow's regex
    count kernel (C++, vectorized)."""
    return pc.count_substring_regex(texts, r"\S+")


# GPT-2-shaped pretokenizer, lookahead-free so it is valid RE2: both
# pyarrow.compute and DuckDB regex on RE2, so counts agree exactly.
# (The real GPT-2 pattern's trailing (?!\S) lookahead only changes how
# whitespace runs split — immaterial for a token-count estimate.)
BPE_ISH_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """BPE-ish (GPT-2 pretokenizer) token-count estimate, vectorized."""
    return pc.count_substring_regex(texts, BPE_ISH_RE)


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars / n_tokens / n_bpe_tokens columns (SQL-checkable)."""
    texts = batch.column(text_col)
    n_chars = pc.utf8_length(texts)
    n_tokens = token_count_batch(texts)
    n_bpe = bpe_token_count_batch(texts)
    out = batch.append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    return out.append_column("n_bpe_tokens", pc.cast(n_bpe, pa.int64()))


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    return cjk / len(text)


def language_id(text: str) -> str:
    """Stopword/codepoint heuristic language ID (rows-only check; the
    synthetic corpus carries a label column but real pipelines won't)."""
    if _cjk_ratio(text) > 0.2:
        return "zh"
    tokens = [t.lower() for t in _WS_RE.findall(text)[:200]]
    if not tokens:
        return "und"
    best, best_score = "und", 0
    tset = tokens  # keep duplicates: frequency matters
    for lang, sw in STOPWORDS.items():
        if not sw:
            continue
        score = sum(1 for t in tset if t in sw)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "und"


def language_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds = [language_id(t or "")
             for t in batch.column(text_col).to_pylist()]
    return batch.append_column("pred_lang", pa.array(preds, pa.string()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality scoring: length, punctuation ratio, stopword
    ratio, mean token length → a 0..1 score.

    Every term uses only IEEE-754 basic operations (+ - * / abs min max),
    which are correctly rounded and therefore BIT-IDENTICAL between numpy
    and any other IEEE engine evaluating the same expression in the same
    order — this is what makes the DuckDB oracle (__ray_entry__) an exact
    value match, not an allclose. (No exp/log: transcendentals are not
    reproducible across libm implementations.)
    """
    import numpy as np

    texts = batch.column(text_col)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype("float64")
    n_tokens = pc.cast(token_count_batch(texts), pa.int64()).to_numpy(
        zero_copy_only=False).astype("float64")
    n_punct = pc.count_substring_regex(texts, r"[^\w\s]").to_numpy(
        zero_copy_only=False).astype("float64")
    # null text rows surface as NaN counts (arrow->numpy); score them
    # as empty strings instead of crashing on int(NaN) below
    n_chars = np.nan_to_num(n_chars)
    n_tokens = np.nan_to_num(n_tokens)
    n_punct = np.nan_to_num(n_punct)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_tok = np.where(n_tokens > 0, n_chars / np.maximum(n_tokens, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
    sw_en = STOPWORDS["en"]
    sw_ratio = np.array([
        (sum(1 for t in _WS_RE.findall((t or "").lower())[:500] if t in sw_en)
         / max(1, min(500, int(k)))) if k else 0.0
        for t, k in zip(batch.column(text_col).to_pylist(), n_tokens)
    ])
    length_ok = np.clip(n_tokens / 20.0, 0.0, 1.0)
    tok_ok = 1.0 / (1.0 + np.abs(mean_tok - 5.5) / 5.5)
    punct_ok = np.clip(1.0 - punct_ratio * 4.0, 0.0, 1.0)
    score = 0.4 * length_ok + 0.3 * tok_ok + 0.2 * punct_ok + 0.1 * np.clip(
        sw_ratio * 5.0, 0.0, 1.0)
    out = batch.append_column("quality", pa.array(score, pa.float64()))
    out = out.append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
    return out.append_column("stopword_ratio", pa.array(sw_ratio, pa.float64()))


def quality_filter_batch(batch: pa.Table, text_col: str = "text",
                         min_words: int = 5, max_words: int = 100_000,
                         min_mean_word_len: float = 2.0,
                         max_mean_word_len: float = 12.0,
                         min_alpha_ratio: float = 0.6) -> pa.Table:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, simplified to the
    deterministic core): word-count bounds, mean-word-length bounds, and
    alphabetic-character ratio. Fully vectorized (three Arrow regex
    kernels per batch) and SQL-mirrorable bit-for-bit — every ratio is
    one IEEE division of two integer counts.

    Appends: n_words:int64, mean_word_len:float64, alpha_ratio:float64,
    keep:bool.
    """
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    nonspace = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, r"\s", "")), pa.int64())
    alpha = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, r"[^A-Za-z]", "")), pa.int64())
    fw = pc.cast(n_words, pa.float64())
    fns = pc.cast(nonspace, pa.float64())
    mean_wl = pc.divide(fns, pc.max_element_wise(fw, pa.scalar(1.0)))
    alpha_ratio = pc.divide(pc.cast(alpha, pa.float64()),
                            pc.max_element_wise(fns, pa.scalar(1.0)))
    keep = pc.and_(
        pc.and_(pc.greater_equal(n_words, pa.scalar(min_words)),
                pc.less_equal(n_words, pa.scalar(max_words))),
        pc.and_(
            pc.and_(pc.greater_equal(mean_wl,
                                     pa.scalar(min_mean_word_len)),
                    pc.less_equal(mean_wl, pa.scalar(max_mean_word_len))),
            pc.greater_equal(alpha_ratio, pa.scalar(min_alpha_ratio))))
    out = batch.append_column("n_words", n_words)
    out = out.append_column("mean_word_len", mean_wl)
    out = out.append_column("alpha_ratio", alpha_ratio)
    return out.append_column("keep", keep)


def repetition_stats_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): fraction
    of duplicate lines and duplicate tokens per document. High values
    mark boilerplate/spam for filtering.

    Ratios are IEEE divisions of integer counts, so they mirror a SQL
    computation (list_distinct / string_split) bit-for-bit. Per-row work
    is O(bytes) set-building — the same order as any tokenizing pass.
    """
    texts = batch.column(text_col).to_pylist()
    n_lines = [0] * len(texts)
    dup_line = [0.0] * len(texts)
    n_tok = [0] * len(texts)
    dup_tok = [0.0] * len(texts)
    for i, t in enumerate(texts):
        t = t or ""
        lines = t.split("\n")
        n_lines[i] = len(lines)
        dup_line[i] = 1.0 - len(set(lines)) / len(lines)
        toks = t.split()
        n_tok[i] = len(toks)
        dup_tok[i] = (1.0 - len(set(toks)) / len(toks)) if toks else 0.0
    out = batch.append_column("n_lines", pa.array(n_lines, pa.int64()))
    out = out.append_column("dup_line_frac",
                            pa.array(dup_line, pa.float64()))
    out = out.append_column("n_tokens_ws", pa.array(n_tok, pa.int64()))
    return out.append_column("dup_token_frac",
                             pa.array(dup_tok, pa.float64()))


# RE2 class == DuckDB regexp_replace class, so the oracle matches exactly.
CONTROL_CHARS_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm_text", form: str = "NFC",
                         strip_controls: bool = True) -> pa.Table:
    """Unicode normalization + control-character strip (the standard
    ingest cleanup pass). Control stripping is vectorized RE2; the NFC/
    NFKC pass is ``unicodedata.normalize``, which is codepoint-identical
    to DuckDB's ``nfc_normalize`` (verified) — so the op is SQL-checkable
    despite being a per-codepoint transform."""
    import unicodedata

    col = batch.column(text_col)
    if strip_controls:
        col = pc.replace_substring_regex(col, pattern=CONTROL_CHARS_RE,
                                         replacement="")
    out = pa.array(
        [None if t is None else unicodedata.normalize(form, t)
         for t in col.to_pylist()], pa.large_string())
    return batch.append_column(out_col, out)


def compression_ratio_batch(batch: pa.Table, text_col: str = "text",
                            out_col: str = "zlib_ratio",
                            level: int = 6) -> pa.Table:
    """zlib compression ratio per doc (compressed/raw bytes) — the
    MassiveText/RefinedWeb-family repetition proxy: highly repetitive
    machine-generated text compresses far below ~0.4. Deterministic
    (fixed zlib level) but not SQL-expressible -> rows-only oracle."""
    import zlib

    vals = []
    for t in batch.column(text_col).to_pylist():
        b = (t or "").encode("utf-8", "surrogatepass")
        vals.append(len(zlib.compress(b, level)) / max(1, len(b)))
    return batch.append_column(out_col, pa.array(vals, pa.float64()))


def char_entropy_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Per-document character-distribution Shannon entropy (nats) ->
    (id, n_chars, entropy) — the gibberish/low-diversity quality signal
    complementing the zlib compression-ratio proxy: entropy is
    model-free and exactly reproducible, where zlib depends on the
    compressor build.

    Map-only; per-doc work is one Counter pass over its characters.
    Empty docs get entropy 0.0.
    """
    from collections import Counter
    from math import log

    ids = batch.column(id_col).to_pylist()
    out_n, out_e = [], []
    for t in batch.column(text_col).to_pylist():
        t = t or ""
        n = len(t)
        if n == 0:
            out_n.append(0)
            out_e.append(0.0)
            continue
        ent = -sum((k / n) * log(k / n)
                   for k in Counter(t).values())
        out_n.append(n)
        out_e.append(ent)
    return pa.table({
        id_col: pa.array(ids, batch.column(id_col).type),
        "n_chars_calc": pa.array(out_n, pa.int64()),
        "entropy": pa.array(out_e, pa.float64()),
    })
