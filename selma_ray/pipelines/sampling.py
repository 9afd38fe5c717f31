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
