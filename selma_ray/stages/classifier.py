"""Batched model-inference stage: a hashed bag-of-ngrams linear text
classifier (the fastText-style quality/domain classifier every
large-scale curation pipeline runs after rule filters).

`HashedLinearClassifier` is a callable CLASS for
``ds.map_batches(HashedLinearClassifier, concurrency=N, ...)``: the
weight vector is resolved ONCE per actor in ``__init__`` (loaded from a
``.npy`` path, taken from an in-memory array, or generated
deterministically from a seed for tests), and ``__call__`` scores one
Arrow batch vectorized — tokens and bigrams are hashed (crc32, stable
across processes) into a ``dim``-bucket feature space, batch features
become one scipy-free CSR-style gather, and the score is a numpy dot.

Scale shape: weights are ``dim`` float32s (1 MiB at the 2^18 default)
living once per actor, NOT re-shipped per batch; real deployments pass
``weights_path`` so every actor loads from shared storage in
``__init__``. Inference is map-only — no shuffle. No reference
equivalent (SURVEY.md §2.5 — training-data addition around the engine).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def _hash_features(text: str, dim: int, bigrams: bool) -> "np.ndarray":
    """Stable feature indices for one document: crc32 of each token and
    (optionally) each adjacent-token bigram, mod dim. Returns the raw
    occurrence list (duplicates = counts), matching fastText's mean-of-
    embeddings with a linear head when weights are per-bucket scalars."""
    toks = text.split()
    feats = [zlib.crc32(t.encode("utf-8", "surrogatepass")) % dim
             for t in toks]
    if bigrams:
        feats += [zlib.crc32((a + " " + b).encode("utf-8", "surrogatepass"))
                  % dim for a, b in zip(toks, toks[1:])]
    return np.asarray(feats, dtype=np.int64)


class HashedLinearClassifier:
    """text column -> ``out_col`` probability column (sigmoid of the
    mean hashed-feature weight), plus ``<out_col>_n_feats``."""

    def __init__(self, *, text_col: str = "text",
                 out_col: str = "quality_prob", dim: int = 1 << 18,
                 bigrams: bool = True, weights=None,
                 weights_path: str | None = None, seed: int = 0,
                 bias: float = 0.0):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim
        self.bigrams = bigrams
        self.bias = float(bias)
        if weights_path is not None:
            w = np.load(weights_path)
        elif weights is not None:
            w = np.asarray(weights)
        else:
            # deterministic stand-in model (tests/demos): every actor
            # derives the identical vector from the seed
            w = np.random.default_rng(seed).standard_normal(dim) * 0.1
        if w.shape != (dim,):
            raise ValueError(f"weights shape {w.shape} != ({dim},)")
        self.w = w.astype(np.float64)

    def score_one(self, text: str) -> tuple[float, int]:
        idx = _hash_features(text or "", self.dim, self.bigrams)
        if idx.size == 0:
            z = self.bias
        else:
            z = self.bias + float(self.w[idx].mean())
        return 1.0 / (1.0 + np.exp(-z)), int(idx.size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        probs = np.empty(len(texts), dtype=np.float64)
        n_feats = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            probs[i], n_feats[i] = self.score_one(t)
        return (batch
                .append_column(self.out_col, pa.array(probs))
                .append_column(f"{self.out_col}_n_feats",
                               pa.array(n_feats)))


def classifier_stage(ds, *, concurrency: int | tuple = 4,
                     batch_size: int = 256, **clf_kwargs):
    """Attach classifier scores as an actor-pool map_batches stage."""
    return ds.map_batches(
        HashedLinearClassifier,
        fn_constructor_kwargs=clf_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
