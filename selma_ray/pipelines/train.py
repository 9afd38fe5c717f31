"""Distributed model TRAINING over Dataset rows (the complement of
stages/classifier.py's inference stage): deterministic full-batch
logistic regression by iterated broadcast-params -> per-block partial
gradients -> driver fold, the same round structure as distributed
Lloyd's k-means (pipelines/clustering.py).

Scale notes: every round is one pass over the input, so feed a
materialized / parquet-backed dataset (lazy lineage would re-execute
upstream stages per round). At 100 TB you train on a stratified
``hash_sample`` of the corpus — the round structure is unchanged; only
the read shrinks. Gradient partials are (d+2) float64s per block, so
the driver fold is O(blocks), never O(rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _features(batch: pa.Table, feature_cols, label_col):
    x = np.column_stack([
        batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        for c in feature_cols])
    y = batch.column(label_col).to_numpy(
        zero_copy_only=False).astype(np.float64)
    return x, y


def train_logreg(ds, *, feature_cols: list[str], label_col: str,
                 iters: int = 60, lr: float = 1.0, l2: float = 0.0):
    """Full-batch gradient-descent logistic regression -> dict with
    ``weights`` (d,), ``bias``, ``mean``/``std`` (the standardization
    applied to features), ``loss`` history, and ``train_acc``.

    Deterministic up to float summation order of the per-block partial
    gradients (the same caveat as any distributed float reduce); the
    optimization itself is full-batch, so there is no RNG anywhere.
    """
    import ray

    from ray.data.aggregate import Sum

    d = len(feature_cols)

    def stats_partial(batch: pa.Table) -> pa.Table:
        x, _ = _features(batch, feature_cols, label_col)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([x.sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "sxx": pa.array([(x * x).sum(axis=0).tolist()],
                            pa.list_(pa.float64())),
        })

    n_total = 0
    sx = np.zeros(d)
    sxx = np.zeros(d)
    for r in ds.map_batches(stats_partial,
                            batch_format="pyarrow").take_all():
        n_total += r["n"]
        sx += np.asarray(r["sx"])
        sxx += np.asarray(r["sxx"])
    if n_total == 0:
        raise ValueError("empty training input")
    mean = sx / n_total
    var = np.maximum(sxx / n_total - mean * mean, 1e-12)
    std = np.sqrt(var)

    w = np.zeros(d)
    b = 0.0
    losses = []
    for _ in range(iters):
        ref = ray.put((w.copy(), b, mean, std))

        def grad_partial(batch: pa.Table, *, _ref=ref) -> pa.Table:
            ww, bb, mu, sd = ray.get(_ref)
            x, y = _features(batch, feature_cols, label_col)
            xs = (x - mu) / sd
            z = xs @ ww + bb
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            eps = 1e-12
            loss = -np.sum(y * np.log(p + eps)
                           + (1 - y) * np.log(1 - p + eps))
            return pa.table({
                "gw": pa.array([(xs.T @ err).tolist()],
                               pa.list_(pa.float64())),
                "gb": pa.array([float(err.sum())], pa.float64()),
                "pl": pa.array([float(loss)], pa.float64()),
            })

        gw = np.zeros(d)
        gb = 0.0
        pl = 0.0
        for r in ds.map_batches(grad_partial,
                                batch_format="pyarrow").take_all():
            gw += np.asarray(r["gw"])
            gb += r["gb"]
            pl += r["pl"]
        w -= lr * (gw / n_total + l2 * w)
        b -= lr * gb / n_total
        losses.append(pl / n_total)

    ref = ray.put((w.copy(), b, mean, std))

    def acc_partial(batch: pa.Table, *, _ref=ref) -> pa.Table:
        ww, bb, mu, sd = ray.get(_ref)
        x, y = _features(batch, feature_cols, label_col)
        pred = ((x - mu) / sd) @ ww + bb > 0
        return pa.table({
            "n": pa.array([len(y)], pa.int64()),
            "ok": pa.array([int((pred == (y > 0.5)).sum())], pa.int64()),
        })

    n_acc = ok = 0
    for r in ds.map_batches(acc_partial, batch_format="pyarrow").take_all():
        n_acc += r["n"]
        ok += r["ok"]
    return {
        "weights": w, "bias": b, "mean": mean, "std": std,
        "loss": losses, "train_acc": ok / max(n_acc, 1), "n": n_total,
    }
