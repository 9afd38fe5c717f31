"""Distributed k-means (Lloyd's) over an embedding column.

The canonical iterative-ML shape on Ray Data: each round broadcasts the
k×d centroid matrix (ray.put once), every batch assigns its vectors to
the nearest centroid with one matmul and emits PARTIAL per-centroid
sums; a tiny groupby reduces k×d scalars; the driver only ever touches
O(k·d) floats per round. Vectors never leave their blocks.

Determinism: centroids are initialized from the k smallest ids and
rounded to 6 decimals after every round, so run-to-run float reduce
order cannot leak into assignments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_small


def _mat(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def kmeans(ds, *, k: int = 8, iters: int = 10, id_col: str = "vec_id",
           emb_col: str = "embedding", tol: float = 1e-6):
    """Lloyd's k-means. Returns (assignments_ds, centroids) where
    assignments_ds has (vec_id:int64, cluster:int32, dist:float64) and
    centroids is the final (k, d) numpy array.

    Partitioning: the only wide op per round is a groupby over k·d
    (cluster, dim) partial-sum rows — constant size regardless of corpus
    size. The assignment pass is embarrassingly parallel.
    """
    import ray
    from ray.data.aggregate import Sum

    # deterministic init: the k lowest-id vectors
    seed_rows = ds.sort(id_col).limit(k).take_all()
    cent = np.round(np.array([r[emb_col] for r in seed_rows],
                             dtype=np.float64), 6)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, *, _ref=ref) -> pa.Table:
            C = ray.get(_ref)
            E = _mat(batch, emb_col)
            if not E.size:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            # squared euclidean via the expansion trick: one matmul
            d2 = (E * E).sum(1)[:, None] - 2.0 * (E @ C.T) \
                + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            kk, dd = C.shape
            sums = np.zeros((kk, dd))
            np.add.at(sums, a, E)
            counts = np.bincount(a, minlength=kk)
            cl = np.repeat(np.arange(kk, dtype=np.int64), dd)
            return pa.table({
                "cluster": pa.array(cl, pa.int64()),
                "dim": pa.array(np.tile(np.arange(dd, dtype=np.int64), kk),
                                pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts.astype(np.int64), dd),
                              pa.int64()),
            })

        rows = coalesce_small(ds.map_batches(partial,
                                             batch_format="pyarrow")) \
            .groupby(["cluster", "dim"]).aggregate(Sum("s"), Sum("n")) \
            .take_all()
        new = cent.copy()
        for r in rows:
            c, d = int(r["cluster"]), int(r["dim"])
            n = int(r["sum(n)"])
            if n > 0:
                new[c, d] = r["sum(s)"] / n
        new = np.round(new, 6)
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift <= tol:
            break

    ref = ray.put(cent)

    def assign(batch: pa.Table, *, _ref=ref) -> pa.Table:
        C = ray.get(_ref)
        E = _mat(batch, emb_col)
        ids = pc.cast(batch.column(id_col), pa.int64())
        if not E.size:
            return pa.table({"vec_id": ids,
                             "cluster": pa.array([], pa.int32()),
                             "dist": pa.array([], pa.float64())})
        d2 = (E * E).sum(1)[:, None] - 2.0 * (E @ C.T) \
            + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        best = np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0))
        return pa.table({
            "vec_id": ids,
            "cluster": pa.array(a.astype(np.int32), pa.int32()),
            "dist": pa.array(np.round(best, 6), pa.float64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow"), cent
