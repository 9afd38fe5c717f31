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


def semantic_dedup(ds, *, k: int = 8, threshold: float = 0.95,
                   iters: int = 10, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embedding space, then within each cluster greedily keep rows
    (ascending id) whose max cosine similarity to every already-kept
    row is below ``threshold``. Returns (vec_id, cluster:int32,
    keep:bool, max_sim:float64) — ``max_sim`` is the similarity to the
    closest kept earlier row (-1.0 for the first row of a cluster).

    Scale shape: the quadratic pairwise work is confined WITHIN
    clusters (pick k ~ n / desired-cluster-size so each group fits one
    task); across clusters it parallelizes embarrassingly via
    groupby(cluster).map_groups. The assignment pass broadcasts the
    k x d centroid matrix once and appends a cluster column in-stream,
    so embeddings ride exactly one shuffle (the cluster groupby).

    Determinism: centroids come from the deterministic kmeans above;
    within-cluster order is ascending id; BLAS is single-threaded
    (selma_ray._blas), so the float reduction order is fixed.
    """
    import ray

    _, centroids = kmeans(ds, k=k, iters=iters, id_col=id_col,
                          emb_col=emb_col)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _mat(batch, emb_col)
        if x.shape[0] == 0:
            return batch.append_column("cluster",
                                       pa.array([], pa.int32()))
        d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ c.T)
              + (c * c).sum(1)[None, :])
        return batch.append_column(
            "cluster", pa.array(d2.argmin(1).astype(np.int32)))

    def prune(df):
        import pandas as pd

        df = df.sort_values(id_col).reset_index(drop=True)
        x = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df[emb_col]])
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        x = x / norms[:, None]
        keep_rows: list[int] = []
        keep_flag = np.zeros(len(df), dtype=bool)
        max_sim = np.full(len(df), -1.0)
        for i in range(len(df)):
            if keep_rows:
                sims = x[keep_rows] @ x[i]
                max_sim[i] = float(sims.max())
            if max_sim[i] < threshold:
                keep_flag[i] = True
                keep_rows.append(i)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": df["cluster"].to_numpy().astype(np.int32),
            "keep": keep_flag,
            "max_sim": max_sim,
        })

    slim = ds.select_columns([id_col, emb_col]) \
        .map_batches(assign, batch_format="pyarrow")
    return slim.groupby("cluster").map_groups(prune, batch_format="pandas")


def label_centroids(ds, *, label_col: str = "label",
                    vec_col: str = "embedding"):
    """Per-label mean embedding in long form -> (label, idx:int64,
    mean_val:float64) — the group-wise VECTOR aggregate (class
    centroids / per-source embedding profiles).

    Scale shape: each block emits one partial (label, idx, psum, pn)
    row set (labels x dim rows, vectors never leave their block as
    raw rows); one groupby((label, idx)) sums the partials and a final
    map divides. Identical discipline to the kmeans update step, but
    keyed by a data column instead of the assigned cluster.
    """
    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def partial(batch: pa.Table) -> pa.Table:
        m = _mat(batch, vec_col).astype(np.float64)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        dim = m.shape[1] if len(m) else 0
        labs, idxs, sums, ns = [], [], [], []
        for lb in np.unique(labels):
            sel = m[labels == lb]
            s = sel.sum(axis=0)
            labs.extend([int(lb)] * dim)
            idxs.extend(range(dim))
            sums.extend(float(x) for x in s)
            ns.extend([len(sel)] * dim)
        return pa.table({
            "label": pa.array(labs, pa.int64()),
            "idx": pa.array(idxs, pa.int64()),
            "psum": pa.array(sums, pa.float64()),
            "pn": pa.array(ns, pa.int64()),
        })

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["label", "idx"]).aggregate(Sum("psum"), Sum("pn"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "label": pc.cast(batch.column("label"), pa.int64()),
            "idx": pc.cast(batch.column("idx"), pa.int64()),
            "mean_val": pc.divide(
                batch.column("sum(psum)"),
                pc.cast(batch.column("sum(pn)"), pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def cluster_exemplars(ds, *, k: int = 8, iters: int = 10,
                      id_col: str = "vec_id", emb_col: str = "embedding"):
    """k-means cluster EXEMPLARS: for each cluster, the real vector
    closest to its centroid -> (cluster:int64, vec_id:int64,
    dist:float64) — the 'show me what each cluster looks like'
    inspection op (medoid-style, but against the kmeans centroid).

    Runs the distributed Lloyd's pass first, then ONE more map pass
    where each block emits its per-cluster argmin candidate (distance
    to the broadcast centroids); a tiny groupby(cluster) picks the
    global winner. Vectors never leave their blocks; ties break by
    vec_id for determinism.
    """
    import ray

    from ray.data.aggregate import Min

    import pandas as pd

    _, centroids = kmeans(ds, k=k, iters=iters, id_col=id_col,
                          emb_col=emb_col)
    ref = ray.put(centroids)

    def candidates(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _mat(batch, emb_col).astype(np.float64)
        if not m.size:       # empty block: (0,0) won't broadcast vs (1,k,d)
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            })
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        rows = {"cluster": [], id_col: [], "dist": []}
        for cl in np.unique(assign):
            sel = np.nonzero(assign == cl)[0]
            dist = np.sqrt(d2[sel, cl])
            # deterministic argmin: (dist, vec_id)
            order = np.lexsort((ids[sel], dist))
            best = sel[order[0]]
            rows["cluster"].append(int(cl))
            rows[id_col].append(int(ids[best]))
            rows["dist"].append(float(np.sqrt(d2[best, cl])))
        return pa.table({
            "cluster": pa.array(rows["cluster"], pa.int64()),
            id_col: pa.array(rows[id_col], pa.int64()),
            "dist": pa.array(rows["dist"], pa.float64()),
        })

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["dist", id_col]).iloc[:1]
        return g.reset_index(drop=True)

    return ds.map_batches(candidates, batch_format="pyarrow") \
        .groupby("cluster").map_groups(pick, batch_format="pandas")


def pca_project(ds, *, k: int = 8, id_col: str = "vec_id",
                emb_col: str = "embedding"):
    """Distributed PCA: project each embedding onto the top-k principal
    components of the corpus. Returns (proj_ds, components, mean) where
    proj_ds has (vec_id:int64, proj:list<double> length k) and
    components is the (k, d) eigenvector matrix (descending eigenvalue
    order, sign-fixed so each component's largest-|w| coordinate is
    positive — deterministic across runs).

    Scale shape: one shuffle-free moment pass — every block emits a
    SINGLE partial row (n, sum_x[d], flattened X^T X [d*d]); the driver
    folds the ~(d^2+d+1)-float partials and runs the d x d eigh
    locally (d is embedding width, not corpus size). The projection
    pass broadcasts (mean, W) once via ray.put and is map-only; vectors
    never leave their blocks and nothing corpus-sized shuffles. For
    d in the thousands, swap the dense d^2 partial for a randomized
    sketch (d x (k+p) range finder) — same two-pass structure.
    """
    import ray

    def moments(batch: pa.Table) -> pa.Table:
        X = _mat(batch, emb_col)
        if not X.size:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.float64())),
                             "xtx": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "xtx": pa.array([(X.T @ X).ravel().tolist()],
                            pa.list_(pa.float64())),
        })

    parts = ds.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(p["n"]) for p in parts)
    if n == 0:
        raise ValueError("pca_project: empty dataset")
    d = len(parts[0]["sx"])
    sx = np.zeros(d)
    xtx = np.zeros((d, d))
    for p in parts:
        sx += np.asarray(p["sx"])
        xtx += np.asarray(p["xtx"]).reshape(d, d)
    mean = sx / n
    cov = xtx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order].T                      # (k, d)
    for i in range(W.shape[0]):               # deterministic sign
        j = int(np.argmax(np.abs(W[i])))
        if W[i, j] < 0:
            W[i] = -W[i]
    ref = ray.put((mean, W))

    def project(batch: pa.Table, *, _ref=ref) -> pa.Table:
        m, comp = ray.get(_ref)
        X = _mat(batch, emb_col)
        P = (X - m) @ comp.T if X.size else np.zeros((0, comp.shape[0]))
        ids = batch.column(id_col)
        return pa.table({
            id_col: ids,
            "proj": pa.array(P.tolist(), pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_format="pyarrow"), W, mean


def kcenter_select(ds, *, k: int = 16, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """Greedy k-center (Gonzalez 2-approx) coreset selection over an
    embedding column -> (order:int64, vec_id:int64, radius:float64):
    the k most mutually-distant vectors, picked farthest-point-first —
    diversity sampling for training-data curation (radius is the
    corpus covering radius when the row was chosen, so the curve
    doubles as a coverage report).

    Deterministic: seed = lowest vec_id; ties broken by lowest id.

    Round structure (k rounds, like kmeans iters): centers-so-far are
    broadcast via ray.put, every block computes its min-distance-to-
    centers and reduces to ONE (id, dist, vec) candidate row, the
    driver picks the global argmax — per round only #blocks candidate
    rows leave the cluster. Each round recomputes distances to all r
    centers from the source (stateless tasks, O(k^2 N d) total work,
    nothing materialized); at very large k, flip to the incremental
    shape — persist a running min-dist column (one materialize per
    round) and compute against only the newest center.
    """
    import ray

    def seed_pass(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             emb_col: pa.array([], batch.schema
                                               .field(emb_col).type)})
        i = pc.index(ids, pc.min(ids))
        return batch.select([id_col, emb_col]).slice(i.as_py(), 1)

    seeds = ds.map_batches(seed_pass, batch_format="pyarrow").take_all()
    if not seeds:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "order": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "radius": pa.array([], pa.float64()),
        }))
    seed = min(seeds, key=lambda r: r[id_col])
    centers = [np.asarray(seed[emb_col], np.float64)]
    chosen = [(0, int(seed[id_col]), 0.0)]

    for rnd in range(1, k):
        cref = ray.put(np.stack(centers))

        def far_pass(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)                       # (r, d)
            x = _mat(batch, emb_col)                # (n, d)
            if x.shape[0] == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.float64()),
                                 "vec": pa.array([], pa.list_(
                                     pa.float64()))})
            # squared euclidean via the expansion; min over centers
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) \
                + (c * c).sum(1)[None, :]
            mind = d2.min(1)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            # block-top candidate, ties -> lowest id
            best = np.lexsort((ids, -mind))[0]
            return pa.table({
                id_col: pa.array([int(ids[best])], pa.int64()),
                "dist": pa.array([float(mind[best])], pa.float64()),
                "vec": pa.array([x[best].tolist()],
                                pa.list_(pa.float64())),
            })

        cands = ds.map_batches(far_pass, batch_format="pyarrow").take_all()
        top = max(cands, key=lambda r: (r["dist"], -r[id_col]))
        if top["dist"] <= 0.0:
            # covering radius hit 0: every vector IS a center already —
            # further rounds would re-select duplicates of existing ids
            break
        centers.append(np.asarray(top["vec"], np.float64))
        chosen.append((rnd, int(top[id_col]),
                       float(np.sqrt(top["dist"]))))

    import ray.data
    return ray.data.from_arrow(pa.table({
        "order": pa.array([c[0] for c in chosen], pa.int64()),
        id_col: pa.array([c[1] for c in chosen], pa.int64()),
        "radius": pa.array([c[2] for c in chosen], pa.float64()),
    }))


def embedding_drift(ds, *, label_col: str = "label",
                    side_col: str = "side", emb_col: str = "embedding"):
    """Embedding-space drift per label between two labeled slices ->
    (label, label_drift_cosine float64): cosine similarity of the two
    sides' centroids — the embedding analog of psi_drift (a new
    encoder/corpus snapshot whose per-label centroids rotate away
    from the reference is drifting).

    Shape: per-batch partial (label, side, dim) sums + counts — at
    most labels x 2 x d rows per block — one tiny groupby, then a
    per-label cosine over the d-row group. Vectors never shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch.column(label_col).to_pylist())
        sides = np.asarray(batch.column(side_col).to_pylist(),
                           dtype=object)
        E = _mat(batch, emb_col)
        if not E.size:
            return pa.table({label_col: pa.array([], pa.int64()),
                             side_col: pa.array([], pa.string()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        d = E.shape[1]
        distinct_sides = sorted(set(sides.tolist()))
        if len(distinct_sides) > 2:
            # fail fast instead of silently reporting no drift: the op
            # compares exactly two labeled slices
            raise ValueError(
                f"embedding_drift expects exactly 2 side labels, got "
                f"{distinct_sides}")
        out_l, out_sd, out_dim, out_s, out_n = [], [], [], [], []
        for lab in np.unique(labels):
            for sd in distinct_sides:
                m = (labels == lab) & (sides == sd)
                if not m.any():
                    continue
                sums = E[m].sum(0)
                out_l.extend([int(lab)] * d)
                out_sd.extend([sd] * d)
                out_dim.extend(range(d))
                out_s.extend(sums.tolist())
                out_n.extend([int(m.sum())] * d)
        return pa.table({label_col: pa.array(out_l, pa.int64()),
                         side_col: pa.array(out_sd, pa.string()),
                         "dim": pa.array(out_dim, pa.int64()),
                         "s": pa.array(out_s, pa.float64()),
                         "n": pa.array(out_n, pa.int64())})

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby([label_col, side_col, "dim"]) \
        .aggregate(Sum("s"), Sum("n"))

    def finish(group: pa.Table) -> pa.Table:
        g = group.sort_by([(side_col, "ascending"), ("dim", "ascending")])
        sides = np.asarray(g.column(side_col).to_pylist(), dtype=object)
        s = g.column("sum(s)").to_numpy(zero_copy_only=False)
        n = g.column("sum(n)").to_numpy(zero_copy_only=False)
        cv = s / n
        # the two slices are whatever side labels the data carries,
        # compared in ascending label order ("a"/"b", "new"/"ref", ...)
        uniq = sorted(set(sides.tolist()))
        if len(uniq) > 2:
            # the per-batch guard can miss a 3rd label split across
            # batches (each batch seeing <=2); this group sees the
            # GLOBAL per-label side set post-aggregate, so enforce here
            raise ValueError(
                f"embedding_drift expects exactly 2 side labels, got "
                f"{uniq}")
        ca = cv[sides == uniq[0]]
        cb = cv[sides == uniq[1]] if len(uniq) > 1 else cv[:0]
        lab = group.column(label_col)[0].as_py()
        if not len(ca) or not len(cb):
            return pa.table({label_col: pa.array([lab], pa.int64()),
                             "label_drift_cosine": pa.array([float("nan")],
                                                      pa.float64())})
        cos = float(np.dot(ca, cb)
                    / (np.sqrt(np.dot(ca, ca)) * np.sqrt(np.dot(cb, cb))))
        return pa.table({label_col: pa.array([lab], pa.int64()),
                         "label_drift_cosine": pa.array([cos], pa.float64())})

    return agg.groupby(label_col).map_groups(finish,
                                             batch_format="pyarrow")
