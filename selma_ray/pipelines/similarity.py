"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is normalized
once, put in the object store ONCE (ray.put) and read per task; each
batch computes a (q x batch) matmul and emits only its per-query top-k
rows, so the reduce shuffle carries O(#batches * q * k) tiny rows, never
the embeddings. The scale path is LSH bucketing: random-hyperplane sign
buckets mean each batch only scores rows whose bucket matches a query's
bucket (recall traded for candidate-set size; verified against brute
force in tests).

Near-duplicate detection by embedding cosine reuses the same broadcast
pattern with the corpus itself as the query side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_small


def _normalize(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # list<float> -> (n, d) without per-row Python: flatten + reshape
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _collect_broadcast_matrix(ds, id_col: str, emb_col: str,
                              max_rows: int, *, fallback_hint: str):
    """Driver-side collect of a SMALL (ids, normalized-matrix) broadcast
    side, SORTED by id — iter_batches yields dataset (file/shuffle)
    order, and broadcast consumers searchsorted/suffix-slice on ids.
    Raises past ``max_rows``, naming the scale path to use instead."""
    slim = ds.map_batches(
        lambda b: pa.table({"id": pc.cast(b.column(id_col), pa.int64()),
                            "emb": b.column(emb_col)}),
        batch_format="pyarrow")
    id_parts, mat_parts, n_rows = [], [], 0
    for b in slim.iter_batches(batch_format="pyarrow", batch_size=8192):
        n_rows += b.num_rows
        if n_rows > max_rows:
            raise ValueError(
                f"corpus too large to broadcast (>{max_rows} rows); "
                f"use the {fallback_hint}")
        id_parts.append(b.column("id").to_numpy(zero_copy_only=False))
        mat_parts.append(_batch_matrix(b, "emb"))
    all_ids = np.concatenate(id_parts).astype(np.int64)
    M = _normalize(np.vstack(mat_parts))
    order = np.argsort(all_ids, kind="stable")
    return all_ids[order], M[order]


class PartialTopK:
    """map_batches actor: emit per-batch top-k (query_id, vec_id, sim)."""

    def __init__(self, queries_ref, *, id_col: str = "vec_id",
                 emb_col: str = "embedding", k: int = 10):
        import ray

        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k
        # fetched once per actor; zero-copy numpy view from plasma
        self.query_ids, self.Q = ray.get(queries_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or self.Q.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        E = _normalize(_batch_matrix(batch, self.emb_col))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = self.Q @ E.T                      # (q, n)
        k = min(self.k, n)
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]   # (q, k)
        q_idx = np.repeat(np.arange(len(self.query_ids)), k)
        v_idx = top.ravel()
        return pa.table({
            "query_id": pa.array(self.query_ids[q_idx], pa.int64()),
            "vec_id": pa.array(ids[v_idx].astype(np.int64), pa.int64()),
            "sim": pa.array(sims[q_idx, v_idx], pa.float64()),
        })


def _final_topk_fn(k: int, round_to: int | None):
    def final_topk(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        qid = group.column("query_id")[0].as_py()
        # sort by (-sim, vec_id) for deterministic ties
        order = np.lexsort((ids, -sims))[:k]
        out_sims = sims[order]
        if round_to is not None:
            out_sims = np.round(out_sims, round_to)
        return pa.table({
            "query_id": pa.array([qid] * len(order), pa.int64()),
            "neighbor_id": pa.array(ids[order].astype(np.int64), pa.int64()),
            "sim": pa.array(out_sims, pa.float64()),
        })
    return final_topk


def load_queries(sf_dir_or_path: str, *, n_queries: int = 5,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
    """Driver-side: read the first n query vectors (tiny, column-pruned
    single-file read) and return (ids, normalized matrix)."""
    import pyarrow.parquet as pq

    path = (sf_dir_or_path if sf_dir_or_path.endswith(".parquet")
            else f"{sf_dir_or_path}/embeddings.parquet")
    t = pq.read_table(path, columns=[id_col, emb_col])
    t = t.filter(pa.compute.less(t.column(id_col), n_queries))
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    Q = _normalize(np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column(emb_col).to_pylist()]))
    return ids, Q


# per-worker stage cache (see pipelines/dedup.py): stateless tasks reuse
# warm worker processes; the ray.put broadcast is fetched once per worker
# (keyed by the ObjectRef) — same amortization an actor pool gives,
# without paying pool spin-up on small/interactive inputs. BOUNDED:
# unlike dedup's param-keyed cache, these keys hold per-call ObjectRefs
# — an unbounded dict would grow worker heap with every query AND pin
# each broadcast object in plasma forever (the ref in the key keeps it
# alive). FIFO-evicting past a handful of live query sets releases both.
_STAGE_CACHE: dict = {}
_STAGE_CACHE_MAX = 4


def _cached_stage(cls, **kw):
    key = (cls.__name__,) + tuple(sorted(kw.items(), key=lambda x: x[0]))
    st = _STAGE_CACHE.get(key)
    if st is None:
        while len(_STAGE_CACHE) >= _STAGE_CACHE_MAX:
            _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        st = _STAGE_CACHE.setdefault(key, cls(**kw))
    return st


def _partial_topk_fn(batch: pa.Table, **kw) -> pa.Table:
    return _cached_stage(PartialTopK, **kw)(batch)


def _lsh_partial_topk_fn(batch: pa.Table, **kw) -> pa.Table:
    return _cached_stage(LshPartialTopK, **kw)(batch)


def brute_force_topk(ds, query_ids: np.ndarray, Q: np.ndarray, *,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     k: int = 10, round_to: int | None = 4,
                     concurrency=None):
    """Exact cosine top-k of every query against the dataset."""
    import ray

    qref = ray.put((np.asarray(query_ids, dtype=np.int64), _normalize(Q)))
    kwargs = dict(
        fn_kwargs=dict(queries_ref=qref, id_col=id_col,
                       emb_col=emb_col, k=k),
        batch_format="pyarrow", batch_size=4096)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    partial = ds.map_batches(_partial_topk_fn, **kwargs)
    return coalesce_small(partial).groupby("query_id").map_groups(
        _final_topk_fn(k, round_to), batch_format="pyarrow")


# -- LSH-bucketed ANN (scale path) ------------------------------------------


class LshPartialTopK:
    """Like PartialTopK but each batch row is scored ONLY against queries
    sharing a random-hyperplane bucket in at least one of ``n_tables``
    hash tables — the candidate set shrinks by ~2^nbits per table while
    the table union keeps recall up (multi-table LSH). Planes are seeded
    deterministically so every actor agrees."""

    def __init__(self, queries_ref, *, id_col: str = "vec_id",
                 emb_col: str = "embedding", k: int = 10, nbits: int = 4,
                 n_tables: int = 4, seed: int = 0xA11CE):
        import ray

        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k
        self.nbits = nbits
        self.n_tables = n_tables
        self.seed = seed
        self.query_ids, self.Q = ray.get(queries_ref)
        self._planes = None  # built lazily once dim is known
        self._qbuckets = None

    def _ensure_planes(self, dim: int):
        if self._planes is None:
            rng = np.random.default_rng(self.seed)
            self._planes = rng.standard_normal(
                (self.n_tables, dim, self.nbits))
            self._qbuckets = self._bucket(self.Q)

    def _bucket(self, M: np.ndarray) -> np.ndarray:
        """(n_tables, n) bucket codes."""
        bits = np.einsum("nd,tdb->tnb", M, self._planes) > 0
        return (bits * (1 << np.arange(self.nbits))).sum(axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        E = _normalize(_batch_matrix(batch, self.emb_col))
        self._ensure_planes(E.shape[1])
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        ebuckets = self._bucket(E)                      # (t, n)
        # candidate[q, e] = buckets match in ANY table
        cand = np.zeros((self.Q.shape[0], E.shape[0]), dtype=bool)
        for t in range(self.n_tables):
            cand |= self._qbuckets[t][:, None] == ebuckets[t][None, :]
        out = []
        for qi in range(self.Q.shape[0]):
            e_sel = np.nonzero(cand[qi])[0]
            if e_sel.size == 0:
                continue
            sims = self.Q[qi] @ E[e_sel].T
            k = min(self.k, e_sel.size)
            top = np.argpartition(-sims, k - 1)[:k]
            out.append(pa.table({
                "query_id": pa.array(
                    np.full(k, self.query_ids[qi]), pa.int64()),
                "vec_id": pa.array(ids[e_sel[top]].astype(np.int64),
                                   pa.int64()),
                "sim": pa.array(sims[top], pa.float64()),
            }))
        return pa.concat_tables(out) if out else empty


def lsh_topk(ds, query_ids, Q, *, id_col: str = "vec_id",
             emb_col: str = "embedding", k: int = 10, nbits: int = 4,
             n_tables: int = 4, round_to: int | None = 4,
             concurrency=None):
    import ray

    qref = ray.put((np.asarray(query_ids, dtype=np.int64), _normalize(Q)))
    kwargs = dict(
        fn_kwargs=dict(queries_ref=qref, id_col=id_col,
                       emb_col=emb_col, k=k, nbits=nbits,
                       n_tables=n_tables),
        batch_format="pyarrow", batch_size=4096)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    partial = ds.map_batches(_lsh_partial_topk_fn, **kwargs)
    return coalesce_small(partial).groupby("query_id").map_groups(
        _final_topk_fn(k, round_to), batch_format="pyarrow")


# -- IVF-bucketed ANN (the other scale path) ---------------------------------


def train_ivf_centroids(ds, *, emb_col: str = "embedding", n_cells: int = 16,
                        n_iter: int = 5, sample_rows: int = 4096):
    """Deterministic driver-side k-means-lite: centroids from a bounded
    sample (first ``sample_rows`` in dataset order, seeded init = first
    n_cells vectors), a few Lloyd iterations on normalized vectors.
    Returns a normalized (n_cells, dim) matrix. At 100 TB the sample read
    stays a single limit() scan; training is O(sample * cells * iter) on
    the driver. For full-corpus training swap in the distributed Lloyd's
    implementation (selma_ray.pipelines.clustering.kmeans) — same
    centroid contract."""
    sample = ds.limit(sample_rows)
    mats = [_batch_matrix(b, emb_col)
            for b in sample.iter_batches(batch_format="pyarrow",
                                         batch_size=2048)]
    X = _normalize(np.vstack(mats))
    C = X[:n_cells].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


class IvfPartialTopK:
    """Like PartialTopK, but each batch row is scored only against the
    queries probing its IVF cell: rows are assigned to their nearest
    centroid; each query probes its ``nprobe`` nearest cells. Candidate
    work shrinks ~n_cells/nprobe-fold at matched recall on clustered
    data (the inverted-file trade)."""

    def __init__(self, state_ref, *, id_col: str = "vec_id",
                 emb_col: str = "embedding", k: int = 10, nprobe: int = 4):
        import ray

        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k
        self.query_ids, self.Q, self.C = ray.get(state_ref)
        # (n_queries, nprobe) probed cell ids
        sims = self.Q @ self.C.T
        nprobe = min(nprobe, self.C.shape[0])
        self.qcells = np.argpartition(-sims, nprobe - 1,
                                      axis=1)[:, :nprobe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        E = _normalize(_batch_matrix(batch, self.emb_col))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        ecell = np.argmax(E @ self.C.T, axis=1)      # (n,)
        out = []
        for qi in range(self.Q.shape[0]):
            cand = np.nonzero(np.isin(ecell, self.qcells[qi]))[0]
            if cand.size == 0:
                continue
            sims = self.Q[qi] @ E[cand].T
            k = min(self.k, cand.size)
            top = np.argpartition(-sims, k - 1)[:k]
            out.append(pa.table({
                "query_id": pa.array(
                    np.full(k, self.query_ids[qi]), pa.int64()),
                "vec_id": pa.array(ids[cand[top]].astype(np.int64),
                                   pa.int64()),
                "sim": pa.array(sims[top], pa.float64()),
            }))
        return pa.concat_tables(out) if out else empty


def _ivf_partial_topk_fn(batch: pa.Table, **kw) -> pa.Table:
    return _cached_stage(IvfPartialTopK, **kw)(batch)


def ivf_topk(ds, query_ids, Q, *, id_col: str = "vec_id",
             emb_col: str = "embedding", k: int = 10, n_cells: int = 16,
             nprobe: int = 4, round_to: int | None = 4, concurrency=None):
    import ray

    C = train_ivf_centroids(ds, emb_col=emb_col, n_cells=n_cells)
    state_ref = ray.put((np.asarray(query_ids, dtype=np.int64),
                         _normalize(Q), C))
    kwargs = dict(
        fn_kwargs=dict(state_ref=state_ref, id_col=id_col, emb_col=emb_col,
                       k=k, nprobe=nprobe),
        batch_format="pyarrow", batch_size=4096)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    partial = ds.map_batches(_ivf_partial_topk_fn, **kwargs)
    return coalesce_small(partial).groupby("query_id").map_groups(
        _final_topk_fn(k, round_to), batch_format="pyarrow")


# -- embedding-cosine near-dup ------------------------------------------------


def embedding_near_dup_pairs(ds, *, id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             threshold: float = 0.95,
                             round_to: int | None = 4,
                             max_broadcast_rows: int = 200_000):
    """All pairs (id_a < id_b) with cosine >= threshold.

    Broadcast-self pattern: the normalized corpus matrix is placed in the
    object store once; each batch matmuls against it and keeps only
    pairs where the other id is larger (no double-count, no self-pairs).
    Valid while the corpus matrix fits a worker heap (~200k x 64 f64 =
    100 MB); beyond that the LSH-bucketed variant in dedup-style
    band-groupby form takes over.
    """
    import ray

    all_ids, M = _collect_broadcast_matrix(
        ds, id_col, emb_col, max_broadcast_rows,
        fallback_hint="LSH-bucketed near-dup path")
    ref = ray.put((all_ids, M))

    empty = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "similarity": pa.array([], pa.float64()),
        "method": pa.array([], pa.string()),
    })

    def pairs_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:              # bids.min() would raise
            return empty
        ids_all, Mat = ray.get(ref)          # ids_all sorted ascending
        E = _normalize(_batch_matrix(batch, emb_col))
        bids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # upper triangle only: pairs need the corpus id STRICTLY greater,
        # and ids_all is sorted, so the candidate columns are a suffix —
        # halves the total matmul flops across batches
        start = int(np.searchsorted(ids_all, bids.min(), side="right"))
        if start >= ids_all.size:
            return empty
        sub_ids = ids_all[start:]
        sims = E @ Mat[start:].T             # (batch, suffix)
        # inclusion is decided on the ROUNDED similarity so it can't flip
        # on float noise between this and an independent (SQL) computation
        # — but rounding the FULL (batch x suffix) matrix costs 3 matrix
        # allocations per call, which dwarfs the matmul. Instead: take a
        # candidate superset with a half-ulp-of-rounding slack, then round
        # only the few surviving values.
        if round_to is not None:
            thr = threshold - 0.5 * 10.0 ** (-round_to) - 1e-12
        else:
            thr = threshold
        mask = sims >= thr
        mask &= sub_ids[None, :] > bids[:, None]
        ii, jj = np.nonzero(mask)            # fully vectorized pair pick
        vals = sims[ii, jj]
        if round_to is not None:
            vals = np.round(vals, round_to)
            keep = vals >= threshold
            ii, jj, vals = ii[keep], jj[keep], vals[keep]
        return pa.table({
            "id_a": pa.array(bids[ii].astype(np.int64), pa.int64()),
            "id_b": pa.array(sub_ids[jj], pa.int64()),
            "similarity": pa.array(vals, pa.float64()),
            "method": pa.array(["embedding_cosine"] * ii.size),
        })

    return ds.map_batches(pairs_fn, batch_format="pyarrow", batch_size=4096)


def quantize_embeddings(ds, *, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Symmetric per-vector int8 quantization -> (id, scale:float64,
    q:binary of d int8 bytes): the 4x storage shrink applied before
    parking 100 TB of embeddings in parquet. scale = max|x| / 127;
    dequant = q * scale. Map-only, fully vectorized per batch.

    Pair with ``dequantize_embeddings_batch`` on the read side; recall
    loss for cosine top-k at int8 is typically < 1% (verify per corpus
    with the ann_topk oracle before committing a corpus to it).
    """
    def quant(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        amax = np.abs(m).max(axis=1)
        scale = np.where(amax > 0, amax / 127.0, 1.0)
        # round half-away-from-zero (sign*floor(|x|+0.5)): the common
        # symmetric-quant convention, and what SQL round() does — so
        # the DuckDB oracle reproduces every code exactly
        x = m / scale[:, None]
        q = np.clip(np.sign(x) * np.floor(np.abs(x) + 0.5),
                    -127, 127).astype(np.int8)
        return pa.table({
            id_col: batch.column(id_col),
            "scale": pa.array(scale, pa.float64()),
            "q": pa.array([row.tobytes() for row in q], pa.binary()),
        })

    return ds.map_batches(quant, batch_format="pyarrow")


def dequantize_embeddings_batch(batch: pa.Table, *,
                                vec_col: str = "q") -> np.ndarray:
    """(scale, q) batch -> float32 matrix (the inverse of
    :func:`quantize_embeddings`), for use inside downstream stages."""
    raw = np.stack([np.frombuffer(b, dtype=np.int8)
                    for b in batch.column(vec_col).to_pylist()])
    scale = batch.column("scale").to_numpy(zero_copy_only=False)
    return (raw.astype(np.float32) * scale[:, None].astype(np.float32))


def top_similar_pairs(ds, *, k_pairs: int = 50, id_col: str = "vec_id",
                      emb_col: str = "embedding",
                      max_broadcast_rows: int = 200_000):
    """The ``k_pairs`` globally most-similar cosine pairs (id_a < id_b)
    — threshold-free near-dup triage ("show me the closest pairs").

    Same broadcast-self matmul as embedding_near_dup_pairs, but each
    block k-prunes to its own top ``k_pairs`` candidates (np.argpartition,
    no per-block full sort) and the final exact sort+limit runs over at
    most k_pairs x blocks rows — never the full pair matrix. Ties break
    by (id_a, id_b) for determinism. Same broadcast-fit bound as the
    threshold variant; LSH-bucket beyond it.
    """
    import ray

    all_ids, M = _collect_broadcast_matrix(
        ds, id_col, emb_col, max_broadcast_rows,
        fallback_hint="LSH-bucketed path")
    ref = ray.put((all_ids, M))

    empty = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "similarity": pa.array([], pa.float64()),
    })

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ids_all, mat = ray.get(ref)
        ids = pa.compute.cast(batch.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        E = _normalize(_batch_matrix(batch, emb_col))
        sims = E @ mat.T                      # (b, N)
        mask = ids[:, None] < ids_all[None, :]  # pair once, no self
        sims = np.where(mask, sims, -np.inf)
        flat = sims.ravel()
        k = min(k_pairs, flat.size)
        idx = np.argpartition(-flat, k - 1)[:k]
        idx = idx[np.isfinite(flat[idx])]
        r, c = np.unravel_index(idx, sims.shape)
        return pa.table({
            "id_a": pa.array(ids[r], pa.int64()),
            "id_b": pa.array(ids_all[c], pa.int64()),
            "similarity": pa.array(flat[idx], pa.float64()),
        })

    cand = ds.map_batches(block_topk, batch_format="pyarrow")
    return cand.sort(["similarity", "id_a", "id_b"],
                     descending=[True, False, False]).limit(k_pairs)


def knn_graph_stats(ds, *, k: int = 10, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    max_broadcast_rows: int = 200_000):
    """Embedding-space health report -> one row (k, n_vectors,
    reciprocal_rate, max_in_degree, hub_share): build the cosine kNN
    graph and measure (a) how often "a is in b's top-k" is mutual
    (low reciprocity = asymmetric/hubby space, bad for ANN recall)
    and (b) hubness — the max in-degree and the in-degree share of
    the top 1% most-pointed-at vectors.

    Same broadcast-matmul scale contract as ann_topk/top_similar_pairs
    (each block computes its rows' top-k against the broadcast matrix;
    per-block output is k ints per row); the graph-level folds run on
    the edge list (n*k pairs), driver-side here, a groupby at larger
    n.
    """
    import ray

    all_ids, M = _collect_broadcast_matrix(
        ds, id_col, emb_col, max_broadcast_rows,
        fallback_hint="IVF/LSH-bucketed path")
    ref = ray.put((all_ids, M))

    def block_knn(batch: pa.Table) -> pa.Table:
        ids_all, mat = ray.get(ref)
        ids = pc.cast(batch.column(id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        E = _normalize(_batch_matrix(batch, emb_col))
        sims = E @ mat.T
        sims[ids[:, None] == ids_all[None, :]] = -np.inf  # no self edge
        kk = min(k, sims.shape[1] - 1)
        # stable argsort over the id-ascending broadcast order = the
        # deterministic (sim DESC, id ASC) edge rule the SQL oracle
        # replays; argpartition would leave boundary ties
        # partition-order-dependent
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        src = np.repeat(ids, kk)
        dst = ids_all[idx.ravel()]
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = ds.map_batches(block_knn, batch_format="pyarrow").take_all()
    pairs = {(r["src"], r["dst"]) for r in edges}
    recip = sum(1 for (a, b) in pairs if (b, a) in pairs)
    indeg: dict = {}
    for _, b in pairs:
        indeg[b] = indeg.get(b, 0) + 1
    degs = sorted(indeg.values(), reverse=True)
    top1 = max(1, len(all_ids) // 100)
    hub_share = sum(degs[:top1]) / max(sum(degs), 1)

    import ray.data

    return ray.data.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "n_vectors": pa.array([len(all_ids)], pa.int64()),
        "reciprocal_rate": pa.array([recip / max(len(pairs), 1)],
                                    pa.float64()),
        "max_in_degree": pa.array([degs[0] if degs else 0], pa.int64()),
        "hub_share": pa.array([hub_share], pa.float64()),
    }))


def random_projection(ds, *, out_dim: int = 16, seed: int = 0x4A4C,
                      id_col: str = "vec_id", emb_col: str = "embedding"):
    """Johnson-Lindenstrauss random projection -> (id, projected
    list<float32>): seeded Gaussian projection to ``out_dim`` /
    sqrt(out_dim) scaling, preserving pairwise distances within
    ~1/sqrt(out_dim). Map-only: the projection matrix is built ONCE
    per task from the seed (no broadcast needed — determinism IS the
    broadcast), one matmul per batch.
    """
    def project(batch: pa.Table) -> pa.Table:
        E = _batch_matrix(batch, emb_col)
        if E.shape[0] == 0:
            return pa.table({id_col: batch.column(id_col),
                             "projected": pa.array([], pa.list_(
                                 pa.float32(), out_dim))})
        rng = np.random.default_rng(seed)
        P = rng.standard_normal((E.shape[1], out_dim)) / np.sqrt(out_dim)
        Y = (E @ P).astype(np.float32)
        return pa.table({
            id_col: batch.column(id_col),
            "projected": pa.array(Y.tolist(),
                                  pa.list_(pa.float32(), out_dim)),
        })

    return ds.map_batches(project, batch_format="pyarrow")
