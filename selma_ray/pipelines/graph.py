"""Graph analytics over edge Datasets: PageRank by iterated
join + groupby rounds (the same iterative-wide-op discipline as the
Hash-Min connected-components pass in pipelines/dedup.py).

Scale shape per round: ONE hash join (edges x node-sized rank table,
join key = src) and ONE groupby(dst) sum — the edge table streams
through both; the rank table is node-cardinality and is re-materialized
each round (it is the only state). Dangling-node mass (nodes without
out-edges) is folded driver-side from the already-reduced rank table
and redistributed uniformly, so ranks sum to 1 every round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_small


def _distinct_int(ds, col: str, out_name: str):
    def per_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            out_name: pc.unique(pc.cast(batch.column(col), pa.int64()))})

    from ..stages.util import per_key_in_buckets

    return per_key_in_buckets(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        out_name, lambda g: g.slice(0, 1))


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             damping: float = 0.85, iters: int = 20,
             num_partitions: int = 8):
    """Edge Dataset (src:int64, dst:int64) -> (node:int64, rank:float64).

    Standard PageRank with uniform teleport and uniform dangling-mass
    redistribution; duplicate edges count as parallel edges. The edge
    table should be parquet-backed / materialized — each round streams
    it once.
    """
    import ray.data

    from ray.data.aggregate import Sum

    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "src": pc.cast(b.column(src_col), pa.int64()),
            "dst": pc.cast(b.column(dst_col), pa.int64()),
        }), batch_format="pyarrow").materialize()

    from ..stages.util import per_key_in_buckets

    nodes = per_key_in_buckets(
        _distinct_int(edges, "src", "node")
        .union(_distinct_int(edges, "dst", "node")),
        "node", lambda g: g.slice(0, 1)).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.int64()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    # cap hash partitions to graph size: Acero rejects the empty/
    # schemaless partitions a tiny graph leaves at num_partitions=8
    # (same guard as connected_components / bfs_depth)
    num_partitions = max(1, min(num_partitions, n // 4 or 1))

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["src"]).group_by("src").aggregate(
            [("src", "count")])
        return pa.table({
            "node": g.column("src"),
            "pdeg": pc.cast(g.column("src_count"), pa.int64()),
        })

    outdeg = coalesce_small(
        edges.map_batches(deg_partial, batch_format="pyarrow")) \
        .groupby("node").aggregate(Sum("pdeg"))

    # rank table: (node, rank, outdeg) — outdeg 0 marks dangling nodes
    ranks = nodes.join(
        coalesce_small(outdeg.map_batches(
            lambda b: pa.table({
                "node": pc.cast(b.column("node"), pa.int64()),
                "outdeg": pc.cast(b.column("sum(pdeg)"), pa.int64()),
            }), batch_format="pyarrow")),
        join_type="left_outer", num_partitions=num_partitions,
        on=("node",)).map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "outdeg": pc.fill_null(b.column("outdeg"),
                                   pa.scalar(0, pa.int64())),
            "rank": pa.array(np.full(b.num_rows, 1.0 / n)),
        }), batch_format="pyarrow").materialize()

    for _ in range(iters):
        dangling = ranks.filter(expr="outdeg == 0").sum("rank") or 0.0
        base = (1.0 - damping) / n + damping * dangling / n

        contrib_src = ranks.filter(expr="outdeg > 0").map_batches(
            lambda b: pa.table({
                "src": b.column("node"),
                "share": pc.divide(
                    b.column("rank"),
                    pc.cast(b.column("outdeg"), pa.float64())),
            }), batch_format="pyarrow")
        hits = edges.join(coalesce_small(contrib_src),
                          join_type="inner",
                          num_partitions=num_partitions, on=("src",))

        def in_partial(batch: pa.Table) -> pa.Table:
            g = pa.table({"node": batch.column("dst"),
                          "share": batch.column("share")}) \
                .group_by("node").aggregate([("share", "sum")])
            return pa.table({
                "node": g.column("node"),
                "psum": g.column("share_sum"),
            })

        insum = coalesce_small(
            hits.map_batches(in_partial, batch_format="pyarrow")) \
            .groupby("node").aggregate(Sum("psum"))

        ranks = ranks.select_columns(["node", "outdeg"]).join(
            coalesce_small(insum.map_batches(
                lambda b: pa.table({
                    "node": pc.cast(b.column("node"), pa.int64()),
                    "insum": b.column("sum(psum)"),
                }), batch_format="pyarrow")),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",)).map_batches(
            lambda b, *, _base=base: pa.table({
                "node": b.column("node"),
                "outdeg": b.column("outdeg"),
                "rank": pc.add(
                    pa.scalar(_base),
                    pc.multiply(pa.scalar(damping),
                                pc.fill_null(b.column("insum"),
                                             pa.scalar(0.0)))),
            }), batch_format="pyarrow").materialize()

    return ranks.select_columns(["node", "rank"])


def connected_components(edges_ds, *, src_col: str = "src",
                         dst_col: str = "dst", rounds: int = 12,
                         num_partitions: int = 8):
    """Undirected connected components by Hash-Min label propagation
    -> (node:int64, label:int64), label = the component's minimum node
    id once ``rounds`` >= graph diameter (the generic, query-exposed
    sibling of the dedup module's internal pass).

    Runs EXACTLY ``rounds`` rounds — deterministic output even if the
    graph hasn't converged, which is what lets an oracle run the same
    fixed unrolled rounds and match label-for-label. Per round: one
    hash join (symmetrized edges x labels on src) + one groupby(dst)
    min — the edge table streams through, labels are the only state
    (node-cardinality, re-materialized per round).
    """
    import ray.data

    from ray.data.aggregate import Min

    from ..stages.util import coalesce_small

    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "src": pc.cast(b.column(src_col), pa.int64()),
            "dst": pc.cast(b.column(dst_col), pa.int64()),
        }), batch_format="pyarrow")
    sym = edges.union(edges.map_batches(
        lambda b: pa.table({"src": b.column("dst"),
                            "dst": b.column("src")}),
        batch_format="pyarrow")).materialize()

    nodes = _distinct_int(sym, "src", "node").materialize()
    # sparse keys + many hash partitions -> empty (schemaless)
    # partitions that Acero rejects; scale partitions to cardinality
    n_nodes = nodes.count()
    num_partitions = max(1, min(num_partitions, n_nodes // 4 or 1))
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "label": b.column("node")}),
        batch_format="pyarrow").materialize()

    for _ in range(rounds):
        lab_src = labels.map_batches(
            lambda b: pa.table({"src": b.column("node"),
                                "slabel": b.column("label")}),
            batch_format="pyarrow")
        hits = coalesce_small(sym).join(
            coalesce_small(lab_src), join_type="inner",
            num_partitions=num_partitions, on=("src",))

        def nbr_partial(batch: pa.Table) -> pa.Table:
            g = pa.table({"node": batch.column("dst"),
                          "nl": batch.column("slabel")}) \
                .group_by("node").aggregate([("nl", "min")])
            return pa.table({"node": g.column("node"),
                             "p_min": g.column("nl_min")})

        nbr = coalesce_small(
            hits.map_batches(nbr_partial, batch_format="pyarrow")) \
            .groupby("node").aggregate(Min("p_min"))

        labels = coalesce_small(labels).join(
            coalesce_small(nbr.map_batches(
                lambda b: pa.table({
                    "node": pc.cast(b.column("node"), pa.int64()),
                    "nmin": pc.cast(b.column("min(p_min)"), pa.int64()),
                }), batch_format="pyarrow")),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",)).map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "label": pc.min_element_wise(
                    b.column("label"),
                    pc.fill_null(b.column("nmin"),
                                 pa.scalar(2**62, pa.int64()))),
            }), batch_format="pyarrow").materialize()

    return labels


def bfs_depth(edges_ds, seeds, *, src_col: str = "src",
              dst_col: str = "dst", rounds: int = 8,
              num_partitions: int = 8, unreachable: int = -1):
    """Multi-source BFS depth by min-plus propagation -> (node:int64,
    depth:int64): hop distance to the nearest seed over the
    undirected graph, ``unreachable`` (-1) for nodes no seed reaches
    within ``rounds`` (fixed rounds, same determinism contract as
    connected_components). Per round: one join + one groupby(min) —
    depth table is the only state.
    """
    import ray.data

    from ray.data.aggregate import Min

    from ..stages.util import coalesce_small

    INF = 2 ** 62

    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "src": pc.cast(b.column(src_col), pa.int64()),
            "dst": pc.cast(b.column(dst_col), pa.int64()),
        }), batch_format="pyarrow")
    sym = edges.union(edges.map_batches(
        lambda b: pa.table({"src": b.column("dst"),
                            "dst": b.column("src")}),
        batch_format="pyarrow")).materialize()

    nodes = _distinct_int(sym, "src", "node").materialize()
    n_nodes = nodes.count()
    num_partitions = max(1, min(num_partitions, n_nodes // 4 or 1))
    seed_set = set(int(s) for s in seeds)

    def init(batch: pa.Table) -> pa.Table:
        ns = batch.column("node").to_numpy(zero_copy_only=False)
        d = np.where(np.isin(ns, list(seed_set)), 0, INF)
        return pa.table({"node": pa.array(ns, pa.int64()),
                         "depth": pa.array(d.astype(np.int64),
                                           pa.int64())})

    depth = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        d_src = depth.map_batches(
            lambda b: pa.table({"src": b.column("node"),
                                "sdepth": b.column("depth")}),
            batch_format="pyarrow")
        hits = coalesce_small(sym).join(
            coalesce_small(d_src), join_type="inner",
            num_partitions=num_partitions, on=("src",))

        def nbr(batch: pa.Table) -> pa.Table:
            g = pa.table({"node": batch.column("dst"),
                          "nd": pc.add(batch.column("sdepth"),
                                       pa.scalar(1, pa.int64()))}) \
                .group_by("node").aggregate([("nd", "min")])
            return pa.table({"node": g.column("node"),
                             "p_min": g.column("nd_min")})

        best = coalesce_small(
            hits.map_batches(nbr, batch_format="pyarrow")) \
            .groupby("node").aggregate(Min("p_min"))

        depth = coalesce_small(depth).join(
            coalesce_small(best.map_batches(
                lambda b: pa.table({
                    "node": pc.cast(b.column("node"), pa.int64()),
                    "nmin": pc.cast(b.column("min(p_min)"), pa.int64()),
                }), batch_format="pyarrow")),
            join_type="left_outer", num_partitions=num_partitions,
            on=("node",)).map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "depth": pc.min_element_wise(
                    b.column("depth"),
                    pc.fill_null(b.column("nmin"),
                                 pa.scalar(INF, pa.int64()))),
            }), batch_format="pyarrow").materialize()

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("depth").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "depth": pa.array(np.where(d >= INF, unreachable, d)
                              .astype(np.int64), pa.int64()),
        })

    return depth.map_batches(finish, batch_format="pyarrow")
