"""Relational demo pipelines over the TPC-H-ish test tables.

These exist to exercise the engine's wide-operation patterns the way a
100 TB pipeline would:

- partial aggregation INSIDE map_batches before the groupby, so the
  shuffle carries one row per (batch x key), not per input row;
- broadcast hash join for small dimension sides (ray.put once, read in
  each task) instead of an all-to-all shuffle join;
- sort + limit only on already-reduced data.

Money columns aggregate in integer cents (round(value*100) as int64):
integer sums are order-independent and exact, so results hash-match an
independent SQL computation bit-for-bit — float sums rounded to cents
can flip on .005 boundaries depending on summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_small, per_key_in_buckets


def _cents(col, scale: int = 100) -> pa.Array:
    """Exact decimal-scaled int64: round(value * scale)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(np.rint(v * scale).astype(np.int64), pa.int64())


def _partial_sum_by(batch_cols: dict[str, pa.Array],
                    key_cols: list[str], sum_cols: list[str],
                    count_name: str | None = None) -> pa.Table:
    """Arrow group_by inside the task (the per-batch combiner)."""
    t = pa.table(batch_cols)
    aggs = [(c, "sum") for c in sum_cols]
    if count_name:
        aggs.append((key_cols[0], "count"))
    g = t.group_by(key_cols).aggregate(aggs)
    cols = {k: g.column(k) for k in key_cols}
    for c in sum_cols:
        cols[c] = g.column(f"{c}_sum")
    if count_name:
        cols[count_name] = pc.cast(g.column(f"{key_cols[0]}_count"),
                                   pa.int64())
    return pa.table(cols)


def events_rollup(ds):
    """events -> (event_type, n_events, sum_value_cents), partial-agg
    per batch first so the shuffle carries one row per key per batch."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"event_type": batch.column("event_type"),
             "v": _cents(batch.column("value"))},
            ["event_type"], ["v"], "n_partial")

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("event_type").aggregate(Sum("v"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "sum_value_cents": pc.cast(batch.column("sum(v)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


class BroadcastLookup:
    """map_batches fn: map a key column through a broadcast dict.

    The dict travels to the object store once (ray.put on the driver);
    each worker fetches it once (module cache below), NOT per batch.
    """

    def __init__(self, mapping_ref, key_col: str, out_col: str,
                 out_type=pa.string()):
        import ray

        self.mapping = ray.get(mapping_ref)
        self.key_col = key_col
        self.out_col = out_col
        self.out_type = out_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        vals = [self.mapping.get(k) for k in keys]
        return batch.append_column(self.out_col,
                                   pa.array(vals, self.out_type))


# stateless-task wrapper (see pipelines/dedup.py): ray.get amortizes via
# the per-worker cache without paying actor-pool spin-up
_STAGE_CACHE: dict = {}


def _broadcast_lookup_fn(batch: pa.Table, **kw) -> pa.Table:
    key = tuple(sorted(kw.items(), key=lambda x: x[0]))
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE.setdefault(key, BroadcastLookup(**kw))
    return st(batch)


def events_windowed(ds, *, window: str = "hour"):
    """Tumbling-window rollup: (window_start, event_type) -> count, sum.

    The windowed aggregate Ray Data lacks natively, composed the
    streaming way: window assignment is a vectorized map (floor_temporal
    inside map_batches — event time never leaves the block), per-block
    partial aggregation shrinks the shuffle to one row per (window, type)
    per block, and the final groupby is tiny. Tumbling windows need no
    watermarks: every event maps to exactly one window.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=window)
        return _partial_sum_by(
            {"window_start": win,
             "event_type": batch.column("event_type"),
             "v": _cents(batch.column("value"))},
            ["window_start", "event_type"], ["v"], "n_partial")

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["window_start", "event_type"]).aggregate(
            Sum("v"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": batch.column("window_start"),
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "sum_value_cents": pc.cast(batch.column("sum(v)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def events_asof_orders(events_ds, orders_path: str):
    """As-of join: each event -> the latest order date of its user at or
    before the event time (DuckDB ``ASOF JOIN`` semantics, inner).

    Ray Data has no asof-join primitive; this is the broadcast-small-side
    composition: the (custkey, orderdate) pairs are packed into ONE sorted
    uint64 composite array (dense key rank x measured time span +
    relative time), ray.put once, and each event batch resolves matches
    with a single vectorized searchsorted — no shuffle, no per-row
    Python. Emits the matched DATE (not an order id) so ties on
    (custkey, date) stay deterministic.

    Partitioning assumption: the order side fits a worker heap (~16B/row;
    dimension-scale). For fact-to-fact asof at 100 TB, hash-partition
    both sides by key and run this same searchsorted merge per partition
    (groupby(key).map_groups) instead of broadcasting.
    """
    import ray
    import pyarrow.parquet as pq

    o = pq.read_table(orders_path, columns=["o_custkey", "o_orderdate"])
    ck = o.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    od = pc.cast(o.column("o_orderdate"), pa.int64()).to_numpy(
        zero_copy_only=False)
    # Composite = dense_key_rank * time_span + relative_time, in uint64.
    # A fixed bit split (key << 52) silently ALIASES keys past its bit
    # budget (custkey 4097 == custkey 1 at 52 time bits); dense ranks x
    # measured span use exactly the bits the data needs, with a loud
    # guard instead of silent wraparound past 2^64.
    keys = np.unique(ck)
    t0 = np.int64(od.min()) if len(od) else np.int64(0)
    span = np.uint64((int(od.max()) - int(t0) + 2) if len(od) else 2)
    if len(keys) and int(len(keys)) * int(span) >= (1 << 64):
        raise ValueError(
            "asof composite exceeds 64 bits (keys x time span); "
            "hash-partition both sides by key and run the merge per "
            "partition (see docstring)")
    rank = np.searchsorted(keys, ck).astype(np.uint64)
    comp = rank * span + (od - t0).astype(np.uint64)
    comp.sort()
    ref = ray.put((comp, keys))

    def asof(batch: pa.Table) -> pa.Table:
        orders_comp, keys_r = ray.get(ref)
        if len(keys_r) == 0:
            # empty order side: no event can match (guards the
            # keys_r[r_c] membership check below against 0-length index)
            none = pa.array([], pa.int64())
            return pa.table({
                "event_id": pc.take(batch.column("event_id"), none),
                "user_id": pc.take(batch.column("user_id"), none),
                "ts": pc.take(batch.column("ts"), none),
                "last_order_date": none.cast(pa.timestamp("us")),
            })
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        r = np.searchsorted(keys_r, uid)
        known = r < len(keys_r)
        r_c = np.minimum(r, max(len(keys_r) - 1, 0)).astype(np.uint64)
        known &= keys_r[r_c.astype(np.int64)] == uid
        # clamp event times into the key's span cell: earlier-than-all
        # probes resolve to rel 0 (validated below), later-than-all to
        # the key's last order — exactly the as-of semantics
        rel = np.clip(ts - t0, 0, int(span) - 1).astype(np.uint64)
        q = r_c * span + rel
        idx = np.searchsorted(orders_comp, q, side="right") - 1
        valid = known & (idx >= 0)
        idx_c = np.maximum(idx, 0)
        same_key = orders_comp[idx_c] // span == r_c
        matched = (orders_comp[idx_c] % span).astype(np.int64) + t0
        valid &= same_key & (matched <= ts)
        sel = np.nonzero(valid)[0]
        take = pa.array(sel, pa.int64())
        return pa.table({
            "event_id": pc.take(batch.column("event_id"), take),
            "user_id": pc.take(batch.column("user_id"), take),
            "ts": pc.take(batch.column("ts"), take),
            "last_order_date": pa.array(matched[sel], pa.int64()).cast(
                pa.timestamp("us")),
        })

    return events_ds.map_batches(asof, batch_format="pyarrow")


def events_range_self_join(events_ds, events_path: str, *,
                           window_s: int = 300):
    """Range join: pairs of events by the same user within ``window_s``
    seconds (a.ts <= b.ts < a.ts + window, a.event_id != b.event_id).
    A tied-timestamp pair satisfies a.ts <= b.ts in BOTH directions, so
    it appears twice — once per orientation — exactly like the SQL
    inequality join the oracle runs.

    Broadcast-small-side composition of a range join (Ray Data has no
    native one): the right side packs into a sorted uint64 composite
    (dense user rank x padded time span + relative ts — a fixed bit
    split would silently alias users past its bit budget); each left
    batch finds its window with TWO vectorized searchsorted calls and
    expands matches with repeat/arange arithmetic — no shuffle, no
    per-row Python. Same documented scale fallback as the as-of join:
    hash-partition both sides by user and run the identical merge per
    partition.
    """
    import ray
    import pyarrow.parquet as pq

    win_us = np.int64(window_s * 1_000_000)

    t = pq.read_table(events_path, columns=["user_id", "ts", "event_id"])
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
    eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    keys = np.unique(uid)
    t0 = np.int64(ts.min()) if len(ts) else np.int64(0)
    # pad the span so q + win stays inside the user's cell (no bleed
    # into the next rank's range)
    span = np.uint64((int(ts.max()) - int(t0) if len(ts) else 0)
                     + int(win_us) + 2)
    if len(keys) and int(len(keys)) * int(span) >= (1 << 64):
        raise ValueError(
            "range-join composite exceeds 64 bits (users x time span); "
            "hash-partition both sides by user and run the merge per "
            "partition (see docstring)")
    rank = np.searchsorted(keys, uid).astype(np.uint64)
    comp = rank * span + (ts - t0).astype(np.uint64)
    order = np.argsort(comp, kind="stable")
    ref = ray.put((comp[order], eid[order], ts[order], keys))

    def pairs(batch: pa.Table) -> pa.Table:
        comp_r, eid_r, ts_r, keys_r = ray.get(ref)
        if len(keys_r) == 0:
            # empty right side (same latent 0-length-index pattern as
            # the as-of join; unreachable for the self-join but kept
            # safe for reuse with a disjoint right table)
            none = pa.array([], pa.int64())
            return pa.table({"user_id": none, "event_a": none,
                             "event_b": none, "gap_us": none})
        uid_l = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts_l = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        eid_l = batch.column("event_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        r = np.searchsorted(keys_r, uid_l)
        known = (r < len(keys_r))
        r_c = np.minimum(r, max(len(keys_r) - 1, 0))
        known &= keys_r[r_c] == uid_l
        # left events are rows of the same table, so ts_l - t0 >= 0;
        # unknown users get an empty [lo, hi) window via known-mask
        q = r_c.astype(np.uint64) * span \
            + np.clip(ts_l - t0, 0, int(span) - 1).astype(np.uint64)
        lo = np.searchsorted(comp_r, q, side="left")
        hi = np.searchsorted(comp_r, q + np.uint64(win_us), side="left")
        hi = np.where(known, hi, lo)
        counts = hi - lo
        li = np.repeat(np.arange(len(q)), counts)
        # within-window offsets: flat arange minus each row's start
        flat = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts)
        rj = lo[li] + flat
        keep = eid_r[rj] != eid_l[li]          # drop self-pairs
        li, rj = li[keep], rj[keep]
        return pa.table({
            "user_id": pa.array(uid_l[li], pa.int64()),
            "event_a": pa.array(eid_l[li], pa.int64()),
            "event_b": pa.array(eid_r[rj], pa.int64()),
            "gap_us": pa.array(ts_r[rj] - ts_l[li], pa.int64()),
        })

    return events_ds.map_batches(pairs, batch_format="pyarrow")


def sessionize_events(events_ds, *, gap_s: int = 1800):
    """Per-user sessionization: a new session starts when the gap since
    the user's previous event exceeds ``gap_s`` seconds. Emits
    (event_id, user_id, ts, session_idx) with session_idx dense from 0
    per user.

    The stateful-ordering op: groupby(user_id).map_groups sorts each
    user's events by time and takes a cumulative sum over gap breaks —
    per-group state never crosses users, so hash partitioning by user is
    the only shuffle. Matches the SQL window-function formulation
    (sum(gap > g) OVER (PARTITION BY user ORDER BY ts)).
    """
    gap_us = np.int64(gap_s * 1_000_000)

    def assign(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        breaks = np.empty(len(ts), dtype=np.int64)
        breaks[0] = 0
        breaks[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "session_idx": pa.array(np.cumsum(breaks), pa.int64()),
        })

    return per_key_in_buckets(events_ds, "user_id", assign)


def revenue_by_nation(orders_ds, customer_path: str, nation_path: str):
    """orders ⋈ customer ⋈ nation -> (n_name, n_orders, revenue_cents).

    Dimension sides (customer: key->nationkey, nation: key->name) are
    tiny: composed driver-side into ONE custkey->nation-name dict and
    broadcast; orders partial-aggregate by custkey inside each batch
    before the lookup, so the final groupby shuffle is per-nation only.
    """
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    nation_name = dict(zip(nat.column("n_nationkey").to_pylist(),
                           nat.column("n_name").to_pylist()))
    cust_nation = {
        ck: nation_name[nk]
        for ck, nk in zip(cust.column("c_custkey").to_pylist(),
                          cust.column("c_nationkey").to_pylist())
    }
    ref = ray.put(cust_nation)

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"o_custkey": batch.column("o_custkey"),
             "price": _cents(batch.column("o_totalprice"))},
            ["o_custkey"], ["price"], "n_partial")

    tagged = orders_ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(
            _broadcast_lookup_fn,
            fn_kwargs=dict(mapping_ref=ref, key_col="o_custkey",
                           out_col="n_name"),
            batch_format="pyarrow")
    agg = coalesce_small(tagged).groupby("n_name").aggregate(
        Sum("price"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch.column("n_name"),
            "n_orders": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "revenue_cents": pc.cast(batch.column("sum(price)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def suppliers_by_region(supplier_ds, nation_path: str, region_path: str):
    """supplier ⋈ nation ⋈ region -> (r_name, n_suppliers,
    total_acctbal_cents).

    Both dimension sides are tiny fixed vocabularies (25 nations, 5
    regions): composed driver-side into ONE nationkey->region-name dict
    and broadcast; suppliers partial-aggregate by nationkey inside each
    batch, so the final shuffle is one row per region per block.
    """
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nat = pq.read_table(nation_path, columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(region_path, columns=["r_regionkey", "r_name"])
    region_name = dict(zip(reg.column("r_regionkey").to_pylist(),
                           reg.column("r_name").to_pylist()))
    nation_region = {
        nk: region_name[rk]
        for nk, rk in zip(nat.column("n_nationkey").to_pylist(),
                          nat.column("n_regionkey").to_pylist())
    }
    ref = ray.put(nation_region)

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"s_nationkey": batch.column("s_nationkey"),
             "acctbal": _cents(batch.column("s_acctbal"))},
            ["s_nationkey"], ["acctbal"], "n_partial")

    tagged = supplier_ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(
            _broadcast_lookup_fn,
            fn_kwargs=dict(mapping_ref=ref, key_col="s_nationkey",
                           out_col="r_name"),
            batch_format="pyarrow")
    agg = coalesce_small(tagged).groupby("r_name").aggregate(
        Sum("acctbal"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": batch.column("r_name"),
            "n_suppliers": pc.cast(batch.column("sum(n_partial)"),
                                   pa.int64()),
            "total_acctbal_cents": pc.cast(batch.column("sum(acctbal)"),
                                           pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def parts_by_brand(part_ds):
    """part rollup -> (p_brand, n_parts, sum_retailprice_cents, max_size):
    per-batch Arrow combiner (sum/max/count by brand), then a tiny
    per-brand global aggregate."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "p_brand": batch.column("p_brand"),
            "price": _cents(batch.column("p_retailprice")),
            "size": batch.column("p_size"),
        })
        g = t.group_by("p_brand").aggregate(
            [("price", "sum"), ("size", "max"), ("p_brand", "count")])
        return pa.table({
            "p_brand": g.column("p_brand"),
            "price": g.column("price_sum"),
            "size": pc.cast(g.column("size_max"), pa.int64()),
            "n_partial": pc.cast(g.column("p_brand_count"), pa.int64()),
        })

    agg = coalesce_small(part_ds.map_batches(partial,
                                             batch_format="pyarrow")) \
        .groupby("p_brand").aggregate(Sum("price"), Max("size"),
                                      Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": batch.column("p_brand"),
            "n_parts": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "sum_retailprice_cents": pc.cast(batch.column("sum(price)"),
                                             pa.int64()),
            "max_size": pc.cast(batch.column("max(size)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def top_customers(orders_ds, *, k: int = 10):
    """Top-k customers by total order price (groupby -> sort -> limit).

    The sort runs on the already-aggregated (one row per customer)
    dataset, never on raw orders. Integer-cents totals make the
    (-total, custkey) order fully deterministic.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"o_custkey": batch.column("o_custkey"),
             "price": _cents(batch.column("o_totalprice"))},
            ["o_custkey"], ["price"], "n_partial")

    agg = coalesce_small(
        orders_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("o_custkey").aggregate(Sum("price"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "n_orders": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "total_price_cents": pc.cast(batch.column("sum(price)"),
                                         pa.int64()),
        })

    renamed = agg.map_batches(rename, batch_format="pyarrow")
    return renamed.sort(["total_price_cents", "o_custkey"],
                        descending=[True, False]).limit(k)


def lines_by_priority(lineitem_ds, orders_ds, *, num_partitions: int = 16):
    """Fact ⋈ fact hash join: lineitem ⋈ orders(status='F') on orderkey,
    rolled up by priority -> (o_orderpriority, n_lines, revenue_e4).

    Neither side of a fact⋈fact join fits a broadcast, so this uses Ray
    Data's native hash-partitioned ``Dataset.join`` (both sides shuffle
    on the key into ``num_partitions`` aggregator actors). What makes it
    scale is what crosses the exchange:

    - lineitem is pruned to (l_orderkey, revenue_e4): the discounted-price
      expression is evaluated per batch BEFORE the shuffle so one int64
      rides the wire instead of two float64s;
    - orders is filtered (o_orderstatus = 'F') and pruned to
      (o_orderkey, o_orderpriority) before the shuffle — predicate and
      projection pushed below the join;
    - the post-join rollup reuses the partial-combiner + tiny-groupby
      shape, so the second shuffle carries one row per (batch × priority).

    At 100 TB size ``num_partitions`` to ~256 MB of pruned join input per
    partition (total_pruned_bytes / 256 MB). Orderkey skew does not arise:
    the build side (orders) is unique per key and the probe side fans out
    at most ~7 lines per order.
    """

    def prune_line(batch: pa.Table) -> pa.Table:
        ext = batch.column("l_extendedprice")
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        disc = batch.column("l_discount")
        if isinstance(disc, pa.ChunkedArray):
            disc = disc.combine_chunks()
        ext_np = ext.to_numpy(zero_copy_only=False).astype(np.float64)
        disc_np = disc.to_numpy(zero_copy_only=False).astype(np.float64)
        rev = np.rint(ext_np * (1 - disc_np) * 10000).astype(np.int64)
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "revenue_e4": pa.array(rev, pa.int64())})

    def prune_orders(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderstatus"), "F")
        t = batch.filter(mask)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_orderpriority": t.column("o_orderpriority")})

    line = lineitem_ds.map_batches(prune_line, batch_format="pyarrow")
    orders = orders_ds.map_batches(prune_orders, batch_format="pyarrow")
    joined = line.join(orders, join_type="inner",
                       num_partitions=num_partitions,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"o_orderpriority": batch.column("o_orderpriority"),
             "rev": batch.column("revenue_e4")},
            ["o_orderpriority"], ["rev"], "n_partial")

    agg = coalesce_small(
        joined.map_batches(partial, batch_format="pyarrow")) \
        .groupby("o_orderpriority").aggregate(Sum("rev"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "n_lines": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "revenue_e4": pc.cast(batch.column("sum(rev)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def lineitem_pricing_summary(lineitem_ds):
    """TPC-H Q1-shaped rollup per (returnflag, linestatus).

    qty scales x100, prices x100 (cents), discounted price x10^4 (two
    2-decimal factors multiply to exactly 4 decimals). avg_qty is the
    exact-int division sum/count — identical doubles on any platform.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ext = batch.column("l_extendedprice")
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        ext_np = ext.to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch.column("l_discount")
        if isinstance(disc, pa.ChunkedArray):
            disc = disc.combine_chunks()
        disc_np = disc.to_numpy(zero_copy_only=False).astype(np.float64)
        disc_e4 = np.rint(ext_np * (1 - disc_np) * 10000).astype(np.int64)
        return _partial_sum_by(
            {"l_returnflag": batch.column("l_returnflag"),
             "l_linestatus": batch.column("l_linestatus"),
             "qty": _cents(batch.column("l_quantity")),
             "base": _cents(batch.column("l_extendedprice")),
             "disc": pa.array(disc_e4, pa.int64())},
            ["l_returnflag", "l_linestatus"], ["qty", "base", "disc"], "n")

    agg = coalesce_small(
        lineitem_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("qty"), Sum("base"), Sum("disc"), Sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        sum_qty = pc.cast(batch.column("sum(qty)"), pa.int64())
        n = pc.cast(batch.column("sum(n)"), pa.int64())
        avg = pc.divide(pc.cast(sum_qty, pa.float64()),
                        pc.multiply(pc.cast(n, pa.float64()),
                                    pa.scalar(100.0)))
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty_e2": sum_qty,
            "sum_base_price_cents": pc.cast(batch.column("sum(base)"),
                                            pa.int64()),
            "sum_disc_price_e4": pc.cast(batch.column("sum(disc)"),
                                         pa.int64()),
            "avg_qty": avg,
            "count_order": n,
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def customers_without_urgent_orders(customer_ds, orders_ds, *,
                                    num_partitions: int = 8):
    """Anti-join: customers that never placed a 1-URGENT order ->
    (c_custkey, c_name).

    The "unmatched keys" op a broadcast can't serve once BOTH sides are
    fact-scale: a native hash-partitioned ``left_anti`` join. Both sides
    are pruned before the shuffle — customers to (key, name); orders are
    filtered (predicate pushed below the join) then collapsed to
    per-batch DISTINCT custkeys (the anti probe only needs existence, so
    the combiner collapses repeat orderers to one row per batch).
    """

    def slim_c(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "c_name": batch.column("c_name")})

    def slim_o(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("o_orderpriority"),
                                  "1-URGENT"))
        col = t.column("o_custkey")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"o_custkey": pc.unique(col)})

    left = customer_ds.map_batches(slim_c, batch_format="pyarrow")
    right = orders_ds.map_batches(slim_o, batch_format="pyarrow")
    return left.join(right, join_type="left_anti",
                     num_partitions=num_partitions,
                     on=("c_custkey",), right_on=("o_custkey",))


def top_k_per_group(ds, *, group_col: str, order_col: str, k: int,
                    tie_col: str, keep_cols: list[str]):
    """Per-group top-k rows by ``order_col`` DESC (ties broken by
    ``tie_col`` ASC — fully deterministic).

    Two-phase like every other rollup here: each batch prunes itself to
    at most k rows per group (the combiner), so the shuffle carries
    <= k x groups x blocks rows; the groupby().map_groups then takes the
    global top-k per group. No global sort."""
    import pandas as pd  # noqa: F401  (map_groups pandas path)

    cols = list(dict.fromkeys([group_col, order_col, tie_col] + keep_cols))

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df.sort_values([group_col, order_col, tie_col],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby(group_col, sort=False)
                                    .head(k), preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([order_col, tie_col],
                              ascending=[False, True]).head(k)
        return g[cols].reset_index(drop=True)

    return ds.map_batches(prune, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final, batch_format="pandas")


def top_docs_per_lang(docs_ds, *, k: int = 3):
    """Top-k longest documents per language -> (lang, doc_id, n_chars)."""
    return top_k_per_group(docs_ds, group_col="lang", order_col="n_chars",
                           k=k, tie_col="doc_id", keep_cols=["doc_id"])


def events_quantiles(events_ds, *, qs: tuple = (0.5, 0.9, 0.99)):
    """Exact discrete quantiles of ``value`` per event_type ->
    (event_type, p50, p90, p99).

    quantile_disc semantics (an actual element is returned, no
    interpolation — so results hash-match an independent SQL computation
    bit-for-bit): element at index ceil(q*n)-1 of the sorted values.

    Partitioning assumption: one event_type's values fit one worker
    (map_groups). For heavy-hitter types at 100 TB, swap the final for a
    two-pass histogram refine: per-batch fixed-width histograms merge in
    a tiny groupby, then a second pass scans only the boundary bucket.
    """
    import math

    import pandas as pd

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch.column("event_type"),
                         "value": batch.column("value")})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(group["value"].to_numpy())
        n = v.size
        row = {"event_type": group["event_type"].iloc[0]}
        for q in qs:
            row[f"p{int(q * 100)}"] = float(v[max(0, math.ceil(q * n) - 1)])
        return pd.DataFrame([row])

    return events_ds.map_batches(slim, batch_format="pyarrow") \
        .groupby("event_type").map_groups(final, batch_format="pandas")


def events_hopping(ds, *, size_hours: int = 2, hop_hours: int = 1):
    """Hopping (sliding) window rollup: (window_start, event_type) ->
    count, sum over [window_start, window_start + size).

    The overlapping-window aggregate, composed streaming-style: each
    event is fanned out to its size/hop owning windows INSIDE the batch
    (vectorized repeat — the fan-out never crosses a task boundary
    un-aggregated), partial-aggregated per block, then a tiny global
    groupby. Late data needs no watermark: windows are pure functions of
    event time, so stragglers fold into the same keys.

    Shuffle cost is (size/hop) x the tumbling case per block BEFORE the
    per-block combiner collapses it to one row per (window, type) —
    identical post-combiner row counts, so the wide step does not grow
    with overlap.
    """
    from ray.data.aggregate import Sum

    k = size_hours // hop_hours
    assert size_hours % hop_hours == 0, "size must be a multiple of hop"
    HOP_US = hop_hours * 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        base = (ts // HOP_US) * HOP_US      # newest window containing ts
        # k owning windows: base, base - hop, ..., base - (k-1)*hop
        starts = (base[None, :] - (np.arange(k, dtype=np.int64)[:, None]
                                   * HOP_US)).ravel()
        etype = batch.column("event_type")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        v = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        n = len(ts)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), k))
        return _partial_sum_by(
            {"window_start": pa.array(starts).cast(pa.timestamp("us")),
             "event_type": etype.take(idx),
             "v": pa.array(np.tile(v, k), pa.int64())},
            ["window_start", "event_type"], ["v"], "n_partial")

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["window_start", "event_type"]).aggregate(
            Sum("v"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": batch.column("window_start"),
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n_partial)"), pa.int64()),
            "sum_value_cents": pc.cast(batch.column("sum(v)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def events_quantiles_twopass(events_ds, *, qs: tuple = (0.5, 0.9, 0.99),
                             n_buckets: int = 512):
    """Exact per-group discrete quantiles WITHOUT materializing any
    group — the scale path events_quantiles' docstring promises, for
    heavy-hitter groups that cannot fit one worker.

    Three streaming passes over the value column (each a map-side
    partial + tiny groupby; only per-group metadata ever reaches the
    driver):

      1. per-type (count, min, max);
      2. per-type fixed-width histogram -> cumulative ranks -> the ONE
         boundary bucket per requested quantile;
      3. re-scan collecting only boundary-bucket values (~n/n_buckets
         per type) and rank-select the exact element.

    Returns the same (event_type, p50, p90, p99) rows as
    events_quantiles, bit-for-bit (actual elements are selected, so
    float bucketing arithmetic never leaks into results). Degenerate
    distributions (one value, or extreme skew into one bucket) fall
    back to collecting that bucket whole — cap n_buckets x skew by
    recursing on the bucket if that ever exceeds worker memory.
    """
    import math

    from ray.data.aggregate import Max, Min, Sum

    # -- pass 1: count/min/max per type ------------------------------------
    def p1(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "value": batch.column("value")})
        g = t.group_by("event_type").aggregate(
            [("value", "count"), ("value", "min"), ("value", "max")])
        return pa.table({
            "event_type": g.column("event_type"),
            "n": pc.cast(g.column("value_count"), pa.int64()),
            "lo": g.column("value_min"),
            "hi": g.column("value_max"),
        })

    stats = coalesce_small(events_ds.map_batches(p1,
                                                 batch_format="pyarrow")) \
        .groupby("event_type").aggregate(Sum("n"), Min("lo"), Max("hi")) \
        .take_all()
    meta = {r["event_type"]: (int(r["sum(n)"]), float(r["min(lo)"]),
                              float(r["max(hi)"])) for r in stats}

    def bucket_of(types, values):
        out = np.zeros(len(values), dtype=np.int64)
        for et, (n, lo, hi) in meta.items():
            m = types == et
            if hi > lo:
                w = (hi - lo) / n_buckets
                out[m] = np.clip(((values[m] - lo) / w).astype(np.int64),
                                 0, n_buckets - 1)
        return out

    # -- pass 2: histogram -> boundary buckets ------------------------------
    def p2(batch: pa.Table) -> pa.Table:
        types = np.asarray(batch.column("event_type").to_pylist())
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        return _partial_sum_by(
            {"event_type": pa.array(types),
             "bucket": pa.array(bucket_of(types, vals), pa.int64())},
            ["event_type", "bucket"], [], "cnt")

    hist = coalesce_small(events_ds.map_batches(p2,
                                                batch_format="pyarrow")) \
        .groupby(["event_type", "bucket"]).aggregate(Sum("cnt")).take_all()
    counts: dict[str, dict[int, int]] = {}
    for r in hist:
        counts.setdefault(r["event_type"], {})[int(r["bucket"])] = \
            int(r["sum(cnt)"])

    # boundary bucket + in-bucket rank per (type, quantile)
    need: dict[str, dict[int, list]] = {}  # type -> bucket -> [(q, k)]
    for et, (n, lo, hi) in meta.items():
        cum = 0
        ranks = {q: max(0, math.ceil(q * n) - 1) for q in qs}
        per_bucket = sorted(counts.get(et, {}).items())
        for q in sorted(qs):
            target = ranks[q]
            cum = 0
            for b, c in per_bucket:
                if cum + c > target:
                    need.setdefault(et, {}).setdefault(b, []).append(
                        (q, target - cum))
                    break
                cum += c

    # -- pass 3: collect boundary buckets, rank-select ----------------------
    def p3(batch: pa.Table) -> pa.Table:
        types = np.asarray(batch.column("event_type").to_pylist())
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        buckets = bucket_of(types, vals)
        keep = np.zeros(len(vals), dtype=bool)
        for et, bmap in need.items():
            m = types == et
            keep |= m & np.isin(buckets, list(bmap))
        return pa.table({
            "event_type": pa.array(types[keep]),
            "bucket": pa.array(buckets[keep], pa.int64()),
            "value": pa.array(vals[keep], pa.float64()),
        })

    import pandas as pd

    def select(group: pd.DataFrame) -> pd.DataFrame:
        et = group["event_type"].iloc[0]
        b = int(group["bucket"].iloc[0])
        v = np.sort(group["value"].to_numpy())
        rows = [{"event_type": et, "q": q, "value": float(v[k])}
                for (q, k) in need[et][b]]
        return pd.DataFrame(rows)

    picked = coalesce_small(events_ds.map_batches(p3,
                                                  batch_format="pyarrow")) \
        .groupby(["event_type", "bucket"]) \
        .map_groups(select, batch_format="pandas").take_all()

    # tiny pivot (|types| x |qs| rows) -> one row per type
    byq: dict[str, dict[float, float]] = {}
    for r in picked:
        byq.setdefault(r["event_type"], {})[float(r["q"])] = r["value"]
    ets = sorted(meta)
    cols: dict = {"event_type": pa.array(ets, pa.string())}
    for q in qs:
        cols[f"p{int(q * 100)}"] = pa.array(
            [byq.get(et, {}).get(q, meta[et][1]) for et in ets],
            pa.float64())

    import ray.data

    return ray.data.from_arrow(pa.table(cols))


def running_totals(events_ds):
    """Per-user running cumulative sum: emits (event_id, user_id, ts,
    running_value) where running_value = sum of the user's ``value``
    over all their events up to and including this one, ordered by
    (ts, event_id).

    The canonical SQL window function (``SUM(value) OVER (PARTITION BY
    user ORDER BY ts ROWS UNBOUNDED PRECEDING)``) expressed Ray-Data-
    first: one groupby(user_id) hash shuffle, then an in-task
    sort+cumsum per group — prefix state never crosses users. For a
    single key whose history exceeds one task (no per-user key does
    here), the bucket-histogram exclusive-scan of
    ``conversations.pack_sequences_global`` is the fallback shape.
    """
    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        vals = g.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "running_value": pa.array(np.cumsum(vals), pa.float64()),
        })

    return per_key_in_buckets(events_ds, "user_id", scan)


def daily_active_users(events_ds):
    """(day, dau): the canonical exact count-distinct rollup.

    Two-phase distinct: per-batch dedup collapses each block to its
    distinct (day, user) pairs (a block shrinks ~events-per-user-day x
    before anything shuffles), one groupby(day, user) makes the pairs
    globally unique, a second per-batch combiner counts pairs per day,
    and the final groupby(day) sums partial counts. Both shuffles carry
    only (day, user[, count]) rows — never events. For approximate-at-
    scale, swap phase 2+ for the KMV sketch (`sketches.kmv_distinct`)
    keyed by day and skip the pair-level shuffle entirely.
    """
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "user_id": batch.column("user_id"),
        })
        return t.group_by(["day", "user_id"]).aggregate([])

    # .count() (not map_groups) — one vectorized aggregate pass yields
    # exactly one row per distinct (day, user)
    uniq = coalesce_small(
        events_ds.map_batches(pairs, batch_format="pyarrow")) \
        .groupby(["day", "user_id"]).count()

    def count_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("day").aggregate([("user_id", "count")])
        return pa.table({
            "day": agg.column("day"),
            "partial_n": pc.cast(agg.column("user_id_count"), pa.int64()),
        })

    final = coalesce_small(
        uniq.map_batches(count_partial, batch_format="pyarrow")) \
        .groupby("day").aggregate(Sum("partial_n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch.column("day"),
            "dau": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })

    return final.map_batches(rename, batch_format="pyarrow")


def events_json_rollup(events_ds, *, key: str = "k"):
    """Semi-structured extraction + rollup: parse the ``props`` JSON
    column, pull ``key``, aggregate per event_type -> (event_type,
    n_events, sum_k, avg_k).

    The schema-on-read op: JSON stays opaque through storage and is
    parsed VECTORIZED inside map_batches only in the one stage that
    needs it (never materialized as a parsed column corpus-wide), and
    the per-batch combiner collapses each block to one row per
    event_type before the (tiny) groupby shuffle. At 100 TB the parse
    cost dominates — it rides the embarrassingly-parallel map, while
    the shuffle carries a few dozen rows per block.
    """
    import json

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p)[key] for p in batch.column("props").to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        return _partial_sum_by(
            {"event_type": batch.column("event_type"),
             "k": pa.array(ks)},
            ["event_type"], ["k"], "n_partial")

    agg = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("event_type").aggregate(Sum("k"), Sum("n_partial"))

    def rename(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("sum(n_partial)"), pa.int64())
        sk = pc.cast(batch.column("sum(k)"), pa.int64())
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": n,
            "sum_k": sk,
            "avg_k": pc.divide(pc.cast(sk, pa.float64()),
                               pc.cast(n, pa.float64())),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def lang_source_crosstab(docs_ds, *, langs=("de", "en", "es", "fr", "zh")):
    """Pivot/crosstab: documents -> one row per source with a count
    column per language (n_de, n_en, ...).

    The reshape op Ray Data lacks natively: a per-batch (source, lang)
    count combiner feeds one groupby(source) over long-form partials;
    the wide reshape happens in the post-aggregate map over the
    already-tiny distinct-source table. Pivot columns must be a KNOWN
    set (``langs``) — discovering them takes a cheap distinct pass
    first; an unknown/unbounded pivot domain is a design smell at
    scale (it turns one column into millions).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["source", "lang"])
        agg = t.group_by(["source", "lang"]).aggregate([("lang", "count")])
        return pa.table({
            "source": agg.column("source"),
            "lang": agg.column("lang"),
            "partial_n": pc.cast(agg.column("lang_count"), pa.int64()),
        })

    agg = coalesce_small(
        docs_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["source", "lang"]).aggregate(Sum("partial_n"))

    def widen(group: pa.Table) -> pa.Table:
        counts = dict.fromkeys(langs, 0)
        for lang, n in zip(group.column("lang").to_pylist(),
                           group.column("sum(partial_n)").to_pylist()):
            if lang in counts:
                counts[lang] = n
        cols = {"source": pa.array([group.column("source")[0].as_py()],
                                   pa.string())}
        for lang in langs:
            cols[f"n_{lang}"] = pa.array([counts[lang]], pa.int64())
        return pa.table(cols)

    return agg.groupby("source").map_groups(widen, batch_format="pyarrow")


def profile_numeric(ds, cols: list[str]):
    """Data-quality profiling: one row per column with (column, n_rows,
    n_nulls, min_v, max_v, sum_v, mean_v) — the `describe` pass every
    ingest pipeline runs before trusting a new drop of data.

    Single streaming pass, no shuffle at all: each batch collapses to
    one partial row per profiled column (min/max/sum/counts), the
    driver folds the tiny partial stream (blocks x cols rows of five
    numbers — folding on the driver is exact and O(cols), not a
    distributed-aggregate job). Sums accumulate as integer CENTS
    (round(v*100) in int64) so they are order-independent and exact —
    a float sum folded in a different order than the SQL oracle's
    drifts past hash tolerance at ~1e9 magnitudes. Mean is one final
    division.
    """
    def partial(batch: pa.Table) -> pa.Table:
        names, mins, maxs, sums, nnull, nrow = [], [], [], [], [], []
        for c in cols:
            col = batch.column(c)
            names.append(c)
            nrow.append(batch.num_rows)
            nnull.append(col.null_count)
            valid = col.drop_null()
            if len(valid):
                v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
                mins.append(float(v.min()))
                maxs.append(float(v.max()))
                sums.append(int(np.rint(v * 100).astype(np.int64).sum()))
            else:
                mins.append(None)
                maxs.append(None)
                sums.append(0)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "p_min": pa.array(mins, pa.float64()),
            "p_max": pa.array(maxs, pa.float64()),
            "p_sum": pa.array(sums, pa.int64()),
            "p_nulls": pa.array(nnull, pa.int64()),
            "p_rows": pa.array(nrow, pa.int64()),
        })

    acc: dict[str, list] = {c: [None, None, 0, 0, 0] for c in cols}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for name, mn, mx, sm, nl, nr in zip(
                b.column("column").to_pylist(), b.column("p_min").to_pylist(),
                b.column("p_max").to_pylist(), b.column("p_sum").to_pylist(),
                b.column("p_nulls").to_pylist(),
                b.column("p_rows").to_pylist()):
            a = acc[name]
            if mn is not None:
                a[0] = mn if a[0] is None else min(a[0], mn)
                a[1] = mx if a[1] is None else max(a[1], mx)
            a[2] += sm
            a[3] += nl
            a[4] += nr
    rows = {
        "column": [], "n_rows": [], "n_nulls": [], "min_v": [],
        "max_v": [], "sum_v": [], "mean_v": [],
    }  # sum_v accumulates cents; emitted as sum_cents
    for c in cols:
        mn, mx, sm, nl, nr = acc[c]
        rows["column"].append(c)
        rows["n_rows"].append(nr)
        rows["n_nulls"].append(nl)
        rows["min_v"].append(mn)
        rows["max_v"].append(mx)
        rows["sum_v"].append(sm)   # integer cents
        nv = nr - nl
        rows["mean_v"].append((sm / 100.0) / nv if nv else None)
    return pa.table({
        "column": pa.array(rows["column"], pa.string()),
        "n_rows": pa.array(rows["n_rows"], pa.int64()),
        "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
        "min_v": pa.array(rows["min_v"], pa.float64()),
        "max_v": pa.array(rows["max_v"], pa.float64()),
        "sum_cents": pa.array(rows["sum_v"], pa.int64()),
        "mean_v": pa.array(rows["mean_v"], pa.float64()),
    })


def rank_rows(ds, *, key_col: str = "n_chars", id_col: str = "doc_id",
              ntile_k: int = 8):
    """Distributed exact RANK / ROW_NUMBER / NTILE over (key, id) with
    NO global sort — the order-statistics window family
    (``rank() OVER (ORDER BY key)``, ``row_number()/ntile(k) OVER
    (ORDER BY key, id)``) Ray Data lacks natively.

    Scale shape (value-histogram prefix-sum idiom, same family as
    length_percentile_filter / epoch_shuffle):
      pass 1: per-batch value-count combiner -> one tiny groupby(key)
          -> the driver sorts the O(distinct keys) histogram and takes
          an exclusive scan: each key value's global offset. Discrete
          keys (lengths, scores, dates) keep this driver-sized; for
          continuous keys quantize to range buckets first.
      pass 2: groupby(key).map_groups — each value group sorts its own
          rows by ``id_col`` and emits offset + local position. Only
          (key, id) pairs ride the shuffle. Skew note: one hot key
          value = one group task; sub-bucket by id range inside the
          value (pack_sequences_global-style) if a single key dominates.

    rank  = value offset + 1 (ties share it, SQL RANK semantics);
    ntile = standard SQL split of n rows into k tiles where the first
    n % k tiles get one extra row, over the (key, id) total order.

    Returns (id_col, key_col, rnk:int64, row_num:int64, tile:int64).
    """
    import numpy as np
    import pandas as pd

    import ray

    from ray.data.aggregate import Sum

    from ..stages.util import coalesce_small

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select([key_col]).group_by(key_col) \
            .aggregate([(key_col, "count")])
        return pa.table({
            key_col: agg.column(key_col),
            "partial_n": pc.cast(agg.column(f"{key_col}_count"), pa.int64()),
        })

    hist = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(key_col).aggregate(Sum("partial_n")).take_all()
    pairs = sorted((r[key_col], r["sum(partial_n)"]) for r in hist)
    n_total = sum(c for _, c in pairs)
    offsets: dict = {}
    cum = 0
    for v, c in pairs:
        offsets[v] = cum
        cum += c
    oref = ray.put(offsets)
    q, r = divmod(n_total, ntile_k)

    def number(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)[group[key_col].iloc[0]]
        g = group.sort_values(id_col).reset_index(drop=True)
        row_num = off + 1 + np.arange(len(g), dtype=np.int64)
        big = q + 1
        in_big = row_num <= r * big
        tile = np.where(
            in_big,
            (row_num - 1) // big + 1,
            # q > 0 whenever any row falls past the first r big tiles
            r + (row_num - r * big - 1) // max(q, 1) + 1,
        )
        return pd.DataFrame({
            id_col: g[id_col],
            key_col: g[key_col],
            "rnk": np.full(len(g), off + 1, dtype=np.int64),
            "row_num": row_num,
            "tile": tile.astype(np.int64),
        })

    import pandas as _pd

    return per_key_in_buckets(
        ds.select_columns([id_col, key_col]), key_col,
        lambda t: pa.Table.from_pandas(number(t.to_pandas()),
                                       preserve_index=False))


def events_rollup_sets(ds):
    """GROUP BY ROLLUP(event_type, day): the grouping-sets aggregate —
    (event_type, day) detail rows plus per-event_type subtotals plus
    one grand total. Rolled-up key slots are coalesced to sentinels
    ('' / epoch) rather than SQL NULL so downstream exact comparison
    (and Parquet predicate pushdown on the key columns) stays trivial;
    the (sentinel, sentinel) pattern is the GROUPING id.

    Scale shape: exactly ONE shuffle, at the finest grain (per-block
    cents combiner -> groupby(event_type, day)); the coarser levels are
    derived from the finest aggregate, whose size is the key domain
    (types x days), not the row count — it is pulled to the driver and
    re-summed in exact integer arithmetic. For huge key domains, swap
    the driver fold for two more tiny groupbys over the same aggregate
    table; the input is still read once either way.

    Returns (event_type, day, n_events:int64, sum_value_cents:int64).
    """
    import ray.data

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        return _partial_sum_by(
            {"event_type": batch.column("event_type"), "day": day,
             "v": _cents(batch.column("value"))},
            ["event_type", "day"], ["v"], "n_partial")

    finest = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "day"]).aggregate(Sum("v"), Sum("n_partial")) \
        .take_all()

    types, days, ns, sums = [], [], [], []
    by_type: dict = {}
    tot_n = tot_s = 0
    for r in finest:
        n, s = int(r["sum(n_partial)"]), int(r["sum(v)"])
        types.append(r["event_type"])
        days.append(r["day"])
        ns.append(n)
        sums.append(s)
        a = by_type.setdefault(r["event_type"], [0, 0])
        a[0] += n
        a[1] += s
        tot_n += n
        tot_s += s
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    for t in sorted(by_type):
        types.append(t)
        days.append(epoch)
        ns.append(by_type[t][0])
        sums.append(by_type[t][1])
    if finest:
        types.append("")
        days.append(epoch)
        ns.append(tot_n)
        sums.append(tot_s)

    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "day": pa.array(days, pa.timestamp("us")),
        "n_events": pa.array(ns, pa.int64()),
        "sum_value_cents": pa.array(sums, pa.int64()),
    }))


def explode_list(ds, *, id_col: str, list_col: str, val_name: str = "val"):
    """UNNEST WITH ORDINALITY over a list column -> one row per element
    (id, idx:int64 0-based, val). Pure in-batch fan-out, fully Arrow-
    vectorized (list_flatten + list_parent_indices; ordinals from one
    arange minus repeated starts) — no shuffle, streams at any scale.
    """
    import numpy as np

    def fan(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat = pc.list_flatten(col)
        parent = pc.list_parent_indices(col)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        idx = np.arange(int(lens.sum()), dtype=np.int64) - starts
        return pa.table({
            id_col: ids.take(parent),
            "idx": pa.array(idx, pa.int64()),
            val_name: flat,
        })

    return ds.map_batches(fan, batch_format="pyarrow")


def value_histogram(ds, *, col: str = "value", width_cents: int = 500):
    """Fixed-width value histogram -> (bin_start_cents:int64, n:int64).

    Per-block bin-count combiner -> one groupby(bin): the shuffle
    carries O(bins x blocks) rows. Bins are floor(cents / width) so
    negative values land in the correct bucket (floor, not
    truncate-toward-zero division).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column(col)).to_numpy()
        bins = np.floor_divide(cents, width_cents)
        t = pa.table({"b": pa.array(bins, pa.int64())})
        g = t.group_by("b").aggregate([("b", "count")])
        return pa.table({
            "b": g.column("b"),
            "partial_n": pc.cast(g.column("b_count"), pa.int64()),
        })

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("b").aggregate(Sum("partial_n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bin_start_cents": pc.multiply(
                pc.cast(batch.column("b"), pa.int64()),
                pa.scalar(width_cents, pa.int64())),
            "n": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def pearson_corr(ds, *, x_col: str, y_col: str):
    """Distributed EXACT Pearson correlation of two numeric columns in
    one pass -> a single (n, corr) row.

    Values are scaled to integer cents; each block emits exact int64
    partial moments (n, sx, sy, sxx, syy, sxy) — block sums stay well
    under 2^63 — and the driver folds them in arbitrary-precision
    Python ints, so the final
        corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))
    is computed from EXACT integer moments with one fixed float
    expression, bit-identical to a SQL oracle writing the same formula
    over HUGEINT sums. No shuffle at all: the per-block moment rows
    stream straight to the driver fold (6 ints per block).
    """
    import math

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column(x_col)).to_numpy().astype(object)
        y = _cents(batch.column(y_col)).to_numpy().astype(object)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(sum(x))], pa.int64()),
            "sy": pa.array([int(sum(y))], pa.int64()),
            "sxx": pa.array([int(sum(xx * xx for xx in x))], pa.int64()),
            "syy": pa.array([int(sum(yy * yy for yy in y))], pa.int64()),
            "sxy": pa.array([int(sum(xx * yy for xx, yy in zip(x, y)))],
                            pa.int64()),
        })

    import ray.data

    # cap batch rows so int64 block partials can't overflow:
    # 8192 * (1e7 cents)^2 ~ 8e17 << 2^63
    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=8192).take_all()
    n = sx = sy = sxx = syy = sxy = 0
    for r in rows:
        n += r["n"]
        sx += r["sx"]
        sy += r["sy"]
        sxx += r["sxx"]
        syy += r["syy"]
        sxy += r["sxy"]
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) \
        * math.sqrt(float(n * syy - sy * sy))
    corr = num / den if den else None
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "corr": pa.array([corr], pa.float64()),
    }))


def mad_outliers(events_ds, *, k: int = 3):
    """Robust per-user anomaly flags via median / MAD (median absolute
    deviation) in EXACT integer cents -> (event_id, user_id,
    value_cents, med_cents, mad_cents, is_outlier).

    Median uses the discrete-quantile rule (element at ceil(q*n)-1 of
    the sorted values — quantile_disc semantics), so med/MAD are actual
    data elements and the whole result is bit-exact against a SQL
    oracle; no float statistics anywhere. Mean/stddev z-scores are NOT
    order-reproducible in floating point, which is why the robust
    variant is the one that ships.

    Shuffle shape: one hash-BUCKET exchange on user_id (users x blocks
    rows of 3 slim columns); per-USER work inside the bucket is two
    sorts of that user's values — in-process numpy per segment, one
    pandas/Arrow conversion per bucket rather than one per entity.
    Per-entity segments are user-sized; if a single entity outgrows a
    task, swap the in-segment sort for the histogram-refine pass used
    by events_quantiles_scalable.
    """
    import math

    from ..stages.util import bucketed_map_groups

    def per_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl, sort_keys=[("user_id", "ascending")])
        g = tbl.take(order)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        v = np.rint(g.column("value").to_numpy(zero_copy_only=False)
                    .astype(np.float64) * 100).astype(np.int64)
        n = len(v)
        med = np.empty(n, np.int64)
        mad = np.empty(n, np.int64)
        bounds = np.nonzero(np.concatenate(
            ([True], uid[1:] != uid[:-1], [True])))[0] if n else []
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = v[s:e]
            qi = max(0, math.ceil(0.5 * (e - s)) - 1)
            m = int(np.sort(seg)[qi])
            a = np.abs(seg - m)
            med[s:e] = m
            mad[s:e] = int(np.sort(a)[qi])
        ad = np.abs(v - med)
        return pa.table({
            "event_id": g.column("event_id").cast(pa.int64()),
            "user_id": g.column("user_id").cast(pa.int64()),
            "value_cents": pa.array(v, pa.int64()),
            "med_cents": pa.array(med, pa.int64()),
            "mad_cents": pa.array(mad, pa.int64()),
            "is_outlier": pa.array(ad > k * mad),
        })

    return bucketed_map_groups(
        events_ds.select_columns(["event_id", "user_id", "value"]),
        "user_id", per_bucket)


def _key_bloom_positions(col, m_bits) -> "np.ndarray":
    """(n, k) uint64 Bloom probe positions for a KEY column, fully
    vectorized — no per-row Python. Keys hash through the shared
    util.key_u64 representation (int64 cast / pandas siphash) and two
    splitmix64 finalizers. Kirsch-Mitzenmacher double hashing like
    dedup._bloom_positions (h2 forced odd), but a different hash
    family: a Bloom built here must be probed here."""
    from ..stages.util import SPLITMIX_GAMMA, key_u64, splitmix64

    v = key_u64(col)
    h1 = splitmix64(v)
    h2 = splitmix64(v ^ np.uint64(SPLITMIX_GAMMA)) | np.uint64(1)
    js = np.arange(_KEY_BLOOM_K, dtype=np.uint64)
    # uint64 wraparound is part of the hash
    return (h1[:, None] + js * h2[:, None]) % np.uint64(m_bits)


_KEY_BLOOM_K = 7


def bloom_semi_join(fact_ds, dim_ds, *, fact_key: str, dim_key: str,
                    m_bits: int = 1 << 20, num_partitions: int = 8):
    """Exact semi join with a CONSTANT-size Bloom prefilter pushed
    below the shuffle: keep fact rows whose key appears in dim.

    The classic 100 TB join optimization — the dim side's keys fold
    into a packed Bloom bitmap (distributed build, driver holds
    m_bits/8 bytes; see dedup.snapshot_bloom), every fact task drops
    non-matching rows map-side (no false negatives, ~1% false
    positives at 10 bits/key), and only the surviving sliver rides the
    native hash-partitioned left_semi join that removes the false
    positives. Result is EXACT; the Bloom only shrinks the exchange.
    """
    import ray

    from ..pipelines.dedup import bloom_from_positions
    from ..stages.util import coalesce_small

    bits_ref = ray.put(bloom_from_positions(
        dim_ds.select_columns([dim_key]),
        lambda b: _key_bloom_positions(b.column(dim_key), m_bits),
        m_bits=m_bits))

    def prefilter(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        pos = _key_bloom_positions(batch.column(fact_key), m_bits)
        hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1) \
            .all(axis=1)
        return batch.filter(pa.array(hit))

    def dim_slim(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column(dim_key))
        return pa.table({fact_key: u})

    def dim_unique(batch: pa.Table) -> pa.Table:
        return pa.table({fact_key: pc.unique(batch.column(fact_key))})

    # survivors stay un-coalesced: they are WIDE fact rows and the
    # left_semi hash join repartitions them anyway — an extra merge
    # pass here copies the whole surviving payload for nothing.
    survivors = fact_ds.map_batches(prefilter, batch_format="pyarrow")
    # the right side needs no GLOBAL dedup: left_semi is existence —
    # duplicate right keys can't multiply left rows. Two block-local
    # unique passes (pre- and post-coalesce) bound residual dupes at
    # one per key per merged block, far cheaper than a per-key shuffle.
    dim_keys = coalesce_small(
        dim_ds.select_columns([dim_key]).map_batches(
            dim_slim, batch_format="pyarrow")) \
        .map_batches(dim_unique, batch_format="pyarrow")
    return survivors.join(dim_keys, join_type="left_semi",
                          num_partitions=num_partitions, on=(fact_key,))


def revenue_share_by_nation(orders_ds, customer_path: str,
                            nation_path: str):
    """Ratio-to-report: each nation's share of total revenue ->
    (n_name, revenue_cents, share) — the ``sum(x) OVER () /
    percent-of-total`` window family.

    Built ON the already-reduced revenue_by_nation aggregate (nation
    cardinality), so the share step is a driver-side exact-integer
    total + one map over ~25 rows; the single int/int division makes
    the float bit-exact against the SQL oracle.
    """
    import ray.data

    rows = revenue_by_nation(orders_ds, customer_path,
                             nation_path).take_all()
    total = sum(r["revenue_cents"] for r in rows)
    rows.sort(key=lambda r: r["n_name"])
    return ray.data.from_arrow(pa.table({
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "revenue_cents": pa.array([r["revenue_cents"] for r in rows],
                                  pa.int64()),
        "share": pa.array([r["revenue_cents"] / total for r in rows]
                          if total else [], pa.float64()),
    }))


def key_skew_report(ds, *, key_col: str, top_k: int = 20):
    """Hot-key diagnostic for shuffle planning -> the ``top_k``
    heaviest keys as (key, n, frac of all rows). Run this BEFORE
    keying a groupby/join on a column at scale: a key with frac >>
    1/num_partitions is the straggler — salt it (see
    conversations.py's block-salted assembly) or broadcast it.

    Shape: per-batch count combiner -> one groupby(key); total and the
    sort+limit run on the already-reduced distinct-key table.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col]).group_by(key_col).aggregate(
            [(key_col, "count")])
        return pa.table({
            key_col: g.column(key_col),
            "pn": pc.cast(g.column(f"{key_col}_count"), pa.int64()),
        })

    agg = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(key_col).aggregate(Sum("pn")).materialize()
    total = agg.sum("sum(pn)") or 0

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("sum(pn)"), pa.int64())
        return pa.table({
            key_col: batch.column(key_col),
            "n": n,
            "frac": pc.divide(pc.cast(n, pa.float64()),
                              pa.scalar(float(total))),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["n", key_col], descending=[True, False]).limit(top_k)


def rolling_avg_events(events_ds, *, window_rows: int = 5):
    """Per-user moving average over the last ``window_rows`` events ->
    (event_id, user_id, ts, avg_cents:float64) — the ROWS-frame window
    aggregate (``AVG(...) OVER (PARTITION BY user ORDER BY ts ROWS
    BETWEEN k-1 PRECEDING AND CURRENT ROW)``).

    One hash-BUCKET exchange on user_id; the rolling sum runs per
    bucket as a segment-guarded prefix-sum over exact int64 cents
    (window sum = cum[i] - cum[i-w], clamped at each user's segment
    start) with a single final division, so every value is bit-exact
    against the SQL oracle (never rolling-mean floats directly —
    incremental float means drift) and no per-entity task or pandas
    conversion exists at any user count.
    """
    from ..stages.util import bucketed_map_groups

    def per_bucket(tbl: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            tbl, sort_keys=[("user_id", "ascending"),
                            ("ts", "ascending"),
                            ("event_id", "ascending")])
        g = tbl.take(order)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.rint(g.column("value").to_numpy(zero_copy_only=False)
                        .astype(np.float64) * 100).astype(np.int64)
        n = len(cents)
        first = np.ones(n, bool)
        if n:
            first[1:] = uid[1:] != uid[:-1]
        seg_first = np.maximum.accumulate(
            np.where(first, np.arange(n), 0)) if n else first
        pos = np.arange(n) - seg_first          # 0-based rank in segment
        cum = np.cumsum(cents)
        # exclusive prefix before the window start, clamped to segment
        start = np.maximum(np.arange(n) - window_rows + 1, seg_first)
        prev = np.where(start > 0, cum[start - 1], 0)
        # start == 0 only for the very first row(s); subtract nothing
        prev = np.where(start == 0, 0, prev)
        wsum = cum - prev
        wcnt = np.minimum(pos + 1, window_rows)
        return pa.table({
            "event_id": g.column("event_id").cast(pa.int64()),
            "user_id": g.column("user_id").cast(pa.int64()),
            "ts": g.column("ts"),
            "avg_cents": pa.array(wsum / wcnt, pa.float64()),
        })

    return bucketed_map_groups(
        events_ds.select_columns(["event_id", "user_id", "ts", "value"]),
        "user_id", per_bucket)


def compact_latest(events_ds, *, key_cols: list[str],
                   order_col: str = "ts", tie_col: str = "event_id"):
    """Log compaction / upsert semantics: keep only the LATEST row per
    key, ordered by (order_col, tie_col) -> the changelog-to-snapshot
    op (Kafka compacted topics, CDC table materialization).

    Two-level argmax: a per-batch combiner keeps one candidate row per
    key per block (so the shuffle carries keys x blocks rows, not the
    log), then one groupby(keys) picks the global winner with the same
    deterministic (order_col DESC, tie_col DESC) rule. The combiner is
    zero-copy Arrow (sort_indices + adjacent-key first-mask, the
    exact_dedup_combine_batch idiom) — the full stream never pays an
    Arrow->pandas round trip.
    """
    def keep_latest(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch,
            sort_keys=[(k, "ascending") for k in key_cols]
            + [(order_col, "descending"), (tie_col, "descending")])
        srt = batch.take(order)
        first = np.ones(srt.num_rows, bool)
        if srt.num_rows:
            first[1:] = False
            # a row starts a new key when ANY key column changed
            for k in key_cols:
                col = srt.column(k).to_numpy(zero_copy_only=False)
                first[1:] |= col[1:] != col[:-1]
        return srt.filter(pa.array(first))

    combined = events_ds.map_batches(keep_latest, batch_format="pyarrow")
    return per_key_in_buckets(combined, key_cols, keep_latest)


def user_first_last(events_ds):
    """Per-entity FIRST/LAST event (the arg_min/arg_max aggregate) ->
    (user_id, first_event:int64, first_ts, last_event:int64, last_ts).

    Two-level argmin/argmax: each block keeps one candidate row per
    user, the groupby folds candidates with the same rule — the
    shuffle carries users x blocks rows. Ties on ts break by
    event_id, so the result is deterministic and SQL-mirrorable with
    ordered first()/last() aggregates. The combiner is zero-copy
    Arrow (one sort_indices + adjacent-user first/last masks, the
    exact_dedup_combine_batch idiom) — no pandas round trip on the
    full stream.
    """
    def ends(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            batch, sort_keys=[("user_id", "ascending"),
                              ("ts", "ascending"),
                              ("event_id", "ascending")])
        srt = batch.take(order)
        uid = srt.column("user_id").to_numpy(zero_copy_only=False)
        n = len(uid)
        first = np.ones(n, bool)
        last = np.ones(n, bool)
        if n:
            edge = uid[1:] != uid[:-1]
            first[1:] = edge
            last[:-1] = edge
        f = srt.filter(pa.array(first))
        l = srt.filter(pa.array(last))
        # sorted by user on both sides, so rows align per user
        return pa.table({
            "user_id": f.column("user_id").cast(pa.int64()),
            "first_event": f.column("event_id").cast(pa.int64()),
            "first_ts": f.column("ts"),
            "last_event": l.column("event_id").cast(pa.int64()),
            "last_ts": l.column("ts"),
        })

    def fold(group: pa.Table) -> pa.Table:
        fo = pc.sort_indices(
            group, sort_keys=[("first_ts", "ascending"),
                              ("first_event", "ascending")])
        lo = pc.sort_indices(
            group, sort_keys=[("last_ts", "descending"),
                              ("last_event", "descending")])
        f = group.take(fo.slice(0, 1))
        l = group.take(lo.slice(0, 1))
        return pa.table({
            "user_id": f.column("user_id"),
            "first_event": f.column("first_event"),
            "first_ts": f.column("first_ts"),
            "last_event": l.column("last_event"),
            "last_ts": l.column("last_ts"),
        })

    combined = events_ds.select_columns(["event_id", "user_id", "ts"]) \
        .map_batches(ends, batch_format="pyarrow")
    return per_key_in_buckets(combined, "user_id", fold)


def funnel_steps(events_ds, steps: list[str]):
    """Sequential funnel conversion over an ordered event-type path ->
    (step_idx:int64, event_type, n_users:int64), where n_users counts
    the users who completed steps[0..i] IN TIMESTAMP ORDER: step i+1
    must occur strictly after the user's earliest valid completion of
    step i (the classic t2 = min ts(step2) with ts > t1 recurrence).

    Scale shape: the read is pruned to (user_id, event_type, ts) and
    filtered to the funnel's event types BEFORE the only shuffle, so
    non-funnel events never leave the scan. groupby(user_id).map_groups
    replays each user's slim event list with a vectorized per-step
    min-over-threshold scan (per-group state never crosses users); the
    per-user depths collapse through a per-block histogram combiner so
    the final groupby carries at most len(steps)+1 rows per block.
    Mirrors the nested min-filter SQL formulation (no window functions
    needed; reference semantics: selector chains fire in document
    order, rewriter.rs:356-440 — same earliest-match-then-advance
    discipline applied to event streams).
    """
    from ray.data.aggregate import Sum

    step_of = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def depth(group: pa.Table) -> pa.Table:
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        sidx = np.array([step_of[t] for t in
                         group.column("event_type").to_pylist()],
                        dtype=np.int64)
        prev = -np.inf
        d = 0
        for i in range(n_steps):
            cand = ts[(sidx == i) & (ts > prev)]
            if len(cand) == 0:
                break
            prev = cand.min()
            d += 1
        return pa.table({"depth": pa.array([d], pa.int64()),
                         "n_partial": pa.array([1], pa.int64())})

    def hist(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"depth": batch.column("depth"),
             "n": batch.column("n_partial")},
            ["depth"], ["n"], "n_rows")

    step_set = pa.array(steps, pa.string())

    def keep_steps(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"),
                                     value_set=step_set))

    slim = events_ds.select_columns(["user_id", "event_type", "ts"]) \
        .map_batches(keep_steps, batch_format="pyarrow")
    depths = per_key_in_buckets(slim, "user_id", depth)
    agg = coalesce_small(depths.map_batches(hist, batch_format="pyarrow")) \
        .groupby("depth").aggregate(Sum("n")).take_all()

    reached = [0] * (n_steps + 1)
    for r in agg:
        reached[int(r["depth"])] = int(r["sum(n)"])
    # users at depth >= i completed step i
    cum = 0
    n_at_least = [0] * (n_steps + 1)
    for d in range(n_steps, -1, -1):
        cum += reached[d]
        n_at_least[d] = cum
    import ray.data

    return ray.data.from_arrow(pa.table({
        "step_idx": pa.array(range(1, n_steps + 1), pa.int64()),
        "event_type": pa.array(steps, pa.string()),
        "n_users": pa.array([n_at_least[i] for i in range(1, n_steps + 1)],
                            pa.int64()),
    }))


def cohort_retention(events_ds):
    """Weekly cohort retention matrix -> (cohort_week:int64,
    week_offset:int64, n_users:int64): users are assigned to the epoch
    week of their first-ever event, and n_users counts how many of a
    cohort's users were active again week_offset weeks later.

    Scale shape: blocks collapse to DISTINCT (user_id, epoch_week)
    pairs before anything shuffles (activity within a week dedupes in
    place), so only 16-byte pairs ride the per-user groupby. The
    cohort week is just min(week) inside each user's group — no join
    back to a firsts table and no broadcast of a user-sized side. The
    emitted (cohort_week, week_offset) labels then collapse through
    the standard per-block histogram combiner into the final tiny
    groupby whose size is the week-domain squared, not the row count.
    """
    from ray.data.aggregate import Sum

    WEEK_US = 604_800_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        key = np.stack([uid, us // WEEK_US], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({"user_id": pa.array(uniq[:, 0], pa.int64()),
                         "week": pa.array(uniq[:, 1], pa.int64())})

    def offsets(group: pa.Table) -> pa.Table:
        weeks = np.unique(group.column("week").to_numpy(
            zero_copy_only=False))
        cohort = weeks.min()
        n = len(weeks)
        return pa.table({
            "cohort_week": pa.array(np.full(n, cohort), pa.int64()),
            "week_offset": pa.array(weeks - cohort, pa.int64()),
            "n": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
        })

    def hist(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"cohort_week": batch.column("cohort_week"),
             "week_offset": batch.column("week_offset"),
             "n": batch.column("n")},
            ["cohort_week", "week_offset"], ["n"], "n_rows")

    acted = events_ds.select_columns(["user_id", "ts"]) \
        .map_batches(pairs, batch_format="pyarrow")
    labeled = per_key_in_buckets(acted, "user_id", offsets)
    agg = coalesce_small(labeled.map_batches(hist, batch_format="pyarrow")) \
        .groupby(["cohort_week", "week_offset"]).aggregate(Sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": batch.column("cohort_week"),
            "week_offset": batch.column("week_offset"),
            "n_users": batch.column("sum(n)"),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def events_cube(ds):
    """GROUP BY CUBE(event_type, weekday): all four grouping sets —
    (type, weekday) detail, per-type totals, per-weekday totals, and
    the grand total — as one table (event_type, weekday:int64,
    n_events:int64, sum_value_cents:int64). Rolled-up slots carry
    sentinels ('' / -1) instead of SQL NULL, same convention as
    events_rollup_sets. weekday is epoch-day mod 7 (0 = Thursday), a
    pure integer derivation with no timezone/locale semantics.

    Scale shape: exactly ONE shuffle at the finest grain (per-block
    cents combiner -> groupby(event_type, weekday)); the three coarser
    sets are folded from that aggregate, whose size is the key domain
    (types x 7), in exact integer arithmetic on the driver.
    """
    import ray.data
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        weekday = pa.array((us // DAY_US) % 7, pa.int64())
        return _partial_sum_by(
            {"event_type": batch.column("event_type"),
             "weekday": weekday, "v": _cents(batch.column("value"))},
            ["event_type", "weekday"], ["v"], "n_partial")

    finest = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "weekday"]) \
        .aggregate(Sum("v"), Sum("n_partial")).take_all()

    types, wdays, ns, sums = [], [], [], []
    by_type: dict = {}
    by_wday: dict = {}
    tot_n = tot_s = 0
    for r in finest:
        n, s = int(r["sum(n_partial)"]), int(r["sum(v)"])
        types.append(r["event_type"])
        wdays.append(int(r["weekday"]))
        ns.append(n)
        sums.append(s)
        for d, k in ((by_type, r["event_type"]), (by_wday, int(r["weekday"]))):
            a = d.setdefault(k, [0, 0])
            a[0] += n
            a[1] += s
        tot_n += n
        tot_s += s
    for t in sorted(by_type):
        types.append(t); wdays.append(-1)
        ns.append(by_type[t][0]); sums.append(by_type[t][1])
    for w in sorted(by_wday):
        types.append(""); wdays.append(w)
        ns.append(by_wday[w][0]); sums.append(by_wday[w][1])
    if finest:
        types.append(""); wdays.append(-1)
        ns.append(tot_n); sums.append(tot_s)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "weekday": pa.array(wdays, pa.int64()),
        "n_events": pa.array(ns, pa.int64()),
        "sum_value_cents": pa.array(sums, pa.int64()),
    }))


def zscore_by_type(events_ds):
    """Per-type standardization: z = (cents - mean) / std over each
    event_type's value distribution -> (event_id:int64, event_type,
    z:float64). Population std from EXACT integer moments (sum and
    sum-of-squares of cents), so the float result is a deterministic
    function of the data, not of reduce order — the same property the
    corpus_profile / pearson_corr ops rely on.

    Scale shape: one tiny groupby over per-block (n, S, SS) integer
    partials (key domain = event types), stats broadcast back as a
    plain dict closure, then a map-only vectorized scoring pass.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": batch.column("event_type"),
                      "s": pa.array(c, pa.int64()),
                      "ss": pa.array(c * c, pa.int64())})
        return _partial_sum_by(
            {"event_type": t.column("event_type"), "s": t.column("s"),
             "ss": t.column("ss")},
            ["event_type"], ["s", "ss"], "n_partial")

    stats_rows = coalesce_small(
        events_ds.select_columns(["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")) \
        .groupby("event_type") \
        .aggregate(Sum("s"), Sum("ss"), Sum("n_partial")).take_all()
    stats = {}
    for r in stats_rows:
        n = int(r["sum(n_partial)"])
        S = int(r["sum(s)"])
        SS = int(r["sum(ss)"])
        mean = S / n
        var = SS / n - mean * mean
        stats[r["event_type"]] = (mean, var ** 0.5)

    def score(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_pylist()
        means = np.array([stats[t][0] for t in types])
        stds = np.array([stats[t][1] for t in types])
        # a constant-valued type has std 0; define z as 0.0 there (the
        # value sits exactly at its mean) instead of emitting inf/nan
        z = np.divide(c - means, stds,
                      out=np.zeros(len(types), np.float64),
                      where=stds > 0)
        return pa.table({
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type"),
            "z": pa.array(z, pa.float64()),
        })

    return events_ds.select_columns(["event_id", "event_type", "value"]) \
        .map_batches(score, batch_format="pyarrow")


def skew_safe_join(fact_ds, dim_ds, *, fact_key: str, dim_key: str,
                   dim_col: str, dim_type=pa.string(),
                   hot_top_k: int = 16, num_partitions: int = 16):
    """Inner fact ⋈ dim join that survives pathological key skew: the
    ``hot_top_k`` heaviest fact keys take a BROADCAST path (their dim
    rows ride a tiny ray.put dict, joined map-side with zero shuffle),
    while the cold tail takes the native hash-partitioned join. A hot
    key that would pin one aggregator actor at 100 TB never enters the
    exchange at all — this is the broadcast-the-hot-side alternative to
    salting (conversations.py's block-salted assembly is the other).

    Returns fact columns + ``dim_col``. dim must be unique per key
    (dimension semantics). The hot-key set comes from the same
    reduced histogram key_skew_report uses, so the extra pass costs one
    tiny groupby over per-block count partials.
    """
    import ray
    from ray.data.aggregate import Sum

    def key_counts(batch: pa.Table) -> pa.Table:
        g = batch.select([fact_key]).group_by(fact_key).aggregate(
            [(fact_key, "count")])
        return pa.table({
            fact_key: g.column(fact_key),
            "pn": pc.cast(g.column(f"{fact_key}_count"), pa.int64()),
        })

    hot_rows = coalesce_small(
        fact_ds.map_batches(key_counts, batch_format="pyarrow")) \
        .groupby(fact_key).aggregate(Sum("pn")) \
        .sort(["sum(pn)", fact_key], descending=[True, False]) \
        .limit(hot_top_k).take_all()
    hot_keys = [r[fact_key] for r in hot_rows]
    hot_arr = pa.array(hot_keys)

    def prune_dim(batch: pa.Table) -> pa.Table:
        return batch.select([dim_key, dim_col])

    dim_slim = dim_ds.map_batches(prune_dim, batch_format="pyarrow")

    def dim_hot_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(dim_key),
                                     value_set=hot_arr))

    hot_dim = dim_slim.map_batches(dim_hot_only,
                                   batch_format="pyarrow").take_all()
    lookup = {r[dim_key]: r[dim_col] for r in hot_dim}
    ref = ray.put(lookup)

    def fact_hot(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column(fact_key),
                                  value_set=hot_arr))
        t = _broadcast_lookup_fn(t, mapping_ref=ref, key_col=fact_key,
                                 out_col=dim_col, out_type=dim_type)
        # inner semantics: hot keys absent from dim drop out
        return t.filter(pc.is_valid(t.column(dim_col)))

    def fact_cold(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch.column(fact_key),
                                               value_set=hot_arr)))

    def dim_cold(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch.column(dim_key),
                                               value_set=hot_arr)))

    hot_out = fact_ds.map_batches(fact_hot, batch_format="pyarrow")
    cold_join = coalesce_small(
        fact_ds.map_batches(fact_cold, batch_format="pyarrow")) \
        .join(coalesce_small(dim_slim.map_batches(
            dim_cold, batch_format="pyarrow")),
            join_type="inner", num_partitions=num_partitions,
            on=(fact_key,), right_on=(dim_key,))
    out_cols = [c for c in fact_ds.schema().names] + [dim_col]

    def align(batch: pa.Table) -> pa.Table:
        return batch.select(out_cols)

    return hot_out.map_batches(align, batch_format="pyarrow").union(
        cold_join.map_batches(align, batch_format="pyarrow"))


def winsorized_mean(events_ds, *, p: float = 0.1):
    """Per-type winsorized mean: values clamped to the [p, 1-p]
    discrete quantiles before averaging -> (event_type, lo_cents:int64,
    hi_cents:int64, wmean_cents:float64). The robust-mean alternative
    to mad_outliers when you want a summary, not row flags.

    Scale shape: rows collapse to the (type, cents)->count histogram
    via the per-block combiner (the value_histogram idiom), so both the
    quantile walk and the clamped sum run over distinct VALUES, not
    rows — per-group work is O(distinct cents), never O(corpus).
    quantile_disc semantics (element at ceil(q*n)-1) keep it
    bit-mirrorable in SQL; the mean is an exact int64 sum divided once.
    """
    import math

    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_sum_by(
            {"event_type": batch.column("event_type"),
             "cents": _cents(batch.column("value"))},
            ["event_type", "cents"], [], "n_partial")

    hist = coalesce_small(
        events_ds.select_columns(["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "cents"]).aggregate(Sum("n_partial"))

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("cents")
        cents = g["cents"].to_numpy(dtype=np.int64)
        counts = g["sum(n_partial)"].to_numpy(dtype=np.int64)
        n = int(counts.sum())
        cum = np.cumsum(counts)

        def qdisc(q: float) -> int:
            target = max(1, math.ceil(q * n))
            return int(cents[np.searchsorted(cum, target)])

        lo, hi = qdisc(p), qdisc(1.0 - p)
        clamped = np.clip(cents, lo, hi)
        s = int((clamped * counts).sum())
        return pd.DataFrame([{
            "event_type": group["event_type"].iloc[0],
            "lo_cents": lo, "hi_cents": hi,
            "wmean_cents": s / n,
        }])

    return hist.groupby("event_type").map_groups(
        finish, batch_format="pandas")


def lag_deltas(events_ds):
    """Per-user event-to-event deltas: (event_id, user_id, ts,
    secs_since_prev, value_delta) for every event that HAS a previous
    event from the same user, ordered by (ts, event_id) within user.

    The SQL window shape (``LAG(...) OVER (PARTITION BY user ORDER BY
    ts, event_id)``) expressed Ray-Data-first: one groupby(user_id)
    hash shuffle, then a vectorized in-task sort + shift per group —
    the lag never crosses users, so no ordered global pass is needed.
    First events per user are dropped (their lag is undefined); the
    oracle filters the same way, so no NULL-sentinel coordination.
    """
    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = g.column("value").to_numpy(zero_copy_only=False)
        if len(ts) < 2:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], g.schema.field("ts").type),
                "secs_since_prev": pa.array([], pa.float64()),
                "value_delta": pa.array([], pa.float64()),
            })
        return pa.table({
            "event_id": g.column("event_id").slice(1),
            "user_id": g.column("user_id").slice(1),
            "ts": g.column("ts").slice(1),
            "secs_since_prev": pa.array((ts[1:] - ts[:-1]) / 1e6,
                                        pa.float64()),
            "value_delta": pa.array(vals[1:] - vals[:-1], pa.float64()),
        })

    return per_key_in_buckets(events_ds, "user_id", scan)


def user_event_sequences(events_ds, *, sep: str = ">"):
    """Per-user ordered event-type trail: (user_id, n_events, seq)
    where seq = event types joined by ``sep`` in (ts, event_id) order —
    the SQL ``string_agg(event_type, sep ORDER BY ts, event_id)``.

    One groupby(user_id) shuffle carrying only (user_id, ts, event_id,
    event_type); the join happens in the group task. seq length is
    bounded by events-per-user — for a pathological user, pre-combine
    per block into ordered segment rows first (the
    conversation-assembly two-phase shape in conversations.py).
    """
    def slim(batch: pa.Table) -> pa.Table:
        return batch.select(["user_id", "ts", "event_id", "event_type"])

    def assemble(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        types = g.column("event_type").to_pylist()
        return pa.table({
            "user_id": pa.array([g.column("user_id")[0].as_py()],
                                pa.int64()),
            "n_events": pa.array([len(types)], pa.int64()),
            "seq": pa.array([sep.join(types)], pa.string()),
        })

    return per_key_in_buckets(
        events_ds.map_batches(slim, batch_format="pyarrow"),
        "user_id", assemble)


def debounce_events(events_ds, *, gap_secs: float = 3600.0):
    """Drop an event when the SAME user fired the SAME event type
    ``gap_secs`` or less earlier — an event exactly gap_secs after its
    predecessor is dropped too; keep requires diff STRICTLY greater,
    matching the oracle's ``> gap`` (vs the previous RAW event, i.e. the
    LAG(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts,
    event_id) formulation — deliberately, so an exact SQL oracle
    exists; a compare-to-last-KEPT debounce is the same in-task scan
    with a running keep-timestamp instead of the shift).

    One groupby(user_id, event_type) hash shuffle, vectorized in-task
    sort + shifted-diff filter. Keeps (event_id, user_id, event_type,
    ts, value).
    """
    gap_us = int(gap_secs * 1e6)

    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.ones(len(ts), bool)
        keep[1:] = (ts[1:] - ts[:-1]) > gap_us
        return g.select(["event_id", "user_id", "event_type", "ts",
                         "value"]).filter(pa.array(keep))

    return per_key_in_buckets(events_ds, ["user_id", "event_type"],
                              scan)


def user_event_entropy(events_ds):
    """Per-user Shannon entropy (nats) of the event-type mix:
    (user_id, n_events, value_entropy) — behavioral-diversity scoring, the
    events-table analogue of the documents char_entropy op.

    Two-phase: per-batch (user, type) count combiner -> groupby sum
    (one row per user x type survives) -> groupby(user_id) map_groups
    computes H = -sum(p ln p) over the handful of type rows. Only
    count rows ride either shuffle. ln via np.log for DuckDB parity.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["user_id", "event_type"]) \
            .group_by(["user_id", "event_type"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "event_type": agg.column("event_type"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["user_id", "event_type"]).aggregate(Sum("partial_n"))

    def finish(group: pa.Table) -> pa.Table:
        c = np.asarray(group.column("sum(partial_n)").to_pylist(),
                       np.float64)
        n = c.sum()
        p = c / n
        return pa.table({
            "user_id": pa.array([group.column("user_id")[0].as_py()],
                                pa.int64()),
            "n_events": pa.array([int(n)], pa.int64()),
            "value_entropy": pa.array([float(-(p * np.log(p)).sum())],
                                       pa.float64()),
        })

    return per_key_in_buckets(counts, "user_id", finish)


def percent_rank_by_group(events_ds, *, group_col: str = "event_type",
                          value_col: str = "value",
                          id_col: str = "event_id"):
    """Exact PERCENT_RANK() OVER (PARTITION BY group ORDER BY value)
    (and CUME_DIST) for every row -> (id, group, value, pct_rank,
    cume_dist), both float64.

    rank_rows' histogram idiom, upgraded to a per-group window and a
    MAP-ONLY second pass: because percent_rank is a function of the
    VALUE (ties share a rank), no row ever needs a per-row position —
    pass 1 builds the (group, cents) histogram (one tiny groupby),
    the driver's per-group exclusive scan yields rank-1 per distinct
    value, and pass 2 is a broadcast lookup inside map_batches: zero
    row-level shuffle. Driver state is O(distinct (group, quantized
    value)) — values here are exact 2-decimal so cents quantization is
    order-isomorphic; for truly continuous keys coarsen the bucket and
    refine per-bucket (length_percentile_filter-style).
    """
    import ray

    from ray.data.aggregate import Sum

    def cents(col) -> pa.Array:
        return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))),
                       pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      "c": cents(batch.column(value_col))})
        agg = t.group_by([group_col, "c"]).aggregate([([], "count_all")])
        return pa.table({
            group_col: agg.column(group_col),
            "c": agg.column("c"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    hist = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby([group_col, "c"]).aggregate(Sum("partial_n")).take_all()

    ranks: dict = {}      # (group, cents) -> rows strictly below
    cume: dict = {}       # (group, cents) -> rows at-or-below
    totals: dict = {}
    by_group: dict = {}
    for r in hist:
        by_group.setdefault(r[group_col], []).append(
            (r["c"], r["sum(partial_n)"]))
    for g, pairs in by_group.items():
        cum = 0
        for c, n in sorted(pairs):
            ranks[(g, c)] = cum
            cum += n
            cume[(g, c)] = cum
        totals[g] = cum
    bc = ray.put((ranks, cume, totals))

    def assign(batch: pa.Table) -> pa.Table:
        rk, cm, tot = ray.get(bc)
        gs = batch.column(group_col).to_pylist()
        cs = cents(batch.column(value_col)).to_pylist()
        pct = np.array(
            [rk[(g, c)] / max(tot[g] - 1, 1) for g, c in zip(gs, cs)],
            np.float64)
        cd = np.array(
            [cm[(g, c)] / tot[g] for g, c in zip(gs, cs)], np.float64)
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            value_col: batch.column(value_col),
            "pct_rank": pa.array(pct, pa.float64()),
            "cume_dist": pa.array(cd, pa.float64()),
        })

    return events_ds.map_batches(assign, batch_format="pyarrow")


def psi_drift(ds, *, group_col: str = "source", side_col: str = "side",
              value_col: str = "n_chars", bin_width: int = 128,
              n_bins: int = 16):
    """Population Stability Index per group between two labeled slices
    -> (group, value_psi float64; named so the unique group key, not the reassociation-sensitive float, is the primary row-sort key in order-insensitive compares): the standard distribution-drift monitor
    (psi < 0.1 stable, > 0.25 drifted) run per corpus source when a
    new snapshot lands.

    Input needs a ``side_col`` with values 'a' (reference) and 'b'
    (candidate). Values are binned fixed-width (``min(value //
    bin_width, n_bins-1)``), counts are Laplace-smoothed
    ((c+1)/(n+n_bins)) so empty bins are defined, and
    psi = sum_bins (p_a - p_b) * ln(p_a / p_b).

    Shape: per-batch (group, side, bin) count combiner -> one tiny
    groupby sum -> groupby(group) finalize over <= 2*n_bins rows per
    group. Raw values never shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        bins = pc.min_element_wise(
            pc.cast(pc.divide(vals, pa.scalar(bin_width, pa.int64())),
                    pa.int64()),
            pa.scalar(n_bins - 1, pa.int64()))
        t = pa.table({group_col: batch.column(group_col),
                      side_col: batch.column(side_col), "bin": bins})
        agg = t.group_by([group_col, side_col, "bin"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            group_col: agg.column(group_col),
            side_col: agg.column(side_col),
            "bin": agg.column("bin"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby([group_col, side_col, "bin"]).aggregate(Sum("partial_n"))

    def finish(group: pa.Table) -> pa.Table:
        sides = group.column(side_col).to_pylist()
        bins = group.column("bin").to_pylist()
        ns = group.column("sum(partial_n)").to_pylist()
        grid = {("a", b): 0 for b in range(n_bins)}
        grid.update({("b", b): 0 for b in range(n_bins)})
        for s, b, n in zip(sides, bins, ns):
            grid[(s, b)] = n
        tn = {s: sum(grid[(s, b)] for b in range(n_bins)) for s in "ab"}
        pa_ = np.array([(grid[("a", b)] + 1.0) / (tn["a"] + float(n_bins))
                        for b in range(n_bins)])
        pb_ = np.array([(grid[("b", b)] + 1.0) / (tn["b"] + float(n_bins))
                        for b in range(n_bins)])
        psi = float(((pa_ - pb_) * np.log(pa_ / pb_)).sum())
        return pa.table({
            group_col: pa.array([group.column(group_col)[0].as_py()]),
            "value_psi": pa.array([psi], pa.float64()),
        })

    return counts.groupby(group_col).map_groups(
        finish, batch_format="pyarrow")


def expectations_report(docs_ds, *, allowed_langs: tuple = ("en", "de",
                                                            "fr", "es",
                                                            "ja"),
                        max_chars: int = 1_000_000):
    """Distributed data-quality expectations over the documents table
    -> one row per check: (check_name, total, violations, pass_rate) — the
    Great-Expectations-style validation pass a 100 TB ingest runs
    before promoting a snapshot.

    Checks: text_not_null, lang_allowed, n_chars_in_range,
    n_chars_matches_text (n_chars == len(text)), doc_id_unique.

    Shape: the four row-local checks reduce per batch to ONE partial
    row of int64 counters (a groupby over ~blocks rows finishes them);
    uniqueness is the only check that must co-locate ids — one
    groupby(doc_id) count over 8-byte ids, then a per-batch combiner
    counts ids with multiplicity > 1. Nothing else shuffles.
    """
    from ray.data.aggregate import Sum

    allowed = set(allowed_langs)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch.column("text")
        null_text = int(pc.sum(pc.cast(pc.is_null(text), pa.int64()))
                        .as_py() or 0)
        lang_bad = n - int(pc.sum(pc.cast(
            pc.is_in(batch.column("lang"),
                     value_set=pa.array(sorted(allowed))),
            pa.int64())).as_py() or 0)
        nch = batch.column("n_chars")
        range_bad = n - int(pc.sum(pc.cast(
            pc.and_(pc.greater_equal(nch, pa.scalar(1, pa.int64())),
                    pc.less_equal(nch, pa.scalar(max_chars, pa.int64()))),
            pa.int64())).as_py() or 0)
        mism = int(pc.sum(pc.cast(pc.not_equal(
            pc.cast(pc.utf8_length(pc.fill_null(text, "")), pa.int64()),
            nch), pa.int64())).as_py() or 0)
        return pa.table({
            "total": pa.array([n], pa.int64()),
            "v_null_text": pa.array([null_text], pa.int64()),
            "v_lang": pa.array([lang_bad], pa.int64()),
            "v_range": pa.array([range_bad], pa.int64()),
            "v_len_mismatch": pa.array([mism], pa.int64()),
        })

    agg = coalesce_small(
        docs_ds.map_batches(partial, batch_format="pyarrow")) \
        .sum(["total", "v_null_text", "v_lang", "v_range",
              "v_len_mismatch"])

    # uniqueness: ids with multiplicity > 1 (each duplicated id counts
    # all its rows as violations except one)
    def id_only(batch: pa.Table) -> pa.Table:
        t = batch.select(["doc_id"]).group_by("doc_id") \
            .aggregate([([], "count_all")])
        return pa.table({"doc_id": t.column("doc_id"),
                         "partial_n": pc.cast(t.column("count_all"),
                                              pa.int64())})

    mult = coalesce_small(
        docs_ds.map_batches(id_only, batch_format="pyarrow")) \
        .groupby("doc_id").aggregate(Sum("partial_n"))

    def dup_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(partial_n)")
        extra = pc.sum(pc.subtract(
            c, pa.scalar(1, pa.int64()))).as_py() or 0
        return pa.table({"v_dup": pa.array([int(extra)], pa.int64())})

    dup = mult.map_batches(dup_partial, batch_format="pyarrow") \
        .sum("v_dup")

    import ray.data

    total = int(agg["sum(total)"])
    rows = [
        ("text_not_null", agg["sum(v_null_text)"]),
        ("lang_allowed", agg["sum(v_lang)"]),
        ("n_chars_in_range", agg["sum(v_range)"]),
        ("n_chars_matches_text", agg["sum(v_len_mismatch)"]),
        ("doc_id_unique", int(dup or 0)),
    ]
    return ray.data.from_arrow(pa.table({
        "check_name": pa.array([r[0] for r in rows], pa.string()),
        "total": pa.array([total] * len(rows), pa.int64()),
        "violations": pa.array([int(r[1]) for r in rows], pa.int64()),
        "pass_rate": pa.array([(total - int(r[1])) / total
                               for r in rows], pa.float64()),
    }))


def rolling_sum_range(events_ds, *, window_secs: float = 3600.0):
    """Per-user TIME-based (RANGE-frame) rolling sum -> (event_id,
    user_id, ts, wsum_cents:int64): ``SUM(cents) OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN <window> PRECEDING AND CURRENT
    ROW)`` — the other window-frame family vs rolling_avg_events'
    ROWS frame. RANGE semantics: every ts-peer of the current row is
    in-frame (including later-ordered peers), which the two-pointer
    below reproduces with searchsorted(ts, 'right').

    ONE groupby(user_id); in-task vectorized prefix-sum + two binary
    searches per group over exact int64 cents — bit-exact vs SQL.
    """
    win_us = int(window_secs * 1e6)

    def per_user(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.rint(g.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(cents)])
        left = np.searchsorted(ts, ts - win_us, side="left")
        right = np.searchsorted(ts, ts, side="right")
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "wsum_cents": pa.array(csum[right] - csum[left], pa.int64()),
        })

    return per_key_in_buckets(
        events_ds.select_columns(["event_id", "user_id", "ts", "value"]),
        "user_id", per_user)


def impute_group_mean(ds, *, group_col: str = "event_type",
                      value_col: str = "value",
                      missing_col: str = "missing",
                      id_col: str = "event_id"):
    """Fill missing values with their group's mean of present values
    -> (id, group, value_filled:float64) — the standard imputation
    pass before feature export.

    Two-phase broadcast: exact int64 cents-sum/count per group (one
    tiny groupby over per-batch partials), driver folds to a
    {group: mean} dict shipped once via ray.put, then a MAP-ONLY fill
    pass — no row-level shuffle. Means are computed (sum/n)/100 in a
    fixed order so they bit-match the SQL oracle.
    """
    import ray

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch.column(missing_col),
                                     pa.scalar(False)))
        t = pa.table({
            group_col: keep.column(group_col),
            "c": pc.cast(pc.round(pc.multiply(keep.column(value_col),
                                              pa.scalar(100.0))),
                         pa.int64()),
        })
        agg = t.group_by(group_col).aggregate([("c", "sum"),
                                               ([], "count_all")])
        return pa.table({
            group_col: agg.column(group_col),
            "s": pc.cast(agg.column("c_sum"), pa.int64()),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    rows = coalesce_small(ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(group_col).aggregate(Sum("s"), Sum("n")).take_all()
    means = {r[group_col]: (r["sum(s)"] / r["sum(n)"]) / 100.0
             for r in rows if r["sum(n)"]}
    bc = ray.put(means)

    def fill(batch: pa.Table) -> pa.Table:
        m = ray.get(bc)
        gs = batch.column(group_col).to_pylist()
        miss = batch.column(missing_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64).copy()
        repl = np.array([m.get(g, np.nan) for g in gs], np.float64)
        vals[miss] = repl[miss]
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            "value_filled": pa.array(vals, pa.float64()),
        })

    return ds.map_batches(fill, batch_format="pyarrow")


def last_touch_attribution(events_ds, *, convert_type: str = "purchase",
                           touch_type: str = "click",
                           window_secs: float = 86400.0):
    """Last-touch attribution: for every conversion event, the LATEST
    touch event by the same user at-or-before it and within the
    window -> (event_id, user_id, ts, click_id, secs_since_click).
    No-match rows keep the conversion with sentinel click_id = -1 /
    secs = -1.0 (sentinels, not NULLs, so the oracle compare is
    well-defined). Ties at the same touch ts resolve to the highest
    touch event_id, matching the oracle's ORDER BY ts DESC, event_id
    DESC LIMIT 1.

    One groupby(user_id) shuffle of (id, type, ts) triples; the as-of
    lookup is one vectorized searchsorted over the user's touch
    timeline per group — a SELF-asof within one stream (vs
    events_asof_orders' broadcast two-table as-of).
    """
    win_us = int(window_secs * 1e6)

    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        types = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        conv = types == convert_type
        touch = types == touch_type
        t_ts, t_id = ts[touch], ids[touch]
        c_ts, c_id = ts[conv], ids[conv]
        if not len(c_ts):
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], g.schema.field("ts").type),
                "click_id": pa.array([], pa.int64()),
                "secs_since_click": pa.array([], pa.float64()),
            })
        if len(t_ts):
            idx = np.searchsorted(t_ts, c_ts, side="right") - 1
            ok = idx >= 0
            safe = np.clip(idx, 0, None)
            matched_ts = np.where(ok, t_ts[safe], 0)
            ok &= (c_ts - matched_ts) <= win_us
            click_id = np.where(ok, t_id[safe], -1).astype(np.int64)
            secs = np.where(ok, (c_ts - matched_ts) / 1e6, -1.0)
        else:
            click_id = np.full(len(c_ts), -1, np.int64)
            secs = np.full(len(c_ts), -1.0, np.float64)
        conv_tbl = g.filter(pa.array(conv))
        return pa.table({
            "event_id": conv_tbl.column("event_id"),
            "user_id": conv_tbl.column("user_id"),
            "ts": conv_tbl.column("ts"),
            "click_id": pa.array(click_id, pa.int64()),
            "secs_since_click": pa.array(secs, pa.float64()),
        })

    return per_key_in_buckets(
        events_ds.select_columns(
            ["event_id", "user_id", "event_type", "ts"]),
        "user_id", scan)


def events_timeseries_filled(events_ds):
    """Zero-filled per-(event_type, day) counts -> (event_type, day,
    n): the gap-completion op — downstream time-series models need
    explicit zeros, not missing rows. Day domain = [min day, max day]
    across the whole table (so every type gets every day).

    Shape: per-batch (type, day) count combiner -> one tiny groupby
    sum -> driver completes the type x day grid (types x days rows —
    driver-sized by construction since both domains are small).
    """
    from ray.data.aggregate import Sum

    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
        })
        agg = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "day": agg.column("day"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    rows = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "day"]).aggregate(Sum("partial_n")) \
        .take_all()

    counts = {(r["event_type"], r["day"]): r["sum(partial_n)"]
              for r in rows}
    types = sorted({t for t, _ in counts})
    days = [d for _, d in counts]
    lo, hi = min(days), max(days)
    import datetime as _dt

    grid_days = []
    d = lo
    while d <= hi:
        grid_days.append(d)
        d = d + _dt.timedelta(days=1)
    out_t, out_d, out_n = [], [], []
    for t in types:
        for d in grid_days:
            out_t.append(t)
            out_d.append(d)
            out_n.append(int(counts.get((t, d), 0)))
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "day": pa.array(out_d, pa.timestamp("us")),
        "n": pa.array(out_n, pa.int64()),
    }))


def apply_changelog(ds, *, key_cols: list[str], order_col: str = "ts",
                    tie_col: str = "event_id", op_col: str = "op"):
    """CDC changelog -> snapshot: keep each key's LATEST row by
    (order_col, tie_col), then drop keys whose latest op is a delete
    ('D') — compact_latest extended with tombstone semantics (Kafka
    compacted topics with deletes, Iceberg/Hudi merge-on-read).

    Same two-level argmax shuffle shape as compact_latest: the
    combiner keeps one candidate per key per block, so the shuffle
    carries keys x blocks rows regardless of changelog length.
    """
    latest = compact_latest(ds, key_cols=key_cols, order_col=order_col,
                            tie_col=tie_col)
    return latest.filter(expr=f"{op_col} != 'D'")


def returned_revenue_by_customer(lineitem_ds, orders_ds, customer_path,
                                 *, k: int = 20,
                                 num_partitions: int = 16):
    """TPC-H Q10-lite: revenue lost to returns per customer ->
    top-``k`` (c_custkey, c_name, revenue_e4) — the three-table shape
    (fact ⋈ fact ⋈ dim) composed from the catalog's own parts:

    - lineitem is filtered (l_returnflag = 'R'), the discounted price
      is evaluated per batch, and rows are PRE-AGGREGATED by orderkey
      inside the batch before anything shuffles — the exchange carries
      (l_orderkey, partial revenue int64) only;
    - native hash join against orders pruned to (o_orderkey,
      o_custkey) — predicate+projection below the shuffle;
    - per-customer rollup via the usual combiner + tiny groupby;
    - customer is a DIM side: broadcast lookup for c_name (never a
      third shuffle);
    - top-k sorts the already-reduced per-customer table.
    """
    import pyarrow.parquet as pq

    import ray

    from ray.data.aggregate import Sum

    def prune_line(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        ext = t.column("l_extendedprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rev = np.rint(ext * (1 - disc) * 10000).astype(np.int64)
        part = pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev": pa.array(rev, pa.int64())})
        agg = part.group_by("l_orderkey").aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": agg.column("l_orderkey"),
                         "rev": pc.cast(agg.column("rev_sum"),
                                        pa.int64())})

    def prune_orders(batch: pa.Table) -> pa.Table:
        return batch.select(["o_orderkey", "o_custkey"])

    lines = coalesce_small(
        lineitem_ds.map_batches(prune_line, batch_format="pyarrow"))
    orders = coalesce_small(
        orders_ds.map_batches(prune_orders, batch_format="pyarrow"))
    joined = lines.join(orders, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",))

    def cust_partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by("o_custkey").aggregate([("rev", "sum")])
        return pa.table({"o_custkey": agg.column("o_custkey"),
                         "partial": pc.cast(agg.column("rev_sum"),
                                            pa.int64())})

    per_cust = coalesce_small(
        joined.map_batches(cust_partial, batch_format="pyarrow")) \
        .groupby("o_custkey").aggregate(Sum("partial"))

    names = dict(zip(
        *[pq.read_table(customer_path,
                        columns=["c_custkey", "c_name"]).column(c)
          .to_pylist() for c in ("c_custkey", "c_name")]))
    nref = ray.put(names)

    def attach(batch: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        keys = batch.column("o_custkey").to_pylist()
        return pa.table({
            "c_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "c_name": pa.array([nm[k] for k in keys], pa.string()),
            "revenue_e4": pc.cast(batch.column("sum(partial)"),
                                  pa.int64()),
        })

    return per_cust.map_batches(attach, batch_format="pyarrow") \
        .sort(["revenue_e4", "c_custkey"], descending=[True, False]) \
        .limit(k)


def events_quantiles_cont(events_ds, *, qs: tuple = (0.5, 0.9)):
    """Per-type INTERPOLATED quantiles (SQL ``quantile_cont``) ->
    (event_type, q, value): lower + frac*(upper-lower) at position
    q*(n-1) over the ordered values — the continuous counterpart of
    events_quantiles' discrete family, exact (not sketched) from the
    same (type, cents) histogram: per-batch count combiner -> one tiny
    groupby -> per-type order-statistics walk over distinct values.
    Raw rows never shuffle; per-group state is O(distinct values).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "c": pc.cast(pc.round(pc.multiply(batch.column("value"),
                                              pa.scalar(100.0))),
                         pa.int64()),
        })
        agg = t.group_by(["event_type", "c"]).aggregate([([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "c": agg.column("c"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    hist = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "c"]).aggregate(Sum("partial_n"))

    def finish(group: pa.Table) -> pa.Table:
        g = group.sort_by([("c", "ascending")])
        vals = g.column("c").to_numpy(zero_copy_only=False) / 100.0
        cnt = g.column("sum(partial_n)").to_numpy(zero_copy_only=False)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            pos = q * (n - 1)
            lo_i = int(np.floor(pos))
            hi_i = int(np.ceil(pos))
            frac = pos - lo_i
            lo_v = vals[np.searchsorted(cum, lo_i + 1)]
            hi_v = vals[np.searchsorted(cum, hi_i + 1)]
            out_q.append(q)
            out_v.append(lo_v + frac * (hi_v - lo_v))
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()] * len(qs)),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        })

    return hist.groupby("event_type").map_groups(
        finish, batch_format="pyarrow")


def time_to_conversion(events_ds, *, from_type: str = "click",
                       to_type: str = "purchase",
                       window_secs: float = 86400.0):
    """Forward as-of: for every ``from_type`` event, the user's NEXT
    ``to_type`` event within the window -> (event_id, user_id, ts,
    conv_id, secs_to_conv) — the time-to-conversion dual of
    last_touch_attribution (searchsorted 'left' on the forward
    timeline instead of 'right' on the backward one). No-match rows
    carry sentinels -1 / -1.0. Ties at the same conversion ts resolve
    to the LOWEST conversion event_id (mirrors ORDER BY ts, event_id
    LIMIT 1).
    """
    win_us = int(window_secs * 1e6)

    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        types = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g.column("event_id").to_numpy(zero_copy_only=False)
        src = types == from_type
        dst = types == to_type
        d_ts, d_id = ts[dst], ids[dst]
        s_ts = ts[src]
        out_schema = {
            "event_id": pa.int64(), "user_id": pa.int64(),
            "ts": g.schema.field("ts").type,
            "conv_id": pa.int64(), "secs_to_conv": pa.float64(),
        }
        if not len(s_ts):
            return pa.schema(list(out_schema.items())).empty_table()
        if len(d_ts):
            idx = np.searchsorted(d_ts, s_ts, side="left")
            ok = idx < len(d_ts)
            safe = np.clip(idx, 0, len(d_ts) - 1)
            matched = np.where(ok, d_ts[safe], 0)
            ok &= (matched - s_ts) <= win_us
            conv_id = np.where(ok, d_id[safe], -1).astype(np.int64)
            secs = np.where(ok, (matched - s_ts) / 1e6, -1.0)
        else:
            conv_id = np.full(len(s_ts), -1, np.int64)
            secs = np.full(len(s_ts), -1.0, np.float64)
        st = g.filter(pa.array(src))
        return pa.table({
            "event_id": st.column("event_id"),
            "user_id": st.column("user_id"),
            "ts": st.column("ts"),
            "conv_id": pa.array(conv_id, pa.int64()),
            "secs_to_conv": pa.array(secs, pa.float64()),
        })

    return per_key_in_buckets(
        events_ds.select_columns(
            ["event_id", "user_id", "event_type", "ts"]),
        "user_id", scan)


def session_paths(events_ds, *, gap_secs: float = 1800.0, k: int = 25,
                  sep: str = ">"):
    """Most common session journeys -> top-``k`` (path, n): events are
    sessionized per user (gap rule), each session becomes its ordered
    event-type path string, and paths are counted corpus-wide — the
    product-analytics "top user journeys" query, composed from the
    sessionize + string_agg + heavy-key shapes.

    ONE groupby(user_id) shuffle carrying (user_id, ts, event_id,
    event_type); sessions never span users so the gap split and path
    join run in-task; each group emits (path, partial_count) rows —
    already aggregated within the user — and one tiny groupby(path)
    sum + sort-limit finishes. Raw events never shuffle twice.
    """
    gap_us = int(gap_secs * 1e6)

    from ray.data.aggregate import Sum

    def per_user(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = g.column("event_type").to_pylist()
        breaks = np.zeros(len(ts), bool)
        breaks[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(breaks)
        from collections import Counter

        paths: Counter = Counter()
        start = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or sess[i] != sess[start]:
                paths[sep.join(types[start:i])] += 1
                start = i
        return pa.table({
            "path": pa.array(list(paths.keys()), pa.string()),
            "partial_n": pa.array(list(paths.values()), pa.int64()),
        })

    partial = per_key_in_buckets(
        events_ds.select_columns(
            ["event_id", "user_id", "ts", "event_type"]),
        "user_id", per_user)

    agg = coalesce_small(partial).groupby("path").aggregate(
        Sum("partial_n"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "path": batch.column("path"),
            "n": pc.cast(batch.column("sum(partial_n)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow") \
        .sort(["n", "path"], descending=[True, False]).limit(k)


def events_daily_report(events_ds):
    """Fused multi-metric daily rollup -> (day, n_events,
    sum_value_cents, n_purchases, purchase_cents): four aggregates
    computed in ONE combiner pass and ONE groupby(day) — the fusion
    pattern that matters at 100 TB (each extra metric is a column on
    the same tiny partial row, not another scan/shuffle of the fact
    table). Exact integer cents everywhere.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"),
                                             pa.scalar(100.0))),
                        pa.int64())
        is_p = pc.equal(batch.column("event_type"),
                        pa.scalar("purchase"))
        t = pa.table({
            "day": day,
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "cents": cents,
            "p_one": pc.cast(is_p, pa.int64()),
            "p_cents": pc.if_else(is_p, cents, pa.scalar(0, pa.int64())),
        })
        agg = t.group_by("day").aggregate(
            [("one", "sum"), ("cents", "sum"), ("p_one", "sum"),
             ("p_cents", "sum")])
        return pa.table({
            "day": agg.column("day"),
            "pn": pc.cast(agg.column("one_sum"), pa.int64()),
            "pc_": pc.cast(agg.column("cents_sum"), pa.int64()),
            "pp": pc.cast(agg.column("p_one_sum"), pa.int64()),
            "ppc": pc.cast(agg.column("p_cents_sum"), pa.int64()),
        })

    agg = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("day").aggregate(Sum("pn"), Sum("pc_"), Sum("pp"),
                                  Sum("ppc"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch.column("day"),
            "n_events": pc.cast(batch.column("sum(pn)"), pa.int64()),
            "sum_value_cents": pc.cast(batch.column("sum(pc_)"),
                                       pa.int64()),
            "n_purchases": pc.cast(batch.column("sum(pp)"), pa.int64()),
            "purchase_cents": pc.cast(batch.column("sum(ppc)"),
                                      pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def daily_change_by_type(events_ds):
    """Day-over-day change of daily event counts per type ->
    (event_type, day, n, delta, pct_change float64; first day carries
    delta 0 / pct_change 0.0) — the "window AFTER aggregate" pattern:
    the LAG runs on the already-reduced (type, day) table (types x
    days rows), so the windowing is in-task per type and effectively
    free; only count partials ever shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
        })
        agg = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "day": agg.column("day"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "day"]).aggregate(Sum("partial_n"))

    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("day", "ascending")])
        n = g.column("sum(partial_n)").to_numpy(zero_copy_only=False)
        delta = np.zeros(len(n), np.int64)
        pct = np.zeros(len(n), np.float64)
        if len(n) > 1:
            delta[1:] = n[1:] - n[:-1]
            pct[1:] = (n[1:] - n[:-1]) / n[:-1]
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()] * len(n)),
            "day": g.column("day"),
            "n": pa.array(n, pa.int64()),
            "delta": pa.array(delta, pa.int64()),
            "pct_change": pa.array(pct, pa.float64()),
        })

    return counts.groupby("event_type").map_groups(
        scan, batch_format="pyarrow")


def purge_keys(ds, *, key_col: str, keys, audit: bool = False):
    """Right-to-be-forgotten purge: drop every row whose ``key_col``
    is in ``keys`` -> the kept Dataset (and, with ``audit=True``, a
    per-key removed-row-count audit table instead — run it first,
    store it, then rewrite).

    The deletion set is broadcast ONCE via ray.put and applied with a
    vectorized is_in inside map_batches — a pure map-only pass over
    the corpus, trivially resumable per partition; never a join, never
    a shuffle. At GDPR scale the keys list is tiny next to the corpus.
    """
    import ray

    from ray.data.aggregate import Sum

    kref = ray.put(sorted(set(keys)))

    def drop(batch: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        mask = pc.is_in(batch.column(key_col),
                        value_set=pa.array(ks))
        return batch.filter(pc.invert(mask))

    if not audit:
        return ds.map_batches(drop, batch_format="pyarrow")

    def count_removed(batch: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        mask = pc.is_in(batch.column(key_col), value_set=pa.array(ks))
        hit = batch.filter(mask)
        agg = hit.select([key_col]).group_by(key_col) \
            .aggregate([([], "count_all")])
        return pa.table({
            key_col: agg.column(key_col),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = coalesce_small(
        ds.map_batches(count_removed, batch_format="pyarrow")) \
        .groupby(key_col).aggregate(Sum("partial_n"))
    return agg.map_batches(
        lambda b: pa.table({
            key_col: b.column(key_col),
            "n_removed": pc.cast(b.column("sum(partial_n)"), pa.int64()),
        }), batch_format="pyarrow")


def merge_rollups(rollup_a, rollup_b, *, key_cols: list[str],
                  sum_cols: list[str]):
    """Incremental-aggregation maintenance: combine two additive
    rollups (yesterday's materialized aggregate + today's delta
    aggregate) into the up-to-date rollup WITHOUT touching raw data —
    union the two small tables and re-sum. Correct for any additive
    metric (counts, cents sums) because integer addition is
    associative; averages/ratios must be stored as (numerator,
    denominator) pairs upstream and divided only at read time.
    """
    from ray.data.aggregate import Sum

    merged = rollup_a.union(rollup_b)
    agg = coalesce_small(merged).groupby(key_cols).aggregate(
        *[Sum(c) for c in sum_cols])

    def rename(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in key_cols}
        for c in sum_cols:
            cols[c] = pc.cast(batch.column(f"sum({c})"), pa.int64())
        return pa.table(cols)

    return agg.map_batches(rename, batch_format="pyarrow")


def snapshot_column_diff(ds_a, ds_b, *, key_col: str,
                         compare_cols: list[str],
                         num_partitions: int = 16):
    """Column-level restatement audit between two snapshots of the
    same keyed table -> one row per compared column: (column,
    n_changed, n_matched_keys) — "what exactly moved?" when a
    backfill lands, at column granularity rather than corpus_diff's
    row granularity.

    One native hash join on the key (both sides pruned to key +
    compared columns BEFORE the shuffle), then per-batch vectorized
    not-equal partial counts -> a k-row final sum. Only the compared
    columns ever cross the exchange.
    """
    from ray.data.aggregate import Sum

    def prune(suffix: str):
        def f(batch: pa.Table) -> pa.Table:
            cols = {key_col: batch.column(key_col)}
            for c in compare_cols:
                cols[f"{c}{suffix}"] = batch.column(c)
            return pa.table(cols)
        return f

    a = coalesce_small(ds_a.map_batches(prune("_a"),
                                        batch_format="pyarrow"))
    b = coalesce_small(ds_b.map_batches(prune("_b"),
                                        batch_format="pyarrow"))
    joined = a.join(b, join_type="inner",
                    num_partitions=num_partitions, on=(key_col,))

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols, changed = [], []
        for c in compare_cols:
            ca, cb = batch.column(f"{c}_a"), batch.column(f"{c}_b")
            # not_equal is NULL when either side is null, and pc.sum
            # skips nulls — a value changing to/from NULL would count
            # as unchanged. null<->value IS a change; null<->null isn't.
            neq = pc.coalesce(pc.not_equal(ca, cb),
                              pc.xor(pc.is_null(ca), pc.is_null(cb)))
            cols.append(c)
            changed.append(int(pc.sum(pc.cast(neq, pa.int64()))
                               .as_py() or 0))
        return pa.table({
            "column": pa.array(cols, pa.string()),
            "p_changed": pa.array(changed, pa.int64()),
            "p_keys": pa.array([n] * len(cols), pa.int64()),
        })

    agg = coalesce_small(
        joined.map_batches(partial, batch_format="pyarrow")) \
        .groupby("column").aggregate(Sum("p_changed"), Sum("p_keys"))

    return agg.map_batches(
        lambda t: pa.table({
            "column": t.column("column"),
            "n_changed": pc.cast(t.column("sum(p_changed)"), pa.int64()),
            "n_matched_keys": pc.cast(t.column("sum(p_keys)"),
                                      pa.int64()),
        }), batch_format="pyarrow")


def late_orders_by_priority(orders_ds, lineitem_ds, *,
                            late_days: int = 90,
                            num_buckets: int = 256):
    """TPC-H Q4-shaped EXISTS rollup: count orders per priority having
    AT LEAST ONE line shipped more than ``late_days`` after the order
    date -> (o_orderpriority, late_orders).

    Bucketed co-group instead of groupby+join: lineitem pre-aggregates
    to ONE (orderkey, max_shipdate) row per order per block (existence
    only needs the max), orders prune to (key, date, priority), both
    sides union into one slim stream tagged hash(orderkey)%B, and ONE
    low-cardinality groupby(_bucket) co-locates each order's rows. The
    per-bucket task then does the exact max + join + late predicate in
    Arrow — replacing a ~|orders|-key global aggregate AND a hash join
    (each seconds of fixed shuffle overhead) with a single B-key
    exchange of one slim row per order per side. ``num_buckets`` bounds
    reducer fan-in independently of order cardinality; raise it with
    data size so a bucket fits one task's heap.
    """
    from ray.data.aggregate import Sum

    from ..stages.util import bucketed_map_groups

    ts = pa.timestamp("us")

    def line_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["l_orderkey", "l_shipdate"]) \
            .group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        n = agg.num_rows
        return pa.table({
            "k": agg.column("l_orderkey"),
            "p_max": pc.cast(agg.column("l_shipdate_max"), ts),
            "o_orderdate": pa.nulls(n, ts),
            "o_orderpriority": pa.nulls(n, pa.string()),
        })

    def order_slim(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "k": batch.column("o_orderkey"),
            "p_max": pa.nulls(n, ts),
            "o_orderdate": pc.cast(batch.column("o_orderdate"), ts),
            "o_orderpriority": batch.column("o_orderpriority"),
        })

    lines = lineitem_ds.map_batches(line_partial, batch_format="pyarrow")
    orders = orders_ds.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(order_slim, batch_format="pyarrow")

    late_us = late_days * 86_400_000_000

    def bucket_rollup(group: pa.Table) -> pa.Table:
        is_line = pc.is_valid(group.column("p_max"))
        maxed = group.filter(is_line).select(["k", "p_max"]) \
            .group_by("k").aggregate([("p_max", "max")])
        orders_side = group.filter(pc.invert(is_line)) \
            .select(["k", "o_orderdate", "o_orderpriority"])
        joined = orders_side.join(maxed, keys="k", join_type="inner")
        diff = pc.subtract(
            pc.cast(joined.column("p_max_max"), pa.int64()),
            pc.cast(joined.column("o_orderdate"), pa.int64()))
        late = joined.filter(pc.greater(diff, pa.scalar(late_us,
                                                        pa.int64())))
        agg = late.select(["o_orderpriority"]) \
            .group_by("o_orderpriority").aggregate([([], "count_all")])
        return pa.table({
            "o_orderpriority": agg.column("o_orderpriority"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    partials = bucketed_map_groups(lines.union(orders), "k",
                                   bucket_rollup,
                                   num_buckets=num_buckets)
    out = coalesce_small(partials) \
        .groupby("o_orderpriority").aggregate(Sum("partial_n"))
    return out.map_batches(
        lambda b: pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "late_orders": pc.cast(b.column("sum(partial_n)"),
                                   pa.int64()),
        }), batch_format="pyarrow")


def open_orders_by_day(orders_ds, lineitem_ds, *,
                       num_partitions: int = 16):
    """Interval sweep-line: how many orders are OPEN (placed, not yet
    fully shipped) on each change day -> (day, open_orders). An order
    is open from its order date through its last line's ship date.

    The classic interval-counting decomposition: each order reduces to
    TWO delta rows (+1 at start day, -1 the day after its end), a tiny
    groupby(day) nets them, and one ordered prefix sum over the
    distinct-day table (driver-small) yields the census — never a
    days x orders cross join. End dates come from the same
    slim (orderkey, max_shipdate) pre-aggregate as
    late_orders_by_priority.
    """
    from ray.data.aggregate import Max, Sum

    def line_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["l_orderkey", "l_shipdate"]) \
            .group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        return pa.table({
            "l_orderkey": agg.column("l_orderkey"),
            "p_max": agg.column("l_shipdate_max"),
        })

    ends = coalesce_small(
        lineitem_ds.map_batches(line_partial, batch_format="pyarrow")) \
        .groupby("l_orderkey").aggregate(Max("p_max"))
    ends = ends.map_batches(
        lambda b: pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "end_ship": b.column("max(p_max)"),
        }), batch_format="pyarrow")

    orders = coalesce_small(orders_ds.select_columns(
        ["o_orderkey", "o_orderdate"]))
    joined = orders.join(coalesce_small(ends), join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    day_us = 86_400_000_000

    def deltas(batch: pa.Table) -> pa.Table:
        s = pc.floor_temporal(pc.cast(batch.column("o_orderdate"),
                                      pa.timestamp("us")), unit="day")
        e = pc.floor_temporal(pc.cast(batch.column("end_ship"),
                                      pa.timestamp("us")), unit="day")
        e_next = pc.cast(pc.add(pc.cast(e, pa.int64()),
                                pa.scalar(day_us, pa.int64())),
                         pa.timestamp("us"))
        t = pa.table({
            "day": pa.concat_arrays([
                s.combine_chunks() if isinstance(s, pa.ChunkedArray)
                else s,
                e_next.combine_chunks()
                if isinstance(e_next, pa.ChunkedArray) else e_next]),
            "delta": pa.array([1] * batch.num_rows
                              + [-1] * batch.num_rows, pa.int64()),
        })
        agg = t.group_by("day").aggregate([("delta", "sum")])
        return pa.table({"day": agg.column("day"),
                         "p_delta": pc.cast(agg.column("delta_sum"),
                                            pa.int64())})

    net = coalesce_small(joined.map_batches(deltas,
                                            batch_format="pyarrow")) \
        .groupby("day").aggregate(Sum("p_delta"))

    def prefix(batch: pa.Table) -> pa.Table:
        g = batch.sort_by([("day", "ascending")])
        d = g.column("sum(p_delta)").to_numpy(zero_copy_only=False)
        return pa.table({
            "day": g.column("day"),
            "open_orders": pa.array(np.cumsum(d), pa.int64()),
        })

    return net.repartition(1).map_batches(prefix, batch_format="pyarrow",
                                          batch_size=None)


def anomalous_days(events_ds, *, k_sigma: int = 3):
    """Daily-volume anomaly flags per event type -> (event_type, day,
    n, is_anomaly): a day is anomalous when its count deviates from
    the type's mean by more than ``k_sigma`` standard deviations —
    evaluated in EXACT integer arithmetic (flag iff
    (D*n - S)^2 > k^2 * (D*Q - S^2), with D days, S = sum counts,
    Q = sum squares), so the flag is bit-reproducible on any engine
    and any summation order — no float mean/sqrt anywhere.

    Shape: per-batch (type, day) count combiner -> tiny groupby ->
    per-type finalize over ~days rows. Population sigma (divide by D),
    matching the SQL oracle's integer formula exactly.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
        })
        agg = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "day": agg.column("day"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "day"]).aggregate(Sum("partial_n"))

    def finish(group: pa.Table) -> pa.Table:
        g = group.sort_by([("day", "ascending")])
        n = [int(v) for v in
             g.column("sum(partial_n)").to_pylist()]     # python ints:
        d = len(n)                                       # exact algebra
        s = sum(n)
        q = sum(v * v for v in n)
        var_d2 = d * q - s * s        # D^2 * variance (exact int)
        flags = [(d * v - s) ** 2 > k_sigma * k_sigma * var_d2
                 for v in n]
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()] * d),
            "day": g.column("day"),
            "n": pa.array(n, pa.int64()),
            "is_anomaly": pa.array(flags, pa.bool_()),
        })

    return counts.groupby("event_type").map_groups(
        finish, batch_format="pyarrow")


def weekly_active_users(events_ds, *, window_days: int = 7):
    """Trailing-window distinct users per day (WAU) -> (day, wau):
    for each observed day, how many distinct users were active in the
    last ``window_days`` days — the sliding-window COUNT(DISTINCT) SQL
    window functions cannot express.

    Decomposition that never re-counts a user per window: each user's
    distinct active days become disjoint coverage intervals
    [d_i, min(d_i + w - 1, d_(i+1) - 1)] (clipping each window at the
    user's next active day makes the union exact with no set math).
    Intervals become +1/-1 delta rows, a day-cardinality groupby nets
    them, and one ordered prefix sum over the distinct-day table
    (driver-small, like open_orders_by_day) yields the census for
    every day, filtered to OBSERVED days (those carrying a +1 start,
    which are exactly the active days).

    Shuffle shape: per-block distinct (user, day) pairs ride ONE
    low-cardinality hash(user)%B exchange (bucketed_map_groups); the
    per-bucket task dedups pairs and emits interval deltas fully
    vectorized (dictionary-encoded users, lexsort, shifted-neighbor
    clipping) — no ~|users|-key global aggregate and no per-user
    Python call, the two sf0.1 hot spots of the previous shape.
    """
    from ray.data.aggregate import Max, Sum

    from ..stages.util import bucketed_map_groups

    day_us = 86_400_000_000

    def day_pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": batch.column("user_id"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
        })
        return t.group_by(["user_id", "day"]).aggregate([])

    pairs = events_ds.map_batches(day_pairs, batch_format="pyarrow")

    def bucket_deltas(group: pa.Table) -> pa.Table:
        t = group.group_by(["user_id", "day"]).aggregate([])
        uid = t.column("user_id").dictionary_encode().combine_chunks() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        day = pc.cast(pc.cast(t.column("day"), pa.timestamp("us")),
                      pa.int64()).to_numpy(zero_copy_only=False) // day_us
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        nxt = np.append(day[1:], np.iinfo(np.int64).max)
        same = np.append(uid[1:] == uid[:-1], False)
        nxt[~same] = np.iinfo(np.int64).max
        end = np.minimum(day + window_days - 1, nxt - 1)
        deltas = pa.table({
            "d": pa.array(np.concatenate([day, end + 1]), pa.int64()),
            "delta": pa.array(
                np.concatenate([np.ones(len(day), np.int64),
                                -np.ones(len(day), np.int64)])),
            "obs": pa.array(
                np.concatenate([np.ones(len(day), np.int64),
                                np.zeros(len(day), np.int64)])),
        })
        g = deltas.group_by("d").aggregate([("delta", "sum"),
                                            ("obs", "max")])
        return pa.table({
            "d": g.column("d"),
            "delta": g.column("delta_sum"),
            "obs": g.column("obs_max"),
        })

    deltas = bucketed_map_groups(pairs, "user_id", bucket_deltas)
    netted = coalesce_small(deltas).groupby("d") \
        .aggregate(Sum("delta"), Max("obs"))

    def sweep(batch: pa.Table) -> pa.Table:
        # distinct-day table: bounded by calendar span, not events
        d = batch.column("d").to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d = d[order]
        delta = pc.cast(batch.column("sum(delta)"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[order]
        obs = pc.cast(batch.column("max(obs)"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[order]
        wau = np.cumsum(delta)
        keep = obs == 1
        return pa.table({
            "day": pa.array(d[keep] * day_us).cast(pa.timestamp("us")),
            "wau": pa.array(wau[keep], pa.int64()),
        })

    return netted.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None)


def _pareto_prune(qty: np.ndarray, price: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the (maximize qty, minimize price) skyline
    with duplicate-point survival: a point is dropped iff some point
    has qty >= AND price <= with at least one strict."""
    order = np.lexsort((price, -qty))      # qty desc, price asc
    q, p = qty[order], price[order]
    keep_sorted = np.zeros(len(q), bool)
    best = np.inf                          # min price among STRICTLY higher qty
    i = 0
    while i < len(q):
        j = i
        while j < len(q) and q[j] == q[i]:
            j += 1
        level_min = p[i]                   # sorted asc within level
        if level_min < best:
            k = i
            while k < j and p[k] == level_min:
                keep_sorted[k] = True      # all ties at the level min
                k += 1
        best = min(best, level_min)
        i = j
    keep = np.zeros(len(q), bool)
    keep[order] = keep_sorted
    return keep


def pareto_front(ds, *, max_col: str, min_col: str, id_col: str):
    """Distributed skyline: the points not dominated on (maximize
    ``max_col``, minimize ``min_col``) -> (id, max_col, min_col).

    The textbook combiner op: pareto(pareto(A) ∪ pareto(B)) =
    pareto(A ∪ B), so every block prunes to its own (tiny) front
    before anything moves, and the final exact pass runs over
    candidates only — at 100 TB the front is usually a few hundred
    rows however big the input. Duplicate optimal points all survive
    (neither dominates the other), matching the NOT EXISTS oracle.
    """
    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([id_col, max_col, min_col])
        q = batch.column(max_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        p = batch.column(min_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return batch.select([id_col, max_col, min_col]) \
            .filter(pa.array(_pareto_prune(q, p)))

    cand = coalesce_small(ds.map_batches(prune, batch_format="pyarrow"))
    return cand.repartition(1).map_batches(prune, batch_format="pyarrow",
                                           batch_size=None)


_RFM_COLS = ("recency_days", "frequency", "monetary_cents",
             "r_tile", "f_tile", "m_tile")


def _rfm_widen(present: dict):
    """Pad a (user_id, some-subset) table to the full RFM schema with
    int64 nulls, so the tile tables and the metrics table union into
    one groupby(user_id) max-pivot."""
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {"user_id": batch.column("user_id")}
        for c in _RFM_COLS:
            cols[c] = (batch.column(present[c]) if c in present
                       else pa.nulls(n, pa.int64()))
        return pa.table(cols)
    return fn


def rfm_segments(events_ds, *, n_tiles: int = 5):
    """RFM segmentation -> (user_id, recency_days, frequency,
    monetary_cents, r_tile, f_tile, m_tile): the marketing-analytics
    staple — each user's recency (days since their last event,
    anchored at the corpus max ts), frequency and monetary quintiles.

    Fully distributed (no per-entity single task): the per-user
    reduction is the usual combiner + one groupby (exact ints); each
    metric is then tiled with rank_rows' value-histogram exclusive-scan
    idiom (O(distinct metric values) driver state, (user_id, metric)
    pairs on the shuffle), and the three (user_id, tile) tables pivot
    back onto the metrics table via one union + groupby(user_id) Max
    (Max over exactly-one-non-null columns = join). Tiles use SQL
    NTILE semantics over (metric ASC, user_id ASC) — deterministic
    under ties. For continuous money at extreme cardinality, quantize
    cents to range buckets first (rank_rows docstring note).
    """
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"),
                                             pa.scalar(100.0))),
                        pa.int64())
        t = pa.table({"user_id": batch.column("user_id"),
                      "ts": batch.column("ts"), "c": cents})
        agg = t.group_by("user_id").aggregate(
            [("ts", "max"), ("c", "sum"), ([], "count_all")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "p_last": agg.column("ts_max"),
            "p_cents": pc.cast(agg.column("c_sum"), pa.int64()),
            "p_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    per_user = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("user_id").aggregate(Max("p_last"), Sum("p_cents"),
                                      Sum("p_n")).materialize()

    # global anchor: a driver scalar, not a repartition(1)
    anchor = per_user.max("max(p_last)")
    anchor_us = pa.scalar(anchor).cast(pa.timestamp("us")) \
        .cast(pa.int64()).as_py()

    def to_metrics(batch: pa.Table, *, anchor_us: int) -> pa.Table:
        # the groupby Max can narrow timestamp[us] -> timestamp[s];
        # re-widen before the integer microsecond math
        last = batch.column("max(p_last)") \
            .cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rec = (anchor_us - last) // 86_400_000_000
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "recency_days": pa.array(rec, pa.int64()),
            "frequency": pc.cast(batch.column("sum(p_n)"), pa.int64()),
            "monetary_cents": pc.cast(batch.column("sum(p_cents)"),
                                      pa.int64()),
        })

    metrics = per_user.map_batches(
        to_metrics, fn_kwargs={"anchor_us": anchor_us},
        batch_format="pyarrow").materialize()

    parts = [metrics.map_batches(
        _rfm_widen({c: c for c in _RFM_COLS[:3]}),
        batch_format="pyarrow")]
    for metric, out in (("recency_days", "r_tile"),
                        ("frequency", "f_tile"),
                        ("monetary_cents", "m_tile")):
        ranked = rank_rows(metrics, key_col=metric, id_col="user_id",
                           ntile_k=n_tiles)
        tiles = ranked.map_batches(
            lambda b, out=out: pa.table({
                "user_id": pc.cast(b.column("user_id"), pa.int64()),
                out: pc.cast(b.column("tile"), pa.int64()),
            }), batch_format="pyarrow")
        parts.append(tiles.map_batches(_rfm_widen({out: out}),
                                       batch_format="pyarrow"))

    unioned = parts[0].union(*parts[1:])
    agg = coalesce_small(unioned).groupby("user_id").aggregate(
        *[Max(c) for c in _RFM_COLS])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": batch.column("user_id")}
            | {c: pc.cast(batch.column(f"max({c})"), pa.int64())
               for c in _RFM_COLS})

    return agg.map_batches(rename, batch_format="pyarrow")


def ewma_daily(events_ds, *, alpha: float = 0.5):
    """EWMA-smoothed daily counts per type -> (event_type, day, n,
    value_ewma): value_ewma_t = alpha * sum_i n_i (1-alpha)^(t-i)
    over the type's day index — trend smoothing on the REDUCED
    (type, day) table, so the sequential scan is in-task and free
    (window-after-aggregate again). alpha = 0.5 keeps every decay
    power an exact binary fraction.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
        })
        agg = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "day": agg.column("day"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["event_type", "day"]).aggregate(Sum("partial_n"))

    def scan(group: pa.Table) -> pa.Table:
        g = group.sort_by([("day", "ascending")])
        n = g.column("sum(partial_n)").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        t = np.arange(len(n))
        # closed form sum (not the recurrence) so the float op ORDER
        # matches the SQL power-sum oracle term-for-term per row
        decay = (1.0 - alpha) ** (t[:, None] - t[None, :])
        decay = np.tril(decay)
        ewma = alpha * (decay * n[None, :]).sum(axis=1)
        return pa.table({
            "event_type": pa.array(
                [group.column("event_type")[0].as_py()] * len(n)),
            "day": g.column("day"),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "value_ewma": pa.array(ewma, pa.float64()),
        })

    return counts.groupby("event_type").map_groups(
        scan, batch_format="pyarrow")


def activity_heatmap(events_ds):
    """Usage heatmap -> (dow, hour, n): event counts per (ISO day of
    week 1-7, hour 0-23) — the calendar-features rollup. One combiner
    pass, one tiny groupby; the output is at most 168 rows however
    large the input.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        t = pa.table({
            "dow": pc.cast(pc.day_of_week(
                ts, options=pc.DayOfWeekOptions(
                    count_from_zero=False, week_start=1)), pa.int64()),
            "hour": pc.cast(pc.hour(ts), pa.int64()),
        })
        agg = t.group_by(["dow", "hour"]).aggregate([([], "count_all")])
        return pa.table({
            "dow": agg.column("dow"),
            "hour": agg.column("hour"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["dow", "hour"]).aggregate(Sum("partial_n"))
    return agg.map_batches(
        lambda b: pa.table({
            "dow": b.column("dow"),
            "hour": b.column("hour"),
            "n": pc.cast(b.column("sum(partial_n)"), pa.int64()),
        }), batch_format="pyarrow")


def activity_gini(events_ds):
    """Gini coefficient of per-user event-count inequality -> one row
    (n_users, value_gini): the "is 1% of users generating 90% of the
    data?" scalar.

    Fully distributed (no per-entity single task): per-user counts
    reduce first (combiner + groupby), then a SECOND combiner folds
    them to a value histogram (count value c -> m_c users), so the
    finalizer holds O(distinct count values) rows — Zipf-bounded
    (max events/user), never O(users). The sorted weighted sum is
    computed per tie-run in closed form: a run of m users at value c
    starting after global offset o contributes
    c * (m*o + m*(m+1)/2), which equals sum(i * x_i) over any
    within-tie order. G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n; all
    sums are exact ints, only the two final divisions are float,
    mirrored exactly in the oracle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["user_id"]).group_by("user_id") \
            .aggregate([([], "count_all")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    per_user = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("user_id").aggregate(Sum("partial_n"))

    def hist_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["sum(partial_n)"]).group_by("sum(partial_n)") \
            .aggregate([([], "count_all")])
        return pa.table({
            "c": pc.cast(agg.column("sum(partial_n)"), pa.int64()),
            "partial_m": pc.cast(agg.column("count_all"), pa.int64()),
        })

    hist = coalesce_small(
        per_user.map_batches(hist_partial, batch_format="pyarrow")) \
        .groupby("c").aggregate(Sum("partial_m"))

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        m = batch.column("sum(partial_m)").to_numpy(zero_copy_only=False)
        order = np.argsort(c)
        c, m = c[order], m[order]
        off = np.concatenate(([0], np.cumsum(m)[:-1]))
        n = int(m.sum())
        total = int((c * m).sum())
        # Python-int accumulation: m*off ~ n^2 overflows int64 near
        # n ~ 3e9 users and numpy wraps silently; this table is
        # O(distinct count values) rows, so the object-dtype pass
        # costs nothing
        weighted = int((c.astype(object)
                        * (m.astype(object) * off.astype(object)
                           + m.astype(object) * (m.astype(object) + 1)
                           // 2)).sum())
        gini = 2.0 * weighted / (n * total) - (n + 1.0) / n
        return pa.table({
            "n_users": pa.array([n], pa.int64()),
            "value_gini": pa.array([gini], pa.float64()),
        })

    # repartition(1) over the histogram, not the users — bounded by
    # distinct count values (same class as pareto_front/value_histogram)
    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def source_concentration(docs_ds):
    """Herfindahl-Hirschman concentration of the corpus across
    sources -> one row (n_sources, total_docs, value_hhi):
    hhi = sum(n_i^2) / (sum n_i)^2, 1/n_sources (even) .. 1.0
    (single-source). Exact integer numerator/denominator, one final
    division.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["source"]).group_by("source") \
            .aggregate([([], "count_all")])
        return pa.table({
            "source": agg.column("source"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    per_src = coalesce_small(
        docs_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("source").aggregate(Sum("partial_n"))

    def finish(batch: pa.Table) -> pa.Table:
        x = batch.column("sum(partial_n)").to_numpy(zero_copy_only=False)
        total = int(x.sum())
        num = int((x.astype(object) ** 2).sum())   # exact python ints
        return pa.table({
            "n_sources": pa.array([len(x)], pa.int64()),
            "total_docs": pa.array([total], pa.int64()),
            "value_hhi": pa.array([num / (total * total)], pa.float64()),
        })

    return per_src.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def session_stats(events_ds, *, gap_secs: float = 1800.0):
    """Per-user session summary -> (user_id, n_sessions, bounces,
    value_bounce_rate): sessions are gap-split per user (same rule as
    sessionize_events); a bounce is a single-event session. One
    groupby(user_id) shuffle of (user, ts, event_id) triples; the gap
    split, session sizing and ratio all run in-task. Ratio is an
    exact integer division.
    """
    gap_us = int(gap_secs * 1e6)

    def per_user(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        breaks = np.zeros(len(ts), bool)
        breaks[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(breaks)
        sizes = np.bincount(sess)
        n_sessions = len(sizes)
        bounces = int((sizes == 1).sum())
        return pa.table({
            "user_id": pa.array([group.column("user_id")[0].as_py()],
                                pa.int64()),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "bounces": pa.array([bounces], pa.int64()),
            "value_bounce_rate": pa.array([bounces / n_sessions],
                                          pa.float64()),
        })

    return per_key_in_buckets(
        events_ds.select_columns(["event_id", "user_id", "ts"]),
        "user_id", per_user)


def type_cooccurrence_lift(events_ds, *, gap_secs: float = 1800.0):
    """Market-basket association over sessions -> (type_a, type_b,
    n_both, n_a, n_b, n_sessions, value_lift) for every unordered
    type pair (a < b): lift = P(a,b) / (P(a) P(b)) over session
    baskets — "users who error also purchase?"-style co-occurrence
    mining, exact.

    One groupby(user) shuffle (sessions never span users): each
    user's group emits per-session distinct-type sets pre-counted as
    (pair, 1) and (type, 1) partials; two tiny groupbys make global
    counts; lift evaluates as exact integer products with one final
    float division: (n_both * n_sessions) / (n_a * n_b).
    """
    from itertools import combinations

    import ray

    from ray.data.aggregate import Sum

    gap_us = int(gap_secs * 1e6)

    def per_user(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = g.column("event_type").to_pylist()
        breaks = np.zeros(len(ts), bool)
        breaks[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(breaks)
        out_a, out_b, out_n = [], [], []
        n_sessions = 0
        start = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or sess[i] != sess[start]:
                basket = sorted(set(types[start:i]))
                n_sessions += 1
                for t in basket:                      # singles: ('', t)
                    out_a.append("")
                    out_b.append(t)
                    out_n.append(1)
                for x, y in combinations(basket, 2):  # pairs
                    out_a.append(x)
                    out_b.append(y)
                    out_n.append(1)
                start = i
        out_a.append("#S")                            # session counter
        out_b.append("")
        out_n.append(n_sessions)
        return pa.table({
            "a": pa.array(out_a, pa.string()),
            "b": pa.array(out_b, pa.string()),
            "partial_n": pa.array(out_n, pa.int64()),
        })

    counts = coalesce_small(
        per_key_in_buckets(
            events_ds.select_columns(["event_id", "user_id", "ts",
                                      "event_type"]),
            "user_id", per_user)) \
        .groupby(["a", "b"]).aggregate(Sum("partial_n")).take_all()

    singles, pairs = {}, {}
    n_sessions = 0
    for r in counts:
        if r["a"] == "#S":
            n_sessions += r["sum(partial_n)"]
        elif r["a"] == "":
            singles[r["b"]] = r["sum(partial_n)"]
        else:
            pairs[(r["a"], r["b"])] = r["sum(partial_n)"]

    import ray.data

    rows = sorted(pairs.items())
    return ray.data.from_arrow(pa.table({
        "type_a": pa.array([k[0] for k, _ in rows], pa.string()),
        "type_b": pa.array([k[1] for k, _ in rows], pa.string()),
        "n_both": pa.array([v for _, v in rows], pa.int64()),
        "n_a": pa.array([singles[k[0]] for k, _ in rows], pa.int64()),
        "n_b": pa.array([singles[k[1]] for k, _ in rows], pa.int64()),
        "n_sessions": pa.array([n_sessions] * len(rows), pa.int64()),
        "value_lift": pa.array(
            [(v * n_sessions) / (singles[k[0]] * singles[k[1]])
             for k, v in rows], pa.float64()),
    }))


def retention_curve(events_ds):
    """User-lifespan survival curve -> (t_days, surviving, n_users,
    value_survival): for each observed lifespan t, the fraction of
    users whose span from first to last event is >= t days.

    Per-user (min ts, max ts) reduces via one combiner + groupby;
    lifespans histogram to <= max_days rows; the survival cumsum (from
    the top) runs in one task over that tiny table. All integers, one
    exact division per row.
    """
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["user_id", "ts"]).group_by("user_id") \
            .aggregate([("ts", "min"), ("ts", "max")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "p_min": agg.column("ts_min"),
            "p_max": agg.column("ts_max"),
        })

    per_user = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("user_id").aggregate(Min("p_min"), Max("p_max"))

    def spans(batch: pa.Table) -> pa.Table:
        lo = batch.column("min(p_min)").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi = batch.column("max(p_max)").cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = (hi - lo) // 86_400_000_000
        t = pa.table({"t_days": pa.array(days, pa.int64())})
        agg = t.group_by("t_days").aggregate([([], "count_all")])
        return pa.table({
            "t_days": agg.column("t_days"),
            "partial_n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    hist = coalesce_small(
        per_user.map_batches(spans, batch_format="pyarrow")) \
        .groupby("t_days").aggregate(Sum("partial_n"))

    def finish(batch: pa.Table) -> pa.Table:
        g = batch.sort_by([("t_days", "descending")])
        t = g.column("t_days").to_numpy(zero_copy_only=False)
        n = g.column("sum(partial_n)").to_numpy(zero_copy_only=False)
        surv = np.cumsum(n)           # users with lifespan >= t
        total = int(surv[-1])
        return pa.table({
            "t_days": pa.array(t, pa.int64()),
            "surviving": pa.array(surv, pa.int64()),
            "n_users": pa.array([total] * len(t), pa.int64()),
            "value_survival": pa.array(surv / total, pa.float64()),
        })

    return hist.repartition(1).map_batches(finish, batch_format="pyarrow",
                                           batch_size=None)


def ab_test_zstat(events_ds):
    """Two-proportion A/B z-statistic -> one row (n_a, n_b, conv_a,
    conv_b, value_z): users split by user_id parity, conversion =
    "ever made a purchase of value >= 240" (rare enough to vary). The per-user reduction is distributed (one
    combiner + groupby over (user, converted)); the z formula — pooled
    p, sqrt((p(1-p)(1/na+1/nb))) — evaluates once, in the identical
    operation order as the SQL oracle.
    """
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        conv = pc.cast(pc.and_(
            pc.equal(batch.column("event_type"), pa.scalar("purchase")),
            pc.greater_equal(batch.column("value"), pa.scalar(240.0))),
            pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "c": conv})
        agg = t.group_by("user_id").aggregate([("c", "max")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "p_conv": pc.cast(agg.column("c_max"), pa.int64()),
        })

    per_user = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("user_id").aggregate(Max("p_conv")).take_all()

    na = nb = ca = cb = 0
    for r in per_user:
        if r["user_id"] % 2 == 0:
            na += 1
            ca += int(r["max(p_conv)"])
        else:
            nb += 1
            cb += int(r["max(p_conv)"])
    pa_ = ca / na
    pb_ = cb / nb
    pp = (ca + cb) / (na + nb)
    # zero-variance arms have no defined z; emit 0.0 (the oracle's
    # CASE does the same — NaN would poison the value compare)
    z = 0.0 if pp in (0.0, 1.0) else         (pa_ - pb_) / np.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))

    import ray.data

    return ray.data.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "conv_a": pa.array([ca], pa.int64()),
        "conv_b": pa.array([cb], pa.int64()),
        "value_z": pa.array([float(z)], pa.float64()),
    }))


def churned_users(events_ds, *, split_day: int = 15):
    """Churn census -> one row (retained, churned, new_users,
    value_churn_rate): users active before day-index ``split_day``
    (since the corpus min day) vs at-or-after it. churned =
    before-only; new = after-only; retained = both. Exact set algebra
    on the reduced per-user (first day, last day) table — per-batch
    min/max partials, one groupby(user), driver counters.
    """
    from ray.data.aggregate import Max, Min

    def flags(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, pa.int64()))
        t = pa.table({"user_id": batch.column("user_id"), "day": day})
        agg = t.group_by("user_id").aggregate([("day", "min"),
                                               ("day", "max")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "p_min": agg.column("day_min"),
            "p_max": agg.column("day_max"),
        })

    per_user2 = coalesce_small(
        events_ds.map_batches(flags, batch_format="pyarrow")) \
        .groupby("user_id").aggregate(Min("p_min"), Max("p_max")) \
        .take_all()
    day0 = min(r["min(p_min)"] for r in per_user2)
    retained = churned = new = 0
    for r in per_user2:
        before = r["min(p_min)"] - day0 < split_day
        after = r["max(p_max)"] - day0 >= split_day
        if before and after:
            retained += 1
        elif before:
            churned += 1
        else:
            new += 1

    import ray.data

    before_total = retained + churned
    return ray.data.from_arrow(pa.table({
        "retained": pa.array([retained], pa.int64()),
        "churned": pa.array([churned], pa.int64()),
        "new_users": pa.array([new], pa.int64()),
        "value_churn_rate": pa.array(
            [churned / before_total if before_total else 0.0],
            pa.float64()),
    }))


def interarrival_histogram(events_ds, *, n_bins: int = 20):
    """Per-user inter-arrival time distribution -> (bin, n): log2-
    binned seconds between a user's consecutive events (bin =
    min(floor(log2(secs+1)), n_bins-1)) — the burstiness / bot-cadence
    fingerprint (humans are heavy-tailed; schedulers spike one bin).

    Rides lag_deltas' shuffle shape: one groupby(user) sort+shift, but
    each group emits only its bin partial counts, so the second
    groupby sees <= n_bins rows per user group.
    """
    from ray.data.aggregate import Sum

    def per_user(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(ts) < 2:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "partial_n": pa.array([], pa.int64())})
        secs = (ts[1:] - ts[:-1]) // 1_000_000
        bins = np.minimum(np.floor(np.log2(secs + 1)).astype(np.int64),
                          n_bins - 1)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(uniq, pa.int64()),
                         "partial_n": pa.array(counts, pa.int64())})

    agg = coalesce_small(
        per_key_in_buckets(
            events_ds.select_columns(["event_id", "user_id", "ts"]),
            "user_id", per_user)) \
        .groupby("bin").aggregate(Sum("partial_n"))
    return agg.map_batches(
        lambda b: pa.table({
            "bin": b.column("bin"),
            "n": pc.cast(b.column("sum(partial_n)"), pa.int64()),
        }), batch_format="pyarrow")


def top_user_share(events_ds, *, pcts: tuple = (1, 5, 10)):
    """Whale curve -> (top_pct, n_top_users, top_cents, total_cents,
    value_share): the share of total value captured by the top-N% of
    users (by their value sum) — the concentration view activity_gini
    compresses to one number.

    Fully distributed (no per-entity single task): per-user exact
    cents reduce first (combiner + groupby), then a SECOND combiner
    folds them to a value histogram (cents value c -> m_c users), so
    the finalizer walks O(distinct cents values) rows, never
    O(users). The top-k sum is tie-order independent (all users in a
    tie run contribute the same c), so the histogram walk is exact:
    k = ceil(n * pct / 100) users; the run containing the k-th user
    contributes (k - users_before_run) * c. Matches the oracle's
    (cents desc, user_id) sort bit-for-bit. For continuous money at
    extreme per-user-sum cardinality, quantize cents to range buckets
    first (rank_rows docstring note).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("value"),
                                         pa.scalar(100.0))), pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "c": c})
        agg = t.group_by("user_id").aggregate([("c", "sum")])
        return pa.table({"user_id": agg.column("user_id"),
                         "p_c": pc.cast(agg.column("c_sum"),
                                        pa.int64())})

    per_user = coalesce_small(
        events_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby("user_id").aggregate(Sum("p_c"))

    def hist_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["sum(p_c)"]).group_by("sum(p_c)") \
            .aggregate([([], "count_all")])
        return pa.table({
            "c": pc.cast(agg.column("sum(p_c)"), pa.int64()),
            "partial_m": pc.cast(agg.column("count_all"), pa.int64()),
        })

    hist = coalesce_small(
        per_user.map_batches(hist_partial, batch_format="pyarrow")) \
        .groupby("c").aggregate(Sum("partial_m"))

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        m = batch.column("sum(partial_m)").to_numpy(zero_copy_only=False)
        order = np.argsort(-c)
        c, m = c[order], m[order]
        cum_users = np.cumsum(m)
        cum_cents = np.cumsum(c * m)
        n = int(cum_users[-1])
        total = int(cum_cents[-1])
        out = []
        for p in pcts:
            k = int(np.ceil(n * p / 100))
            j = int(np.searchsorted(cum_users, k))
            before_users = int(cum_users[j - 1]) if j else 0
            before_cents = int(cum_cents[j - 1]) if j else 0
            top = before_cents + (k - before_users) * int(c[j])
            out.append((p, k, top))
        return pa.table({
            "top_pct": pa.array([o[0] for o in out], pa.int64()),
            "n_top_users": pa.array([o[1] for o in out], pa.int64()),
            "top_cents": pa.array([o[2] for o in out], pa.int64()),
            "total_cents": pa.array([total] * len(out), pa.int64()),
            "value_share": pa.array([o[2] / total for o in out],
                                    pa.float64()),
        })

    # repartition(1) over the cents-value histogram, not the users
    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None)
