"""Block-shaping helpers: coalesce_small / split_blocks /
bucketed_map_groups (stages/util.py).

These carry the repo's shuffle-cost discipline: Ray's sort-based
shuffle pays per-input-block overhead, so tiny-block intermediates must
MERGE before a wide op, oversized blocks must SPLIT for reduce
parallelism, and entity-keyed reductions should ride ONE
low-cardinality hash-bucket exchange instead of a per-key global
aggregate (see late_orders_by_priority / weekly_active_users).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from selma_ray.stages.util import (
    bucketed_map_groups,
    coalesce_small,
    key_buckets,
    split_blocks,
)


def _blocks(tables):
    return rd.from_arrow(tables)


class TestCoalesceSmall:
    def test_merges_tiny_blocks(self):
        t = pa.table({"x": np.arange(500)})
        ds = coalesce_small(_blocks([t] * 64), target_rows=8000)
        assert ds.materialize().num_blocks() <= 8
        assert ds.count() == 32000

    def test_splits_oversized_blocks(self):
        t = pa.table({"x": np.arange(100_000)})
        ds = coalesce_small(_blocks([t]), target_rows=10_000)
        assert ds.materialize().num_blocks() >= 10

    def test_preserves_rows_and_schema(self):
        t = pa.table({"x": np.arange(100), "s": [f"v{i}" for i in range(100)]})
        out = coalesce_small(_blocks([t] * 5), target_rows=300).materialize()
        assert out.count() == 500
        assert set(out.schema().names) == {"x", "s"}


class TestSplitBlocks:
    def test_splits_without_merging(self):
        big = pa.table({"x": np.arange(50_000)})
        small = pa.table({"x": np.arange(10)})
        ds = split_blocks(_blocks([big, small, small]), target_rows=10_000)
        m = ds.materialize()
        assert m.count() == 50_020
        assert m.num_blocks() >= 5  # big split; smalls left alone


class TestKeyBuckets:
    def test_int_keys_deterministic_and_in_range(self):
        arr = pa.array(np.arange(10_000, dtype=np.int64))
        b1 = key_buckets(arr, 256)
        b2 = key_buckets(arr, 256)
        assert np.array_equal(b1, b2)
        assert b1.min() >= 0 and b1.max() < 256

    def test_dense_int_keys_spread_uniformly(self):
        # splitmix64 must break up contiguous id ranges: no bucket may
        # hold a wildly disproportionate share of 100k dense keys
        b = key_buckets(pa.array(np.arange(100_000, dtype=np.int64)), 64)
        counts = np.bincount(b, minlength=64)
        assert counts.max() < 3 * (100_000 // 64)

    def test_string_keys(self):
        arr = pa.array([f"user-{i}" for i in range(5_000)])
        b1 = key_buckets(arr, 32)
        b2 = key_buckets(arr, 32)
        assert np.array_equal(b1, b2)
        assert b1.min() >= 0 and b1.max() < 32
        assert len(np.unique(b1)) == 32

    def test_chunked_array(self):
        ch = pa.chunked_array([pa.array([1, 2, 3], pa.int64()),
                               pa.array([4, 5], pa.int64())])
        assert len(key_buckets(ch, 8)) == 5


class TestBucketedMapGroups:
    def test_exact_per_key_reduction(self):
        # per-key max across MANY partitions must equal the naive
        # answer: the hash guarantees co-location of each key's rows
        rng = np.random.default_rng(7)
        keys = rng.integers(0, 2_000, size=30_000).astype(np.int64)
        vals = rng.random(30_000)
        tables = [pa.table({"k": keys[i::10], "v": vals[i::10]})
                  for i in range(10)]

        def per_key_max(group: pa.Table) -> pa.Table:
            agg = group.group_by("k").aggregate([("v", "max")])
            return pa.table({"k": agg.column("k"),
                             "vmax": agg.column("v_max")})

        out = bucketed_map_groups(_blocks(tables), "k", per_key_max,
                                  num_buckets=16).take_all()
        got = {r["k"]: r["vmax"] for r in out}
        exp = {}
        for k, v in zip(keys, vals):
            exp[k] = max(exp.get(k, -1.0), v)
        assert len(got) == len(exp)
        for k, v in exp.items():
            assert got[k] == pytest.approx(v)

    def test_bucket_column_not_leaked(self):
        t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "v": [1.0, 2.0, 3.0]})

        def passthrough(group: pa.Table) -> pa.Table:
            assert "_bucket" not in group.schema.names
            return group

        out = bucketed_map_groups(_blocks([t]), "k", passthrough,
                                  num_buckets=4)
        assert set(out.schema().names) == {"k", "v"}
        assert out.count() == 3

    def test_string_keys_co_located(self):
        tables = [pa.table({"k": [f"u{i % 50}" for i in range(i, i + 500)],
                            "v": np.ones(500)})
                  for i in range(0, 5000, 500)]

        def count_rows(group: pa.Table) -> pa.Table:
            agg = group.group_by("k").aggregate([([], "count_all")])
            return pa.table({"k": agg.column("k"),
                             "n": agg.column("count_all")})

        out = bucketed_map_groups(_blocks(tables), "k", count_rows,
                                  num_buckets=8).take_all()
        # every key appears exactly once => all its rows were co-located
        ks = [r["k"] for r in out]
        assert len(ks) == len(set(ks))
        assert sum(r["n"] for r in out) == 5000


def test_key_u64_null_and_big_int_keys():
    """Null-bearing int key columns must not route through float64:
    nulls get a sentinel, and keys above 2^53 keep exact values
    (float64 would round them together)."""
    import numpy as np
    import pyarrow as pa

    from selma_ray.stages.util import key_buckets, key_u64

    big_a = (1 << 60) + 1
    big_b = (1 << 60) + 2   # collide under float64 rounding
    arr = pa.array([big_a, None, big_b], pa.int64())
    v = key_u64(arr)
    assert v.dtype == np.uint64
    assert v[0] != v[2], "2^60-scale keys collided (float64 round-trip)"
    assert v[1] == np.uint64(-(1 << 62) + 41)
    # bucketing is deterministic for the null sentinel too
    b1 = key_buckets(arr, 16)
    b2 = key_buckets(arr, 16)
    assert list(b1) == list(b2)


def test_per_key_in_buckets_matches_groupby_map_groups(ray_session):
    """per_key_in_buckets must be output-equivalent to Ray's
    groupby(key).map_groups for a per-key fn — single key, composite
    key, string keys, and across partitionings."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from selma_ray.stages.util import per_key_in_buckets

    n = 2000
    t = pa.table({
        "k": pa.array((np.arange(n) * 7) % 97, pa.int64()),
        "s": pa.array([f"g{i % 13}" for i in range(n)]),
        "v": pa.array(np.arange(n) % 31, pa.int64()),
    })

    def agg(group: pa.Table) -> pa.Table:
        return pa.table({
            "k": group.column("k").slice(0, 1),
            "s": group.column("s").slice(0, 1),
            "total": pa.array(
                [int(pa.compute.sum(group.column("v")).as_py())],
                pa.int64()),
            "n": pa.array([group.num_rows], pa.int64()),
        })

    def norm(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for parts in (1, 7):
        src = ray.data.from_arrow(t).repartition(parts)
        want = norm(src.groupby(["k", "s"]).map_groups(
            agg, batch_format="pyarrow"))
        got = norm(per_key_in_buckets(src, ["k", "s"], agg,
                                      num_buckets=16))
        pd.testing.assert_frame_equal(got, want, check_exact=True)

    # min_rows skip: pair-style fn that emits nothing under 2 rows
    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"k": group.column("k").slice(0, 1),
                         "n": pa.array([group.num_rows], pa.int64())})

    # keys 0..96: each appears ~20x, plus one singleton key 1000
    t2 = pa.table({"k": pa.array(list((np.arange(n) * 7) % 97)
                                 + [1000], pa.int64())})
    src2 = ray.data.from_arrow(t2).repartition(5)
    base = norm(src2.groupby("k").map_groups(pairs,
                                             batch_format="pyarrow"))
    skip = norm(per_key_in_buckets(src2, "k", pairs, num_buckets=8,
                                   min_rows=2))
    pd.testing.assert_frame_equal(skip, base, check_exact=True)


def test_per_key_in_buckets_hot_key_cap(ray_session):
    """The max_key_rows safety valve: a pathological hot key is
    deterministically truncated to the cap (so its group can never
    blow a bucket task's heap), keys below the cap stay EXACT, and
    the sampled result is identical across partitionings."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from selma_ray.stages.util import per_key_in_buckets

    # key 7 is degenerate (5000 rows); keys 0..4 are small and exact
    hot_n, cap = 5000, 200
    t = pa.table({
        "k": pa.array([7] * hot_n + list(range(5)) * 10, pa.int64()),
        "rid": pa.array(range(hot_n + 50), pa.int64()),
    })

    def size_and_sum(group: pa.Table) -> pa.Table:
        rid = group.column("rid").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": group.column("k").slice(0, 1),
            "n": pa.array([group.num_rows], pa.int64()),
            "rid_sum": pa.array([int(rid.sum())], pa.int64()),
        })

    def run(parts):
        src = ray.data.from_arrow(t).repartition(parts)
        df = per_key_in_buckets(src, "k", size_and_sum, num_buckets=8,
                                max_key_rows=cap, sample_col="rid") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        return df

    one, many = run(1), run(9)
    pd.testing.assert_frame_equal(one, many, check_exact=True)
    got = one.set_index("k")
    # hot key truncated EXACTLY to the cap
    assert got.loc[7, "n"] == cap
    # small keys bit-exact (10 rows each, untouched by the valve)
    for k in range(5):
        assert got.loc[k, "n"] == 10
    want_small = {k: sum(r for r in range(hot_n, hot_n + 50)
                         if (r - hot_n) % 5 == k) for k in range(5)}
    for k in range(5):
        assert got.loc[k, "rid_sum"] == want_small[k]
    # the truncated sample is a real subset of the hot key's rows
    assert 0 < got.loc[7, "rid_sum"] < sum(range(hot_n))

    # arming the valve without a sample column is an error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        per_key_in_buckets(ray.data.from_arrow(t), "k", size_and_sum,
                           max_key_rows=cap)


def test_minhash_valve_on_degenerate_corpus(ray_session):
    """An all-identical corpus collapses every band into one hot key;
    with max_band_rows armed the pair miner completes with bounded
    group size and still links sampled members to a representative."""
    import pyarrow as pa
    import ray.data

    from selma_ray.pipelines.dedup import minhash_lsh_pairs

    n = 1200
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["same exact degenerate text body here"] * n),
    })
    out = minhash_lsh_pairs(ray.data.from_arrow(t).repartition(6),
                            max_band_rows=64).to_pandas()
    assert len(out) > 0
    ids = set(out["id_a"]) | set(out["id_b"])
    assert ids <= set(range(n))
    # truncation semantics: pairs are mined among the sampled members
    # only — far fewer distinct ids than the corpus
    assert len(ids) <= 64 * 16
    assert (out["similarity"] == 1.0).all()
    # deterministic across partitionings
    out2 = minhash_lsh_pairs(ray.data.from_arrow(t).repartition(3),
                             max_band_rows=64).to_pandas()
    a = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = out2.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert a.equals(b)


def test_key_u64_uint64_above_2_63():
    """uint64 keys past 2^63 must hash bit-exactly, not raise
    ArrowInvalid from a checked int64 cast."""
    import numpy as np
    import pyarrow as pa

    from selma_ray.stages.util import key_u64

    hi_a = (1 << 63) + 7
    hi_b = (1 << 64) - 1
    arr = pa.array([hi_a, None, hi_b, 5], pa.uint64())
    v = key_u64(arr)
    assert v.dtype == np.uint64
    assert v[0] == np.uint64(hi_a)
    assert v[2] == np.uint64(hi_b)
    assert v[3] == np.uint64(5)
    assert len({int(x) for x in v}) == 4  # sentinel distinct from keys
    # smaller unsigned widths stay exact too
    assert key_u64(pa.array([250], pa.uint8()))[0] == np.uint64(250)
