"""Partition-invariance property tests: an operator's result must not
depend on how the input happens to be blocked — the property that makes
a pipeline's output stable across cluster sizes, retries, and file
layouts (and the one subtle bugs in combiner logic break first).

Each case runs the op on a single-block dataset and on the same rows
split into 7 blocks, and requires identical (order-insensitive) output.
"""

import datetime as dt

import pyarrow as pa
import pytest


def _events_table(n: int = 400) -> pa.Table:
    base = dt.datetime(2024, 1, 1)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array([i % 13 for i in range(n)], pa.int64()),
        "event_type": pa.array(
            [["click", "view", "purchase", "error"][i % 4]
             for i in range(n)]),
        "ts": pa.array([base + dt.timedelta(minutes=7 * i, seconds=i % 3)
                        for i in range(n)], pa.timestamp("us")),
        "value": pa.array([round((i * 37 % 500) / 7, 2)
                           for i in range(n)], pa.float64()),
    })


def _docs_table(n: int = 120) -> pa.Table:
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([" ".join(words[(i + j) % 5]
                                   for j in range(3 + i % 7))
                          for i in range(n)]),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
        "n_chars": pa.array([len(" ".join(words[(i + j) % 5]
                                          for j in range(3 + i % 7)))
                             for i in range(n)], pa.int64()),
    })


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _run_both(fn, table):
    import pandas as pd
    import ray.data

    one = _norm(fn(ray.data.from_arrow(table)).to_pandas())
    many = _norm(fn(ray.data.from_arrow(table).repartition(7))
                 .to_pandas())
    pd.testing.assert_frame_equal(one, many, check_exact=True)
    return one


def _ev_cases():
    from selma_ray.pipelines.relational import (
        activity_gini,
        activity_heatmap,
        anomalous_days,
        daily_change_by_type,
        debounce_events,
        events_daily_report,
        ewma_daily,
        lag_deltas,
        last_touch_attribution,
        percent_rank_by_group,
        psi_drift,
        rfm_segments,
        rolling_sum_range,
        session_stats,
        top_user_share,
        user_event_entropy,
        weekly_active_users,
    )
    import pyarrow.compute as pc

    def psi(ds):
        def tag(b):
            two = pa.scalar(2, pa.int64())
            ids = b.column("event_id")
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, two), two))
            return b.append_column(
                "side", pc.if_else(pc.equal(mod, pa.scalar(0, pa.int64())),
                                   pa.scalar("a"), pa.scalar("b")))
        return psi_drift(
            ds.map_batches(tag, batch_format="pyarrow"),
            group_col="event_type", value_col="event_id", bin_width=64)

    return {
        "lag_deltas": lag_deltas,
        "debounce": lambda ds: debounce_events(ds, gap_secs=600),
        "entropy": user_event_entropy,
        "percent_rank": percent_rank_by_group,
        "rolling_range": lambda ds: rolling_sum_range(ds,
                                                      window_secs=900),
        "last_touch": lambda ds: last_touch_attribution(
            ds, window_secs=3600),
        "daily_report": events_daily_report,
        "daily_change": daily_change_by_type,
        "ewma": lambda ds: ewma_daily(ds, alpha=0.5),
        "heatmap": activity_heatmap,
        "anomalous": lambda ds: anomalous_days(ds, k_sigma=2),
        "rfm": lambda ds: rfm_segments(ds, n_tiles=4),
        "gini": activity_gini,
        "top_share": lambda ds: top_user_share(ds, pcts=(1, 10, 25)),
        "sessions": lambda ds: session_stats(ds, gap_secs=900),
        "wau": lambda ds: weekly_active_users(ds, window_days=3),
        "psi": psi,
    }


@pytest.mark.parametrize("name", sorted(_ev_cases()))
def test_event_ops_partition_invariant(name, ray_session):
    _run_both(_ev_cases()[name], _events_table())


def _doc_cases():
    from selma_ray.pipelines.corpus import (
        distinctive_terms,
        doc_ttr,
        feature_hash_audit,
        length_buckets,
        term_burstiness,
        vocab_coverage,
    )
    from selma_ray.pipelines.dedup import (
        cross_source_dup_matrix,
        dup_family_histogram,
        exact_dedup_keep_best,
        jaccard_prefix_join,
    )
    from selma_ray.pipelines.sampling import interleave_sources

    return {
        "ttr": doc_ttr,
        "length_buckets": length_buckets,
        "vocab_coverage": lambda ds: vocab_coverage(ds, ks=(3, 10)),
        "hash_audit": lambda ds: feature_hash_audit(ds, dims=(8, 64)),
        "distinctive": lambda ds: distinctive_terms(ds, group_col="lang",
                                                    top_k=3),
        "burstiness": term_burstiness,
        "dup_families": dup_family_histogram,
        "cross_source": cross_source_dup_matrix,
        "keep_best": exact_dedup_keep_best,
        "jaccard_join": lambda ds: jaccard_prefix_join(ds,
                                                       threshold=0.5),
        "interleave": lambda ds: interleave_sources(ds,
                                                    bucket_width=16),
    }


@pytest.mark.parametrize("name", sorted(_doc_cases()))
def test_doc_ops_partition_invariant(name, ray_session):
    _run_both(_doc_cases()[name], _docs_table())


def _float_cases():
    """Ops whose result is a distributed FLOAT sum: blocking changes
    the addition order, so equality is to 1e-9 (the oracle compare
    tolerance), not bit-exact."""
    from selma_ray.pipelines.corpus import (
        bigram_entropy_by_group,
        source_cross_entropy,
    )

    return {
        "bigram_entropy": bigram_entropy_by_group,
        "source_cross_entropy": lambda ds: source_cross_entropy(
            ds, num_buckets=16),
    }


@pytest.mark.parametrize("name", sorted(_float_cases()))
def test_float_doc_ops_partition_invariant(name, ray_session):
    import pandas as pd
    import ray.data

    fn = _float_cases()[name]
    table = _docs_table()
    one = _norm(fn(ray.data.from_arrow(table)).to_pandas())
    many = _norm(fn(ray.data.from_arrow(table).repartition(7))
                 .to_pandas())
    pd.testing.assert_frame_equal(one, many, check_exact=False,
                                  atol=1e-9, rtol=0)


def test_image_phash_pairs_partition_invariant(ray_session):
    from selma_ray.pipelines.dedup import image_phash_pairs
    from selma_ray.stages.imagecodec import decode_png, synth_image
    from selma_ray.stages.jpegcodec import encode_jpeg

    ids, payloads = [], []
    for d in range(24):
        png = synth_image(d, w=40, h=24)
        ids.append(d)
        payloads.append(png)
        if d % 3 == 0:
            ids.append(d + 1000)
            payloads.append(encode_jpeg(decode_png(png), quality=90))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "data": pa.array(payloads, pa.binary())})
    _run_both(lambda ds: image_phash_pairs(ds, concurrency=1), t)
