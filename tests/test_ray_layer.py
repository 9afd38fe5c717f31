"""Ray-layer tests: transcript source, extraction stage/pipeline, manifest
resume, sanitize stage, multimodal plumbing.

All Ray use goes through the session-scoped ``ray_session`` fixture
(tests/conftest.py) — one ray.init per pytest run.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from selma_ray.engine.extract import ExtractionEngine
from selma_ray.sources.transcripts import (
    SCHEMA,
    synthesize_transcripts,
    transcript_dataset,
)
from selma_ray.state.manifest import Manifest


def test_transcripts_deterministic_and_schema():
    t1 = synthesize_transcripts(8, big_every=0)
    t2 = synthesize_transcripts(8, big_every=0)
    assert t1.schema.equals(SCHEMA)
    assert t1.equals(t2)
    # per-conv turn_idx contiguous from 0
    df = t1.to_pandas()
    for _, g in df.groupby("conv_id"):
        assert list(g.sort_values("turn_idx")["turn_idx"]) == list(range(len(g)))
    # mix of plain and HTML turns
    has_html = df["text"].str.contains("<").sum()
    assert 0 < has_html < len(df)


def test_transcript_dataset_matches_local(ray_session):
    ds = transcript_dataset(6, big_every=0, parallelism=3)
    got = pa.Table.from_pandas(
        ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        schema=SCHEMA, preserve_index=False)
    want = synthesize_transcripts(6, big_every=0)
    want = want.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(want)


def test_extract_pipeline_parity_with_engine(ray_session):
    """Per-turn text equality: Ray actor-pool output == single-process
    engine output under stable (conv_id, turn_idx) ordering."""
    import ray.data

    from selma_ray.pipelines.extract import extract_transcripts

    table = synthesize_transcripts(10, big_every=0)
    ds = ray.data.from_arrow(table).repartition(4)
    out = extract_transcripts(ds, batch_size=32, concurrency=2, sort=True)
    got = out.to_pandas()
    assert list(got.columns[:6]) == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]

    engine = ExtractionEngine()
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    expect = [engine.process(t) for t in df["text"]]
    assert got["extracted_text"].tolist() == [e["extracted_text"] for e in expect]
    assert got["title"].tolist() == [e["title"] for e in expect]
    assert got["bytes_out"].tolist() == [e["bytes_out"] for e in expect]


def test_extract_plain_text_passthrough(ray_session):
    import ray.data

    from selma_ray.stages.extract import extract_stage

    plain = pa.table({
        "conv_id": pa.array(["c"] * 3),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "text": pa.array(["no markup here", "just words", "plain 123"],
                         pa.large_string()),
    })
    out = extract_stage(ray.data.from_arrow(plain), concurrency=1).to_pandas()
    out = out.sort_values("turn_idx")
    assert out["extracted_text"].tolist() == plain.column("text").to_pylist()
    assert (out["bytes_in"] == out["bytes_out"]).all()


def test_extract_strips_boilerplate(ray_session):
    import ray.data

    from selma_ray.stages.extract import extract_stage

    html = ('<html><head><title>T</title><style>x{}</style></head><body>'
            '<nav><a href="/">Home</a></nav><main><p>Real content here.</p>'
            '</main><footer>c 2026</footer><script>junk()</script></body></html>')
    t = pa.table({"text": pa.array([html], pa.large_string())})
    out = extract_stage(ray.data.from_arrow(t), concurrency=1).to_pandas()
    text = out["extracted_text"][0]
    assert "Real content here." in text
    assert "Home" not in text
    assert "junk" not in text
    assert out["title"][0] == "T"
    assert out["hits_strip"][0] >= 3  # style, nav, footer, script


def test_run_extraction_resume(tmp_path, ray_session):
    from selma_ray.pipelines.extract import run_extraction

    # 3 input files = 3 shards
    table = synthesize_transcripts(6, big_every=0)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    n = table.num_rows // 3
    for i in range(3):
        pq.write_table(table.slice(i * n, n if i < 2 else table.num_rows - 2 * n),
                       in_dir / f"part-{i}.parquet")
    out_dir = str(tmp_path / "out")

    s1 = run_extraction(str(in_dir), out_dir, batch_size=32, concurrency=1,
                        keep_spans=False)
    assert s1["shards_total"] == 3
    assert s1["shards_done"] == 3
    assert s1["rows"] == table.num_rows
    assert s1["metrics"]["turns_processed"] == table.num_rows
    assert s1["metrics"]["bytes_stripped"] > 0

    # full resume: nothing recomputed
    s2 = run_extraction(str(in_dir), out_dir, batch_size=32, concurrency=1,
                        keep_spans=False)
    assert s2["shards_skipped"] == 3 and s2["shards_done"] == 0
    assert s2["metrics"]["turns_processed"] == table.num_rows

    # partial resume: forget one shard -> only it is recomputed
    man = Manifest(os.path.join(out_dir, "_manifest"))
    victim = sorted(man.completed())[0]
    os.remove(os.path.join(man.shards_dir, f"{victim}.json"))
    s3 = run_extraction(str(in_dir), out_dir, batch_size=32, concurrency=1,
                        keep_spans=False)
    assert s3["shards_skipped"] == 2 and s3["shards_done"] == 1
    assert s3["metrics"]["turns_processed"] == table.num_rows


def test_path_to_shard_resolves_scheme_stripped_paths():
    """include_paths=True surfaces fragment.path WITHOUT the URI scheme,
    while list_input_shards keeps it (s3://bucket/key) so the files stay
    readable. The lookup dict must therefore carry BOTH forms, or every
    remote-input batch KeyErrors on its first path."""
    import pyarrow as pa

    from selma_ray.pipelines.extract import _AttachShard, build_path_to_shard

    todo = {
        "s-part-0": "s3://bucket/prefix/part-0.parquet",
        "s-part-1": "s3://bucket/prefix/part-1.parquet",
        "s-local": "/data/local/part-2.parquet",
    }
    lookup = build_path_to_shard(todo)
    # scheme-qualified, scheme-stripped, and local forms all resolve
    assert lookup["s3://bucket/prefix/part-0.parquet"] == "s-part-0"
    assert lookup["bucket/prefix/part-0.parquet"] == "s-part-0"
    assert lookup["/data/local/part-2.parquet"] == "s-local"

    batch = pa.table({
        "path": pa.array(["bucket/prefix/part-1.parquet",
                          "/data/local/part-2.parquet"]),
        "text": pa.array(["a", "b"]),
    })
    out = _AttachShard(lookup)(batch)
    assert out.column("shard").to_pylist() == ["s-part-1", "s-local"]


def test_manifest_atomic_and_summary(tmp_path):
    man = Manifest(str(tmp_path / "m"))
    man.mark_done("s1", metrics={"rows": 10, "bytes": 100})
    man.mark_done("s2", metrics={"rows": 5, "bytes": 50},
                  lineage={"input_file": "f2"})
    assert man.completed() == {"s1", "s2"}
    summ = man.summary()
    assert summ["shards_done"] == 2
    assert summ["metrics"] == {"rows": 15, "bytes": 150}
    recs = {r["shard_id"]: r for r in man.records()}
    assert recs["s2"]["lineage"]["input_file"] == "f2"


def test_sanitize_stage(ray_session):
    import ray.data

    from selma_ray.stages.sanitize import sanitize_stage

    t = pa.table({"text": pa.array(
        ['<b>keep</b> <script>alert(1)</script> done', None],
        pa.large_string())})
    out = sanitize_stage(ray.data.from_arrow(t)).to_pandas()
    got = sorted(out["sanitized"].tolist(), key=lambda x: x is None)
    assert got[0] == "keep  done"
    assert got[1] is None


def test_multimodal_fake_decode(ray_session):
    import ray.data

    from selma_ray.stages.multimodal import (
        DecodeImageFeatures,
        SampleVideoFrames,
        multimodal_stage,
    )

    t = pa.table({"id": pa.array([0, 1]),
                  "data": pa.array([b"imagebytes0", b"imagebytes1"], pa.binary())})
    ds = ray.data.from_arrow(t)
    out = multimodal_stage(ds, DecodeImageFeatures, batch_size=2, dim=8,
                           concurrency=1).to_pandas().sort_values("id")
    feats = out["features"].tolist()
    assert len(feats[0]) == 8
    # deterministic across runs
    out2 = multimodal_stage(ray.data.from_arrow(t), DecodeImageFeatures,
                            batch_size=2, dim=8, concurrency=1) \
        .to_pandas().sort_values("id")
    assert [list(f) for f in feats] == [list(f) for f in out2["features"]]

    frames = multimodal_stage(ds, SampleVideoFrames, batch_size=2, n_frames=2,
                              concurrency=1).to_pandas().sort_values("id")
    assert all(len(f) == 2 for f in frames["frames"])

    with pytest.raises(NotImplementedError):
        DecodeImageFeatures(fake=False).decode_impl(b"x")


def test_multimodal_fake_resize(ray_session):
    import ray.data

    from selma_ray.stages.multimodal import ResizeImage, multimodal_stage

    t = pa.table({"id": pa.array([0, 1]),
                  "data": pa.array([b"short", b"x" * 5000], pa.binary())})
    out = multimodal_stage(ray.data.from_arrow(t), ResizeImage,
                           batch_size=2, w=16, h=8, concurrency=1) \
        .to_pandas().sort_values("id")
    # output bytes are O(w*h) regardless of input size, metadata typed
    assert [len(b) for b in out["resized"]] == [128, 128]
    assert list(out["width"]) == [16, 16] and list(out["height"]) == [8, 8]
    assert bytes(out["resized"].iloc[0][:5]) == b"short"

    with pytest.raises(NotImplementedError):
        ResizeImage(fake=False).resize_impl(b"x")


def test_read_transcripts_formats(ray_session, tmp_path):
    import json

    import pyarrow.parquet as pq

    from selma_ray.sources.readers import TRANSCRIPT_SCHEMA, read_transcripts

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "<p>hi</p>", "tool": "", "ts": "2024-01-02T03:04:05"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "plain", "tool": "search", "ts": "2024-01-02T03:05:06"},
    ]
    # jsonl
    jp = tmp_path / "t.jsonl"
    jp.write_text("\n".join(json.dumps(r) for r in rows))
    # csv
    cp = tmp_path / "t.csv"
    cp.write_text("conv_id,turn_idx,role,text,tool,ts\n" + "\n".join(
        f'{r["conv_id"]},{r["turn_idx"]},{r["role"]},"{r["text"]}",'
        f'{r["tool"]},{r["ts"]}' for r in rows))
    # parquet (ts as real timestamp; tool column missing -> typed nulls)
    t = pa.table({
        "conv_id": ["c1", "c1"], "turn_idx": [0, 1],
        "role": ["user", "assistant"], "text": ["<p>hi</p>", "plain"],
        "ts": pa.array([1704164645000000, 1704164706000000],
                       pa.timestamp("us")),
        "extra": [1, 2],
    })
    pp = tmp_path / "t.parquet"
    pq.write_table(t, pp)

    outs = {}
    for fmt, path in (("jsonl", jp), ("csv", cp)):
        ds = read_transcripts(str(path), format=fmt)
        assert ds.schema().base_schema == TRANSCRIPT_SCHEMA
        outs[fmt] = sorted(ds.take_all(), key=lambda r: r["turn_idx"])
    assert outs["jsonl"] == outs["csv"]
    assert outs["jsonl"][0]["text"] == "<p>hi</p>"
    assert outs["jsonl"][1]["ts"].year == 2024

    pds = read_transcripts(str(pp), format="parquet")
    prows = sorted(pds.take_all(), key=lambda r: r["turn_idx"])
    assert pds.schema().base_schema == TRANSCRIPT_SCHEMA
    assert prows[0]["tool"] is None and "extra" not in prows[0]


def test_curate_corpus_stages_and_resume(ray_session, tmp_path):
    from selma_ray.pipelines.curate import curate_corpus
    from selma_ray.sources.transcripts import transcripts_parquet

    inp = transcripts_parquet(24)
    out = str(tmp_path / "curated")
    s1 = curate_corpus(inp, out, concurrency=1)
    assert s1["stages"]["extract"]["shards_skipped"] == 0
    assert s1["stages"]["quality_filter"]["rows_kept"] > 0
    # dedup can only shrink; packing preserves rows
    assert (s1["stages"]["dedup"]["rows_out"]
            <= s1["stages"]["quality_filter"]["rows_kept"])
    assert (s1["stages"]["pack"]["rows_out"]
            == s1["stages"]["dedup"]["rows_out"])
    s2 = curate_corpus(inp, out, concurrency=1)
    assert s2["stages"]["extract"]["shards_skipped"] \
        == s2["stages"]["extract"]["shards_total"]
    # same checkpointed counts; wall seconds differ (resume ~0)
    assert s2["stages"]["dedup"]["rows_out"] \
        == s1["stages"]["dedup"]["rows_out"]
    assert s2["stages"]["dedup"]["sec"] < s1["stages"]["dedup"]["sec"]


@pytest.mark.parametrize("drop", [("row_key", "text_hash"),
                                  ("row_key",)])
def test_curate_corpus_resumes_over_legacy_checkpoint(drop, ray_session,
                                                      tmp_path):
    """Forward-compat: a stage-1 checkpoint written BEFORE the dedup
    keys were persisted — missing both key columns (legacy) or just
    one (partial/hand-pruned) — must still complete on resume via the
    self-hashing fallback, with identical output rows."""
    import pyarrow.parquet as pq
    import ray.data

    from selma_ray.pipelines.curate import curate_corpus
    from selma_ray.sources.transcripts import transcripts_parquet

    inp = transcripts_parquet(24)
    ref_out = tmp_path / "ref"
    ref = curate_corpus(inp, str(ref_out), concurrency=1)

    # rewrite the quality-filter checkpoint to the degraded schema and
    # erase every later stage (the mid-upgrade death state)
    import shutil
    out = tmp_path / "legacy"
    shutil.copytree(ref_out / "extracted", out / "extracted")
    qf = out / "filtered"
    qf.mkdir()
    shutil.copy(ref_out / "filtered" / "_STAGE_DONE.json",
                qf / "_STAGE_DONE.json")
    for f in (ref_out / "filtered").glob("*.parquet"):
        t = pq.read_table(f)
        t = t.drop_columns([c for c in drop if c in t.column_names])
        pq.write_table(t, qf / f.name)

    s = curate_corpus(inp, str(out), concurrency=1)
    assert s["stages"]["dedup"]["rows_out"] \
        == ref["stages"]["dedup"]["rows_out"]
    got = ray.data.read_parquet(str(out / "packed")).to_pandas()
    want = ray.data.read_parquet(str(ref_out / "packed")).to_pandas()
    key = ["conv_id", "window_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(got[sorted(got.columns)],
                           want[sorted(want.columns)])


def test_curate_corpus_decontamination_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from selma_ray.pipelines.curate import curate_corpus
    from selma_ray.sources.transcripts import transcripts_parquet

    inp = transcripts_parquet(24)
    out = str(tmp_path / "curated_dc")

    # eval set = the extracted text of one real turn, so at least one
    # turn must be dropped; plus a never-matching probe
    base = curate_corpus(inp, str(tmp_path / "probe"), concurrency=1)
    dd = ray.data.read_parquet(str(tmp_path / "probe/deduped")) \
        .take(1)[0]["extracted_text"]
    eval_pq = str(tmp_path / "eval.parquet")
    pq.write_table(pa.table({"text": pa.array([dd, "zz qq vv ww xx"])}),
                   eval_pq)

    s = curate_corpus(inp, out, concurrency=1, eval_path=eval_pq,
                      decontam_ngram=4)
    assert "decontaminate" in s["stages"]
    assert (s["stages"]["decontaminate"]["rows_out"]
            < s["stages"]["dedup"]["rows_out"])
    assert (s["stages"]["pack"]["rows_out"]
            == s["stages"]["decontaminate"]["rows_out"])
    assert base["stages"]["dedup"]["rows_out"] \
        == s["stages"]["dedup"]["rows_out"]


def test_write_outputs_roundtrip(ray_session, tmp_path):
    """jsonl and csv sinks round-trip through read_transcripts; parquet
    sink honors partition_cols."""
    import ray.data

    from selma_ray.sources.readers import read_transcripts, write_outputs
    from selma_ray.sources.transcripts import transcript_dataset

    src = transcript_dataset(6)
    want = sorted((r["conv_id"], r["turn_idx"], r["text"], str(r["ts"]))
                  for r in src.take_all())

    for fmt in ("jsonl", "csv"):
        out = str(tmp_path / fmt)
        write_outputs(transcript_dataset(6), out, format=fmt)
        back = read_transcripts(out, format=fmt)
        got = sorted((r["conv_id"], r["turn_idx"], r["text"], str(r["ts"]))
                     for r in back.take_all())
        assert got == want, fmt

    pq_out = str(tmp_path / "pq")
    write_outputs(transcript_dataset(6), pq_out, format="parquet",
                  partition_cols=["role"])
    import glob
    assert glob.glob(f"{pq_out}/role=*"), "partitioned layout expected"
    back = sorted((r["conv_id"], r["turn_idx"], r["text"], str(r["ts"]))
                  for r in read_transcripts(pq_out).take_all())
    assert back == want

    import pytest

    with pytest.raises(ValueError):
        write_outputs(transcript_dataset(2), str(tmp_path / "x"),
                      format="jsonl", partition_cols=["role"])


def test_extract_keep_meta_column(ray_session):
    import ray.data

    from selma_ray.stages.extract import extract_stage

    tbl = pa.table({
        "conv_id": pa.array(["c"] * 2),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "text": pa.array(
            ['<meta name="robots" content="noindex">'
             '<meta name="author" content="me"><p>body</p>',
             "plain turn"]),
    })
    rows = sorted(
        extract_stage(ray.data.from_arrow(tbl), keep_meta=True,
                      keep_spans=False, concurrency=2).take_all(),
        key=lambda r: r["turn_idx"])
    assert dict(rows[0]["meta"]) == {"robots": "noindex", "author": "me"}
    assert rows[0]["hits_meta"] == 2
    assert dict(rows[1]["meta"]) == {}


def test_orc_round_trip(ray_session, tmp_path):
    """write_outputs(orc) -> read_transcripts(orc): values, timestamps
    and column projection survive the round trip."""
    import ray.data

    from selma_ray.sources.readers import (
        TRANSCRIPT_SCHEMA,
        read_orc,
        read_transcripts,
        write_outputs,
    )

    t = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "assistant", "user"], pa.string()),
        "text": pa.array(["<p>hi</p>", "plain", "x"], pa.large_string()),
        "tool": pa.array(["", "search", ""], pa.string()),
        "ts": pa.array([1704164645000000, 1704164706000000,
                        1704164800000000], pa.timestamp("us")),
        "extra": pa.array([1, 2, 3], pa.int64()),
    })
    out = tmp_path / "orc_out"
    write_outputs(ray.data.from_arrow(t), str(out), format="orc")

    ds = read_transcripts(str(out), format="orc")
    assert ds.schema().base_schema == TRANSCRIPT_SCHEMA
    got = sorted(ds.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["text"] for r in got] == ["<p>hi</p>", "plain", "x"]
    assert got[0]["ts"].year == 2024
    assert "extra" not in got[0]  # projection pruned it

    # raw reader honors explicit column projection
    slim = read_orc(str(out), columns=["conv_id", "extra"])
    assert set(slim.schema().names) == {"conv_id", "extra"}
    assert sorted(r["extra"] for r in slim.take_all()) == [1, 2, 3]


def test_union_by_name_aligns_and_casts(ray_session):
    import pyarrow as pa_
    import ray.data

    from selma_ray.sources.readers import union_by_name

    a = ray.data.from_arrow(pa_.table({
        "id": pa_.array([1, 2], pa_.int64()),
        "x": pa_.array(["a", "b"], pa_.string()),
    }))
    b = ray.data.from_arrow(pa_.table({
        "id": pa_.array([3], pa_.int32()),      # narrower type -> cast
        "y": pa_.array([9.5], pa_.float64()),
    }))
    got = union_by_name([a, b]).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert list(got.columns) == ["id", "x", "y"]
    assert list(got["id"]) == [1, 2, 3]
    assert got["x"].tolist()[:2] == ["a", "b"] and got["x"][2] is None
    assert got["y"].isna().tolist() == [True, True, False]


def test_write_clustered_layout(ray_session, tmp_path):
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from selma_ray.sources.readers import write_clustered

    rng_rows = pd.DataFrame({
        "k": [((i * 37) % 100) for i in range(400)],
        "payload": list(range(400)),
    })
    out = str(tmp_path / "clustered")
    manifest = write_clustered(
        ray.data.from_pandas(rng_rows).repartition(5),
        out, key_col="k", num_ranges=4).to_pandas() \
        .sort_values("range_id").reset_index(drop=True)

    assert manifest["n_rows"].sum() == 400
    # ranges are key-disjoint and ordered
    for i in range(1, len(manifest)):
        assert manifest.loc[i - 1, "key_max"] < manifest.loc[i, "key_min"]
    # each file exists and is sorted on k; union reproduces the input
    seen = []
    for _, row in manifest.iterrows():
        assert os.path.exists(row["path"])
        t = pq.read_table(row["path"])
        ks = t.column("k").to_pylist()
        assert ks == sorted(ks)
        seen.extend(t.column("payload").to_pylist())
    assert sorted(seen) == list(range(400))


def test_clustered_merge_join(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from selma_ray.sources.readers import clustered_merge_join, \
        write_clustered

    left = pd.DataFrame({"k": list(range(100)),
                         "a_val": [i * 2 for i in range(100)]})
    right = pd.DataFrame({"k": list(range(0, 100, 2)),
                          "b_val": [i * 3 for i in range(0, 100, 2)]})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    from selma_ray.sources.readers import cluster_bounds
    bounds = cluster_bounds(ray.data.from_pandas(left),
                            key_col="k", num_ranges=4)
    write_clustered(ray.data.from_pandas(left).repartition(3), da,
                    key_col="k", bounds=bounds).materialize()
    write_clustered(ray.data.from_pandas(right).repartition(2), db,
                    key_col="k", bounds=bounds).materialize()

    got = clustered_merge_join(da, db, key_col="k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = left.merge(right, on="k").sort_values("k") \
        .rename(columns={"b_val": "b_val_b"}).reset_index(drop=True)
    # shared bounds co-partition both layouts, so the range-local
    # joins reproduce the full join
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert (got["k"] == want["k"]).all()
    assert (got["a_val"] == want["a_val"]).all()
    assert (got["b_val_b"] == want["b_val_b"]).all()


def test_zorder_layout_box_query(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data

    from selma_ray.sources.readers import (morton_key, write_zordered,
                                           zordered_box_read)

    # bit-loop reference for the vectorized morton encode
    def ref_morton(x, y):
        z = 0
        for b in range(32):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    xs = np.array([0, 1, 5, 1023, 2**31 - 1, 77])
    ys = np.array([0, 1, 9, 4095, 2**31 - 1, 13])
    got = morton_key(xs, ys)
    for x, y, z in zip(xs, ys, got):
        assert int(z) == ref_morton(int(x), int(y))
    # monotone componentwise
    assert morton_key(np.array([5]), np.array([9]))[0] < \
        morton_key(np.array([6]), np.array([9]))[0]
    assert morton_key(np.array([5]), np.array([9]))[0] < \
        morton_key(np.array([5]), np.array([10]))[0]

    # 64x64 grid -> 16 z-tiles; a small box must touch few files
    n = 64
    g = pd.DataFrame({
        "x": np.repeat(np.arange(n), n),
        "y": np.tile(np.arange(n), n),
    })
    g["payload"] = g["x"] * 1000 + g["y"]
    out = str(tmp_path / "zord")
    manifest = write_zordered(
        ray.data.from_pandas(g).repartition(6), out,
        x_col="x", y_col="y", num_ranges=16)

    ds, n_read, n_total = zordered_box_read(
        out, manifest, x_col="x", y_col="y",
        x_range=(3, 10), y_range=(5, 12))
    got_rows = ds.to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    want = g[(g.x.between(3, 10)) & (g.y.between(5, 12))] \
        .sort_values(["x", "y"]).reset_index(drop=True)
    assert got_rows["payload"].tolist() == want["payload"].tolist()
    assert n_total == 16
    assert n_read < n_total  # pruning actually skipped files


def test_multimodal_fake_audio(ray_session):
    import ray.data

    from selma_ray.stages.multimodal import (
        DecodeAudioFeatures,
        multimodal_stage,
    )

    t = pa.table({"id": pa.array([0, 1]),
                  "data": pa.array([b"a" * 3000, b"b" * 500], pa.binary())})
    out = multimodal_stage(ray.data.from_arrow(t), DecodeAudioFeatures,
                           batch_size=2, dim=4, hop_bytes=1024,
                           concurrency=1).to_pandas().sort_values("id")
    # window count tracks payload length; fixed-width frames
    assert list(out["n_windows"]) == [2, 1]
    assert len(out["frames"].iloc[0]) == 2
    assert len(out["frames"].iloc[0][0]) == 4
    # deterministic across runs
    out2 = multimodal_stage(ray.data.from_arrow(t), DecodeAudioFeatures,
                            batch_size=2, dim=4, hop_bytes=1024,
                            concurrency=1).to_pandas().sort_values("id")
    assert out["frames"].iloc[0][0][0] == out2["frames"].iloc[0][0][0]

    with pytest.raises(NotImplementedError):
        DecodeAudioFeatures(fake=False).decode_impl(b"x")


def test_real_wav_decode_goldens():
    """The WAV path is a REAL codec + featurizer: physics-checkable
    features on a pure sine, not a hash stand-in."""
    import io
    import wave

    import numpy as np

    from selma_ray.stages.multimodal import DecodeAudioFeatures, synth_wav

    sr, f, amp, secs = 8000, 500.0, 0.5, 1.0
    t = np.arange(int(sr * secs)) / sr
    pcm = np.clip(np.sin(2 * np.pi * f * t) * amp * 32767.0,
                  -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    dec = DecodeAudioFeatures(dim=8, fake=False, win_samples=256)
    feats = dec.decode_impl(buf.getvalue())
    assert feats.shape == (sr // 256, 8)
    # rms of a sine = amp/sqrt(2); zcr = 2f/sr crossings per sample
    assert np.allclose(feats[:, 0], amp / np.sqrt(2), atol=0.02)
    assert np.allclose(feats[:, 1], 2 * f / sr, atol=0.02)
    assert np.allclose(feats[:, 2], amp, atol=0.02)
    # dominant FFT band: 500 Hz at sr=8000, win=256 -> bin 16 of 129
    # -> band 0 of 5 (bands split 129 bins into 5 chunks of ~26)
    assert (feats[:, 3] > feats[:, 4:].max(axis=1)).all()
    # bit-deterministic
    feats2 = dec.decode_impl(buf.getvalue())
    assert (feats == feats2).all()
    # synth_wav round-trips through the same decoder
    w = synth_wav(7, sr=8000, secs=0.25)
    assert w[:4] == b"RIFF"
    out = dec.decode_impl(w)
    assert out.shape == (int(8000 * 0.25) // 256, 8)


def test_real_wav_stereo_and_8bit():
    import io
    import wave

    import numpy as np

    from selma_ray.stages.multimodal import DecodeAudioFeatures

    dec = DecodeAudioFeatures(dim=4, fake=False, win_samples=64)
    # stereo 16-bit: identical channels must equal the mono decode
    t = np.arange(640) / 8000.0
    mono = np.clip(np.sin(2 * np.pi * 440 * t) * 16000,
                   -32768, 32767).astype("<i2")
    stereo = np.column_stack([mono, mono]).ravel()
    bufs = {}
    for name, (nch, data) in {"mono": (1, mono),
                              "stereo": (2, stereo)}.items():
        b = io.BytesIO()
        with wave.open(b, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(data.astype("<i2").tobytes())
        bufs[name] = b.getvalue()
    fm = dec.decode_impl(bufs["mono"])
    fs = dec.decode_impl(bufs["stereo"])
    assert np.allclose(fm, fs, atol=1e-5)
    # 8-bit unsigned PCM decodes (silence -> 0 rms)
    b = io.BytesIO()
    with wave.open(b, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128] * 640))
    f8 = dec.decode_impl(b.getvalue())
    assert f8.shape == (10, 4)
    assert np.allclose(f8[:, 0], 0.0)
    # fake=False still refuses NON-wav formats
    import pytest

    with pytest.raises(NotImplementedError):
        dec.decode_impl(b"\x00\x01\x02not-audio")


def test_extract_job_cli_runs_and_resumes(tmp_path, ray_session):
    """selma_ray.job extract: the `ray job submit` driver target.

    main() must reuse an existing Ray session WITHOUT shutting it down
    (job agents / tests own it), write the manifest, and skip every
    shard on re-run.
    """
    import json

    from selma_ray.job import main
    from selma_ray.sources.transcripts import synthesize_transcripts

    src = tmp_path / "in"
    src.mkdir()
    tbl = synthesize_transcripts(20)
    pq.write_table(tbl.slice(0, len(tbl) // 2), src / "a.parquet")
    pq.write_table(tbl.slice(len(tbl) // 2), src / "b.parquet")
    out = tmp_path / "out"

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["extract", "--input", str(src), "--output", str(out)])
    assert rc == 0
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rec["shards_total"] == 2
    assert rec["shards_done"] == 2
    assert rec["rows"] == len(tbl)
    assert rec["metrics"]["turns_processed"] == len(tbl)

    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc = main(["extract", "--input", str(src), "--output", str(out)])
    assert rc == 0
    rec2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert rec2["shards_skipped"] == 2
    assert rec2["shards_done"] == 0
    # aggregate metrics survive the resume untouched
    assert rec2["metrics"] == rec["metrics"]


def test_extract_survives_worker_death(tmp_path, ray_session):
    """Actor-pool fault tolerance: Ray Data's default actor args
    (max_restarts=-1, max_task_retries=-1) must make abrupt worker
    death invisible to the result — same rows, same extracted text.
    The chaos wrapper lives in selma_ray.testing because a restarted
    actor re-imports its class by module path in a fresh worker."""
    import ray.data

    from selma_ray.stages.extract import ExtractTurns, extract_stage
    from selma_ray.testing import KillWorkerOnce

    table = synthesize_transcripts(12, big_every=0)
    src = tmp_path / "in.parquet"
    pq.write_table(table, src)
    latch = str(tmp_path / "kill.latch")

    clean = extract_stage(
        ray.data.read_parquet(str(src)), concurrency=1, batch_size=32,
        keep_spans=False).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    chaotic = ray.data.read_parquet(str(src)).map_batches(
        KillWorkerOnce,
        fn_constructor_kwargs=dict(latch=latch, inner_cls=ExtractTurns,
                                   keep_spans=False),
        batch_format="pyarrow", batch_size=32, concurrency=2,
    ).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    assert os.path.exists(latch), "fault was never injected"
    assert len(chaotic) == len(clean)
    assert chaotic["extracted_text"].tolist() == clean["extracted_text"].tolist()
    assert chaotic["bytes_out"].tolist() == clean["bytes_out"].tolist()


def test_join_survives_worker_death(tmp_path, ray_session):
    """Worker death feeding a native hash-partitioned Dataset.join
    (lines_by_priority): the killed task's block must be retried and
    re-enter BOTH join exchanges, leaving the per-priority rollup
    identical to an undisturbed run."""
    import ray.data

    from selma_ray.pipelines.relational import lines_by_priority
    from selma_ray.testing import Identity, KillWorkerOnce

    sf = "/root/testdata/sf0.001"
    cols_l = ["l_orderkey", "l_extendedprice", "l_discount"]
    cols_o = ["o_orderkey", "o_orderstatus", "o_orderpriority"]

    def run(chaos: bool):
        line = ray.data.read_parquet(f"{sf}/lineitem.parquet",
                                     columns=cols_l)
        if chaos:
            line = line.map_batches(
                KillWorkerOnce,
                fn_constructor_kwargs=dict(
                    latch=str(tmp_path / "kill.latch"),
                    inner_cls=Identity),
                batch_format="pyarrow", batch_size=512, concurrency=2)
        orders = ray.data.read_parquet(f"{sf}/orders.parquet",
                                       columns=cols_o)
        return lines_by_priority(line, orders, num_partitions=4) \
            .to_pandas().sort_values("o_orderpriority") \
            .reset_index(drop=True)

    clean = run(chaos=False)
    chaotic = run(chaos=True)
    assert os.path.exists(str(tmp_path / "kill.latch")), \
        "fault was never injected"
    assert chaotic.equals(clean)


def test_bucketed_exchange_survives_worker_death(tmp_path, ray_session):
    """Worker death feeding the bucketed per-key exchange
    (per_key_in_buckets under exact_dedup): the killed task's block
    must be retried, re-tagged with the same deterministic bucket,
    and leave the survivor set identical to an undisturbed run — the
    property the 30+ bucketed ops all lean on."""
    import pyarrow as pa
    import ray.data

    from selma_ray.pipelines.dedup import exact_dedup
    from selma_ray.testing import Identity, KillWorkerOnce

    # dup-heavy corpus so the exchange actually collapses groups
    texts = [f"shared body {i % 37}" for i in range(600)]
    tbl = pa.table({
        "doc_id": pa.array(range(600), pa.int64()),
        "text": pa.array(texts),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(tbl, src)

    def run(chaos: bool):
        ds = ray.data.read_parquet(str(src))
        if chaos:
            ds = ds.map_batches(
                KillWorkerOnce,
                fn_constructor_kwargs=dict(
                    latch=str(tmp_path / "kill.latch"),
                    inner_cls=Identity),
                batch_format="pyarrow", batch_size=64, concurrency=2)
        return exact_dedup(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    clean = run(chaos=False)
    chaotic = run(chaos=True)
    assert os.path.exists(str(tmp_path / "kill.latch")), \
        "fault was never injected"
    assert chaotic.equals(clean)
    # survivor rule held through the fault: min id per distinct text
    assert chaotic["doc_id"].tolist() == list(range(37))


def test_sorted_extract_survives_worker_death(tmp_path, ray_session):
    """Same chaos, but with the ordering sort downstream: the retried
    task's blocks must flow through the all-to-all exchange and leave
    the per-conversation turn ordering byte-identical."""
    import ray.data

    from selma_ray.pipelines.extract import extract_transcripts
    from selma_ray.stages.extract import ExtractTurns
    from selma_ray.testing import KillWorkerOnce

    table = synthesize_transcripts(12, big_every=0)
    src = tmp_path / "in.parquet"
    pq.write_table(table, src)
    latch = str(tmp_path / "kill.latch")

    clean = extract_transcripts(
        ray.data.read_parquet(str(src)), concurrency=1, batch_size=32,
        keep_spans=False).to_pandas().reset_index(drop=True)

    chaotic = ray.data.read_parquet(str(src)).map_batches(
        KillWorkerOnce,
        fn_constructor_kwargs=dict(latch=latch, inner_cls=ExtractTurns,
                                   keep_spans=False),
        batch_format="pyarrow", batch_size=32, concurrency=2,
    ).sort(["conv_id", "turn_idx"]).to_pandas().reset_index(drop=True)

    assert os.path.exists(latch), "fault was never injected"
    # sorted output: row-for-row identical, no re-sorting needed
    assert chaotic["conv_id"].tolist() == clean["conv_id"].tolist()
    assert chaotic["turn_idx"].tolist() == clean["turn_idx"].tolist()
    assert chaotic["extracted_text"].tolist() == clean["extracted_text"].tolist()


def test_parquet_footprint_matches_footers(tmp_path, ray_session):
    """Footer-only storage introspection: per column-chunk byte/value
    counts must match what pyarrow wrote, across multiple files and
    row groups."""
    import pyarrow.parquet as pq
    import ray.data

    from selma_ray.sources.readers import parquet_footprint

    t = pa.table({
        "a": pa.array(range(1000), pa.int64()),
        "b": pa.array([f"text {i}" for i in range(1000)]),
    })
    pq.write_table(t, tmp_path / "x.parquet", row_group_size=300)
    pq.write_table(t.slice(0, 100), tmp_path / "y.parquet")

    df = parquet_footprint(str(tmp_path)).to_pandas()
    # x: 4 row groups x 2 cols, y: 1 x 2
    assert len(df) == 10
    x = df[df["file_name"] == "x.parquet"]
    assert sorted(x["row_group_id"].unique()) == [0, 1, 2, 3]
    assert set(df["column"]) == {"a", "b"}
    sums = df.groupby("file_name")["n_values"].sum()
    assert sums["x.parquet"] == 2000
    assert sums["y.parquet"] == 200
    assert (df["compressed_bytes"] > 0).all()
    assert (df["value_ratio"] > 0).all()
