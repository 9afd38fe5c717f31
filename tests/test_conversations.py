"""Per-conversation assembly/stats (two-phase groupby) and the job CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _turns_ds(n_convs=12):
    import ray.data

    from selma_ray.sources.transcripts import transcript_dataset
    return transcript_dataset(n_convs)


def test_assemble_matches_pandas(ray_session):
    from selma_ray.pipelines.conversations import assemble_conversations

    ds = _turns_ds()
    got = assemble_conversations(ds, sep="\n").to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)

    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"])
    want = df.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"),
        n_chars=("text", lambda s: sum(len(x) for x in s)),
        text=("text", "\n".join),
    ).reset_index().sort_values("conv_id").reset_index(drop=True)

    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["n_turns"]) == list(want["n_turns"])
    assert list(got["n_chars"]) == list(want["n_chars"])
    assert list(got["text"]) == list(want["text"])


def test_assemble_skewed_conversation(ray_session):
    # conv ordinal 0 has 20x turns (the % 97 skew rule); assembly must
    # still produce exactly one ordered row for it
    from selma_ray.pipelines.conversations import assemble_conversations
    from selma_ray.sources.transcripts import n_turns_for

    got = assemble_conversations(_turns_ds(4), sep="|").to_pandas()
    row = got[got.conv_id == "conv-000000"].iloc[0]
    assert row.n_turns == n_turns_for(0) and row.n_turns >= 40
    # first piece is turn 0, last piece is the last turn
    pieces = row.text.split("|")
    assert len(pieces) >= row.n_turns  # separators inside turns possible


def test_conversation_stats(ray_session):
    from selma_ray.pipelines.conversations import conversation_stats

    ds = _turns_ds()
    got = conversation_stats(ds).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    df = ds.to_pandas()
    want = df.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"), first_turn=("turn_idx", "min"),
        last_turn=("turn_idx", "max"),
        total_chars=("text", lambda s: sum(len(x) for x in s)),
    ).reset_index().sort_values("conv_id").reset_index(drop=True)
    assert list(got["n_turns"]) == list(want["n_turns"])
    assert list(got["first_turn"]) == list(want["first_turn"])
    assert list(got["last_turn"]) == list(want["last_turn"])
    assert list(got["total_chars"]) == list(want["total_chars"])


def test_job_cli_extract_and_resume(tmp_path):
    """Drive the ray-job entrypoint end-to-end in a subprocess (it owns
    its own ray session), then resume: second run must skip all shards."""
    from selma_ray.sources.transcripts import synthesize_transcripts
    import pyarrow.parquet as pq

    inp = tmp_path / "in"
    inp.mkdir()
    t = synthesize_transcripts(6)
    pq.write_table(t.slice(0, t.num_rows // 2), inp / "part-0.parquet")
    pq.write_table(t.slice(t.num_rows // 2), inp / "part-1.parquet")
    out = tmp_path / "out"

    env = dict(os.environ, RAY_ADDRESS="local")
    # pool strictly below num-cpus: an actor pool that owns every CPU
    # starves the read/write tasks and deadlocks the streaming executor
    cmd = [sys.executable, "-m", "selma_ray.job", "--num-cpus", "4",
           "extract", "--input", str(inp), "--output", str(out),
           "--no-spans", "--concurrency", "2"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                        cwd="/root/repo", env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["shards_total"] == 2 and s1["shards_done"] == 2
    assert s1["rows"] == t.num_rows

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                        cwd="/root/repo", env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["shards_skipped"] == 2 and s2["shards_done"] == 0
    # metrics carried over from the manifest, not recomputed
    assert s2["metrics"]["turns_processed"] == t.num_rows


class TestPackSequencesGlobal:
    def _run(self, toks, ray_session, budget, parts=4, bucket_width=8):
        import ray.data

        from selma_ray.pipelines.conversations import pack_sequences_global

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(range(len(toks))), pa.int64()),
            "text": pa.array(["t " * n for n in toks]),
        })).repartition(parts)
        out = pack_sequences_global(ds, budget=budget,
                                    bucket_width=bucket_width)
        return sorted((r["doc_id"], r["n_tokens"], r["seq_id"],
                       r["seq_offset"]) for r in out.take_all())

    def _naive(self, toks, budget):
        out, cum = [], 0
        for i, n in enumerate(toks):
            out.append((i, n, cum // budget, cum % budget))
            cum += n
        return out

    def test_matches_sequential_prefix_sum(self, ray_session):
        toks = [(i * 13) % 29 for i in range(100)]
        assert self._run(toks, ray_session, budget=50) == \
            self._naive(toks, 50)

    def test_partition_invariant(self, ray_session):
        toks = [(i * 5) % 17 for i in range(64)]
        a = self._run(toks, ray_session, budget=20, parts=1)
        b = self._run(toks, ray_session, budget=20, parts=7)
        assert a == b

    def test_null_doc_id_raises_clearly(self, ray_session):
        """Null ids must fail with the op's own ValueError, not an
        opaque NaN->int64 ArrowInvalid from the numpy float detour."""
        import pytest
        import ray.data

        from selma_ray.pipelines.conversations import pack_sequences_global

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, None, 3], pa.int64()),
            "text": pa.array(["a b", "c d", "e f"]),
        }))
        with pytest.raises(Exception, match="null 'doc_id'"):
            pack_sequences_global(ds, budget=4).take_all()

    def test_oversized_doc_spans_windows(self, ray_session):
        # a 70-token doc with budget 32 starts at its cum_before window
        toks = [10, 70, 10]
        got = self._run(toks, ray_session, budget=32)
        assert got == [(0, 10, 0, 0), (1, 70, 0, 10), (2, 10, 2, 16)]


def test_turn_pairs_lead_window(ray_session):
    """turn_pairs == pandas groupby-shift LEAD reference, including
    conversations that yield zero pairs."""
    import pandas as pd
    import ray.data

    from selma_ray.pipelines.conversations import turn_pairs

    rows = []
    # conv a: alternating, out-of-order idx insertion; conv b: all user
    for conv, seq in [("a", [(0, "user"), (1, "assistant"), (2, "user"),
                             (3, "assistant"), (4, "user")]),
                      ("b", [(0, "user"), (1, "user")]),
                      ("c", [(5, "assistant"), (7, "user"),
                             (9, "assistant")])]:
        for idx, role in seq:
            rows.append({"conv_id": conv, "turn_idx": idx, "role": role,
                         "text": f"{conv}-{idx}"})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    got = turn_pairs(ds).to_pandas() \
        .sort_values(["conv_id", "prompt_idx"]).reset_index(drop=True)

    assert list(got["conv_id"]) == ["a", "a", "c"]
    assert list(got["prompt_idx"]) == [0, 2, 7]
    assert list(got["response_idx"]) == [1, 3, 9]
    assert list(got["prompt"]) == ["a-0", "a-2", "c-7"]
    assert list(got["response"]) == ["a-1", "a-3", "c-9"]


def test_rank_rows_matches_pandas_window(ray_session):
    """rank_rows == pandas rank/row_number/ntile reference with ties."""
    import numpy as np
    import pandas as pd
    import ray.data

    from selma_ray.pipelines.relational import rank_rows

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "doc_id": np.arange(101, dtype=np.int64),
        "n_chars": rng.randint(0, 12, size=101).astype(np.int64),  # ties
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = rank_rows(ds, key_col="n_chars", id_col="doc_id", ntile_k=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    ref = df.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    ref["row_num"] = np.arange(1, len(ref) + 1, dtype=np.int64)
    ref["rnk"] = ref.groupby("n_chars")["row_num"].transform("min")
    n, k = len(ref), 7
    q, r = divmod(n, k)
    tiles = np.concatenate(
        [np.full(q + (1 if t < r else 0), t + 1) for t in range(k)])
    ref["tile"] = tiles
    ref = ref.sort_values("doc_id").reset_index(drop=True)

    for col in ("n_chars", "rnk", "row_num", "tile"):
        assert list(got[col]) == list(ref[col]), col


def test_conversation_near_dups(ray_session):
    """A conversation and its lightly-edited copy pair up; unrelated
    conversations don't."""
    import pandas as pd
    import ray.data

    from selma_ray.pipelines.conversations import conversation_near_dups

    rows = []
    for t in range(40):
        rows.append({"conv_id": "a", "turn_idx": t, "text": f"turn {t}"})
        if t % 10 != 0:  # near-dup of a: 4 turns dropped
            rows.append({"conv_id": "a2", "turn_idx": t,
                         "text": f"turn {t}"})
        rows.append({"conv_id": "b", "turn_idx": t,
                     "text": f"other {t * 7}"})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    pairs = {(r["id_a"], r["id_b"])
             for r in conversation_near_dups(ds, threshold=0.5).take_all()}
    assert ("a", "a2") in pairs
    assert all("b" not in p for p in pairs)


def test_train_logreg_matches_single_process(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from selma_ray.pipelines.train import train_logreg

    rng = np.random.RandomState(1)
    n = 400
    x = rng.randn(n, 2)
    y = (x[:, 0] + 2 * x[:, 1] + 0.1 * rng.randn(n) > 0).astype(float)
    df = pd.DataFrame({"f0": x[:, 0], "f1": x[:, 1], "keep": y})
    model = train_logreg(
        ray.data.from_pandas(df).repartition(5).materialize(),
        feature_cols=["f0", "f1"], label_col="keep", iters=50, lr=1.0)

    # single-process reference: identical standardization + GD schedule
    mu, sd = x.mean(axis=0), x.std(axis=0)
    xs = (x - mu) / sd
    w = np.zeros(2)
    b = 0.0
    for _ in range(50):
        p = 1 / (1 + np.exp(-(xs @ w + b)))
        w -= 1.0 * (xs.T @ (p - y)) / n
        b -= 1.0 * (p - y).sum() / n
    assert np.allclose(model["weights"], w, atol=1e-6)
    assert abs(model["bias"] - b) < 1e-6
    assert model["train_acc"] > 0.9
