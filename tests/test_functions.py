"""Unit tests for selma_ray.functions (pure, no Ray needed)."""

import numpy as np
import pyarrow as pa

from selma_ray.functions.hashing import (
    band_keys,
    crc32_shard,
    hamming64,
    jaccard,
    md5_hex,
    minhash_signatures,
    rolling_fingerprint,
    shingle_hashes,
    simhash64,
    word_shingles,
)
from selma_ray.functions.text import (
    doc_stats_batch,
    language_id,
    quality_score_batch,
    token_count_batch,
)


def test_token_count_matches_python_split():
    texts = ["a b  c", "", "  leading and trailing  ", "one", "\tx\ny z\r"]
    got = token_count_batch(pa.array(texts)).to_pylist()
    assert got == [len(t.split()) for t in texts]


def test_doc_stats_batch_columns():
    batch = pa.table({"text": pa.array(["hello world", "a"])})
    out = doc_stats_batch(batch)
    assert out.column("n_chars_calc").to_pylist() == [11, 1]
    assert out.column("n_tokens").to_pylist() == [2, 1]


def test_language_id_heuristic():
    assert language_id("the cat sat on the mat and it was the best") == "en"
    assert language_id("der hund und die katze ist ein tier") == "de"
    assert language_id("el perro y la casa es una cosa para los dos") == "es"
    assert language_id("这是一个中文句子，用于测试语言识别功能。") == "zh"
    assert language_id("") == "und"
    assert language_id("zzz qqq xxx") == "und"


def test_quality_score_bounds():
    batch = pa.table({"text": pa.array(
        ["", "the quick brown fox jumps over the lazy dog and runs on",
         "!!!???...;;;", "word " * 100])})
    out = quality_score_batch(batch)
    scores = out.column("quality").to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    # real sentence beats pure punctuation
    assert scores[1] > scores[2]


def test_md5_hex_stable():
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_word_shingles():
    assert word_shingles("a b c d", 3) == {"a b c", "b c d"}
    assert word_shingles("a b", 3) == {"a b"}
    assert word_shingles("", 3) == set()


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox leaps over the lazy dog " * 5
    c = "completely different words entirely here now " * 5
    ha, hb, hc = (shingle_hashes(t) for t in (a, b, c))
    exact_ab = jaccard(ha, hb)
    sigs = minhash_signatures([ha, hb, hc], k=256)
    est_ab = float((sigs[0] == sigs[1]).mean())
    est_ac = float((sigs[0] == sigs[2]).mean())
    assert abs(est_ab - exact_ab) < 0.15
    assert est_ac < 0.1
    # identical docs -> identical signatures
    sigs2 = minhash_signatures([ha, ha], k=256)
    assert (sigs2[0] == sigs2[1]).all()


def test_band_keys_shape_and_band_isolation():
    sig = np.arange(128, dtype=np.uint64)
    keys = band_keys(sig, bands=16)
    assert len(keys) == 16
    assert len(set(keys)) == 16  # distinct across bands (prefix byte)


def test_simhash_similarity():
    a = simhash64("the quick brown fox jumps over the lazy dog " * 10)
    b = simhash64("the quick brown fox jumps over the lazy cat " * 10)
    c = simhash64("numbers 1 2 3 4 5 6 7 8 9 quite unrelated text " * 10)
    assert hamming64(a, b) < hamming64(a, c)
    assert hamming64(a, a) == 0


def test_rolling_fingerprint_deterministic():
    assert rolling_fingerprint("hello") == rolling_fingerprint("hello")
    assert rolling_fingerprint("hello") != rolling_fingerprint("hellp")


def test_crc32_shard_range():
    for k in ["a", "b", "conv-000001"]:
        assert 0 <= crc32_shard(k, 16) < 16


def test_kmeans_matches_driver_reference(ray_session):
    """Distributed Lloyd's must match a single-process numpy reference
    (same deterministic init and per-round rounding)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from selma_ray.pipelines.clustering import kmeans

    rng = np.random.default_rng(3)
    # three well-separated blobs
    blobs = np.vstack([rng.normal(c, 0.05, (30, 8))
                       for c in (0.0, 1.0, 5.0)])
    ids = np.arange(len(blobs))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(blobs.astype(np.float64))),
    }))
    out, cent = kmeans(ds, k=3, iters=8)
    got = {r["vec_id"]: r["cluster"] for r in out.take_all()}

    # reference Lloyd's with identical init/rounding
    C = np.round(blobs[:3].astype(np.float64), 6)
    for _ in range(8):
        d2 = ((blobs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d2, 1)
        newC = np.array([blobs[a == j].mean(0) if (a == j).any() else C[j]
                         for j in range(3)])
        newC = np.round(newC, 6)
        if np.abs(newC - C).max() <= 1e-6:
            C = newC
            break
        C = newC
    d2 = ((blobs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    want = np.argmin(d2, 1)
    assert np.allclose(cent, C)
    assert all(got[i] == want[i] for i in ids)
    # blob membership is perfectly recovered
    assert len({got[i] for i in range(30)}) == 1
    assert len({got[i] for i in range(60, 90)}) == 1


def test_semantic_dedup_matches_reference(ray_session):
    """Distributed SemDeDup must match a single-process greedy reference
    using the same kmeans centroids."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from selma_ray.pipelines.clustering import kmeans, semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (20, 8))
    # plant near-duplicates: rows 20..29 are tiny perturbations of 0..9
    dups = base[:10] + rng.normal(0, 1e-4, (10, 8))
    X = np.vstack([base, dups]).astype(np.float64)
    ids = np.arange(len(X))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(X)),
    })).repartition(4)

    out = semantic_dedup(ds, k=4, threshold=0.99, iters=6).take_all()
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out}

    # reference: same centroids -> same greedy prune
    _, C = kmeans(ds, k=4, iters=6)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    assign = d2.argmin(1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = {}
    for c in range(4):
        members = [i for i in ids if assign[i] == c]
        kept = []
        for i in members:
            ms = max((float(Xn[j] @ Xn[i]) for j in kept), default=-1.0)
            keep = ms < 0.99
            if keep:
                kept.append(i)
            want[i] = (c, keep)
    assert got == want
    # every planted dup that landed in its original's cluster is dropped
    dropped = [i for i in range(20, 30) if assign[i] == assign[i - 20]]
    assert dropped, "test needs at least one co-clustered dup pair"
    assert all(not got[i][1] for i in dropped)
