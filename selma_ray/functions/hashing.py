"""Deterministic hashing / sketching primitives for dedup pipelines.

Everything here must be stable across processes and machines (no
python hash(), no process salts): md5 / crc32-derived only, with numpy
vectorization for the signature math.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np

_WS_RE = re.compile(r"\S+")

_MERSENNE = (1 << 61) - 1  # prime for universal hashing


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "surrogatepass")).hexdigest()


def md5_64(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def md5_64_signed(data: bytes) -> int:
    """Same 8 bytes as :func:`md5_64`, reinterpreted as signed int64 —
    use wherever the hash rides an Arrow column through a Ray groupby
    (uint64 values >= 2^63 trip Ray's block rebuild into a pickled
    python-object fallback column)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little",
                          signed=True)


def tokens(text: str) -> list[str]:
    return _WS_RE.findall(text)


def word_shingles(text: str, n: int = 3) -> set[str]:
    """Distinct word n-gram shingles, joined by single spaces — the exact
    definition the DuckDB oracle reproduces."""
    toks = tokens(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


# word -> md5_64 cache: Zipf vocabularies make this hit-heavy, and the
# per-actor cache is what keeps shingle hashing off the md5 hot path
_WORD_HASH_CACHE: dict[str, int] = {}
_POLY_A = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier (golden-ratio)


def _word_hash(w: str) -> int:
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        if len(_WORD_HASH_CACHE) > 1_000_000:
            _WORD_HASH_CACHE.clear()
        h = _WORD_HASH_CACHE.setdefault(
            w, md5_64(w.encode("utf-8", "surrogatepass")))
    return h


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """64-bit hashes of word n-gram shingles (uint64, sorted, distinct).

    Vectorized: each word is md5-hashed once (cached across documents —
    per-shingle md5 was the minhash stage's hot path), then n-gram hashes
    are a numpy polynomial combine over the word-hash array with natural
    uint64 wraparound. Deterministic across processes/actors (no process
    salt anywhere)."""
    ws = tokens(text)
    if not ws:
        return np.empty(0, dtype=np.uint64)
    hs = np.fromiter((_word_hash(w) for w in ws), dtype=np.uint64,
                     count=len(ws))
    if len(ws) <= n:
        a = int(_POLY_A)
        acc = int(hs[0])
        for j in range(1, len(ws)):
            acc = (acc * a + int(hs[j])) & 0xFFFFFFFFFFFFFFFF
        return np.array([acc], dtype=np.uint64)
    m = len(ws) - n + 1
    acc = hs[0:m].copy()
    for j in range(1, n):
        acc *= _POLY_A
        acc += hs[j:j + m]
    return np.unique(acc)


def _coeffs(k: int, seed: int = 0x5e1fa) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


_COEFF_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signatures(hash_sets: list[np.ndarray], k: int = 128) -> np.ndarray:
    """MinHash signatures, vectorized: for each doc's shingle-hash array,
    sig[j] = min(((a_j * h) mod 2^64 + b_j) mod p). Returns (n_docs, k)
    uint64.

    Honesty note: ``a_j * h`` WRAPS in uint64 before the mod-p, so this
    is a multiply-wrap mixing family, not a textbook mod-p universal
    hash — the formal collision bound doesn't apply, but the wrap mixes
    well empirically (recall parity vs exact Jaccard is tested) and the
    exact same wrapped arithmetic is mirrored bit-for-bit by the DuckDB
    oracle, so it is load-bearing: do not 'fix' the overflow without
    changing the oracle in lockstep."""
    if k not in _COEFF_CACHE:
        _COEFF_CACHE[k] = _coeffs(k)
    a, b = _COEFF_CACHE[k]
    out = np.full((len(hash_sets), k), np.iinfo(np.uint64).max, dtype=np.uint64)
    p = np.uint64(_MERSENNE)
    for i, hs in enumerate(hash_sets):
        if hs.size == 0:
            continue
        # (n_shingles, k) — modular universal hash, all numpy
        v = (hs[:, None] * a[None, :] + b[None, :]) % p
        out[i] = v.min(axis=0)
    return out


def band_keys(sig: np.ndarray, bands: int) -> list[bytes]:
    """LSH band bucket keys for one signature: md5 of each band's bytes,
    prefixed with the band index so buckets never collide across bands."""
    k = sig.shape[0]
    rows = k // bands
    return [
        bytes([bi]) + hashlib.md5(sig[bi * rows:(bi + 1) * rows].tobytes()).digest()[:8]
        for bi in range(bands)
    ]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted distinct uint64 arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-derived token hashes)."""
    toks = tokens(text)
    if not toks:
        return 0
    hs = np.fromiter(
        (md5_64(t.encode("utf-8", "surrogatepass")) for t in toks),
        dtype=np.uint64, count=len(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, base: int = 257,
                        mod: int = (1 << 61) - 1) -> int:
    """Karp–Rabin rolling hash over the whole document (deterministic
    document fingerprint; cheaper than md5 for incremental use-cases)."""
    h = 0
    for b in text.encode("utf-8", "surrogatepass"):
        h = (h * base + b) % mod
    return h


def crc32_shard(key: str, n_shards: int) -> int:
    """Stable shard assignment for salting / partition routing."""
    return zlib.crc32(key.encode()) % n_shards
