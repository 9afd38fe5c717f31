"""Vectorized scalar/text functions used inside map_batches stages."""

from .hashing import md5_hex, minhash_signatures, rolling_fingerprint, simhash64
from .text import doc_stats_batch, language_id, token_count_batch

__all__ = [
    "doc_stats_batch",
    "language_id",
    "md5_hex",
    "minhash_signatures",
    "rolling_fingerprint",
    "simhash64",
    "token_count_batch",
]
