"""End-to-end Dataset pipelines."""

from .dedup import (
    exact_dedup,
    exact_dedup_stats,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .extract import extract_transcripts, run_extraction
from .relational import (
    events_rollup,
    lineitem_pricing_summary,
    revenue_by_nation,
    top_customers,
)
from .similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    load_queries,
    lsh_topk,
)

__all__ = [
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "events_rollup",
    "exact_dedup",
    "exact_dedup_stats",
    "extract_transcripts",
    "lineitem_pricing_summary",
    "load_queries",
    "lsh_topk",
    "minhash_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "revenue_by_nation",
    "run_extraction",
    "simhash_pairs",
    "top_customers",
]
