"""Custom operators the reference family has (or its pipelines need)
that Spark lacks as single built-ins — each composed from DataFrame
ops (no RDDs, no row-at-a-time Python), per SURVEY.md §2.3/§2.12.
"""

from .asof import merge_asof
from .dedup import exact_dedup, minhash_lsh_candidates, near_dedup_minhash
from .similarity import cosine_topk, lsh_bucket_topk

__all__ = [
    "merge_asof",
    "exact_dedup",
    "minhash_lsh_candidates",
    "near_dedup_minhash",
    "cosine_topk",
    "lsh_bucket_topk",
]
