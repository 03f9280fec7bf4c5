"""Scalar/array/text function helpers (SURVEY.md §2.8, §2.12)."""

from .det import avg_from_cents, cents, scaled_int, scaled_sum, sum_cents
from .text import (
    char_ngrams,
    doc_fingerprint,
    lang_id_heuristic,
    minhash_signature,
    quality_score,
    simhash64,
    token_count,
    tokenize,
    word_ngrams,
)

__all__ = [
    "cents",
    "scaled_int",
    "sum_cents",
    "scaled_sum",
    "avg_from_cents",
    "tokenize",
    "token_count",
    "word_ngrams",
    "char_ngrams",
    "minhash_signature",
    "simhash64",
    "lang_id_heuristic",
    "quality_score",
    "doc_fingerprint",
]
