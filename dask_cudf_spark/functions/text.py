"""Text-analysis column functions (SURVEY.md §2.8 nvtext family, §2.12).

Everything here is a *pure Column expression* (JVM-side, whole-stage
codegen) — no Python UDFs in the hot path.  These are the building
blocks the LLM-pipeline operators (dedup, fingerprinting, quality
filtering) compose; at 100 TB they run inside the scan stage.

Reference parity: nvtext tokenize/token_count/ngrams/minhash/jaccard
(upstream: cpp/src/text/*) re-expressed as Spark SQL expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """nvtext.tokenize: whitespace split (drop empties)."""
    return F.filter(F.split(_c(col), pattern), lambda t: t != F.lit(""))


def token_count(col: Column | str, pattern: str = r"\s+") -> Column:
    return F.size(tokenize(col, pattern))


def word_ngrams(col: Column | str, n: int = 2, sep: str = " ") -> Column:
    """nvtext.ngrams_tokenize: word n-grams as an array<string>."""
    toks = tokenize(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), sep),
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """nvtext.character_ngrams: character shingles as array<string>."""
    s = _c(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - F.lit(n - 1), F.lit(0))),
        lambda i: F.substring(s, i, n),
    )


def minhash_signature(col: Column | str, num_hashes: int = 16, shingle: int = 5) -> Column:
    """nvtext.minhash: array of num_hashes min-hash values over character
    shingles.  Seeded xxhash64 per permutation — all JVM-side; one pass.

    Scale note: signature is O(num_hashes) per row with no shuffle; the
    LSH banding that follows (operators/dedup.py) is where the shuffle is.
    """
    shingles = F.array_distinct(char_ngrams(col, shingle))
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def simhash64(col: Column | str, shingle: int = 4) -> Column:
    """SimHash: 64-bit fingerprint; near-dups differ in few bits
    (compare with bit_count(a ^ b) <= k).

    Pure SQL: for each bit b, sum +-1 votes of xxhash64(shingle) bit b,
    then pack the sign bits.  O(64 * shingles) JVM expression.
    """
    hashes = F.transform(
        F.array_distinct(char_ngrams(col, shingle)), lambda s: F.xxhash64(s)
    )

    def _bit_vote(b: int):
        # closure factory: the merge lambda must be exactly binary
        # (pyspark derives the HOF arity from the signature)
        mask = F.lit(1 << b).cast("long")
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    bits = [
        F.when(_bit_vote(b) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(63)  # keep sign bit clear
    ]
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bits):
        out = out + (bit * F.lit(1 << b).cast("long"))
    return out


_EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


def lang_id_heuristic(col: Column | str) -> Column:
    """Cheap language ID: CJK codepoint ratio -> zh; accented-latin hints
    for fr/es/de; English stopword hit-rate -> en; else 'unknown'.
    Deterministic, SQL-expressible (mirrors fastText-style pipelines'
    pre-filter stage, not a real classifier)."""
    s = _c(col)
    total = F.greatest(F.length(s), F.lit(1))
    cjk = F.length(F.regexp_replace(s, r"[^一-鿿]", ""))
    toks = tokenize(F.lower(s))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in _EN_STOPWORDS]))
    )
    fr = F.length(F.regexp_replace(s, r"[^éèêàçùôî]", ""))
    es = F.length(F.regexp_replace(s, r"[^ñáíóúü¿¡]", ""))
    de = F.length(F.regexp_replace(s, r"[^äöüß]", ""))
    return (
        F.when(cjk * 10 > total, F.lit("zh"))
        .when(fr > es, F.when(fr > de, F.lit("fr")).otherwise(F.lit("de")))
        .when(es > de, F.lit("es"))
        .when(de > 0, F.lit("de"))
        .when(stop_hits > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(col: Column | str) -> Column:
    """Document quality heuristics -> struct of signals (Gopher/C4-style
    filters): char count, token count, mean token length, alpha ratio,
    punct ratio, stopword ratio, max repeated-token fraction."""
    s = _c(col)
    toks = tokenize(s)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    total = F.greatest(F.length(s), F.lit(1))
    alpha = F.length(F.regexp_replace(s, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(s, r"[^.,;:!?]", ""))
    stop_hits = F.size(
        F.filter(
            F.transform(toks, F.lower),
            lambda t: t.isin(*[F.lit(w) for w in _EN_STOPWORDS]),
        )
    )
    return F.struct(
        F.length(s).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tok).alias(
            "mean_token_len"
        ),
        (alpha.cast("double") / total).alias("alpha_ratio"),
        (punct.cast("double") / total).alias("punct_ratio"),
        (stop_hits.cast("double") / n_tok).alias("stopword_ratio"),
    )


def doc_fingerprint(col: Column | str, normalize: bool = True) -> Column:
    """Content fingerprint for exact dedup: md5 of whitespace-normalized
    lowercase text (md5 exists in DuckDB too -> oracle-checkable)."""
    s = _c(col)
    if normalize:
        s = F.lower(F.trim(F.regexp_replace(s, r"\s+", " ")))
    return F.md5(s)
