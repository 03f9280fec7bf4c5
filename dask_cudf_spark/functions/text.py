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


_MERSENNE_P = (1 << 31) - 1  # permutation modulus (fits all arithmetic in long)


def minhash_band_buckets(
    col: Column | str, bands: int = 4, rows_per_band: int = 4, shingle: int = 5
) -> Column:
    """LSH band buckets directly: array<long> of `bands` bucket hashes.

    The whole computation is ONE expression with the signature fold as
    the direct input of the final transform, so the fold is evaluated
    exactly once per row.  (Referencing a signature column k times lets
    CollapseProject inline k copies — measured 4-16x slower; HOFs get no
    codegen subexpression elimination.)

    Accumulator shape: array<array<long>> = bands x rows_per_band mins;
    final step hashes each band's slice (xxhash64 over array<long>).
    """
    sig = minhash_signature(col, num_hashes=bands * rows_per_band, shingle=shingle)
    # let-binding trick: wrap the signature in a 1-element array and bind
    # it as a lambda variable -> the `s` references inside are variable
    # reads, and the expensive fold runs exactly once per row.
    return F.element_at(
        F.transform(
            F.array(sig),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(s, b * rows_per_band + 1, rows_per_band)),
            ),
        ),
        1,
    )


def _minhash_perm_constants(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_hashes)
    ]


def minhash_signature(col: Column | str, num_hashes: int = 16, shingle: int = 5) -> Column:
    """nvtext.minhash: array of num_hashes min-hash values over character
    shingles — all JVM-side, one pass.

    Each shingle is hashed ONCE (xxhash64), then the k permutations are
    affine maps h_i(x) = (a_i*x + b_i) mod p over the base hash — the
    standard minhash trick; ~10x cheaper than re-hashing the string per
    permutation and ANSI-safe (no 64-bit overflow: operands < 2^62).

    Scale note: signature is O(num_hashes) per row with no shuffle; the
    LSH banding that follows (operators/dedup.py) is where the shuffle is.
    """
    base = F.transform(
        F.array_distinct(char_ngrams(col, shingle)),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P)),
    )
    consts = _minhash_perm_constants(num_hashes)
    init = F.array(*[F.lit(_MERSENNE_P).cast("long")] * num_hashes)
    # ONE fold over the shingle hashes updating all k mins at once.
    # (k separate array_min(transform(...)) exprs would re-evaluate the
    # shingling k times after CollapseProject inlining — measured 16x
    # slower at sf0.1.)
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))
                    for a, b in consts
                ]
            ),
            lambda x, y: F.least(x, y),
        ),
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
