"""Trained-vocab BPE (functions/bpe.py): trainer determinism, shipped-
artifact provenance, and Spark-vs-reference encoder parity.  The
oracle-level check of q_bpe_encode lives in test_oracle.py like every
other registered query."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_cudf_spark.functions.bpe import (
    CORPUS_MERGES,
    bpe_encode_expr,
    bpe_segment,
    train_bpe,
)
from dask_cudf_spark.sources import load_table

from .conftest import SF_DIR


def test_train_bpe_learns_expected_merges():
    # tiny Sennrich-style example: 'low'-family vocabulary
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(wc, 4)
    # 'es' (9) then 'est' (9) dominate; then 'l o' and 'lo w' (7)
    assert merges[:2] == [("e", "s"), ("es", "t")]
    assert merges[2:] == [("l", "o"), ("lo", "w")]


def test_train_bpe_deterministic_tiebreak():
    # all pairs tie at count 1 -> lexicographic winner first
    merges = train_bpe({"ba": 1, "ab": 1}, 1)
    assert merges == [("a", "b")]


def test_shipped_merges_provenance():
    """CORPUS_MERGES must be exactly train_bpe(corpus word counts, 40).
    If this fails after a testdata regeneration, retrain and update the
    literal in functions/bpe.py (see its comment).

    The training corpus is PINNED to the sf0.001 fixture (the table the
    shipped literal was trained on) — deliberately independent of
    ORACLE_SF_DIR: a gate-scale suite run must not re-interpret the
    merge table's provenance, only its application (which the oracle
    queries check at every SF)."""
    import collections

    import duckdb

    rows = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    wc: collections.Counter = collections.Counter()
    for (t,) in rows:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    assert train_bpe(wc, 40) == CORPUS_MERGES


def _trainer_apply(word: str, merges) -> list[str]:
    """Reference segmentation: apply merges exactly the way train_bpe's
    vocabulary-update loop does (rank order, greedy left-to-right with
    i += 2 on a merge).  The encoder must reproduce this."""
    sym = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_consecutive_merge_occurrences():
    """Regression (round-4 ADVICE): adjacent matches share a boundary in
    a single-space representation, so 'banana' with merge (a,n) used to
    encode as [b, an, a, n, a].  The double-space representation must
    merge BOTH occurrences, matching the trainer's own application."""
    merges = [("a", "n")]
    assert bpe_segment("banana", merges) == ["b", "an", "an", "a"]
    assert bpe_segment("banana", merges) == _trainer_apply(
        "banana", merges
    )
    # run of identical symbols: greedy pairs, odd one left over
    assert bpe_segment("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]
    # cascaded merges over repeats
    m2 = [("a", "n"), ("an", "an")]
    assert bpe_segment("banana", m2) == ["b", "anan", "a"]
    assert bpe_segment("banana", m2) == _trainer_apply("banana", m2)


def test_spark_encoder_consecutive_occurrences(spark):
    """The Spark expression and DuckDB SQL twins share the fixed
    representation: verify both on the 'banana' case."""
    import duckdb

    from dask_cudf_spark.functions.bpe import bpe_encode_sql

    merges = [("a", "n")]
    row = (
        spark.range(1)
        .select(bpe_encode_expr(F.lit("banana nab"), merges).alias("bpe"))
        .collect()[0]
    )
    assert row["bpe"] == "b an an a n a b"
    sql_expr = bpe_encode_sql("'banana nab'", merges)
    (got,) = duckdb.sql(f"SELECT {sql_expr}").fetchone()
    assert got == "b an an a n a b"


def test_segmentation_matches_trainer_on_corpus_words():
    """Every corpus word segments identically under the encoder twin and
    the trainer's own merge application (the artifact's ground truth)."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT DISTINCT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    words = {w for (t,) in rows for w in t.split(" ") if w}
    for w in sorted(words):
        assert bpe_segment(w, CORPUS_MERGES) == _trainer_apply(
            w, CORPUS_MERGES
        ), w


def test_segmentation_lossless():
    for w in ["customer", "window", "stream", "spark", "a", "query"]:
        toks = bpe_segment(w, CORPUS_MERGES)
        assert "".join(toks) == w
        assert all(toks)


def test_spark_encoder_matches_python_reference(spark):
    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 50)
    got = {
        r["doc_id"]: r["bpe"]
        for r in d.select(
            "doc_id", bpe_encode_expr("text").alias("bpe")
        ).collect()
    }
    for r in d.select("doc_id", "text").collect():
        expected = " ".join(
            " ".join(bpe_segment(w, CORPUS_MERGES))
            for w in r["text"].split(" ")
        )
        assert got[r["doc_id"]] == expected


def test_bpe_encoder_equals_trainer_property():
    """Property (round-4 regression armor): for ANY word and ANY merge
    table trained on it, the replace-chain encoder must reproduce the
    trainer's own greedy merge application exactly, and concatenating
    the tokens must restore the word.  Small alphabets maximize
    repeated-pair density — the shape that exposed the
    consecutive-occurrence bug ('banana')."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="abc", min_size=0, max_size=14),
        st.text(alphabet="ab", min_size=0, max_size=10),
        st.integers(min_value=0, max_value=8),
    )
    def run(w1, w2, n_merges):
        vocab = {w: c for w, c in ((w1, 3), (w2, 1)) if w}
        merges = train_bpe(vocab, n_merges)
        for w in vocab:
            got = bpe_segment(w, merges)
            assert got == _trainer_apply(w, merges), (w, merges, got)
            assert "".join(got) == w

    run()
