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
    literal in functions/bpe.py (see its comment)."""
    import collections

    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    wc: collections.Counter = collections.Counter()
    for (t,) in rows:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    assert train_bpe(wc, 40) == CORPUS_MERGES


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
