"""Empty-input contracts for trained-structure operators (round 10).

The 100%-null replay leg (NULLS.md, degenerate endpoint) established
the convention: ZERO non-null vectors -> a typed EMPTY result
(empty-in, empty-out, matching the DuckDB oracle twins), while a
PARTIAL codebook still raises (misconfiguration, not empty input).
These tests pin both sides of that line without the injection
machinery, so a refactor can't silently regress either behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _empty_vectors(spark):
    # the all-null-embedding shape the 100%-null leg produces
    return spark.createDataFrame(
        [(i, None) for i in range(20)],
        "vec_id long, embedding array<double>",
    )


def _some_vectors(spark, n=5):
    return spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_cosine_topk_empty_queries_returns_typed_empty(spark):
    from dask_cudf_spark.operators.similarity import cosine_topk

    corpus = _some_vectors(spark, 5)
    out = cosine_topk(
        corpus, _empty_vectors(spark), k=3, query_id_col="vec_id"
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "neighbor_id", "cosine", "rank",
    ]


def test_cosine_topk_empty_corpus_returns_no_rows(spark):
    from dask_cudf_spark.operators.similarity import cosine_topk

    out = cosine_topk(
        _empty_vectors(spark), _some_vectors(spark, 3),
        k=3, query_id_col="vec_id",
    )
    assert out.count() == 0


def test_ivf_topk_empty_codebook_returns_typed_empty(spark):
    from dask_cudf_spark.operators.similarity import ivf_topk

    out = ivf_topk(
        _empty_vectors(spark), _empty_vectors(spark),
        query_id_col="vec_id",
    )
    assert out.count() == 0
    assert out._ivf_centroid_ids == []
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "neighbor_id", "cosine", "rank",
    ]


def test_pq_topk_empty_corpus_empty_partial_raises(spark):
    from dask_cudf_spark.operators.similarity import pq_topk

    out = pq_topk(
        _empty_vectors(spark), _empty_vectors(spark),
        dim=2, n_subspaces=2, query_id_col="vec_id",
    )
    assert out.count() == 0
    # PARTIAL codebook (non-empty corpus, too few stride seeds for
    # n_codes) must still fail loudly — that line is the contract
    with pytest.raises(ValueError, match="codebook seeds"):
        pq_topk(
            _some_vectors(spark, 3), _some_vectors(spark, 1),
            dim=2, n_subspaces=2, n_codes=8, seed_stride=1,
            query_id_col="vec_id",
        )


def test_kmeans_step_empty_corpus_empty_partial_raises(spark):
    from dask_cudf_spark.operators.similarity import kmeans_step

    out = kmeans_step(_empty_vectors(spark), dim=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "cluster", "n_points", "centroid_sum_s6",
    ]
    with pytest.raises(ValueError, match="seeds"):
        kmeans_step(
            _some_vectors(spark, 3), n_clusters=8, seed_stride=1, dim=2
        )


def test_abtest_se_guard_yields_null_not_divide_by_zero(spark):
    """The ANSI-session crash class (NULLS.md): a zero pooled standard
    error must yield NULL, not DIVIDE_BY_ZERO.  Reproduced directly on
    the query's own expression shape with zero conversions, under the
    session's default ANSI setting AND with ANSI forced on."""
    from dask_cudf_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    import os
    import tempfile

    # events slice with NO purchases -> conv = 0 on both arms -> se = 0
    # (ts column present because load_table normalizes events.ts)
    root = tempfile.mkdtemp(prefix="spark-graft-abtest-")
    ev = spark.createDataFrame(
        [(i, i % 7, "view") for i in range(100)],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))
    ev.write.parquet(os.path.join(root, "events.parquet"))
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        row = REGISTRY["q_abtest_ztest"].fn(spark, root).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert row["z_s6"] is None
    assert row["rate_diff_s6"] == 0


def test_word_ngrams_short_docs_yield_empty_not_raise(spark):
    """r13 ADVICE (medium): documents with fewer than n tokens must
    yield an explicit empty array — the unguarded sequence(1, size-n+1)
    DESCENDS to [1, 0] and slice(toks, 0, n) raises
    INVALID_PARAMETER_VALUE.START.  Same contract char_ngrams pins for
    short strings (r10)."""
    from dask_cudf_spark.functions.text import word_ngrams

    df = spark.createDataFrame(
        [("one",), ("two words",), ("a b c",), ("",), (None,)],
        "t string",
    )
    rows = {r["t"]: (r["g2"], r["g3"]) for r in df.select(
        "t",
        word_ngrams("t", 2).alias("g2"),
        word_ngrams("t", 3).alias("g3"),
    ).collect()}
    assert rows["one"] == ([], [])
    assert rows["two words"] == (["two words"], [])
    assert rows["a b c"] == (["a b", "b c"], ["a b c"])
    assert rows[""] == ([], [])
    assert rows[None] == ([], [])
