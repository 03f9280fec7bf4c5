"""Similarity-search queries over `embeddings` (SURVEY.md §2.12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# DuckDB-side dot product: index lambda over 64 dims, double precision.
_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_NORM_A = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
)
_NORM_B = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))"
)


@register(
    "q_cosine_sim",
    family="similarity",
    oracle=f"""
        SELECT query_id, neighbor_id, cosine, rank
        FROM (
            SELECT
                a.vec_id AS query_id,
                b.vec_id AS neighbor_id,
                ROUND({_DOT} / ({_NORM_A} * {_NORM_B}), 6) AS cosine,
                ROW_NUMBER() OVER (
                    PARTITION BY a.vec_id
                    ORDER BY ROUND({_DOT} / ({_NORM_A} * {_NORM_B}), 6) DESC,
                             b.vec_id
                ) AS rank
            FROM embeddings a
            JOIN embeddings b ON b.vec_id <> a.vec_id
            WHERE a.vec_id < 10
        ) WHERE rank <= 5
    """,
)
def q_cosine_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 cosine neighbors for 10 query vectors
    (operators/similarity.cosine_topk): broadcast queries, single corpus
    scan, per-query top-k window.  zip_with/aggregate dot product is
    pure JVM SQL — no Python in the loop."""
    from ..operators.similarity import cosine_topk

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(em, queries, k=5, query_id_col="query_id")


@register(
    "q_centroids",
    family="similarity",
    oracle="""
        SELECT
            label,
            u.pos AS dim,
            ROUND(AVG(CAST(u.v AS DOUBLE)), 6) AS centroid_v,
            COUNT(*) AS n_vecs
        FROM (
            SELECT label,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> struct_pack(pos := i - 1, v := embedding[i]))) AS u
            FROM embeddings
        )
        GROUP BY label, u.pos
    """,
)
def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in exploded (label, dim) layout
    (operators/similarity.centroids) — groupBy(label, dim), never a
    per-label vector collect; scales to any embedding count."""
    from ..operators.similarity import centroids

    em = load_table(spark, sf_dir, "embeddings")
    out = centroids(em, "label", "embedding", round_dp=6)
    return out.select(
        F.col("label").cast("int").alias("label"),
        F.col("dim").cast("long").alias("dim"),
        "centroid_v",
        "n_vecs",
    )


@register(
    "q_ann_lsh",
    family="similarity",
    oracle=None,  # LSH bucketing is engine-specific -> rows-only; recall tested
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH
    (operators/similarity.lsh_bucket_topk) — the 100TB path: candidates
    only within matching signature buckets, exact re-rank inside."""
    from ..operators.similarity import lsh_bucket_topk

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bucket_topk(em, queries, dim=64, k=5, n_planes=6, seed=42)


@register(
    "q_vector_norms",
    family="similarity",
    oracle="""
        SELECT
            vec_id,
            ROUND(sqrt(list_sum(list_transform(range(1, 65),
                i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS l2_norm,
            ROUND(list_sum(list_transform(range(1, 65),
                i -> CAST(embedding[i] AS DOUBLE))), 6) AS v_sum
        FROM embeddings
        WHERE vec_id < 200
    """,
)
def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm + component sum per vector (reference Series.list
    reductions) — left-fold aggregate, rounded 6dp (float32 -> double)."""
    from ..operators.similarity import l2_norm

    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    e = F.col("embedding")
    return em.select(
        "vec_id",
        F.round(l2_norm(e), 6).alias("l2_norm"),
        F.round(
            F.aggregate(
                F.transform(e, lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("v_sum"),
    )
