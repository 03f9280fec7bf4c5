"""Set operations (SURVEY.md §2.7): concat/union, intersect, except."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_union_all",
    family="setops",
    oracle="""
        SELECT o_orderkey AS okey, 'urgent' AS src, o_totalprice AS price
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey AS okey, 'big' AS src, o_totalprice AS price
        FROM orders WHERE o_totalprice > 200000.0
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat(axis=0) (reference dask concat / cudf concat_dispatch) —
    unionByName so column alignment is by name like pandas concat."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("okey"),
        F.lit("urgent").alias("src"),
        F.col("o_totalprice").alias("price"),
    )
    big = o.filter(F.col("o_totalprice") > 200000.0).select(
        F.col("o_orderkey").alias("okey"),
        F.lit("big").alias("src"),
        F.col("o_totalprice").alias("price"),
    )
    return urgent.unionByName(big)


@register(
    "q_union_missing_cols",
    family="setops",
    oracle="""
        SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT s_suppkey AS key, s_name AS name, NULL AS acctbal
        FROM supplier
    """,
)
def q_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat with non-aligned columns: missing columns null-filled
    (reference concat aligns schemas) — allowMissingColumns=True."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name")
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "q_intersect",
    family="setops",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect (reference idiom: inner merge on all cols + distinct) —
    built-in INTERSECT, strictly better."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "q_except",
    family="setops",
    oracle="""
        SELECT n_nationkey AS nationkey FROM nation
        EXCEPT
        SELECT c_nationkey AS nationkey FROM customer
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """except/difference (reference idiom: left anti on all cols)."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return n.subtract(c)
