"""Sorts / limits / top-k (SURVEY.md §2.6).

Reference: sample->range-partition->local-sort (upstream:
dask_cudf/sorting.py sort_values / quantile_divisions).  Spark's
orderBy runs the identical algorithm (RangePartitioner reservoir
sample); orderBy().limit(n) collapses to TakeOrderedAndProject — the
same tree-reduced top-k as the reference's nlargest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_sort_global",
    family="sort",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'F'
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    """,
)
def q_sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort (reference sort_values(by=[...],
    ascending=[...])).  Fully-keyed ordering so the row sequence is
    deterministic on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_topk",
    family="sort",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nlargest(10, totalprice) (reference per-partition top-k tree
    reduction) -> TakeOrderedAndProject.  o_orderkey tie-break keeps the
    answer set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "q_head_sorted",
    family="sort",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        ORDER BY c_custkey
        LIMIT 25
    """,
)
def q_head_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """head(n) after set_index (reference head is only deterministic on a
    sorted frame; we require the order explicitly)."""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy("c_custkey").limit(25).select("c_custkey", "c_name", "c_acctbal")


@register(
    "q_group_head",
    family="sort",
    oracle="""
        SELECT user_id, event_id, ts, event_type
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) <= 3
    """,
)
def q_group_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby(k).head(n) (dask GroupBy.head; upstream:
    dask/dataframe/groupby.py) — first 3 events per user in event-time
    order.  One shuffle on the group key + in-partition sort; Spark 4
    additionally plans a PARTIAL WindowGroupLimit below the exchange,
    so each map task ships only its local top-3 per group — shuffle
    bytes are bounded by 3x|users| at 100 TB regardless of fan-in
    (asserted in tests/test_plans.py).  Ties broken by event_id so the
    pick is total-order deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "q_repartition_sorted",
    family="partitioning",
    oracle="""
        SELECT l_suppkey,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(TRUNC(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_suppkey
    """,
)
def q_repartition_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """set_index analog: repartitionByRange + sortWithinPartitions then a
    key-local aggregation (reference set_index -> divisions -> groupby on
    index).  Values are unchanged by the physical re-layout — the oracle
    checks exactly that."""
    li = load_table(spark, sf_dir, "lineitem")
    laid_out = li.repartitionByRange(8, "l_suppkey").sortWithinPartitions("l_suppkey")
    return laid_out.groupBy("l_suppkey").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"),
    )


def _z_terms(x: str, y: str, bits: int, spark: bool) -> str:
    """Bit-interleave expression: z = ...y1x1y0x0 over ``bits`` bits of
    each key — identical term order on both engines."""
    terms = []
    for i in range(bits):
        if spark:
            terms.append(
                f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i}) + "
                f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1}))"
            )
        else:
            terms.append(
                f"(((({x} >> {i}) & 1) << {2 * i}) + "
                f"((({y} >> {i}) & 1) << {2 * i + 1}))"
            )
    return " + ".join(terms)


@register(
    "q_zorder_cluster",
    family="sort",
    oracle=f"""
        WITH z AS (
            SELECT l_partkey, l_suppkey,
                   {_z_terms("l_partkey", "l_suppkey", 20, spark=False)}
                       AS zval
            FROM lineitem
        )
        SELECT zval >> 12 AS z_bucket,
               COUNT(*) AS n_rows,
               MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
               MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
        FROM z
        GROUP BY z_bucket
    """,
)
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout — the multi-dimensional data
    layout behind Delta/Iceberg OPTIMIZE ZORDER BY: interleave the bits
    of (l_partkey, l_suppkey) so sorting by the single z-value
    co-locates rows that are close in BOTH dimensions, and per-z-bucket
    min/max ranges stay tight for file skipping on either predicate.
    The query emits the per-bucket row counts and min/max envelopes —
    exactly the footer stats a scan would prune on.

    Scale: the 20-bit interleave is a pure-JVM integer expression
    (codegen'd shifts/masks, no UDF); the bucket rollup is one
    map-side-combined shuffle over ~1k groups.  In a real table layout
    the same z-value feeds repartitionByRange + sortWithinPartitions
    before the write (see sources/writers.py partition_on), giving
    multi-dim pruning without a second sort key."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        F.expr(_z_terms("l_partkey", "l_suppkey", 20, spark=True)).alias(
            "zval"
        ),
        "l_partkey",
        "l_suppkey",
    )
    return z.groupBy(
        F.shiftright(F.col("zval"), 12).alias("z_bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )
