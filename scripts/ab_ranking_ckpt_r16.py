"""r16 measurement: what does pinning the ranking ops' range exchange
with localCheckpoint(eager=False) cost vs the r15 shape that relied on
exchange reuse to keep the two __pid consumers consistent?

OLD = the r15 q_qcut shape (no checkpoint on ranged; Spark's
ReusedExchange de-duplicates the two subtree evaluations when it
fires), rebuilt here inline over the same full-lineitem ntile — the
heaviest checkpointed frame among the ranking queries.  NEW = the
registry q_qcut / q_rank_global.  Same-session interleaved min-of-N
with the bench-style count-agg action.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_cudf_spark.registry import all_queries
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "4"))


def old_qcut(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    order = [
        F.asc_nulls_last("l_extendedprice"),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
        F.asc("l_partkey"),
        F.asc("l_suppkey"),
    ]
    n = 4
    ranged = li.repartitionByRange(*order).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    ranked = (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__rk",
            (F.row_number().over(w_local) + F.col("__off")).cast("long"),
        )
        .drop("__off")
    ).drop("__pid")
    total = counts.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("__N")
    )
    q = F.expr(f"__N div {n}")
    r = F.col("__N") % n
    big = r * (q + 1)
    tile = F.when(
        F.col("__rk") <= big, F.ceil(F.col("__rk") / (q + 1))
    ).otherwise(r + F.ceil((F.col("__rk") - big) / F.greatest(q, F.lit(1))))
    out = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("__q", tile.cast("int"))
        .drop("__rk", "__N")
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.col("__q").cast("long").alias("quartile"),
    )


def old_rank_global(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    value_col, prefix = "qty", "rank_"
    order = [F.asc(value_col)]
    g = (
        li.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count("*").alias("__ties"))
    )
    ranged = g.repartitionByRange(*order).withColumn(
        "__pid", F.spark_partition_id()
    )
    per = ranged.groupBy("__pid").agg(
        F.count("*").alias("__n"), F.sum("__ties").alias("__s")
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offn"),
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__offs"),
    )
    w_rn = Window.partitionBy("__pid").orderBy(*order)
    w_cum = w_rn.rowsBetween(Window.unboundedPreceding, 0)
    g2 = ranged.join(F.broadcast(offsets), "__pid").select(
        value_col,
        "__ties",
        (F.row_number().over(w_rn) + F.col("__offn"))
        .cast("long")
        .alias("__dense"),
        (F.sum("__ties").over(w_cum) + F.col("__offs"))
        .cast("long")
        .alias("__cmax"),
    )
    ranks = g2.select(
        value_col,
        (F.col("__cmax") - F.col("__ties") + 1).alias(f"{prefix}min"),
        F.col("__cmax").alias(f"{prefix}max"),
        ((2 * F.col("__cmax") - F.col("__ties") + 1) / 2.0).alias(
            f"{prefix}avg"
        ),
        F.col("__dense").alias(f"{prefix}dense"),
    )
    ranked = li.join(ranks, value_col, "left")
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        "qty",
        "rank_min",
        "rank_max",
        "rank_avg",
        "rank_dense",
    )


def main():
    spark = get_spark(
        app_name="ab_ranking_ckpt_r16",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).agg(F.count(F.lit(1)).alias("n")).collect()
        return time.perf_counter() - t0

    # sanity: identical result sets
    new_rows = sorted(tuple(r) for r in q["q_qcut"](spark, SF_DIR).collect())
    old_rows = sorted(tuple(r) for r in old_qcut(spark, SF_DIR).collect())
    assert new_rows == old_rows

    arms = [
        ("new_qcut", q["q_qcut"]),
        ("old_qcut", old_qcut),
        ("new_rank_global", q["q_rank_global"]),
        ("old_rank_global", old_rank_global),
    ]
    for _, fn in arms * 2:
        run(fn)
    res = {n: [] for n, _ in arms}
    for _ in range(RUNS):
        for n, fn in arms:
            res[n].append(run(fn))
    for n in res:
        print(
            f"{n}: min={min(res[n]):.3f}s all={['%.2f' % x for x in res[n]]}"
        )


if __name__ == "__main__":
    main()
