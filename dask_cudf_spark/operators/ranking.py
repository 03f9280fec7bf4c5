"""Distributed exact global ranking (round 7).

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
``Exchange SinglePartition`` + ``WindowExec`` — every row funnels
through ONE task, the canonical 100-TB non-starter (WindowExec itself
warns).  Most of this repo's global windows rank provably bounded
tables (top-k results, day/bucket rollups, distinct codes) where the
single partition is a few hundred rows; but ranks over USER- or
ROW-scaled tables (RFM quintiles, qcut, corpus-wide scores) need the
classic two-phase distributed ranking instead:

1. ``repartitionByRange`` on the total-order keys — the same
   distributed sort a global ``ORDER BY`` uses (range exchange, fully
   parallel).
2. Per-partition row counts -> exclusive prefix sums.  The counts
   table has at most ``spark.sql.shuffle.partitions`` rows (cluster
   width, NOT data size), so its own cumulative window is bounded by
   construction.
3. Partition-local ``row_number`` (window keyed on the materialized
   ``spark_partition_id``) + the broadcast prefix offset = the exact
   global rank.

Two full-data exchanges total (range + hash-on-pid) versus the
single-partition funnel; everything stays JVM-side and whole-stage
codegen'd — no Python boundary.  Determinism: callers must pass a
TOTAL order (include tiebreaker keys), the same contract the
single-partition form already required for reproducible output.

Upstream parity: cudf ranks within one GPU's memory
(cudf::sorted_order); dask-cudf's distributed sort + cumulative-count
recombination is exactly the shape implemented here, re-expressed as
Catalyst-visible DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_row_number",
    "global_ntile",
    "global_cumsum",
    "global_rank_methods",
]


def _ranged_parts(
    df: DataFrame, order_cols: list[Column]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(ranged, counts, offsets): the range-exchanged frame with its
    materialized partition id, the per-partition row counts (<=
    shuffle.partitions rows), and their exclusive prefix sums."""
    # localCheckpoint PINS one evaluation of the range exchange (r16,
    # r15 ADVICE): `ranged` feeds two independent subtrees (the counts/
    # offsets rollup and the final join), and RangePartitioner bounds
    # are SAMPLED — if exchange reuse does not fire, the two
    # evaluations can draw different range splits and mismatch __pid
    # between offsets and rows, silently corrupting every downstream
    # rank.  eager=False (the r15 pattern): no extra job, materialized
    # by the query's own first action, and NOT CacheManager-registered
    # so bench samples cannot reuse it across runs.
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__n"))
    # exclusive prefix sum over <= shuffle.partitions rows: the one
    # remaining global window, bounded by CLUSTER WIDTH not data size
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    return ranged, counts, offsets


def _ranked_with_offsets(
    df: DataFrame, order_cols: list[Column]
) -> tuple[DataFrame, list[Column]]:
    ranged, _counts, offsets = _ranged_parts(df, order_cols)
    return ranged.join(F.broadcast(offsets), "__pid"), order_cols


def global_row_number(
    df: DataFrame, order_cols: list[Column], out: str = "rank"
) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY order_cols)`` as a fully
    distributed plan (no Exchange SinglePartition).  ``order_cols``
    must be a total order for deterministic output."""
    joined, order_cols = _ranked_with_offsets(df, order_cols)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        joined.withColumn(
            out,
            (F.row_number().over(w_local) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )


def global_ntile(
    df: DataFrame, n: int, order_cols: list[Column], out: str = "tile"
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` distributed the
    same way.  Implements the SQL-standard tile rule from the global
    rank and total count N: with q = N div n, r = N mod n, the first
    r tiles hold q+1 rows and the rest hold q — bit-identical to
    Spark's and DuckDB's NTILE, verified by the oracle hash gate."""
    ranged, counts, offsets = _ranged_parts(df, order_cols)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__rk",
            (F.row_number().over(w_local) + F.col("__off")).cast("long"),
        )
        .drop("__off")
    ).drop("__pid")
    # N from the bounded per-partition counts table (r15, guide §1.2):
    # the old ranked.groupBy().count() re-ran the whole range exchange
    # + offsets join a second time just to count rows.  coalesce to 0
    # on EMPTY input (sum over zero rows is NULL where count(*) was 0)
    # so the tile arithmetic never computes over NULL — harmless today
    # (ranked is also empty) but a latent ANSI hazard (r15 ADVICE).
    total = counts.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("__N")
    )
    q = F.expr(f"__N div {n}")  # base tile size
    r = F.col("__N") % n  # this many leading tiles hold q+1 rows
    big = r * (q + 1)  # rows covered by the larger tiles
    tile = F.when(
        F.col("__rk") <= big,
        F.ceil(F.col("__rk") / (q + 1)),
    ).otherwise(r + F.ceil((F.col("__rk") - big) / F.greatest(q, F.lit(1))))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out, tile.cast("int"))
        .drop("__rk", "__N")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    sum_col: str,
    out: str = "cumsum",
) -> DataFrame:
    """Exact global running sum of ``sum_col`` in ``order_cols`` order,
    distributed the same two-phase way: per-partition sums -> bounded
    prefix offsets -> partition-local cumulative window + offset."""
    # pinned evaluation — same __pid-consistency hazard as
    # _ranged_parts (two consumers of one sampled range exchange)
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    psums = ranged.groupBy("__pid").agg(F.sum(sum_col).alias("__s"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = psums.select(
        "__pid",
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out,
            (F.sum(sum_col).over(w_local) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )


def global_rank_methods(
    df: DataFrame,
    value_col: str,
    ascending: bool = True,
    prefix: str = "rank_",
) -> DataFrame:
    """Tie-aware GLOBAL ranks — cudf ``DataFrame.rank``'s four methods
    (upstream: cpp/src/sorts/rank.cu RANK_METHOD) with no partition
    key, fully distributed.  Ranks only the DISTINCT values (with tie
    counts), derives every method from the running tie count, and
    equi-joins the per-value ranks back onto the rows:

      dense = global row number of the distinct value
      max   = inclusive running sum of tie counts
      min   = max - ties + 1
      avg   = (min + max) / 2  (exact: .5 fractions are representable)

    NULL values follow the pandas/cudf ``rank`` convention: the row is
    KEPT with null ranks and does not consume a rank position (ranks
    are computed over non-null values only).  Before round 9 the final
    equi-join silently DROPPED null-valued rows — the null-injection
    replay caught it.

    Adds ``<prefix>min/max/avg/dense`` columns.  Ties make min/max/avg
    diverge, which is the whole point of the method family; the
    distinct table is what shuffles (bounded by value cardinality —
    which for continuous columns approaches data size, so the dense
    row-number and the tie-count running sum are FUSED into a single
    ranged pass: one range exchange, one pid exchange, both prefix
    offsets from the same bounded per-partition rollup); the full
    data moves only through the final equi-join."""
    order = [F.asc(value_col) if ascending else F.desc(value_col)]
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count("*").alias("__ties"))
    )
    # pinned evaluation — same __pid-consistency hazard as
    # _ranged_parts (two consumers of one sampled range exchange)
    ranged = (
        g.repartitionByRange(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    per = ranged.groupBy("__pid").agg(
        F.count("*").alias("__n"), F.sum("__ties").alias("__s")
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
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
        (
            (2 * F.col("__cmax") - F.col("__ties") + 1) / 2.0
        ).alias(f"{prefix}avg"),
        F.col("__dense").alias(f"{prefix}dense"),
    )
    # LEFT join keeps null-valued rows (their rank columns stay null);
    # non-null keys always hit exactly one ranks row
    return df.join(ranks, value_col, "left")
