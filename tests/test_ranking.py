"""Distributed exact global ranking (operators/ranking.py, round 7):
bit-equality against the single-partition window ground truth, NTILE
edge cases, and the plan contract (no full-data Exchange
SinglePartition)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_cudf_spark.operators.ranking import (
    global_cumsum,
    global_ntile,
    global_row_number,
)


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@pytest.fixture()
def frame(spark):
    # adversarial: heavy ties in v (1000 distinct over 10007 rows), so
    # correctness leans on the tiebreaker key and on range-partition
    # boundaries landing mid-tie-group
    return spark.range(0, 10007).select(
        (F.hash("id") % 1000).alias("v"), F.col("id").alias("k")
    )


def test_global_row_number_matches_window(spark, frame):
    order = [F.asc("v"), F.asc("k")]
    got = global_row_number(frame, order, out="rank")
    exp = frame.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert _same(got, exp)


def test_global_row_number_desc_order(spark, frame):
    order = [F.desc("v"), F.asc("k")]
    got = global_row_number(frame, order, out="rank")
    exp = frame.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert _same(got, exp)


@pytest.mark.parametrize("n", [2, 5, 7, 13])
def test_global_ntile_matches_window(spark, frame, n):
    order = [F.asc("v"), F.asc("k")]
    got = global_ntile(frame, n, order, out="t")
    exp = frame.withColumn("t", F.ntile(n).over(Window.orderBy(*order)))
    assert _same(got, exp)


def test_global_ntile_fewer_rows_than_tiles(spark):
    tiny = spark.range(0, 3).select(
        F.col("id").alias("v"), F.col("id").alias("k")
    )
    got = global_ntile(tiny, 5, [F.asc("v"), F.asc("k")], out="t")
    exp = tiny.withColumn(
        "t", F.ntile(5).over(Window.orderBy(F.asc("v"), F.asc("k")))
    )
    assert _same(got, exp)


def test_plan_has_no_full_data_single_partition(spark, frame):
    """The contract that makes the operator worth having: the ranked
    DATA never funnels through one partition.  The only allowed
    SinglePartition exchange is the bounded per-partition-counts
    prefix sum (<= spark.sql.shuffle.partitions rows), which feeds the
    BROADCAST side of the offsets join — so the plan's window over the
    data must be keyed (partitioned) and the single-partition subtree
    must end in a broadcast exchange."""
    got = global_row_number(frame, [F.asc("v"), F.asc("k")], out="rank")
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    # AQE's toString echoes the pre-adaptive plan after the final one;
    # assert on the FINAL section only
    plan = plan.split("== Initial Plan ==")[0]
    # exactly one SinglePartition exchange: the counts prefix-sum
    assert plan.count("SinglePartition") == 1
    # the data-bearing window is partition-keyed (has a partitionBy)
    assert "windowspecdefinition(__pid" in plan
    # the ranked data reaches the window via a pid-hash exchange, never
    # via the SinglePartition one
    assert "hashpartitioning(__pid" in plan
    # r16: the range exchange moved INSIDE the pinned localCheckpoint
    # (one evaluation for both __pid consumers — the r15 ADVICE
    # sampled-bounds consistency fix), so the downstream executed plan
    # reads the ranged frame as an ExistingRDD scan instead of showing
    # rangepartitioning inline.  The range exchange itself is exercised
    # (and its ordering verified) by the behavioral tests above; here
    # assert the pinned-scan shape so a silent un-pinning (back to two
    # independent evaluations) fails loudly.
    assert "Scan ExistingRDD" in plan


def test_global_cumsum_matches_window(spark, frame):
    got = global_cumsum(
        frame.withColumn("w", (F.col("v") % 7) + 1),
        [F.asc("v"), F.asc("k")],
        "w",
        out="cs",
    )
    exp = frame.withColumn("w", (F.col("v") % 7) + 1).withColumn(
        "cs",
        F.sum("w")
        .over(
            Window.orderBy(F.asc("v"), F.asc("k")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    assert _same(got, exp)


def test_global_rank_methods_match_window(spark):
    from dask_cudf_spark.operators.ranking import global_rank_methods

    df = spark.range(0, 5000).select(
        (F.hash("id") % 40).alias("v"), F.col("id").alias("k")
    )
    got = global_rank_methods(df, "v")
    w = Window.orderBy("v")
    t = Window.partitionBy("v")
    ties = F.count("*").over(t)
    rmin = F.rank().over(w)
    exp = df.select(
        "v",
        "k",
        rmin.cast("long").alias("rank_min"),
        (rmin + ties - 1).cast("long").alias("rank_max"),
        (rmin + (ties - 1) / 2.0).alias("rank_avg"),
        F.dense_rank().over(w).cast("long").alias("rank_dense"),
    )
    assert _same(got.select(*exp.columns), exp)


def test_frame_rank_pandas_parity(spark):
    """Frame.rank matches pandas Series.rank for every method, both
    directions, and pct (incl. the dense-pct distinct-count rule)."""
    import pandas as pd

    from dask_cudf_spark.frame import Frame

    pdf = pd.DataFrame(
        {"v": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], "k": range(11)}
    )
    fr = Frame(spark.createDataFrame(pdf))
    for method in ("average", "min", "max", "dense"):
        for asc in (True, False):
            for pct in (False, True):
                got = (
                    fr.rank("v", method=method, ascending=asc, pct=pct)
                    .compute()
                    .sort_values("k")["v_rank"]
                    .astype(float)
                    .to_numpy()
                )
                exp = (
                    pdf["v"]
                    .rank(method=method, ascending=asc, pct=pct)
                    .astype(float)
                    .to_numpy()
                )
                assert (got == exp).all(), (method, asc, pct, got, exp)


def test_frame_rank_first_with_tiebreak(spark):
    """method='first' matches pandas when the tiebreak column IS the
    physical row order pandas uses; without a tiebreak it refuses (a
    distributed frame has no row order to break ties by)."""
    import pandas as pd
    import pytest as _pytest

    from dask_cudf_spark.frame import Frame

    pdf = pd.DataFrame(
        {"v": [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5], "k": range(11)}
    )
    fr = Frame(spark.createDataFrame(pdf))
    for asc in (True, False):
        got = (
            fr.rank("v", method="first", ascending=asc, tiebreak="k")
            .compute()
            .sort_values("k")["v_rank"]
            .astype(float)
            .to_numpy()
        )
        exp = (
            pdf["v"].rank(method="first", ascending=asc).astype(float).to_numpy()
        )
        assert (got == exp).all(), (asc, got, exp)
    with _pytest.raises(ValueError, match="tiebreak"):
        fr.rank("v", method="first")


def test_frame_rank_rejects_unknown_method(spark):
    import pytest as _pytest

    from dask_cudf_spark.frame import Frame

    fr = Frame(spark.range(3).select(F.col("id").alias("v")))
    with _pytest.raises(ValueError, match="method"):
        fr.rank("v", method="percentile")
