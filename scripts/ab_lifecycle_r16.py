"""Same-session interleaved A/B for the r16 lifecycle-overlap change
(guide §2.6): OLD = strictly sequential commit/refresh/merge (inline
writes, the r15 shape), NEW = the registry queries with staged writes
overlapped from a driver thread.  Old variants are reconstructed here
from the same primitives (merge_by_key/commit without staged_dir run
the identical inline-write code path), so both run in ONE session and
host-noise bursts hit both arms.  min-of-N per arm."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from dask_cudf_spark.registry import all_queries
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.matview import read_matview, refresh_matview
from dask_cudf_spark.sources.tables import load_table
from dask_cudf_spark.sources.txlog import change_feed, commit, merge_by_key

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "4"))


def old_matview_incremental(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="ab-old-matview-")
    src, dst = f"{root}/src", f"{root}/view"
    aggs = {
        "n": ("count", None),
        "total_c": ("sum", "cents"),
        "first_id": ("min", "event_id"),
        "last_id": ("max", "event_id"),
    }
    lo = F.col("event_id") % 3
    modes = []
    for part in range(3):
        commit(ev.filter(lo == part), src, "append")
        modes.append(refresh_matview(spark, src, dst, ["event_type"], aggs))
    assert [m["mode"] for m in modes] == ["full", "incremental", "incremental"]
    return read_matview(spark, dst).select(
        "event_type", "n", "total_c", "first_id", "last_id"
    )


def old_txlog_change_feed(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderstatus",
    )
    root = tempfile.mkdtemp(prefix="ab-old-cdc-")
    path = f"{root}/t"
    commit(od.filter(F.col("o_orderkey") % 5 != 4), path, "append")
    updates = od.filter(
        (F.col("o_orderkey") % 5 == 4) | (F.col("o_orderkey") % 7 == 0)
    ).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(1000)).otherwise(F.lit(0)),
    )
    v1 = merge_by_key(updates, path, "o_orderkey")
    return change_feed(spark, path, "o_orderkey", from_version=0, to_version=v1)


def old_matview_cdc(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderstatus",
    )
    root = tempfile.mkdtemp(prefix="ab-old-mvcdc-")
    src, dst = f"{root}/src", f"{root}/view"
    aggs = {"n": ("count", None), "total_c": ("sum", "cents")}
    commit(od.filter(F.col("o_orderkey") % 5 != 4), src, "append")
    m0 = refresh_matview(
        spark, src, dst, ["o_orderstatus"], aggs, key="o_orderkey"
    )
    updates = od.filter(
        (F.col("o_orderkey") % 5 == 4) | (F.col("o_orderkey") % 7 == 0)
    ).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(1000)).otherwise(F.lit(0)),
    )
    merge_by_key(updates, src, "o_orderkey")
    m1 = refresh_matview(
        spark, src, dst, ["o_orderstatus"], aggs, key="o_orderkey"
    )
    assert [m0["mode"], m1["mode"]] == ["full", "cdc"]
    return read_matview(spark, dst).select("o_orderstatus", "n", "total_c")


def main():
    spark = get_spark(
        app_name="ab_lifecycle_r16",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    pairs = [
        ("q_matview_incremental", old_matview_incremental),
        ("q_txlog_change_feed", old_txlog_change_feed),
        ("q_matview_cdc", old_matview_cdc),
    ]

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).agg(F.count(F.lit(1)).alias("n")).collect()
        return time.perf_counter() - t0

    # warmup both arms once
    for name, old in pairs:
        run(q[name])
        run(old)
    res = {name: {"old": [], "new": []} for name, _ in pairs}
    for _ in range(RUNS):
        for name, old in pairs:
            res[name]["old"].append(run(old))
            res[name]["new"].append(run(q[name]))
    for name in res:
        o = min(res[name]["old"])
        n = min(res[name]["new"])
        print(
            f"{name}: old_min={o:.3f}s new_min={n:.3f}s "
            f"speedup={o / n:.2f}x  old={['%.2f' % x for x in res[name]['old']]} "
            f"new={['%.2f' % x for x in res[name]['new']]}"
        )


if __name__ == "__main__":
    main()
