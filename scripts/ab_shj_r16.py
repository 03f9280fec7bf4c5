"""r16 experiment (r15 VERDICT item 4): change_feed's full-outer join
SMJ vs shuffled-hash at REAL shuffle volumes.  sf0.1's ~120k-row sides
measured ~2% (noise) in r15; here the table is orders replicated
REP times (default 10 — sf1-equivalent ~15M rows) through the actual
txlog commit+merge lifecycle, then the feed's full-outer join runs
interleaved with and without the SHUFFLE_HASH hint in ONE session,
min-of-N per arm.

Usage: python scripts/ab_shj_r16.py [REP]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table
from dask_cudf_spark.sources.txlog import change_feed, commit, merge_by_key

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 10
RUNS = int(os.environ.get("AB_RUNS", "3"))


def main():
    spark = get_spark(
        app_name="ab_shj_r16",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    od0 = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderstatus",
    )
    n0 = od0.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = spark.range(REP).select(F.col("id").alias("__r"))
    od = od0.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("__r") * F.lit(n0)).alias("o_orderkey"),
        "o_custkey",
        "cents",
        "o_orderstatus",
    )
    root = tempfile.mkdtemp(prefix="ab-shj-")
    path = f"{root}/t"
    print(f"building {REP}x table at {path} ...", flush=True)
    t0 = time.perf_counter()
    commit(od.filter(F.col("o_orderkey") % 5 != 4), path, "append")
    updates = od.filter(
        (F.col("o_orderkey") % 5 == 4) | (F.col("o_orderkey") % 7 == 0)
    ).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(1000)).otherwise(F.lit(0)),
    )
    v1 = merge_by_key(updates, path, "o_orderkey")
    print(f"built in {time.perf_counter() - t0:.1f}s; rows={od.count()}")

    def run(shj: bool):
        t0 = time.perf_counter()
        feed = change_feed(
            spark, path, "o_orderkey", from_version=0, to_version=v1
        )
        df = feed
        if shj:
            # adoption would put the hint inside change_feed; here the
            # session conf flips the planner's preference instead, which
            # reaches the same ShuffledHashJoin operator
            pass
        df.agg(F.count(F.lit(1)).alias("n")).collect()
        return time.perf_counter() - t0

    def run_conf(prefer_shj: bool):
        spark.conf.set(
            "spark.sql.join.preferSortMergeJoin",
            "false" if prefer_shj else "true",
        )
        # SHJ needs a size condition unless hinted; set the AQE local
        # map threshold high so the rewrite actually fires
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "512m" if prefer_shj else "0",
        )
        try:
            return run(False)
        finally:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
            spark.conf.set(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
            )

    # warmups
    run_conf(False)
    run_conf(True)
    smj, shj = [], []
    for _ in range(RUNS):
        smj.append(run_conf(False))
        shj.append(run_conf(True))
    print(
        f"change_feed@{REP}x: smj_min={min(smj):.3f}s shj_min={min(shj):.3f}s "
        f"speedup={min(smj) / min(shj):.2f}x "
        f"smj={['%.2f' % x for x in smj]} shj={['%.2f' % x for x in shj]}"
    )


if __name__ == "__main__":
    main()
