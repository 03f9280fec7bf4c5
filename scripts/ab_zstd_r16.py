"""r16 experiment (r15 VERDICT item 8): spark.io.compression.codec
lz4 (default) vs zstd at REAL shuffle volumes.  Static conf, so it
cannot be flipped inside one session: this script runs ONE session with
the codec given on argv and times the 40x change_feed workload (the
same 6M-row lifecycle ab_shj_r16 uses — the biggest shuffle payload in
the repo's bench orbit) min-of-N.  The caller alternates codecs across
invocations (lz4 zstd lz4 zstd ...) so host-noise bursts spread over
both arms; compare the per-codec MIN across all invocations.

Usage: python scripts/ab_zstd_r16.py <lz4|zstd> [REP]
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
CODEC = sys.argv[1]
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 40
RUNS = int(os.environ.get("AB_RUNS", "4"))


def main():
    spark = get_spark(
        app_name=f"ab_zstd_{CODEC}",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.io.compression.codec": CODEC,
        },
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
    root = tempfile.mkdtemp(prefix=f"ab-zstd-{CODEC}-")
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

    def run():
        t0 = time.perf_counter()
        change_feed(
            spark, path, "o_orderkey", from_version=0, to_version=v1
        ).agg(F.count(F.lit(1)).alias("n")).collect()
        return time.perf_counter() - t0

    run()  # warmup
    xs = [run() for _ in range(RUNS)]
    print(
        f"codec={CODEC} rep={REP}: min={min(xs):.3f}s "
        f"all={['%.2f' % x for x in xs]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
