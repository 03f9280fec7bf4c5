"""Matview maintenance-cost probe (round 7; CDC leg r7b): measure an
INCREMENTAL refresh against a FULL recompute as the source table grows.

The claim under test is the whole point of sources/matview.py: refresh
cost tracks the DELTA size (one appended commit), not the table size —
so at 100x the accumulated history, the incremental refresh should be
~flat while the full recompute grows with the table.

Method: build a txlog source from sf0.1 events replicated K times
(one commit per replica, disjoint event_id ranges), then append one
fixed-size delta commit (the original events batch) and time
(a) refresh_matview (incremental path), vs
(b) a full groupBy recompute over the source snapshot committed the
same way.  min of RUNS, warmed.  Prints one JSON line.

CDC leg (r7b): on the same grown table, a fixed-size MERGE (1% of the
first replica's keys, constant as K grows) followed by a keyed
refresh must run in 'cdc' mode and stay ~flat too — the feed reads
only the merge's retired+added files, so view maintenance through
UPDATES is churn-proportional, not table-proportional.

Usage: python scripts/matview_probe.py [factors...] (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources import load_table
from dask_cudf_spark.sources.matview import refresh_matview
from dask_cudf_spark.sources.txlog import commit, merge_by_key, read_snapshot

SF = "/root/testdata/sf0.1"
BASE = "/tmp/matview_probe"
RUNS = 3
OFFSET = 10**9

AGGS = {
    "n": ("count", None),
    "total_c": ("sum", "cents"),
    "hi": ("max", "event_id"),
}


def events(spark):
    return load_table(spark, SF, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(
        app_name="matview-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = events(spark).localCheckpoint()  # fixed batch, read once
    n_batch = ev.count()
    result = {}
    for k in factors:
        root = f"{BASE}/k{k}"
        shutil.rmtree(root, ignore_errors=True)
        src, dst = f"{root}/src", f"{root}/view"
        for i in range(k):
            commit(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * OFFSET)
                ),
                src,
                "append",
            )
        refresh_matview(spark, src, dst, ["event_type"], AGGS)  # baseline view
        inc_ts, full_ts = [], []
        for r in range(RUNS + 1):  # +1 warm
            delta = ev.withColumn(
                "event_id", F.col("event_id") + F.lit((k + r) * OFFSET)
            )
            commit(delta, src, "append")
            t0 = time.perf_counter()
            out = refresh_matview(spark, src, dst, ["event_type"], AGGS)
            dt = time.perf_counter() - t0
            assert out["mode"] == "incremental", out
            if r > 0:
                inc_ts.append(dt)
            t0 = time.perf_counter()
            read_snapshot(spark, src).groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("total_c"),
                F.max("event_id").alias("hi"),
            ).collect()
            if r > 0:
                full_ts.append(time.perf_counter() - t0)
        # CDC leg: fixed-churn MERGE, keyed refresh must stay flat too
        dst2 = f"{root}/view2"
        aggs_sub = {"n": ("count", None), "total_c": ("sum", "cents")}
        refresh_matview(
            spark, src, dst2, ["event_type"], aggs_sub, key="event_id"
        )
        churn = ev.filter(F.col("event_id") % 100 == 0).localCheckpoint()
        n_churn = churn.count()
        cdc_ts = []
        for r in range(RUNS + 1):  # +1 warm
            merge_by_key(
                churn.withColumn("cents", F.col("cents") + F.lit(r + 1)),
                src,
                "event_id",
            )
            t0 = time.perf_counter()
            out = refresh_matview(
                spark, src, dst2, ["event_type"], aggs_sub, key="event_id"
            )
            dt = time.perf_counter() - t0
            assert out["mode"] == "cdc", out
            if r > 0:
                cdc_ts.append(dt)
        result[f"x{k}"] = {
            "src_rows": n_batch * (k + RUNS + 1),
            "incremental_s": round(min(inc_ts), 3),
            "full_recompute_s": round(min(full_ts), 3),
            "cdc_churn_rows": n_churn,
            "cdc_refresh_s": round(min(cdc_ts), 3),
        }
        print(f"  x{k}: {result[f'x{k}']}", file=sys.stderr)
    print(json.dumps({"runs": RUNS, "delta_rows": n_batch, "by_history": result}))


if __name__ == "__main__":
    main()
