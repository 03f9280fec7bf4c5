"""Streaming serving (Kappa architecture) on the engine's public API.

The third leg of the examples trio (batch curation, retrieval, and —
here — streaming): a micro-batch event stream lands in an ACID txlog
table exactly-once, and a grouped-aggregate MATERIALIZED VIEW refreshes
incrementally per micro-batch, so readers always see a consistent
snapshot at most one batch behind the stream.

What it demonstrates:
- `streaming.jobs.events_stream` — the source-agnostic micro-batch
  stream (file-source stand-in here; `source='kafka'` is the
  production path with identical downstream code).
- `streaming.jobs.stream_matview` — composed exactly-once: a replayed
  batch no-ops at the commit (batch_id idempotence), which holds
  src_version, which no-ops the refresh.  The view can never
  double-count.
- `sources.txlog` time travel over the VIEW's own history: every
  refresh is itself a committed version.

Scale shape: each refresh reads ONE micro-batch commit plus the
|groups|-row view — never the accumulated history (BASELINE.md: flat
refresh cost across 40x history growth).

Run:  python examples/streaming_serving.py [SF_DIR] [WORK_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def run_serving(spark, sf_dir: str, work_dir: str) -> dict:
    from dask_cudf_spark.sources.matview import read_matview
    from dask_cudf_spark.sources.txlog import table_history
    from dask_cudf_spark.streaming.jobs import events_stream, stream_matview

    src = f"{work_dir}/events_table"
    view = f"{work_dir}/revenue_by_type"

    # revenue-per-event-type serving view, money in integer cents
    # (the determinism discipline: sums of ints commute exactly)
    stream = events_stream(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    q = stream_matview(
        stream,
        src,
        view,
        f"{work_dir}/ckpt",
        ["event_type"],
        {"n_events": ("count", None), "revenue_cents": ("sum", "cents")},
    )
    q.awaitTermination(180)

    served = read_matview(spark, view).orderBy("event_type")
    rows = served.collect()

    # the view's own commit log: one version per refresh — time travel
    # and DESCRIBE HISTORY work on the VIEW like any txlog table
    history = table_history(spark, view)

    # exactly-once, demonstrated: batch totals equal a cold batch
    # aggregation over the landed source table
    batch_truth = {
        r["event_type"]: (r["n"], r["cents"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    converged = all(
        batch_truth[r["event_type"]] == (r["n_events"], r["revenue_cents"])
        for r in rows
    )
    return {
        "event_types_served": len(rows),
        "view_refresh_commits": len(history),
        "converged_to_batch_truth": converged,
        "revenue_cents_total": int(sum(r["revenue_cents"] for r in rows)),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="serving-")
    )
    from dask_cudf_spark.session import get_spark

    spark = get_spark(app_name="streaming-serving-example")
    print(json.dumps(run_serving(spark, sf_dir, work)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
