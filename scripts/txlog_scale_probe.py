"""Commit-log scale probe (r14 directive 5): how do txlog snapshot /
change-feed / history reads degrade as the commit count grows?

`txlog._read_log` re-reads the whole JSON commit log per snapshot;
O(commits) was fine at the ~5-commit tables every test builds, but a
long-lived streaming sink appends thousands of commits.  This probe
builds an N-commit table with tiny appends and measures, at
exponentially spaced checkpoints, the latency of:

  - read_snapshot().count()   (log replay + live-dir scan)
  - table_history()           (log replay only)
  - change_feed(v-5, v)       (two replays + dir diff)
  - one more commit()         (writer-side log read)

Usage:  python scripts/txlog_scale_probe.py [n_commits] [table_dir]

OPTIMIZE_EVERY=<k> (r15 directive 4) exercises the auto-compaction
policy knob end-to-end: every commit passes
``auto_optimize_every=k`` so the winning writer compacts the live set
whenever the live-dir count reaches k — the probe then shows whether
snapshot/change-feed go flat once the N single-row-dir parquet scan
(the r14 probe's one remaining O(N) term) is compacted away.

Prints one JSON line per checkpoint and a summary row for BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dask_cudf_spark.session import get_spark  # noqa: E402
from dask_cudf_spark.sources import txlog  # noqa: E402

import os

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
OPTIMIZE_EVERY = int(os.environ.get("OPTIMIZE_EVERY", "0"))
root = sys.argv[2] if len(sys.argv) > 2 else None
cleanup = root is None
if root is None:
    root = tempfile.mkdtemp(prefix="spark-graft-txlog-scale-")
table = f"{root}/t"

spark = get_spark(app_name="txlog-scale-probe")
spark.sparkContext.setLogLevel("ERROR")

CHECKPOINTS = sorted(
    {c for c in (10, 30, 100, 300, 600, 1000, N) if c <= N}
)

results = []
t_commit_bucket = []
t0_total = time.time()
for i in range(1, N + 1):
    # unique id per append: change_feed's key contract needs one live
    # row per key
    one_row = spark.createDataFrame([(i, "payload")], "id long, v string")
    t0 = time.time()
    txlog.commit(one_row, table, auto_optimize_every=OPTIMIZE_EVERY or None)
    t_commit_bucket.append(time.time() - t0)
    if i in CHECKPOINTS:
        t = time.time()
        n = txlog.read_snapshot(spark, table).count()
        t_snap = time.time() - t
        t = time.time()
        h = txlog.table_history(spark, table)
        t_hist = time.time() - t
        t = time.time()
        cf = txlog.change_feed(
            spark, table, "id", max(0, i - 6), i - 1
        ).count()
        t_cf = time.time() - t
        live = len(
            txlog._live_dirs(txlog._read_log(spark, table), None)
        )
        row = {
            "commits": i,
            "rows": n,
            "live_dirs": live,
            "snapshot_s": round(t_snap, 3),
            "history_s": round(t_hist, 3),
            "change_feed_s": round(t_cf, 3),
            "commit_mean_s": round(
                sum(t_commit_bucket) / len(t_commit_bucket), 3
            ),
            "cf_rows": cf,
        }
        t_commit_bucket = []
        results.append(row)
        print(json.dumps(row), flush=True)
        assert n == i, f"snapshot rows {n} != commits {i}"
        if OPTIMIZE_EVERY:
            # compactions add their own overwrite commits to history,
            # and the live set must stay capped near the threshold
            assert len(h) >= i, f"history {len(h)} < commits {i}"
            assert live <= OPTIMIZE_EVERY, (live, OPTIMIZE_EVERY)
        else:
            assert len(h) == i, f"history {len(h)} != commits {i}"

print(
    json.dumps(
        {
            "metric": "txlog_scale",
            "optimize_every": OPTIMIZE_EVERY,
            "n_commits": N,
            "total_s": round(time.time() - t0_total, 1),
            "curve": results,
        }
    )
)
if cleanup:
    shutil.rmtree(root, ignore_errors=True)
