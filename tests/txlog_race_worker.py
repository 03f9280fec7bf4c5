"""Subprocess worker for the two-process txlog commit race test.

Each worker runs in its OWN JVM (a genuinely separate writer, unlike
the in-session race tests), commits N single-row appends tagged with
its writer id, and prints the version numbers it won.  The
create-exclusive version-file primitive must serialize the two
writers: every version unique across processes, no commit lost.

    python tests/txlog_race_worker.py <table_path> <writer_id> <n_commits>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    path, writer_id, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from pyspark.sql import functions as F

    from dask_cudf_spark.session import get_spark
    from dask_cudf_spark.sources import txlog
    from dask_cudf_spark.sources.txlog import commit

    # checkpoint-boundary race cell (r14): a tiny interval makes BOTH
    # racing writers cross checkpoint boundaries mid-race
    iv = os.environ.get("TXLOG_CHECKPOINT_INTERVAL")
    if iv:
        txlog.CHECKPOINT_INTERVAL = int(iv)

    # small local session: the point is process isolation, not scale
    spark = get_spark(
        app_name=f"txlog-race-{writer_id}",
        master="local[2]",
        shuffle_partitions=2,
    )
    versions = []
    for i in range(n):
        df = spark.range(1).select(
            F.lit(writer_id).alias("writer"), F.lit(i).alias("seq")
        )
        versions.append(commit(df, path, op="append", max_retries=20))
    print(json.dumps({"writer": writer_id, "versions": versions}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
