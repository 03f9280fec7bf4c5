"""Isolate one query: N timed runs (noop sink per guide §1.4), job
labels, optional executed-plan dump.  Diagnostic only — the committed
bench numbers stay bench.py's.

Usage: python scripts/bench_one.py q_name [runs] [sf_dir]
       PROFILE_PLAN=1 dumps the AQE-final executed plan after run 1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_cudf_spark.registry import all_queries  # noqa: E402
from dask_cudf_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name=f"bench_one:{name}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        df = q(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        print(f"run {i}: {sec:.4f}s", flush=True)
        if i == 0 and os.environ.get("PROFILE_PLAN"):
            print(df._jdf.queryExecution().executedPlan().toString()[:8000])
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
