"""Long-run differential plan fuzzer (see tests/fuzz_gen.py).

    python scripts/fuzz_differential.py [N_SEEDS] [SF_DIR] [START_SEED]
    HOSTILE=nocodegen python scripts/fuzz_differential.py ...
    GRAMMAR=asof python scripts/fuzz_differential.py ...

Every seed derives one random relational plan executed both as a
PySpark DataFrame composition and as DuckDB SQL over the same parquet;
results are compared with the driver's order-insensitive exact-value
rule.  Exit 0 = every seed matched.  Prints a one-line JSON summary
(seeds, matches, empty-result plans, wall seconds) for the log.

HOSTILE composes the same modes as scripts/driver_replay.py onto the
fuzz sweep (tz | noaqe | noarrow | oddparts | nocodegen), giving a
fuzz-grammar x hostile-config matrix.

GRAMMAR=asof (r10) fuzzes the ENGINE's operators/asof.merge_asof
against DuckDB's native ASOF JOIN (backward/forward/strict/nearest/
tolerance, null-bearing right value columns — the r9 row-tearing
surface); default is the relational-plan grammar.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402

from fuzz_gen import gen_asof_plan, gen_plan  # noqa: E402
from oracle_compare import assert_frames_match  # noqa: E402


_TZOPT = "-Duser.timezone=Asia/Kolkata"
HOSTILE_CONF: dict[str, dict[str, str]] = {
    "": {},
    "tz": {
        "spark.driver.extraJavaOptions": _TZOPT,
        "spark.executor.extraJavaOptions": _TZOPT,
    },
    "noaqe": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
    "noarrow": {
        "spark.sql.execution.arrow.pyspark.enabled": "false",
        "spark.sql.execution.arrow.pyspark.fallback.enabled": "true",
    },
    "oddparts": {"spark.sql.shuffle.partitions": "7"},
    "nocodegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    hostile = os.environ.get("HOSTILE", "")
    if hostile not in HOSTILE_CONF:
        raise SystemExit(f"unknown HOSTILE mode: {hostile!r}")
    grammar = os.environ.get("GRAMMAR", "")
    if grammar not in ("", "asof"):
        raise SystemExit(f"unknown GRAMMAR mode: {grammar!r}")
    gen = gen_asof_plan if grammar == "asof" else gen_plan

    from dask_cudf_spark.session import get_spark

    spark = get_spark(
        app_name="fuzz-differential", extra_conf=HOSTILE_CONF[hostile]
    )
    if hostile:
        print(f"== HOSTILE config: {hostile} ==")
    if grammar:
        print(f"== GRAMMAR: {grammar} ==")
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    t0 = time.time()
    failures: list[tuple[int, str]] = []
    empty = 0
    for seed in range(start, start + n):
        plan = gen(seed)
        try:
            spark_pdf = plan.run_spark(spark, sf_dir).toPandas()
            duck_pdf = con.execute(plan.duck_sql()).fetchdf()
            if len(duck_pdf) == 0:
                empty += 1
            assert_frames_match(spark_pdf, duck_pdf, f"seed {seed}")
            print(f"  seed {seed:5d}  MATCH ({len(spark_pdf)} rows)")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append((seed, str(e)[:500]))
            print(f"  seed {seed:5d}  FAIL: {e}")
            print(f"    plan: {plan.describe()}")
            print(f"    sql:  {plan.duck_sql()}")
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "seeds": n,
                "matches": n - len(failures),
                "failures": [s for s, _ in failures],
                "empty_results": empty,
                "sf_dir": sf_dir,
                "hostile": hostile,
                "grammar": grammar or "relational",
                "wall_s": round(wall, 1),
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
