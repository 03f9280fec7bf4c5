"""Long-run differential plan fuzzer (see tests/fuzz_gen.py).

    python scripts/fuzz_differential.py [N_SEEDS] [SF_DIR] [START_SEED]
    HOSTILE=nocodegen python scripts/fuzz_differential.py ...
    GRAMMAR=asof python scripts/fuzz_differential.py ...
    CORPUS=relational python scripts/fuzz_differential.py ...

CORPUS=relational|events|both (r13, r12 VERDICT next-round item 3)
composes the plan grammar with the ADVERSARIAL data generators: every
CORPUS_EVERY plan seeds (default 25) the lineitem/orders/events parquet
under test is REGENERATED from tests/corpus_gen (dup-key storms,
NULL/dangling FKs, epoch-edge dates, NULL-heavy numeric columns,
hostile event types) with data_seed = plan_seed // CORPUS_EVERY, so one
sweep walks the plan-space x dirty-data quadrant — random plans had
only ever run over clean testdata, hostile data only under fixed
registry queries.  SF_DIR still supplies the non-fuzzed base tables.

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

GRAMMAR=txlog (r11) fuzzes the txlog/matview/CDC layer with random
commit sequences (append/MERGE/overwrite/OPTIMIZE/VACUUM) checked
against a pure-python model: snapshot equality after every commit,
time travel vs frozen snapshots, change_feed composition, matview ==
recompute with the expected refresh mode, stats-pruned reads.  No
DuckDB twin — the model is the oracle (tests/fuzz_gen.py TxlogPlan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402

from fuzz_gen import gen_asof_plan, gen_plan, gen_txlog_plan  # noqa: E402
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
    # ANSI ON over the engine session's pinned ansi=false (r14: the
    # Spark-4 default world composed onto hostile DATA — bad casts,
    # /0, overflow, element_at misses all RAISE here instead of
    # NULLing; results must be identical, not merely non-crashing)
    "ansi": {"spark.sql.ansi.enabled": "true"},
    # memory-starved session (r15): 2 GiB heap for local[32] with
    # execution+storage squeezed to 30% and tiny spill thresholds —
    # the spill paths and collect guards must produce identical
    # results, just slower (spill, don't break)
    "lowmem": {
        "spark.driver.memory": "2g",
        "spark.memory.fraction": "0.3",
        "spark.driver.maxResultSize": "256m",
        "spark.python.worker.memory": "64m",
        "spark.shuffle.spill.numElementsForceSpillThreshold": "50000",
        "spark.sql.windowExec.buffer.spill.threshold": "4096",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "4096",
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
    if grammar not in ("", "asof", "txlog"):
        raise SystemExit(f"unknown GRAMMAR mode: {grammar!r}")
    gen = {
        "asof": gen_asof_plan,
        "txlog": gen_txlog_plan,
    }.get(grammar, gen_plan)

    from dask_cudf_spark.session import get_spark

    conf = dict(HOSTILE_CONF[hostile])
    if grammar == "txlog":
        # txlog plans shuffle a handful of rows per job; 32 shuffle
        # partitions would write 32 near-empty files per matview commit
        # and dominate wall time with task overhead.  2 (not 1) keeps
        # the multi-partition merge/exchange paths exercised.  The
        # memory cap lets many workers share the box when the sweep is
        # parallelized across seed ranges (data is a few dozen rows).
        conf.setdefault("spark.sql.shuffle.partitions", "2")
        conf.setdefault("spark.driver.memory", "6g")
    spark = get_spark(app_name="fuzz-differential", extra_conf=conf)
    if hostile:
        print(f"== HOSTILE config: {hostile} ==")
    if grammar:
        print(f"== GRAMMAR: {grammar} ==")
    corpus = os.environ.get("CORPUS", "")
    if corpus not in ("", "relational", "events", "both"):
        raise SystemExit(f"unknown CORPUS mode: {corpus!r}")
    corpus_every = int(os.environ.get("CORPUS_EVERY", "25"))
    scratch = f"/tmp/txfuzz-{os.getpid()}"

    con = duckdb.connect()

    def bind_views(d: str) -> None:
        for t in ("lineitem", "orders", "events"):
            con.execute(f"DROP VIEW IF EXISTS {t}")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )

    def corpus_dir(data_seed: int) -> str:
        """Regenerate the fuzzed tables for this data seed; non-fuzzed
        tables stay the clean SF_DIR copies (one-axis discipline)."""
        import shutil

        import pyarrow.parquet as pq

        from corpus_gen import gen_events, gen_relational

        d = f"{scratch}/corpus{data_seed}"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        for t in ("lineitem", "orders", "events"):
            shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
        if corpus in ("relational", "both"):
            for t, tbl in gen_relational(data_seed).items():
                if t in ("lineitem", "orders"):
                    pq.write_table(tbl, f"{d}/{t}.parquet")
        if corpus in ("events", "both"):
            pq.write_table(gen_events(data_seed), f"{d}/events.parquet")
        return d

    data_dir = sf_dir
    if not corpus:
        bind_views(sf_dir)

    t0 = time.time()
    failures: list[tuple[int, str]] = []
    empty = 0
    cur_data_seed = None
    for seed in range(start, start + n):
        if corpus:
            ds = seed // corpus_every
            if ds != cur_data_seed:
                cur_data_seed = ds
                data_dir = corpus_dir(ds)
                bind_views(data_dir)
        plan = gen(seed)
        try:
            if grammar == "txlog":
                # model-based: the plan runs the whole commit sequence
                # + its five check families against a scratch table
                res = plan.execute(spark, f"{scratch}/s{seed}")
                print(
                    f"  seed {seed:5d}  MATCH ({res['commits']} commits,"
                    f" {res['checks']} checks)"
                )
                continue
            spark_pdf = plan.run_spark(spark, data_dir).toPandas()
            duck_pdf = con.execute(plan.duck_sql()).fetchdf()
            if len(duck_pdf) == 0:
                empty += 1
            assert_frames_match(spark_pdf, duck_pdf, f"seed {seed}")
            print(f"  seed {seed:5d}  MATCH ({len(spark_pdf)} rows)")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append((seed, str(e)[:500]))
            print(f"  seed {seed:5d}  FAIL: {e}")
            print(f"    plan: {plan.describe()}")
            if grammar != "txlog":
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
                "corpus": corpus,
                "corpus_every": corpus_every if corpus else None,
                "wall_s": round(wall, 1),
            }
        )
    )
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
