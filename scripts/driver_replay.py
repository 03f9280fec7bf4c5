"""Replay the DRIVER's harness end-to-end: plain SparkSession built the
way the driver would (local[32], shuffle=32, no engine-specific confs),
import __spark_entry__, smoke entry() at sf0.001, then compare every
queries() entry against oracle_sql() via DuckDB at sf0.01.

Usage: python scripts/driver_replay.py [sf_dir] [name_substring ...]

Optional name substrings restrict the replay to matching queries (the
entry() smoke still runs) — cheap targeted re-verification after
touching one operator family, e.g.:
    python scripts/driver_replay.py /root/testdata/sf0.01 minhash dedup

`--window` replays exactly the driver's scored window (the first 50
ordered_specs entries) — the pre-commit check for a window rotation.

Hostile-config replays (results must not depend on session defaults):
    HOSTILE=tz    python scripts/driver_replay.py ...   # JVM +05:30
    HOSTILE=noaqe python scripts/driver_replay.py ...   # AQE + auto-broadcast off
    HOSTILE=noarrow / oddparts / nocodegen / ansi / lowmem  # see below
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Driver-style session: default everything (the contract must not depend
# on our session factory).
builder = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .appName("driver-replay")
)
HOSTILE = os.environ.get("HOSTILE", "")
if HOSTILE == "tz":
    # non-UTC JVM with a half-hour offset — the nastiest case for
    # timestamp bucketing; load_table pins session.timeZone, so every
    # query must still produce UTC-aligned results
    tzopt = "-Duser.timezone=Asia/Kolkata"
    builder = builder.config(
        "spark.driver.extraJavaOptions", tzopt
    ).config("spark.executor.extraJavaOptions", tzopt)
elif HOSTILE == "noaqe":
    builder = builder.config("spark.sql.adaptive.enabled", "false").config(
        "spark.sql.autoBroadcastJoinThreshold", "-1"
    )
elif HOSTILE == "noarrow":
    # Arrow optimization OFF: every pandas_udf / mapInPandas /
    # applyInPandas / mapInArrow-adjacent path falls back to the
    # pickle-based serializer — results must be identical
    builder = builder.config(
        "spark.sql.execution.arrow.pyspark.enabled", "false"
    ).config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
elif HOSTILE == "oddparts":
    # hostile shuffle-partition count (prime, tiny): results must be
    # invariant to HOW data lands across partitions — stresses every
    # partition-id-structured plan (two-phase global ranking, salted
    # aggs, range recombinations) plus AQE coalescing behavior
    builder = builder.config("spark.sql.shuffle.partitions", "7")
elif HOSTILE == "ansi":
    # ANSI SQL mode ON (the Spark-4 default the engine session pins
    # OFF, session.py): every arithmetic overflow, bad cast, /0,
    # element_at miss, and sequence bound that silently NULLs or wraps
    # under ansi=false RAISES here — results must be identical, not
    # just non-crashing (r13 directive 2: individual queries defended
    # piecemeal; this replays the whole registry as a mode)
    builder = builder.config("spark.sql.ansi.enabled", "true")
elif HOSTILE == "lowmem":
    # memory-starved session (r15 directive 2): every leg to date ran
    # with default memory on a 128 GiB host, so the spill paths, the
    # codebook/centroid collect guards, and state stores have never
    # executed under constraint.  2 GiB heap for a local[32] JVM with
    # execution+storage squeezed to 30% and tiny spill thresholds —
    # results must be identical, just slower (spill, don't break).
    builder = (
        builder.config("spark.driver.memory", "2g")
        .config("spark.memory.fraction", "0.3")
        .config("spark.driver.maxResultSize", "256m")
        .config("spark.python.worker.memory", "64m")
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "50000")
        .config("spark.sql.windowExec.buffer.spill.threshold", "4096")
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "4096")
    )
elif HOSTILE == "nocodegen":
    # whole-stage codegen OFF + codegen factory forced to NO_CODEGEN:
    # every expression evaluates through the interpreted path instead
    # of Janino-compiled classes — results must be bit-identical
    # (catches codegen/interpreted divergence in expression trees,
    # e.g. around nulls, decimals, and higher-order functions)
    builder = builder.config(
        "spark.sql.codegen.wholeStage", "false"
    ).config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
elif HOSTILE:
    raise SystemExit(
        f"unknown HOSTILE mode: {HOSTILE!r} "
        "(tz|noaqe|noarrow|oddparts|nocodegen|ansi|lowmem)"
    )
spark = builder.getOrCreate()
if HOSTILE:
    print(f"== HOSTILE config: {HOSTILE} ==")

print("== t1 smoke: entry(spark) ==")
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry -> {len(rows)} rows, schema: {df.schema.simpleString()}")
assert len(rows) > 0

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
if ONLY == ["--window"]:
    from dask_cudf_spark.registry import ordered_specs

    window = [s.name for s in ordered_specs()[:50]]
    qs = {n: qs[n] for n in window}
elif ONLY:
    qs = {n: f for n, f in qs.items() if any(s in n for s in ONLY)}
print(f"\n== t2: {len(qs)} queries, {len(oracles)} with oracle ==")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

sys.path.insert(0, "/root/repo/tests")
from oracle_compare import assert_frames_match  # noqa: E402

failed = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        spdf = fn(spark, SF).toPandas()
        if name in oracles:
            ddf = con.execute(oracles[name]).fetchdf()
            assert_frames_match(spdf, ddf, name)
            status = f"MATCH  ({len(spdf)} rows)"
        else:
            status = f"rows-only ({len(spdf)} rows)"
    except Exception as e:
        status = f"FAIL: {str(e)[:200]}"
        failed.append(name)
    print(f"  {name:28s} {status}  [{time.time()-t0:.1f}s]")

print(f"\n{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
sys.exit(1 if failed else 0)
