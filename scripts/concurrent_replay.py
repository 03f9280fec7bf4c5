"""Concurrent multi-query session leg (r15 directive 3): a real
cluster multiplexes ONE SparkSession across many users/queries, but
the registry has only ever run serially.  This probe runs the full
registry twice on one driver-style session — first serially (the
baseline), then sliced round-robin across N threads running
CONCURRENTLY — and asserts every query's canonical row multiset is
byte-equal across the two runs, while a background Structured
Streaming job (rate source -> windowed agg -> memory sink) keeps the
streaming scheduler busy the whole concurrent phase.

What this exercises that nothing else does:
  - thread-safety of the Frame facade / registry / session helpers
    (module-level state, cached literals, codebook builds);
  - temp-view and checkpoint-dir name collisions ACROSS queries (two
    different queries materializing the same global name is invisible
    serially, fatal concurrently);
  - AQE + whole-stage-codegen compilation under concurrent jobs on one
    SparkContext (shared broadcast/exchange reuse machinery);
  - the streaming micro-batch scheduler interleaving with a saturated
    FIFO job scheduler.

Usage:  python scripts/concurrent_replay.py [sf_dir] [n_threads] [name_substr ...]

Prints per-query DIVERGE/FAIL lines (expected: none) plus one JSON
summary line for the round ledger.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from oracle_compare import canonical_rows, normalize_nullable_ints  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ONLY = sys.argv[3:]

# Driver-style session — the contract must not depend on our tuned
# session factory (same builder as driver_replay.py).
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .appName("concurrent-replay")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs = entrymod.queries()
if ONLY:
    qs = {n: f for n, f in qs.items() if any(s in n for s in ONLY)}
names = sorted(qs)
print(f"== concurrent replay: {len(names)} queries, {N_THREADS} threads, sf={SF} ==")


def run_one(name):
    pdf = normalize_nullable_ints(qs[name](spark, SF).toPandas())
    return (sorted(pdf.columns), canonical_rows(pdf))


# ---- phase 1: serial baseline ----------------------------------------
serial: dict[str, tuple] = {}
serial_fail: dict[str, str] = {}
t0 = time.time()
for n in names:
    try:
        serial[n] = run_one(n)
    except Exception as e:
        serial_fail[n] = f"{type(e).__name__}: {str(e)[:160]}"
t_serial = time.time() - t0
print(
    f"serial: {len(serial)} ok, {len(serial_fail)} fail  [{t_serial:.0f}s]"
)
for n, e in serial_fail.items():
    print(f"  SERIAL-FAIL {n}: {e}")

# ---- background streaming job for the concurrent phase ---------------
stream_q = (
    spark.readStream.format("rate")
    .option("rowsPerSecond", 500)
    .load()
    .withWatermark("timestamp", "2 seconds")
    .groupBy(
        F.window("timestamp", "1 second"), (F.col("value") % 7).alias("k")
    )
    .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    .writeStream.format("memory")
    .queryName("concurrent_bg_agg")
    .outputMode("append")
    .start()
)

# ---- phase 2: concurrent round-robin slices --------------------------
conc: dict[str, tuple] = {}
conc_fail: dict[str, str] = {}
lock = threading.Lock()


def worker(idx: int):
    # Disjoint slice per thread: same query never races itself; what
    # we are testing is DIFFERENT queries sharing one session.
    for n in names[idx::N_THREADS]:
        if n in serial_fail:
            continue
        try:
            r = run_one(n)
            with lock:
                conc[n] = r
        except Exception as e:
            with lock:
                conc_fail[n] = (
                    f"{type(e).__name__}: {str(e)[:200]}\n"
                    + traceback.format_exc(limit=3)
                )


t0 = time.time()
threads = [
    threading.Thread(target=worker, args=(i,), daemon=True)
    for i in range(N_THREADS)
]
for t in threads:
    t.start()
for t in threads:
    t.join()
t_conc = time.time() - t0

bg_batches = stream_q.lastProgress["batchId"] if stream_q.lastProgress else 0
bg_exc = stream_q.exception()
stream_q.stop()
bg_rows = spark.sql("SELECT count(*) c FROM concurrent_bg_agg").collect()[0].c

# ---- compare ---------------------------------------------------------
diverged = []
for n in sorted(serial):
    if n in conc_fail:
        print(f"  CONC-FAIL {n}: {conc_fail[n].splitlines()[0]}")
        diverged.append(n)
        continue
    if conc[n][0] != serial[n][0]:
        print(f"  DIVERGE {n}: columns {serial[n][0]} vs {conc[n][0]}")
        diverged.append(n)
    elif conc[n][1] != serial[n][1]:
        print(
            f"  DIVERGE {n}: {len(serial[n][1])} rows serial vs "
            f"{len(conc[n][1])} concurrent (multiset differs)"
        )
        diverged.append(n)

summary = {
    "leg": "concurrent-session",
    "sf": SF,
    "threads": N_THREADS,
    "queries": len(serial),
    "serial_fail": sorted(serial_fail),
    "diverged_or_failed": sorted(diverged),
    "serial_s": round(t_serial, 1),
    "concurrent_s": round(t_conc, 1),
    "speedup": round(t_serial / t_conc, 2) if t_conc else None,
    "bg_stream_batches": bg_batches,
    "bg_stream_rows": int(bg_rows),
    "bg_stream_error": str(bg_exc) if bg_exc else None,
}
print(json.dumps(summary))
ok = not diverged and not serial_fail and bg_exc is None and bg_rows > 0
print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
