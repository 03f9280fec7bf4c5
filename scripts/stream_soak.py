"""Streaming long-soak (r15 directive 6): every streaming leg to date
ran a handful of micro-batches; a production ingest runs thousands.
Two phases, one JSON summary line each:

PHASE A — 200+ micro-batch kafka_py -> exactly-once txlog ingest ->
stream_matview chain with TWO checkpoint restarts mid-soak:
  - the txlog must cross its CHECKPOINT_INTERVAL boundaries DURING
    streaming ingest (the r14 mid-write-gap race fix's steady state):
    asserted by counting chk-*.json files and checking the newest
    checkpoint version;
  - exactly-once must hold across 200+ commits + restarts: every
    produced key lands precisely once, view == model recompute;
  - commit latency must stay FLAT early->late (the r14 checkpoint
    work's whole point — an O(commits) regression shows up here as
    last-quartile mean >> first-quartile mean).

PHASE B — 200+ micro-batch applyInPandasWithState soak (per-user
running totals over a fixed key population): the state store must
stay O(keys), not O(batches) — numRowsTotal curve recorded from
query progress, end state must equal the batch twin bit-for-bit.

Usage:  python scripts/stream_soak.py [n_batches] [restarts]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dask_cudf_spark.session import get_spark  # noqa: E402
from dask_cudf_spark.sources import txlog  # noqa: E402
from dask_cudf_spark.sources.matview import read_matview, refresh_matview  # noqa: E402
from dask_cudf_spark.streaming.jobs import stateful_user_totals  # noqa: E402
from dask_cudf_spark.streaming.kafka_protocol import (  # noqa: E402
    InProcBroker,
    KafkaClient,
)
from dask_cudf_spark.streaming.kafka_source import register_kafka_source  # noqa: E402

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 220
N_RESTARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CHUNK = 15  # rows per produce = rows per micro-batch (capped trigger)
# auto-compaction composed INTO the streaming sink (r15): the policy
# must hold under checkpoint restarts, batch_id replays, and the
# CHECKPOINT_INTERVAL log-compaction machinery all at once; 0 = off
AUTOOPT = int(os.environ.get("AUTOOPT", "50"))

spark = get_spark(app_name="stream-soak")
spark.sparkContext.setLogLevel("ERROR")
register_kafka_source(spark)

root = tempfile.mkdtemp(prefix="spark-graft-soak-")
src = f"{root}/table"
dst = f"{root}/view"
ckpt = f"{root}/ckpt"

topic, nparts = "soak15", 2
broker = InProcBroker(num_partitions=nparts)
broker.ensure_topic(topic)

produced = 0
aggs = {"n": ("count", "k"), "s": ("sum", "v")}


def produce_chunk(n: int) -> None:
    global produced
    buckets: dict[int, list] = {}
    for k in range(produced, produced + n):
        payload = f"{k}|{k % 5}|{k % 17}".encode()
        buckets.setdefault(k % nparts, []).append((str(k).encode(), payload))
    with KafkaClient(broker.bootstrap) as cli:
        for pid, recs in sorted(buckets.items()):
            cli.produce(topic, pid, recs, timestamp_ms=1_700_000_000_000)
    produced += n


commit_times: list[float] = []


def write_and_maybe_refresh(batch_df, batch_id):
    sp = batch_df.sparkSession
    fields = F.split(F.col("value").cast("string"), r"\|")
    rows = batch_df.select(
        fields.getItem(0).cast("bigint").alias("k"),
        fields.getItem(1).cast("bigint").alias("g"),
        fields.getItem(2).cast("bigint").alias("v"),
    )
    t0 = time.time()
    for outer in range(3):  # supervised retry over restart-overlap races
        try:
            txlog.commit(
                rows,
                src,
                "append",
                batch_id=int(batch_id),
                auto_optimize_every=AUTOOPT or None,
            )
            break
        except txlog.CommitConflict:
            if outer == 2:
                raise
    commit_times.append(time.time() - t0)
    if int(batch_id) % 10 == 0:
        refresh_matview(sp, src, dst, ["g"], aggs, key="k")


def start_query():
    raw = (
        spark.readStream.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", topic)
        .option("maxOffsetsPerTrigger", str(CHUNK))
        .load()
    )
    return (
        raw.writeStream.foreachBatch(write_and_maybe_refresh)
        .option("checkpointLocation", ckpt)
        .queryName("soak_ingest")
        .trigger(processingTime="0 seconds")
        .start()
    )


def landed() -> int:
    try:
        return txlog.read_snapshot(spark, src).count()
    except FileNotFoundError:
        return 0


def wait_drained(timeout: float = 600.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if landed() >= produced:
            return
        time.sleep(0.5)
    raise AssertionError(f"drain stalled: {landed()}/{produced}")


print(f"== PHASE A: {N_BATCHES} micro-batches, {N_RESTARTS} restarts ==")
tA = time.time()
restart_at = {
    int(N_BATCHES * (i + 1) / (N_RESTARTS + 1)) for i in range(N_RESTARTS)
}
q = start_query()
try:
    for i in range(N_BATCHES):
        produce_chunk(CHUNK)
        if i in restart_at:
            # stop mid-drain at an arbitrary boundary, then resume
            # from the checkpoint — the at-least-once window
            q.stop()
            q.awaitTermination(30)
            q = start_query()
        if i % 25 == 24:
            wait_drained()  # keep the backlog chunk-sized
    wait_drained()
finally:
    q.stop()
    q.awaitTermination(30)

# --- assertions -------------------------------------------------------
snap = txlog.read_snapshot(spark, src)
n_rows = snap.count()
n_keys = snap.select("k").distinct().count()
assert n_rows == produced == n_keys, (n_rows, produced, n_keys)

hist = txlog.table_history(spark, src)
n_versions = hist[-1]["version"] + 1
live_now = len(txlog._live_dirs(txlog._read_log(spark, src), None))
if AUTOOPT:
    assert live_now <= AUTOOPT, (live_now, AUTOOPT)
chks = sorted(
    int(f[4:-5])
    for f in os.listdir(f"{src}/_txlog")
    if f.startswith("chk-")
)
assert chks, "no txlog checkpoints written during streaming ingest"

# Dead torn-version gaps: a restart can kill a writer BETWEEN the
# exclusive version-file create and the record write (this soak
# reproduced it on its first run) — data stays exactly-once (the
# replayed batch recommits under a new version; the torn slot parses
# as a gap), but checkpoint advancement stalls at the gap by design
# (r14 contiguous-prefix rule).  All queries are stopped here = a
# single-writer maintenance window, so heal with grace 0 and assert
# checkpointing RESUMES past every interval boundary.
parsed_v = {e["version"] for e in hist}
gaps_before = [
    v for v in range(hist[-1]["version"]) if v not in parsed_v
]
healed = txlog.heal_log_gaps(spark, src, min_age_seconds=0)
assert sorted(healed) == gaps_before, (healed, gaps_before)
hist2 = txlog.table_history(spark, src)
assert [e["version"] for e in hist2] == list(
    range(hist2[-1]["version"] + 1)
), "prefix not contiguous after heal"
# a no-op heal-marker commit re-runs _maybe_checkpoint over the
# healed prefix (contents unchanged: an empty-frame append)
txlog.commit(
    spark.createDataFrame([], "k long, g long, v long"), src
)
chks_after = sorted(
    int(f[4:-5])
    for f in os.listdir(f"{src}/_txlog")
    if f.startswith("chk-")
)
last_boundary = hist2[-1]["version"] + 1 - txlog.CHECKPOINT_INTERVAL
assert chks_after[-1] >= last_boundary, (chks_after, last_boundary)

refresh_matview(spark, src, dst, ["g"], aggs, key="k")
view = {
    (r["g"]): (r["n"], r["s"]) for r in read_matview(spark, dst).collect()
}
model = {
    r["g"]: (r["n"], r["s"])
    for r in snap.groupBy("g")
    .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    .collect()
}
assert view == model, "matview != model recompute after soak"

quarter = max(1, len(commit_times) // 4)
early = sum(commit_times[:quarter]) / quarter
late = sum(commit_times[-quarter:]) / quarter
summary_a = {
    "leg": "stream-soak-ingest",
    # batch ids live on the raw log records (table_history strips them)
    "batches_committed": len(
        {
            e.get("batch_id")
            for e in txlog._read_log(spark, src)
            if e.get("batch_id") is not None
        }
    ),
    "produced": produced,
    "landed": n_rows,
    "versions": n_versions,
    "txlog_checkpoints": len(chks),
    "newest_checkpoint_version": chks[-1],
    "auto_optimize_every": AUTOOPT,
    "live_dirs_final": live_now,
    "restarts": N_RESTARTS,
    "commit_mean_first_quartile_s": round(early, 3),
    "commit_mean_last_quartile_s": round(late, 3),
    "late_over_early": round(late / early, 2) if early else None,
    "wall_s": round(time.time() - tA, 1),
}
print(json.dumps(summary_a))

# ---------------------------------------------------------------------
print("== PHASE B: stateful state-store O(keys) soak ==")
tB = time.time()
topic_b = "soak15b"
broker.ensure_topic(topic_b)
N_KEYS = 50
produced_b = 0


def produce_b(n: int) -> None:
    global produced_b
    buckets: dict[int, list] = {}
    for k in range(produced_b, produced_b + n):
        uid = k % N_KEYS
        # value with a .5-boundary-rich fractional part
        payload = f"{uid}|{(k % 13) + (k % 4) * 0.25}".encode()
        buckets.setdefault(k % nparts, []).append((str(k).encode(), payload))
    with KafkaClient(broker.bootstrap) as cli:
        for pid, recs in sorted(buckets.items()):
            cli.produce(topic_b, pid, recs, timestamp_ms=1_700_000_000_000)
    produced_b += n


raw_b = (
    spark.readStream.format("kafka_py")
    .option("bootstrap", broker.bootstrap)
    .option("subscribe", topic_b)
    .option("maxOffsetsPerTrigger", str(CHUNK))
    .load()
)
fields_b = F.split(F.col("value").cast("string"), r"\|")
events_b = raw_b.select(
    fields_b.getItem(0).cast("bigint").alias("user_id"),
    fields_b.getItem(1).cast("double").alias("value"),
)
qb = (
    stateful_user_totals(events_b)
    .writeStream.format("memory")
    .queryName("soak_state")
    .outputMode("update")
    .option("checkpointLocation", f"{root}/ckpt_b")
    .trigger(processingTime="0 seconds")
    .start()
)
state_curve: list[int] = []
batches_seen = 0
try:
    # pace production on BATCH PROGRESS, not wall time: an unpaced
    # producer outruns the 15-row-capped trigger and builds a backlog
    # the drain phase then crawls through for hours (first-run lesson)
    last_produced_at = -1
    t_guard = time.time()
    while batches_seen < N_BATCHES and time.time() - t_guard < 900:
        if batches_seen > last_produced_at:
            produce_b(CHUNK)
            last_produced_at = batches_seen
        else:
            time.sleep(0.05)
        lp = qb.lastProgress
        if lp and lp.get("stateOperators"):
            state_curve.append(lp["stateOperators"][0]["numRowsTotal"])
            batches_seen = lp["batchId"] + 1
    # drain fully
    t0 = time.time()
    while time.time() - t0 < 300:
        total_n = spark.sql(
            "SELECT CAST(SUM(n_events) AS BIGINT) c FROM "
            "(SELECT user_id, MAX_BY(n_events, n_events) n_events "
            " FROM soak_state GROUP BY user_id)"
        ).collect()[0].c
        if total_n == produced_b:
            break
        time.sleep(0.5)
finally:
    lp = qb.lastProgress
    if lp and lp.get("stateOperators"):
        state_curve.append(lp["stateOperators"][0]["numRowsTotal"])
    qb.stop()
    qb.awaitTermination(30)

# end state (latest update per key) must equal the batch twin
final = spark.sql(
    """
    SELECT user_id,
           MAX_BY(n_events, n_events) AS n_events,
           MAX_BY(total_value, n_events) AS total_value
    FROM soak_state GROUP BY user_id
    """
).collect()
got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final}
rows = [
    (k % N_KEYS, (k % 13) + (k % 4) * 0.25) for k in range(produced_b)
]
batch_twin = stateful_user_totals(
    spark.createDataFrame(rows, "user_id bigint, value double")
).collect()
want = {r["user_id"]: (r["n_events"], r["total_value"]) for r in batch_twin}
assert got == want, "stateful end state != batch twin"
assert max(state_curve) <= N_KEYS, (max(state_curve), N_KEYS)

summary_b = {
    "leg": "stream-soak-stateful",
    "batches": int(batches_seen),
    "produced": produced_b,
    "n_keys": N_KEYS,
    "state_rows_max": max(state_curve),
    "state_rows_final": state_curve[-1],
    "state_curve_spot": state_curve[:: max(1, len(state_curve) // 10)],
    "wall_s": round(time.time() - tB, 1),
}
print(json.dumps(summary_b))
print("ALL OK")
shutil.rmtree(root, ignore_errors=True)
