"""Streaming x adversarial-corpus fuzz leg (round 13, r12 VERDICT next-
round item 2): every divergence class the corpus program has found so
far (~26 across four axes) was caught on BATCH twins — the stateful /
watermark / exactly-once machinery had only ever seen clean or
synthetic data.  This leg replays the HOSTILE events corpus
(tests/corpus_gen.gen_events: tie storms, sub-ms bursts, NULL/empty/
unicode event types, NULL values, hostile JSON props) through the
STREAMING paths in genuinely multi-micro-batch mode and convergence-
checks each against its batch twin on the very same files.

Per seed:
  - gen_events(seed) -> scratch/events.parquet (batch-twin file) and
    scratch/chunks/ev-%04d.parquet (ts-ordered chunk files, increasing
    mtimes, so maxFilesPerTrigger=1 yields one micro-batch per chunk
    in event-time order — the events_files_stream ordering contract);
  - scratch/chunks_dup/: the same chunks with the LAST row of each
    chunk REDELIVERED as the first row of the next (an at-least-once
    window inside the watermark by construction: the duplicate is the
    previous batch's max-ts row, and the watermark trails max ts by
    exactly the dedup delay) — drives dropDuplicatesWithinWatermark
    state across batches;
  - run the legs below, each stream-vs-batch on identical bytes.

Legs (ONLY=<substr> filters):
  tumbling / sliding / session   windowed aggs, complete mode
  dedup                          dropDuplicatesWithinWatermark vs
                                 batch dropDuplicates, redelivery dir
  user_totals                    applyInPandasWithState running totals
                                 (update mode, last row per key)
  sessionize                     arbitrary-state sessionization vs the
                                 oracle-gated batch q_sessionize_gaps
  ingest_restart                 exactly-once parquet ingest STOPPED
                                 after the first half of the backlog
                                 and RESUMED from the checkpoint, then
                                 a deliberate foreachBatch redelivery
  matview                        txlog commit + incremental matview
                                 refresh per micro-batch vs the batch
                                 groupBy (idempotence replay included)
  kafka                          events as JSON over the jar-free
                                 kafka_py wire (hostile unicode/ctrl
                                 payloads through the protocol), both
                                 sides reading the SAME topic bytes

Usage:
    python scripts/stream_corpus_fuzz.py [N_SEEDS] [START_SEED]
    CHUNKS=5 ONLY=<leg substr> KAFKA=0 python scripts/stream_corpus_fuzz.py ...
    HOSTILE=tz|noaqe|noarrow|oddparts|nocodegen ...   # session-config cell
                                                      # (r13: e.g. tz runs the
                                                      # whole streaming surface
                                                      # under a +05:30 JVM)

Exit 0 = every (seed, leg) converged.  Prints the one-line JSON the
FUZZ_r*.json artifacts record.  Seed-range etiquette: fresh ranges per
recorded leg (ledger: COVERAGE.md); r13 streaming legs use 10000+.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import pyarrow.parquet as pq  # noqa: E402

from corpus_gen import gen_events  # noqa: E402
from oracle_compare import assert_frames_match, normalize_nullable_ints  # noqa: E402

BASE_SF = "/root/testdata/sf0.001"
CHUNKS = int(os.environ.get("CHUNKS", "5"))


def _prepare_seed(seed: int, root: str) -> dict:
    """Write the per-seed corpus: single-file batch twin + ts-ordered
    chunk dir + redelivery chunk dir.  gen_events emits rows already in
    non-decreasing ts order (built incrementally), so sequential row
    slices ARE event-time slices.  A hostile DOCUMENTS chunk dir rides
    along for the classify leg (no event time — any slicing works)."""
    from corpus_gen import gen_documents

    os.makedirs(root)
    docs = gen_documents(seed)
    pq.write_table(docs, f"{root}/documents.parquet")
    os.makedirs(f"{root}/doc_chunks")
    dcuts = [round(i * docs.num_rows / CHUNKS) for i in range(CHUNKS + 1)]
    for i in range(CHUNKS):
        pq.write_table(
            docs.slice(dcuts[i], dcuts[i + 1] - dcuts[i]),
            f"{root}/doc_chunks/doc-{i:04d}.parquet",
        )
    tbl = gen_events(seed)
    pq.write_table(tbl, f"{root}/events.parquet")
    n = tbl.num_rows
    cuts = [round(i * n / CHUNKS) for i in range(CHUNKS + 1)]
    os.makedirs(f"{root}/chunks")
    os.makedirs(f"{root}/chunks_dup")
    t0 = time.time()
    for i in range(CHUNKS):
        chunk = tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
        path = f"{root}/chunks/ev-{i:04d}.parquet"
        pq.write_table(chunk, path)
        # redelivery dir: prepend a copy of the previous chunk's last
        # row — its ts is the previous batch's MAX event time, so it is
        # always inside the 1h dedup watermark when the next batch runs
        if i > 0:
            import pyarrow as pa

            prev_last = tbl.slice(cuts[i] - 1, 1)
            dup = pa.concat_tables([prev_last, chunk])
        else:
            dup = chunk
        dpath = f"{root}/chunks_dup/ev-{i:04d}.parquet"
        pq.write_table(dup, dpath)
        # file-source batch order follows modification time: force it
        for p in (path, dpath):
            os.utime(p, (t0 + i, t0 + i))
    return {"rows": n}


def _drain(stream_df, ckpt: str, name: str, mode: str):
    """availableNow drain into a memory sink; returns the sink pandas."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError(f"{name}: stream did not drain in 300s")
    finally:
        if q.isActive:
            q.stop()
    spark = stream_df.sparkSession
    pdf = spark.table(name).toPandas()
    spark.catalog.dropTempView(name)
    return pdf


def _cmp(got, exp, name):
    assert_frames_match(
        normalize_nullable_ints(got.reset_index(drop=True)),
        normalize_nullable_ints(exp.reset_index(drop=True)),
        name,
    )


def _batch_events(spark, directory: str):
    """Batch read of a chunk dir under the SAME ts normalization the
    stream reader applies (sources.tables.load_table contract)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(directory)
    if df.schema["ts"].dataType.simpleString() == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# ------------------------------------------------------------- legs

def leg_windowed(spark, root, ckroot, job_name):
    from dask_cudf_spark.streaming import (
        events_files_stream,
        session_agg,
        sliding_counts,
        tumbling_counts,
    )

    job = {
        "tumbling": tumbling_counts,
        "sliding": sliding_counts,
        "session": session_agg,
    }[job_name]
    stream = job(
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1)
    )
    got = _drain(stream, f"{ckroot}/{job_name}", f"scf_{job_name}", "complete")
    exp = job(_batch_events(spark, f"{root}/chunks")).toPandas()
    _cmp(got, exp, job_name)


def leg_dedup(spark, root, ckroot):
    from dask_cudf_spark.streaming import events_files_stream, stream_dedup

    stream = stream_dedup(
        events_files_stream(spark, f"{root}/chunks_dup", max_files_per_trigger=1)
    )
    got = _drain(stream, f"{ckroot}/dedup", "scf_dedup", "append")
    exp = stream_dedup(_batch_events(spark, f"{root}/chunks_dup")).toPandas()
    # row-level equality on the identifying columns (props JSON and
    # float value ride along unchanged; event_id is the dedup key and
    # is unique in the corpus, so sets must match exactly)
    _cmp(
        got[["event_id", "user_id", "event_type"]],
        exp[["event_id", "user_id", "event_type"]],
        "dedup",
    )


def leg_user_totals(spark, root, ckroot):
    from dask_cudf_spark.streaming import events_files_stream, stateful_user_totals

    stream = stateful_user_totals(
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1)
    )
    got = _drain(stream, f"{ckroot}/totals", "scf_totals", "update")
    got = got.groupby("user_id", as_index=False).last()
    exp = stateful_user_totals(_batch_events(spark, f"{root}/chunks")).toPandas()
    _cmp(got, exp, "user_totals")


def leg_sessionize(spark, root, ckroot):
    from pyspark.sql import functions as F

    from dask_cudf_spark.registry import REGISTRY, _ensure_loaded
    from dask_cudf_spark.streaming import events_files_stream, sessionize_stateful

    _ensure_loaded()
    stream = sessionize_stateful(
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1)
    )
    got = _drain(stream, f"{ckroot}/sess", "scf_sess", "update")
    got = (
        got.sort_values(["user_id", "session_start"])
        .groupby(["user_id", "session_start"], as_index=False)
        .last()
        .drop(columns=["closed"])
    )
    exp = (
        REGISTRY["q_sessionize_gaps"]
        .fn(spark, root)
        .select(
            "user_id",
            # MICROSECONDS: the stateful operator's output domain
            # (r13 fix — this leg's seed 10017 caught the seconds-
            # truncation merge)
            F.unix_micros("session_start").alias("session_start"),
            F.unix_micros("session_end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    _cmp(got, exp, "sessionize")


def leg_cusum(spark, root, ckroot):
    """Streaming CUSUM vs the oracle-gated batch q_cusum_drift on the
    same hostile events (NULL purchase values exercise the null-skip
    prefix contract the r13 fix pinned)."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.registry import REGISTRY, _ensure_loaded
    from dask_cudf_spark.streaming import cusum_stateful, events_files_stream

    _ensure_loaded()
    ev = _batch_events(spark, f"{root}/chunks")
    k = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(value * 100, 0) AS LONG))"
                " div count(1) AS LONG)"
            )
        )
        .collect()[0][0]
    )
    if k is None:
        return  # no purchase rows this seed: the twin emits nothing too
    stream = cusum_stateful(
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1),
        k=int(k),
        threshold=6 * int(k),
    )
    got = _drain(stream, f"{ckroot}/cusum", "scf_cusum", "update")
    got = got.groupby("user_id", as_index=False).last()
    got = got[got["n_alerts"] > 0]
    exp = REGISTRY["q_cusum_drift"].fn(spark, root).toPandas()
    _cmp(got, exp, "cusum")


def leg_ingest_restart(spark, root, ckroot):
    """Exactly-once ingest with a MID-BACKLOG RESTART: drain the first
    half of the chunks, stop, add the rest, resume from the same
    checkpoint, then deliberately redeliver the final batch through the
    same foreachBatch writer — landed table must equal the corpus
    exactly once throughout."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming import events_files_stream
    from dask_cudf_spark.streaming.jobs import (
        exactly_once_batch_writer,
        ingest_exactly_once,
    )

    live = f"{root}/live_chunks"
    os.makedirs(live)
    names = sorted(os.listdir(f"{root}/chunks"))
    half = max(1, len(names) // 2)
    for nme in names[:half]:
        shutil.copy2(f"{root}/chunks/{nme}", f"{live}/{nme}")
    out, ckpt = f"{root}/ingested", f"{ckroot}/ingest"

    def run():
        q = ingest_exactly_once(
            events_files_stream(spark, live, max_files_per_trigger=1),
            out,
            ckpt,
            query_name="scf_ingest",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("ingest stream did not drain")

    run()
    for nme in names[half:]:
        shutil.copy2(f"{root}/chunks/{nme}", f"{live}/{nme}")
    run()  # restart from the same checkpoint

    landed = spark.read.parquet(out)
    batch = _batch_events(spark, f"{root}/chunks")
    n = batch.count()
    assert landed.count() == n, (landed.count(), n, "restart lost/duped rows")
    assert landed.select("event_id").distinct().count() == n
    # at-least-once redelivery of the final committed batch: no-op
    bids = [r[0] for r in landed.select("__batch_id").distinct().collect()]
    assert len(bids) >= 2, f"expected multi-batch ingest, got {bids}"
    replay_id = max(bids)
    replay_rows = landed.filter(F.col("__batch_id") == replay_id).drop("__batch_id")
    exactly_once_batch_writer(out)(replay_rows, replay_id)
    after = spark.read.parquet(out)
    assert after.count() == n, "redelivered batch duplicated rows"


def leg_matview(spark, root, ckroot):
    from pyspark.sql import functions as F

    from dask_cudf_spark.sources.matview import matview_is_fresh, read_matview
    from dask_cudf_spark.sources.txlog import commit, table_history
    from dask_cudf_spark.streaming import events_files_stream
    from dask_cudf_spark.streaming.jobs import stream_matview

    src, dst = f"{root}/smv_src", f"{root}/smv_view"
    aggs = {
        "n": ("count", None),
        "total_c": ("sum", "cents"),
        "hi": ("max", "event_id"),
    }
    proj = lambda df: df.select(  # noqa: E731
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    q = stream_matview(
        proj(events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1)),
        src,
        dst,
        f"{ckroot}/smv",
        ["event_type"],
        aggs,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("matview stream did not drain")
    exp = (
        proj(_batch_events(spark, f"{root}/chunks"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").alias("total_c"),
            F.max("event_id").alias("hi"),
        )
        .toPandas()
    )
    got = read_matview(spark, dst).toPandas()
    _cmp(got, exp, "matview")
    assert matview_is_fresh(spark, src, dst)
    # idempotence under redelivery of an already-committed batch id
    sv, dv = len(table_history(spark, src)), len(table_history(spark, dst))
    commit(proj(_batch_events(spark, f"{root}/chunks")).limit(3), src, "append", batch_id=0)
    assert len(table_history(spark, src)) == sv, "redelivered commit not a no-op"
    _cmp(read_matview(spark, dst).toPandas(), exp, "matview_replay")
    assert len(table_history(spark, dst)) == dv


def leg_attribution(spark, root, ckroot):
    """Stream-stream LEFT OUTER interval join over the hostile corpus
    (two independent chunked stream handles, watermarks on both
    sides).  Invariants (same contract as the clean-data test):
    matched pairs equal the batch inner matches exactly; every
    null-augmented row is a genuinely unmatched purchase; purchases
    safely older than the final click watermark must all have been
    emitted (a missing match is provably missing, not late)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming import events_files_stream
    from dask_cudf_spark.streaming.jobs import purchase_click_attribution

    ev = _batch_events(spark, f"{root}/chunks")
    batch = purchase_click_attribution(ev, ev, how="left_outer").toPandas()
    pairs = purchase_click_attribution(
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1),
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1),
        how="left_outer",
    )
    # inline drain (not _drain): the completeness bound below needs the
    # ENGINE-REPORTED final watermark from query progress.  A
    # hand-derived bound (max click ts - delays) is WRONG on sparse
    # streams: Catalyst pushes the event-type filter below the
    # EventTimeWatermark node, so each side's watermark tracks its
    # FILTERED max — the globally-last purchase can never be proven
    # unmatched (seed 10201 finding: the invariant, not the engine).
    q = (
        pairs.writeStream.format("memory")
        .queryName("scf_attr")
        .outputMode("append")
        .option("checkpointLocation", f"{ckroot}/attr")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("attribution stream did not drain")
        wm = None
        for prog in q.recentProgress:
            w = (prog.get("eventTime") or {}).get("watermark")
            if w:
                wm = w
    finally:
        if q.isActive:
            q.stop()
    got = spark.table("scf_attr").toPandas()
    spark.catalog.dropTempView("scf_attr")
    bm, bu = batch[batch.lag_us.notna()], batch[batch.lag_us.isna()]
    gm, gn = got[got.lag_us.notna()], got[got.lag_us.isna()]
    _cmp(gm, bm, "attribution_matched")
    phantom = set(gn.purchase_id) - set(bu.purchase_id)
    assert not phantom, f"attribution: {len(phantom)} phantom unmatched rows"
    if wm is not None and len(bu):
        final_wm = pd.Timestamp(wm).tz_localize(None)
        purchases = (
            ev.filter(ev.event_type == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "ts")
            .toPandas()
            .set_index("purchase_id")["ts"]
        )
        # strictly below the final watermark (1s guard for the ms
        # rounding of the reported value): provably-missing purchases
        old = {
            pid
            for pid in bu.purchase_id
            if purchases[pid] < final_wm - pd.Timedelta(seconds=1)
        }
        missing = old - set(gn.purchase_id)
        assert not missing, (
            f"attribution: {len(missing)} purchases below the final "
            f"watermark {final_wm} never emitted as unmatched"
        )


def leg_classify_docs(spark, root, ckroot):
    """The DOCUMENTS axis through a streaming path: hostile documents
    (unicode soup, NULL/empty text, whitespace pathologies) classified
    map-side by the online nearest-centroid inference job in
    multi-micro-batch mode; predictions must equal the batch run of
    the same centroids exactly (integer vector arithmetic commutes
    across batch slicing)."""
    from dask_cudf_spark.streaming.jobs import classify_documents, train_centroids

    batch_docs = spark.read.parquet(f"{root}/documents.parquet")
    cents = train_centroids(batch_docs)
    if len(cents) < 2:
        return  # too few labeled languages this seed to train on
    exp = classify_documents(batch_docs, cents).toPandas()
    stream_docs = (
        spark.readStream.schema(batch_docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{root}/doc_chunks")
    )
    got = _drain(
        classify_documents(stream_docs, cents),
        f"{ckroot}/classify",
        "scf_classify",
        "append",
    )
    _cmp(got, exp, "classify_docs")


def leg_kafka(spark, root, ckroot, seed):
    """Hostile events as JSON records over the jar-free kafka_py wire:
    unicode/control-char payloads through the Kafka v0 protocol, the
    stream read in bounded micro-batches; stream vs batch on the SAME
    topic bytes."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming import tumbling_counts
    from dask_cudf_spark.streaming.jobs import parse_kafka_events
    from dask_cudf_spark.streaming.kafka_protocol import InProcBroker, KafkaClient
    from dask_cudf_spark.streaming.kafka_source import register_kafka_source

    register_kafka_source(spark)
    broker = InProcBroker(num_partitions=3)
    topic = f"scf{seed}"
    broker.ensure_topic(topic)
    ev = _batch_events(spark, f"{root}/chunks")
    wire = ev.select(
        (F.col("user_id") % 3).cast("int").alias("p"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        ).alias("v"),
    ).collect()
    with KafkaClient(broker.bootstrap) as c:
        for p in range(3):
            msgs = [(None, r.v.encode()) for r in wire if r.p == p]
            if msgs:
                c.produce(topic, p, msgs, 1_700_000_000_000)

    def read(streaming: bool):
        rdr = (spark.readStream if streaming else spark.read).format("kafka_py")
        rdr = rdr.option("bootstrap", broker.bootstrap).option("subscribe", topic)
        if streaming:
            rdr = rdr.option("maxOffsetsPerTrigger", "100")
        return parse_kafka_events(rdr.load())

    stream = tumbling_counts(read(streaming=True))
    got = _drain(stream, f"{ckroot}/kafka", "scf_kafka", "complete")
    exp = tumbling_counts(read(streaming=False)).toPandas()
    try:
        _cmp(got, exp, "kafka")
    finally:
        broker.close()


def leg_geo_join(spark, root, ckroot, seed):
    """GEO axis through STREAMING (r14, r13 VERDICT item 7): hostile
    events stream ⋈ hostile static nation ⋈ region (gen_geo: NULL/''/
    unicode names, NULL/dangling n_regionkey) — the stream-static
    broadcast-join path keyed through a dirty dim chain, aggregated in
    complete mode and convergence-checked against the batch twin on
    the same bytes.  Dangling/NULL n_regionkey rows legitimately drop
    on BOTH sides (inner through region)."""
    from corpus_gen import gen_geo
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming import events_files_stream

    geo = gen_geo(seed)
    os.makedirs(f"{root}/geo", exist_ok=True)
    pq.write_table(geo["nation"], f"{root}/geo/nation.parquet")
    pq.write_table(geo["region"], f"{root}/geo/region.parquet")
    nation = spark.read.parquet(f"{root}/geo/nation.parquet")
    region = spark.read.parquet(f"{root}/geo/region.parquet")

    def job(events):
        e = events.withColumn(
            "nk", F.pmod(F.col("user_id"), F.lit(25)).cast("int")
        )
        return (
            e.join(F.broadcast(nation), e.nk == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name", "r_name")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("event_id").alias("id_sum"),
            )
        )

    stream = job(
        events_files_stream(spark, f"{root}/chunks", max_files_per_trigger=1)
    )
    got = _drain(stream, f"{ckroot}/geo_join", "scf_geo_join", "complete")
    exp = job(_batch_events(spark, f"{root}/chunks")).toPandas()
    _cmp(got, exp, "geo_join")


def leg_dims_agg(spark, root, ckroot, seed):
    """DIMS axis through STREAMING (r14): the hostile PART table itself
    replayed as a multi-micro-batch file stream, aggregated by its
    hostile attribute strings (NULL / '' / unicode-soup / whitespace-
    wrapped p_brand) — every prior streaming leg keyed state by clean
    numeric ids or event types; this one keys the streaming HashAgg
    state by dirty strings, with money summed as scaled cents (the
    det.py discipline)."""
    from corpus_gen import gen_dims
    from pyspark.sql import functions as F

    part = gen_dims(seed)["part"]
    os.makedirs(f"{root}/part_chunks", exist_ok=True)
    n = part.num_rows
    cuts = [round(i * n / CHUNKS) for i in range(CHUNKS + 1)]
    t0 = time.time()
    for i in range(CHUNKS):
        p = f"{root}/part_chunks/part-{i:04d}.parquet"
        pq.write_table(part.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
        os.utime(p, (t0 + i, t0 + i))
    schema = spark.read.parquet(f"{root}/part_chunks").schema

    def job(df):
        return df.groupBy("p_brand").agg(
            F.count("*").alias("n"),
            F.sum(
                F.round(F.col("p_retailprice") * 100).cast("long")
            ).alias("price_cents"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )

    stream = job(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/part_chunks")
    )
    got = _drain(stream, f"{ckroot}/dims_agg", "scf_dims_agg", "complete")
    exp = job(spark.read.parquet(f"{root}/part_chunks")).toPandas()
    _cmp(got, exp, "dims_agg")


LEGS = [
    "tumbling",
    "sliding",
    "session",
    "dedup",
    "user_totals",
    "sessionize",
    "cusum",
    "ingest_restart",
    "matview",
    "attribution",
    "classify_docs",
    "kafka",
    "geo_join",
    "dims_agg",
]


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    only = os.environ.get("ONLY", "")
    legs = [L for L in LEGS if only in L]
    if os.environ.get("KAFKA", "1") != "1" and "kafka" in legs:
        legs.remove("kafka")

    from fuzz_differential import HOSTILE_CONF

    from dask_cudf_spark.session import get_spark

    hostile = os.environ.get("HOSTILE", "")
    if hostile not in HOSTILE_CONF:
        raise SystemExit(f"unknown HOSTILE mode: {hostile!r}")
    conf = {"spark.sql.shuffle.partitions": "8"}
    conf.update(HOSTILE_CONF[hostile])
    # FAULT=failonce (r14): every Python-boundary task (incl. the
    # stateful applyInPandasWithState legs) raises on attempt 0 and
    # retries — streaming state must survive task re-execution inside
    # a micro-batch.  Needs local[N,3] (task maxFailures in the master
    # string; the conf is ignored under local[]).
    fault = os.environ.get("FAULT", "")
    master = None
    fault_counter = None
    if fault:
        if fault != "failonce":
            raise SystemExit(f"unknown FAULT mode: {fault!r}")
        import tempfile

        from fault_shims import install

        markers = tempfile.mkdtemp(prefix="streamfuzz-fault-")
        fault_counter = install("failonce", markers)
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus},3]"
    spark = get_spark(
        app_name="stream-corpus-fuzz", master=master, extra_conf=conf
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"== stream corpus fuzz: legs={legs}, {n_seeds} seeds, "
        f"chunks={CHUNKS}, hostile={hostile or '-'} =="
    )

    scratch = f"/tmp/streamfuzz-{os.getpid()}"
    failures: list[tuple[int, str, str]] = []
    ran = 0
    t0 = time.time()
    for seed in range(start, start + n_seeds):
        root = f"{scratch}/s{seed}"
        shutil.rmtree(root, ignore_errors=True)
        info = _prepare_seed(seed, root)
        ckroot = f"{root}/ckpt"
        seed_fail = 0
        for leg in legs:
            ran += 1
            try:
                if leg in ("tumbling", "sliding", "session"):
                    leg_windowed(spark, root, ckroot, leg)
                elif leg == "dedup":
                    leg_dedup(spark, root, ckroot)
                elif leg == "user_totals":
                    leg_user_totals(spark, root, ckroot)
                elif leg == "sessionize":
                    leg_sessionize(spark, root, ckroot)
                elif leg == "cusum":
                    leg_cusum(spark, root, ckroot)
                elif leg == "ingest_restart":
                    leg_ingest_restart(spark, root, ckroot)
                elif leg == "matview":
                    leg_matview(spark, root, ckroot)
                elif leg == "attribution":
                    leg_attribution(spark, root, ckroot)
                elif leg == "classify_docs":
                    leg_classify_docs(spark, root, ckroot)
                elif leg == "kafka":
                    leg_kafka(spark, root, ckroot, seed)
                elif leg == "geo_join":
                    leg_geo_join(spark, root, ckroot, seed)
                elif leg == "dims_agg":
                    leg_dims_agg(spark, root, ckroot, seed)
            except Exception as e:  # noqa: BLE001 — record and continue
                failures.append((seed, leg, str(e)[:400]))
                seed_fail += 1
                print(f"  seed {seed:5d}  {leg}  FAIL: {str(e)[:220]}")
        print(
            f"  seed {seed:5d}  {len(legs) - seed_fail}/{len(legs)} CONVERGED"
            f"  (rows={info['rows']})"
        )
        shutil.rmtree(root, ignore_errors=True)

    wall = time.time() - t0
    print(
        json.dumps(
            {
                "grammar": "corpus-streaming",
                "hostile": hostile,
                "fault": fault or None,
                "fault_boundaries": (
                    fault_counter["n"] if fault_counter else None
                ),
                "seeds": n_seeds,
                "start_seed": start,
                "legs": legs,
                "chunks": CHUNKS,
                "executions": ran,
                "matches": ran - len(failures),
                "failures": [[s, q] for s, q, _ in failures][:40],
                "wall_s": round(wall, 1),
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
