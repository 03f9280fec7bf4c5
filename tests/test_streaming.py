"""Streaming smoke (SURVEY.md §7 phase 5): the same transformation
functions run under readStream (file source, availableNow trigger) must
converge to the batch answer — the Dataflow-model check.  The batch
twins are oracle-gated in test_oracle.py; here we assert stream==batch.
"""

from __future__ import annotations

import pytest

from dask_cudf_spark.sources import load_table
from dask_cudf_spark.streaming import (
    events_stream,
    session_agg,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

from .conftest import SF_DIR
from .oracle_compare import assert_frames_match


def _run_stream_to_pandas(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if not name.endswith("_append") else "append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.table(name).toPandas()


@pytest.mark.parametrize(
    "fn,name",
    [
        (tumbling_counts, "tumbling"),
        (sliding_counts, "sliding"),
        (session_agg, "session"),
    ],
)
def test_stream_converges_to_batch(spark, tmp_path, fn, name):
    batch = fn(load_table(spark, SF_DIR, "events")).toPandas()
    stream = fn(events_stream(spark, SF_DIR))
    got = _run_stream_to_pandas(stream, tmp_path, f"s_{name}")
    assert_frames_match(got, batch, f"stream_{name}")


def test_stream_dedup_smoke(spark, tmp_path):
    stream = stream_dedup(events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("s_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_dedup").toPandas()
    batch_n = load_table(spark, SF_DIR, "events").dropDuplicates(["event_id"]).count()
    assert len(got) == batch_n
    assert got["event_id"].is_unique


def test_stateful_user_totals_converges(spark, tmp_path):
    from dask_cudf_spark.streaming import stateful_user_totals

    batch = stateful_user_totals(load_table(spark, SF_DIR, "events")).toPandas()
    stream = stateful_user_totals(events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("s_stateful")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_stateful"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a key on every batch; keep the last emission
    got = (
        spark.table("s_stateful")
        .toPandas()
        .groupby("user_id", as_index=False)
        .last()
    )
    assert_frames_match(got, batch, "stream_stateful")


def test_stream_static_join_converges(spark, tmp_path):
    from dask_cudf_spark.streaming import event_type_dims, stream_static_enrich

    dims = event_type_dims(spark)
    batch = stream_static_enrich(load_table(spark, SF_DIR, "events"), dims).toPandas()
    stream = stream_static_enrich(events_stream(spark, SF_DIR), dims)
    got = _run_stream_to_pandas(stream, tmp_path, "s_enrich")
    assert_frames_match(got, batch, "stream_static_join")


def test_kafka_reader_plan_builds(spark):
    """The production Kafka source path (SURVEY §2.1): the configured
    reader must carry the kafka format + options.  `.load()` needs the
    spark-sql-kafka package / a broker, neither in the sandbox, so this
    covers everything up to the source boundary."""
    from dask_cudf_spark.streaming.jobs import kafka_events_reader

    reader = kafka_events_reader(
        spark, "broker1:9092,broker2:9092", "events", max_offsets_per_trigger=50_000
    )
    # DataStreamReader internals: format + options captured pre-load
    assert reader._jreader is not None
    try:
        reader.load()
        loaded = True  # classpath has the connector: plan built for real
    except Exception as e:  # no kafka package in sandbox: clean, named error
        loaded = False
        assert "kafka" in str(e).lower()
    assert loaded in (True, False)


def test_parse_kafka_events_wire_format(spark):
    """parse_kafka_events on a batch frame shaped like the Kafka wire
    schema: binary JSON value -> typed events columns.  This is the
    whole transform the streaming path applies after .load()."""
    import json

    from dask_cudf_spark.streaming.jobs import parse_kafka_events

    payloads = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 00:05:00", "user_id": 8,
         "event_type": "purchase", "value": 99.99, "props": '{"k":1}'},
    ]
    wire = spark.createDataFrame(
        [
            (None, json.dumps(p).encode(), "events", 0, i, None)
            for i, p in enumerate(payloads)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    got = parse_kafka_events(wire).toPandas().sort_values("event_id")
    assert list(got.columns) == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    assert got["event_id"].tolist() == [1, 2]
    assert got["event_type"].tolist() == ["click", "purchase"]
    assert abs(got["value"].tolist()[1] - 99.99) < 1e-9


def test_materialize_rollup_matches_batch(spark, tmp_path):
    """Continuous-aggregate parquet sink: stream-materialized rollup ==
    batch rollup (the hypertable / incremental-rollup pattern)."""
    from dask_cudf_spark.streaming import materialize_rollup

    batch = tumbling_counts(load_table(spark, SF_DIR, "events")).toPandas()
    q = materialize_rollup(
        tumbling_counts(events_stream(spark, SF_DIR)),
        path=str(tmp_path / "rollup_pq"),
        checkpoint=str(tmp_path / "ckpt_rollup"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "rollup_pq")).toPandas()
    assert_frames_match(got, batch, "materialized_rollup")


def test_stream_stream_join_converges(spark, tmp_path):
    """Stream-stream interval join (two independent stream handles over
    the same file source) must produce exactly the batch join's pairs."""
    from dask_cudf_spark.streaming import purchase_click_attribution

    ev = load_table(spark, SF_DIR, "events")
    batch = purchase_click_attribution(ev, ev).toPandas()

    pairs = purchase_click_attribution(
        events_stream(spark, SF_DIR), events_stream(spark, SF_DIR)
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("s_ssjoin_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssjoin"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_ssjoin_append").toPandas()
    assert_frames_match(got, batch, "stream_stream_join")


def test_rate_source_micro_batch(spark, tmp_path):
    """Spark's built-in `rate` source — the broker-free generator for
    load-testing streaming topologies: N rows/sec of (timestamp, value).
    Drives the same windowed-count job the events stream uses, proving
    the jobs are source-agnostic (files / kafka / rate)."""
    from pyspark.sql import functions as F

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .option("numPartitions", "2")
        .load()
    )
    counted = (
        rate.withWatermark("timestamp", "1 second")
        .groupBy(F.window("timestamp", "1 second").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        counted.writeStream.format("memory")
        .queryName("rate_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 30
    rows = 0
    while time.time() < deadline:
        rows = spark.table("rate_counts").count()
        if rows >= 1 and spark.table("rate_counts").agg(
            F.sum("n")
        ).collect()[0][0] >= 100:
            break
        time.sleep(0.5)
    q.stop()
    assert rows >= 1
    total = spark.table("rate_counts").agg(F.sum("n")).collect()[0][0]
    assert total >= 100


def test_stateful_user_totals_tws_converges(spark, tmp_path):
    """transformWithStateInPandas (Spark 4.x arbitrary-state successor,
    round-2 VERDICT item 8): batch twin must equal the
    applyInPandasWithState twin unconditionally; the streaming run
    self-skips ONLY on the sandbox's known blocker (no google.protobuf
    for the TWS state protocol — see stateful_user_totals_tws
    docstring) and converges to batch anywhere protobuf exists."""
    from dask_cudf_spark.streaming import (
        stateful_user_totals,
        stateful_user_totals_tws,
    )

    events = load_table(spark, SF_DIR, "events")
    batch = stateful_user_totals_tws(events).toPandas()
    assert_frames_match(
        batch, stateful_user_totals(events).toPandas(), "tws_batch_twin"
    )

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stateful_user_totals_tws(events_stream(spark, SF_DIR))
        q = (
            stream.writeStream.format("memory")
            .queryName("s_stateful_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_stateful_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    except Exception as e:
        msg = str(e)
        # the protobuf ImportError is in the JVM-side "Caused by" chain,
        # which StreamingQueryException does not always surface; the
        # runner-init crash wrapper is the stable visible signature
        if (
            "STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE" in msg
            or "google.protobuf" in msg
            or "driver worker exited unexpectedly" in msg
        ):
            # round 6: compat.ensure_protobuf (called by get_spark)
            # lifts this on hosts with a vendored pure-Python protobuf
            # (e.g. the Google Cloud SDK's), so in THIS sandbox the
            # test normally runs for real.  When it still fails, name
            # the EXACT blocker in the skip reason (r11 VERDICT item 6)
            # so a skip is diagnosable from the pytest line alone.
            import os as _os

            from dask_cudf_spark import compat as _compat

            driver_had = _compat._has_protobuf()
            revived = _compat.ensure_protobuf()
            probed = [_os.environ.get("SPARK_GRAFT_PROTOBUF_PATH")] + list(
                _compat._VENDOR_CANDIDATES
            )
            if not revived:
                blocker = (
                    "google.protobuf absent: no installed wheel and no "
                    "vendored copy at "
                    + ", ".join(p for p in probed if p)
                    + " (set SPARK_GRAFT_PROTOBUF_PATH to a dir holding "
                    "google/protobuf)"
                )
            elif not driver_had:
                blocker = (
                    "vendored protobuf discovered only NOW by "
                    "ensure_protobuf — this SparkSession's JVM launched "
                    "before the PYTHONPATH wire-up, so its streaming "
                    "runner cannot see it; a fresh session would run"
                )
            else:
                try:
                    import google.protobuf as _pb

                    ver = getattr(_pb, "__version__", "unknown")
                except Exception:  # pragma: no cover - defensive
                    ver = "unimportable"
                blocker = (
                    f"google.protobuf {ver} importable in the driver but "
                    "the JVM-spawned runner still failed "
                    f"({msg.splitlines()[0][:120]!r}) — runtime/gencode "
                    "version mismatch is the remaining suspect"
                )
            pytest.skip(f"transformWithState env-blocked: {blocker}")
        raise
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    got = (
        spark.table("s_stateful_tws")
        .toPandas()
        .groupby("user_id", as_index=False)
        .last()
    )
    assert_frames_match(got, batch, "stream_stateful_tws")


def test_stream_stream_left_outer_join_watermark_semantics(spark, tmp_path):
    """Left-OUTER stream-stream join: matched pairs must equal the batch
    inner join exactly; null-augmented (no-prior-click) purchases are
    emitted only once the click-side watermark proves the match missing
    rather than late, so they must be (a) a subset of the batch outer
    join's unmatched purchases and (b) complete for purchases safely
    older than the final watermark (max click ts - 2h delay)."""
    import pandas as pd

    from dask_cudf_spark.streaming import purchase_click_attribution
    from dask_cudf_spark.streaming.jobs import events_stream

    ev = load_table(spark, SF_DIR, "events")
    batch = purchase_click_attribution(ev, ev, how="left_outer").toPandas()
    batch_matched = batch[batch.lag_us.notna()]
    batch_unmatched = batch[batch.lag_us.isna()]

    pairs = purchase_click_attribution(
        events_stream(spark, SF_DIR),
        events_stream(spark, SF_DIR),
        how="left_outer",
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("s_ssjoin_left")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssjoin_left"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_ssjoin_left").toPandas()
    got_matched = got[got.lag_us.notna()]
    got_null = got[got.lag_us.isna()]

    assert_frames_match(got_matched, batch_matched, "ss_left_matched")
    # every emitted null row is a genuinely unmatched purchase
    assert set(got_null.purchase_id) <= set(batch_unmatched.purchase_id)

    # completeness below the final watermark: click watermark delay is
    # 2h (jobs.purchase_click_attribution), so any unmatched purchase
    # whose ts is older than (max click ts - 2h) was provably
    # match-free before the stream ended and MUST have been emitted
    clicks = ev.filter(ev.event_type == "click")
    import pyspark.sql.functions as F

    wm = clicks.agg(F.max("ts")).collect()[0][0] - pd.Timedelta(hours=2)
    purchases = (
        ev.filter(ev.event_type == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "ts")
        .toPandas()
        .set_index("purchase_id")["ts"]
    )
    old_unmatched = {
        pid
        for pid in batch_unmatched.purchase_id
        if purchases[pid] < wm - pd.Timedelta(hours=1)
    }
    assert old_unmatched <= set(got_null.purchase_id), (
        len(old_unmatched - set(got_null.purchase_id)),
        "safely-old unmatched purchases missing from outer output",
    )


def test_kafka_wire_format_streams_end_to_end(spark, tmp_path):
    """Upgrade the broker-less Kafka coverage from construction-tested
    to STREAM-tested: materialize events as Kafka wire-format records
    (binary JSON value + topic/partition/offset/timestamp), stream them
    with the file source, run parse_kafka_events + tumbling_counts on
    the stream, and assert convergence with the same pipeline on the
    batch wire frame.  Everything after `.load()` — the entire
    transformation surface of the Kafka path — runs under readStream
    for real; only the socket to a broker is substituted."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming.jobs import parse_kafka_events

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") < 2000)
    wire = ev.select(
        F.lit(None).cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        ).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 4).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
    )
    wire_dir = str(tmp_path / "wire")
    wire.write.parquet(wire_dir)

    batch = tumbling_counts(parse_kafka_events(spark.read.parquet(wire_dir))).toPandas()

    stream_wire = spark.readStream.schema(
        spark.read.parquet(wire_dir).schema
    ).parquet(wire_dir)
    stream = tumbling_counts(parse_kafka_events(stream_wire))
    got = _run_stream_to_pandas(stream, tmp_path, "s_kafka_wire")
    assert_frames_match(got, batch, "kafka_wire_stream")


def test_exactly_once_ingest_survives_batch_replay(spark, tmp_path):
    """Exactly-once contract: run the ingestion stream to completion,
    then REPLAY a batch through the very same foreachBatch function
    (simulating the crash-after-write / redelivery window in which
    Structured Streaming runs foreachBatch at-least-once) and assert
    the landed table is byte-for-byte unchanged — no duplicates, no
    loss."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming.jobs import (
        events_stream,
        exactly_once_batch_writer,
        ingest_exactly_once,
    )

    out = str(tmp_path / "ingest")
    q = ingest_exactly_once(
        events_stream(spark, SF_DIR),
        out,
        str(tmp_path / "ckpt_ingest"),
        query_name="s_ingest",
    )
    q.awaitTermination(120)

    landed = spark.read.parquet(out)
    batch = load_table(spark, SF_DIR, "events")
    assert landed.count() == batch.count()
    assert landed.select("event_id").distinct().count() == batch.count()
    batch_ids = [r[0] for r in landed.select("__batch_id").distinct().collect()]

    # redeliver the final batch: same rows, same batch id, same writer
    replay_id = max(batch_ids)
    replay_rows = landed.filter(F.col("__batch_id") == replay_id).drop(
        "__batch_id"
    )
    exactly_once_batch_writer(out)(replay_rows, replay_id)

    after = spark.read.parquet(out)
    assert after.count() == batch.count()
    assert after.select("event_id").distinct().count() == batch.count()
    # every original row still present exactly once
    assert (
        after.groupBy("event_id").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_streaming_classifier_inference_converges(spark, tmp_path):
    """Online inference: train centroids batch-side, classify the
    document stream MAP-SIDE (no shuffle, no state), and assert the
    streamed predictions equal the batch run of the same function AND
    agree with the shuffle-based training pipeline's argmin on the
    held-out split."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.streaming.jobs import (
        classify_documents,
        documents_stream,
        train_centroids,
    )

    docs = load_table(spark, SF_DIR, "documents")
    cents = train_centroids(docs)
    assert len(cents) >= 2 and all(len(c) == 16 for _, c in cents)

    batch = classify_documents(docs, cents).toPandas()
    assert len(batch) == docs.count()

    stream = classify_documents(documents_stream(spark, SF_DIR), cents)
    q = (
        stream.writeStream.format("memory")
        .queryName("s_classify")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_classify"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_classify").toPandas()
    assert_frames_match(got, batch, "stream_classify")

    # held-out confusion from the map-side path must equal the
    # registered training pipeline's confusion matrix
    from dask_cudf_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()

    held = (
        spark.createDataFrame(batch)
        .filter(F.col("doc_id") % 5 == 0)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    pipeline = (
        REGISTRY["q_nearest_centroid_classify"].fn(spark, SF_DIR).toPandas()
    )
    assert_frames_match(held, pipeline, "classifier_confusion_parity")


def test_classify_serving_path_hashes_each_token_once(spark):
    """r4 ADVICE: the serving path must compute ONE md5 per token, not
    16 (one per component fold).  The packed-transform + single-fold
    shape leaves exactly one md5 call in the executed plan (it prints
    twice: alias definition + projection listing)."""
    from dask_cudf_spark.sources import load_table
    from dask_cudf_spark.streaming.jobs import (
        classify_documents,
        train_centroids,
    )

    docs = load_table(spark, SF_DIR, "documents")
    cents = train_centroids(docs)
    plan = (
        classify_documents(docs, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert 1 <= plan.count("md5") <= 2, plan.count("md5")


def test_sessionize_stateful_converges_to_batch_gaps(spark, tmp_path):
    """Round-5 arbitrary-state operator: streaming sessionization via
    applyInPandasWithState (the non-protobuf state API) must converge
    to the batch gaps-and-islands sessionization exactly — same
    session boundaries, same per-session event counts.  Runs the file
    replay in MULTIPLE micro-batches is not possible with one parquet
    file, so cross-batch state carry is covered by
    test_stateful_user_totals_converges; this test pins the session
    state machine itself."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_cudf_spark.registry import REGISTRY, _ensure_loaded
    from dask_cudf_spark.streaming import sessionize_stateful

    _ensure_loaded()

    stream = sessionize_stateful(events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("s_sessionize_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("s_sessionize_state")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .groupby(["user_id", "session_start"], as_index=False)
        .last()
    )
    batch = (
        REGISTRY["q_sessionize_gaps"]
        .fn(spark, SF_DIR)
        .select(
            "user_id",
            # MICROSECONDS: the stateful operator's output domain
            # (r13 fix — cast("long") epoch seconds truncated gaps)
            F.unix_micros("session_start").alias("session_start"),
            F.unix_micros("session_end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    g = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.itertuples()
    }
    b = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.itertuples()
    }
    assert g == b, (len(g), len(b), list(g - b)[:3], list(b - g)[:3])
    # every closed session must be final (no later provisional row)
    closed = got[got["closed"]]
    assert (closed.groupby(["user_id", "session_start"]).size() == 1).all()


def test_txlog_stream_ingest_exactly_once(spark, tmp_path):
    """Streaming ingest into the transaction-log table: the stream's
    rows land once, a deliberate foreachBatch REPLAY (the documented
    at-least-once window) is a log-level no-op, and the table's
    snapshot equals the batch input exactly."""
    from dask_cudf_spark.sources.txlog import read_snapshot, table_history
    from dask_cudf_spark.streaming.jobs import (
        ingest_txlog_exactly_once,
        txlog_batch_writer,
    )

    path = str(tmp_path / "txingest")
    q = ingest_txlog_exactly_once(
        events_stream(spark, SF_DIR),
        path,
        str(tmp_path / "ckpt_txingest"),
    )
    q.awaitTermination(120)
    n_batch = load_table(spark, SF_DIR, "events").count()
    assert read_snapshot(spark, path).count() == n_batch
    versions_before = len(table_history(spark, path))
    # replay EVERY batch id the stream committed — all must no-op
    for bid in range(versions_before):
        txlog_batch_writer(path)(
            load_table(spark, SF_DIR, "events").limit(5), bid
        )
    assert len(table_history(spark, path)) == versions_before
    assert read_snapshot(spark, path).count() == n_batch


def test_cusum_stateful_converges_to_batch(spark, tmp_path):
    """Streaming CUSUM (O(1) per-key state over the prefix/running-min
    identity) must converge to q_cusum_drift's per-user rollup exactly
    with the same reference mean and threshold."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.registry import REGISTRY, _ensure_loaded
    from dask_cudf_spark.streaming import cusum_stateful

    _ensure_loaded()
    ev = load_table(spark, SF_DIR, "events")
    k = ev.filter(F.col("event_type") == "purchase").agg(
        F.expr(
            "CAST(sum(CAST(round(value * 100, 0) AS LONG))"
            " div count(1) AS LONG)"
        )
    ).collect()[0][0]
    stream = cusum_stateful(
        events_stream(spark, SF_DIR), k=int(k), threshold=6 * int(k)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("s_cusum")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("s_cusum")
        .toPandas()
        .groupby("user_id", as_index=False)
        .last()
    )
    got = got[got["n_alerts"] > 0].sort_values("user_id")
    batch = (
        REGISTRY["q_cusum_drift"].fn(spark, SF_DIR).toPandas()
    ).sort_values("user_id")
    g = {tuple(r) for r in got.itertuples(index=False)}
    b = {tuple(r) for r in batch.itertuples(index=False)}
    assert g == b, (len(g), len(b), list(g - b)[:2], list(b - g)[:2])


def test_stream_matview_converges_and_replay_is_noop(spark, tmp_path):
    """Streaming materialized view (round 7): the stream ingests into
    a txlog source exactly-once AND incrementally refreshes the
    grouped view per micro-batch.  After the stream drains, the view
    equals the batch groupBy over all events; replaying a committed
    batch through the same foreachBatch body changes NOTHING (the
    commit no-ops on batch_id, so src_version holds, so the refresh
    no-ops too — the two idempotence contracts compose)."""
    from pyspark.sql import functions as F

    from dask_cudf_spark.sources.matview import (
        matview_is_fresh,
        read_matview,
        refresh_matview,
    )
    from dask_cudf_spark.sources.txlog import commit, table_history
    from dask_cudf_spark.streaming.jobs import stream_matview

    src = str(tmp_path / "smv_src")
    dst = str(tmp_path / "smv_view")
    aggs = {
        "n": ("count", None),
        "total_c": ("sum", "cents"),
        "hi": ("max", "event_id"),
    }
    stream = events_stream(spark, SF_DIR).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    q = stream_matview(
        stream, src, dst, str(tmp_path / "ckpt_smv"), ["event_type"], aggs
    )
    q.awaitTermination(120)

    ev = load_table(spark, SF_DIR, "events")
    exp = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "total_c"
            ),
            F.max("event_id").alias("hi"),
        )
        .orderBy("event_type")
        .collect()
    )
    got = read_matview(spark, dst).orderBy("event_type").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]
    assert matview_is_fresh(spark, src, dst)

    # replay: same batch_id -> commit no-op -> refresh no-op
    src_versions = len(table_history(spark, src))
    dst_versions = len(table_history(spark, dst))
    replay = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .limit(7)
    )
    commit(replay, src, "append", batch_id=0)
    r = refresh_matview(spark, src, dst, ["event_type"], aggs)
    assert r["mode"] == "noop"
    assert len(table_history(spark, src)) == src_versions
    assert len(table_history(spark, dst)) == dst_versions
    assert [x.asDict() for x in
            read_matview(spark, dst).orderBy("event_type").collect()] == [
        x.asDict() for x in exp
    ]


@pytest.mark.slow
def test_kafka_txlog_matview_soak_exactly_once(spark, tmp_path):
    """Sustained-replay soak (r10 VERDICT item 6): 100+ micro-batches
    through the jar-free Kafka source -> txlog -> incrementally
    maintained matview, with the query STOPPED AND RESTARTED mid-drain
    at arbitrary boundaries and already-committed batch ids
    deliberately re-delivered through the same foreachBatch writer —
    the at-least-once window 100-TB ingestion actually lives in.

    Exactly-once claim pinned: after every restart/replay the txlog
    holds each produced record precisely once, version count equals
    distinct committed batch ids, and the view equals a model
    recompute.  Production is interleaved WITH draining (backlog stays
    chunk-sized) so maxOffsetsPerTrigger keeps batches small and the
    batch count genuinely exceeds 100 — a pre-produced backlog would
    collapse into a handful of uncapped first batches."""
    import random as _random
    import time as _time

    from pyspark.sql import functions as F

    from dask_cudf_spark.sources.matview import read_matview, refresh_matview
    from dask_cudf_spark.sources.txlog import (
        _read_log,
        read_snapshot,
        table_history,
    )
    from dask_cudf_spark.sources.txlog import commit as tx_commit
    from dask_cudf_spark.streaming.kafka_protocol import (
        InProcBroker,
        KafkaClient,
    )
    from dask_cudf_spark.streaming.kafka_source import register_kafka_source

    rng = _random.Random(11)
    topic, nparts = "soak", 2
    broker = InProcBroker(num_partitions=nparts)
    broker.ensure_topic(topic)
    register_kafka_source(spark)
    src = str(tmp_path / "soak_table")
    dst = str(tmp_path / "soak_view")
    ckpt = str(tmp_path / "ckpt_soak")
    aggs = {"n": ("count", "k"), "s": ("sum", "v")}

    produced = 0

    def produce_chunk(n):
        nonlocal produced
        buckets = {}
        for k in range(produced, produced + n):
            payload = f"{k}|{k % 5}|{k % 17}".encode()
            buckets.setdefault(k % nparts, []).append(
                (str(k).encode(), payload)
            )
        with KafkaClient(broker.bootstrap) as cli:
            for pid, recs in sorted(buckets.items()):
                cli.produce(topic, pid, recs, timestamp_ms=1_700_000_000_000)
        produced += n

    def write_and_maybe_refresh(batch_df, batch_id):
        from dask_cudf_spark.sources.txlog import CommitConflict

        sp = batch_df.sparkSession
        fields = F.split(F.col("value").cast("string"), r"\|")
        rows = batch_df.select(
            fields.getItem(0).cast("bigint").alias("k"),
            fields.getItem(1).cast("bigint").alias("g"),
            fields.getItem(2).cast("bigint").alias("v"),
        )
        # supervised retry: a stop/restart overlap can leave the OLD
        # query's foreachBatch committing concurrently with this one
        # for a moment; the txlog loser fails CLEANLY (exclusive
        # create + in-commit jittered backoff) and re-calling commit
        # is safe — batch_id idempotence de-dups whoever won.  This
        # outer loop is the supervision a production pipeline wraps
        # around any optimistic-concurrency sink.
        for outer in range(3):
            try:
                tx_commit(rows, src, "append", batch_id=int(batch_id))
                break
            except CommitConflict:
                if outer == 2:
                    raise
        if int(batch_id) % 5 == 0:
            refresh_matview(sp, src, dst, ["g"], aggs, key="k")

    def start_query():
        raw = (
            spark.readStream.format("kafka_py")
            .option("bootstrap", broker.bootstrap)
            .option("subscribe", topic)
            .option("maxOffsetsPerTrigger", "12")
            .load()
        )
        return (
            raw.writeStream.foreachBatch(write_and_maybe_refresh)
            .option("checkpointLocation", ckpt)
            .queryName("s_soak")
            .trigger(processingTime="0 seconds")
            .start()
        )

    def landed():
        try:
            return read_snapshot(spark, src).count()
        except FileNotFoundError:
            return 0

    def wait_drained(timeout=120.0):
        t0 = _time.time()
        while _time.time() - t0 < timeout:
            if landed() >= produced:
                return
            _time.sleep(0.5)
        raise AssertionError(
            f"soak drain stalled: {landed()}/{produced} after {timeout}s"
        )

    n_chunks, chunk, restarts, dup_replays = 24, 150, 0, 0
    q = start_query()
    try:
        for i in range(n_chunks):
            produce_chunk(chunk)
            if i % 3 == 2:
                # restart at an ARBITRARY boundary: stop mid-drain
                # (fresh records are still landing), re-deliver an
                # already-committed batch id through the same writer,
                # then resume from the checkpoint
                _time.sleep(rng.uniform(0.2, 1.5))
                q.stop()
                q.awaitTermination(60)
                restarts += 1
                log = _read_log(spark, src)
                if log:
                    versions_before = len(log)
                    bid = rng.choice(
                        [e["batch_id"] for e in log
                         if e.get("batch_id") is not None]
                    )
                    dup = spark.sql(
                        "SELECT CAST(-1 AS BIGINT) AS k, CAST(0 AS BIGINT)"
                        " AS g, CAST(999 AS BIGINT) AS v"
                    )
                    tx_commit(dup, src, "append", batch_id=int(bid))
                    dup_replays += 1
                    assert len(_read_log(spark, src)) == versions_before, (
                        "duplicate batch replay minted a new version"
                    )
                q = start_query()
            wait_drained()
    finally:
        q.stop()
        q.awaitTermination(60)

    # exactly-once: every record landed precisely once, nothing extra
    snap = read_snapshot(spark, src)
    total = snap.count()
    assert total == produced == n_chunks * chunk
    assert snap.select("k").distinct().count() == produced
    assert (
        snap.groupBy("k").count().filter(F.col("count") > 1).count() == 0
    )
    hist = table_history(spark, src)
    n_batches = len(hist)
    assert n_batches >= 100, f"only {n_batches} micro-batches committed"
    bids = [e.get("batch_id") for e in _read_log(spark, src)]
    assert len(set(bids)) == len(bids), "a batch id committed twice"
    assert restarts >= 5 and dup_replays >= 5

    # the view equals a model recompute after a final catch-up refresh
    refresh_matview(spark, src, dst, ["g"], aggs, key="k")
    got = sorted(
        (r["g"], r["n"], r["s"]) for r in read_matview(spark, dst).collect()
    )
    model = {}
    for k in range(produced):
        n, s = model.get(k % 5, (0, 0))
        model[k % 5] = (n + 1, s + k % 17)
    want = sorted((g, n, s) for g, (n, s) in model.items())
    assert got == want, (got, want)
    print(
        f"SOAK {{\"rows\": {produced}, \"batches\": {n_batches}, "
        f"\"restarts\": {restarts}, \"dup_replays\": {dup_replays}}}"
    )


def test_stream_corpus_null_value_legs(spark, tmp_path):
    """r13 regression pin for the streaming-corpus findings: the
    hostile events corpus (NULL values, NULL/empty event types, tie
    storms) replayed in MULTI-micro-batch mode through the stateful
    paths must converge to the batch twins.  Seed 10000 is the seed
    whose NULL `value` rows crashed stateful_user_totals before the
    dropna fix (NaN -> int64 garbage overflowing the int64 state
    column) and raised int(NaN) in cusum_stateful; one seed x three
    legs keeps the pin cheap while the recorded FUZZ legs cover the
    breadth."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from stream_corpus_fuzz import (
        _prepare_seed,
        leg_cusum,
        leg_dedup,
        leg_user_totals,
    )

    root = str(tmp_path / "scf")
    _prepare_seed(10000, root)
    ck = str(tmp_path / "ck")
    leg_user_totals(spark, root, ck)
    leg_cusum(spark, root, ck)
    leg_dedup(spark, root, ck)
