"""Stream transformations usable on batch or streaming DataFrames.

Watermarks are applied only when the input is streaming (they are
meaningless on batch frames); everything else is identical code — the
Dataflow-model guarantee that a stream over finite input converges to
the batch answer is what tests/test_streaming.py asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import scaled_int


#: JSON payload schema for events on a Kafka topic (one event per
#: record value); mirrors events.parquet minus the wire-level columns
#: Kafka itself provides (topic/partition/offset/timestamp).
KAFKA_EVENTS_JSON_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def kafka_events_reader(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """Configured ``readStream.format('kafka')`` reader (the reference's
    custreamz Kafka micro-batch source, upstream: custreamz/kafka.py).
    Returned WITHOUT ``.load()`` so the plan can be built and tested
    where the spark-sql-kafka package / a broker is unavailable; callers
    chain ``.load()`` then ``parse_kafka_events``.

    Environment note (re-probed round 6, 2026-08-14): this sandbox's
    pyspark ships NO spark-sql-kafka connector jar (``pyspark/jars`` has
    no kafka artifact) and has no network to fetch one, so even a
    loopback stub broker could not exercise ``.load()`` — this
    ``format("kafka")`` path is therefore tested to reader construction
    + wire-format parse only.  On any normal deployment (``--packages
    org.apache.spark:spark-sql-kafka-0-10_2.13``) the returned reader
    is the complete working source.

    CLOSED JAR-FREE in round 7: ``format("kafka_py")``
    (streaming/kafka_source.py) is a pure-Python Kafka wire-protocol
    source+sink over Spark 4's Python DataSource API with the same
    schema and option names — exercised END TO END (produce, fetch,
    exactly-once micro-batches, backpressure, checkpoint restart)
    against an in-process protocol-faithful broker, and oracle-green
    as ``q_kafka_roundtrip``.  Prefer the jar connector where it
    exists (JVM-side fetch, no Python hop); ``kafka_py`` is the
    drop-in for jar-less environments.

    maxOffsetsPerTrigger is the backpressure knob: at cluster scale it
    bounds each micro-batch so one slow batch can't snowball."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka wire frame (key/value binary + topic/partition/offset/
    timestamp) -> typed events frame.  Works on any DataFrame with the
    Kafka source's schema, streaming or batch — tests feed it a batch
    frame shaped like the wire format, so the parse logic is fully
    covered without a broker."""
    payload = F.from_json(
        F.col("value").cast("string"), KAFKA_EVENTS_JSON_SCHEMA
    ).alias("e")
    return raw.select(payload).select("e.*")


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    source: str = "files",
    brokers: str = "localhost:9092",
    topic: str = "events",
) -> DataFrame:
    """Micro-batch event stream.  source='files' replays events.parquet
    as a file-source stream (the sandbox stand-in); source='kafka' is
    the production path: readStream.format('kafka') -> JSON parse to the
    same schema, so every downstream job is source-agnostic."""
    if source == "kafka":
        raw = kafka_events_reader(
            spark, brokers, topic, max_offsets_per_trigger=max_files_per_trigger
        ).load()
        return parse_kafka_events(raw)

    return events_files_stream(
        spark,
        sf_dir,
        max_files_per_trigger=max_files_per_trigger,
        path_glob="events.parquet",
    )


def events_files_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
    path_glob: str | None = None,
) -> DataFrame:
    """Events file-source stream over a DIRECTORY of parquet files with
    the events schema — `events_stream`'s replay path, factored out so
    a MULTI-file directory can drive genuinely multi-micro-batch
    replays (maxFilesPerTrigger=1 -> one micro-batch per file).  The
    r13 streaming-corpus fuzz leg feeds per-seed hostile event chunks
    through this; production-wise it is the classic landing-zone
    ingest (new files appear, each becomes a micro-batch).

    Cross-batch ordering note: the file source orders batches by file
    modification time (then path); callers that rely on per-user
    event-time order across micro-batches (sessionize_stateful) must
    write chunk files in event-time order with non-decreasing mtimes.
    """
    probe = f"{directory}/{path_glob}" if path_glob else directory
    # the NTZ->TIMESTAMP cast below interprets naive micros in the
    # SESSION timezone — pin UTC for the session's LIFETIME, the same
    # deliberate session-wide contract as sources.tables.load_table.
    # Unlike nanosAsLong below (restored after the schema probe), this
    # must NOT be restored: the cast is re-evaluated in every
    # micro-batch for as long as the stream runs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # same ns->us normalization as sources.tables.load_table; scoped so
    # the session-wide conf is restored after the schema probe
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(probe).schema
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    reader = spark.readStream.schema(schema)
    if path_glob:
        # the file source wants a directory; glob-filter to the file
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(directory)
    if stream.schema["ts"].dataType.simpleString() == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif stream.schema["ts"].dataType.simpleString() == "timestamp_ntz":
        # same normalization as sources.tables.load_table: naive µs
        # parquet timestamps -> TIMESTAMP under the UTC session tz
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _maybe_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, width: str = "1 day") -> DataFrame:
    """Tumbling event-time window per event_type."""
    ev = _maybe_watermark(events, "ts", "1 hour")
    return (
        ev.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_int("value", 10000)) / 10000.0).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time window (absent in the reference)."""
    ev = _maybe_watermark(events, "ts", "1 hour")
    return (
        ev.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (absent in the reference): session ends
    after `gap` of inactivity; end = last event + gap."""
    ev = _maybe_watermark(events, "ts", "1 hour")
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_int("value", 10000)) / 10000.0).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(events: DataFrame, within: str = "1 hour") -> DataFrame:
    """Stateful dedup on event_id (reference has none).  On a stream the
    watermark bounds state; on batch it degrades to dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful aggregation (reference custreamz kept Python
    state per key; here: ``applyInPandasWithState``): per-user running
    event count and value total, carried in explicit GroupState across
    micro-batches.  On batch input it computes the same totals with a
    plain aggregation (the Dataflow-model twin the oracle can check).

    Value is accumulated as a scaled int64 (functions/det.py discipline)
    so stream and batch agree bit-for-bit regardless of batch slicing.
    """
    out_schema = "user_id bigint, n_events bigint, total_value double"
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_int("value", 10000)) / 10000.0).alias("total_value"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import numpy as np

        n, total_scaled = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # floor(x*s + 0.5): half-UP, mirroring scaled_int exactly —
            # pandas .round() is half-to-even and would diverge from the
            # batch path on exact-.5 scaled values.
            # dropna BEFORE the int64 cast (r13 streaming-corpus leg,
            # seed 10000): the batch twin's F.sum SKIPS null values
            # while F.count("*") counts the row; without the mask a
            # NULL rides as NaN, the int64 cast silently yields
            # ~Long.MIN garbage, and a second null-bearing batch
            # overflows the int64 STATE column and kills the stream.
            total_scaled += int(
                np.floor(
                    pdf["value"].dropna().to_numpy() * 10000 + 0.5
                ).astype("int64").sum()
            )
        state.update((n, total_scaled))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_scaled / 10000.0],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="n bigint, total_scaled bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4.x ``transformWithStateInPandas`` successor of
    :func:`stateful_user_totals` (SURVEY §2.9): the same per-user
    running (count, scaled-int total) carried in a typed ValueState
    inside a StatefulProcessor, so stream and batch agree bit-for-bit.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``; rocksdbjni ships with
    Spark 4) — transformWithState is not supported by the default HDFS
    provider.  Callers set the conf before starting the query so the
    choice stays scoped to their stream.  On batch input it computes
    the identical totals with a plain aggregation (the Dataflow-model
    twin the oracle checks via q_stream_stateful).

    Environment note (updated round 6, 2026-08-14): the TWS state
    protocol talks protobuf between the JVM state server and the
    Python worker.  ``google.protobuf`` has no installed wheel in this
    sandbox, but :func:`dask_cudf_spark.compat.ensure_protobuf`
    (invoked by ``session.get_spark`` before the JVM launches) wires in
    a vendored pure-Python runtime when one exists on the host — which
    it does here — so the streaming path NOW RUNS END-TO-END and the
    convergence test passes for real (it previously self-skipped on
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE; the skip remains
    only as a fallback for hosts with no protobuf anywhere).
    """
    out_schema = "user_id bigint, n_events bigint, total_value double"
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_int("value", 10000)) / 10000.0).alias("total_value"),
        )

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # class defined in function scope -> cloudpickle ships it BY VALUE,
    # so workers never import this module (see verify-skill round-2 bug)
    class _Totals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "totals", "n bigint, total_scaled bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            import numpy as np
            import pandas as pd

            n, total_scaled = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                # floor(x*s + 0.5): half-UP, mirroring scaled_int (see
                # stateful_user_totals); dropna before the int64 cast
                # for the same NULL-value contract (r13 corpus leg)
                total_scaled += int(
                    np.floor(pdf["value"].dropna().to_numpy() * 10000 + 0.5)
                    .astype("int64")
                    .sum()
                )
            self._state.update((n, total_scaled))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_scaled / 10000.0],
                }
            )

        def close(self):
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def stream_static_enrich(events: DataFrame, dims: DataFrame) -> DataFrame:
    """Stream-static join (SURVEY.md §2.9; absent in the reference): a
    streaming fact joined to a static broadcast dimension — the standard
    enrichment topology.  The static side is planned once and broadcast
    to every micro-batch; works identically on a batch frame."""
    return (
        events.join(F.broadcast(dims), on="event_type")
        .groupBy("event_type", "type_class")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(scaled_int("value", 10000)) / 10000.0).alias("sum_value"),
        )
    )


def event_type_dims(spark: SparkSession) -> DataFrame:
    """Tiny static dimension for the enrichment demo: event_type ->
    class (conversion vs engagement vs problem)."""
    return spark.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "problem"),
        ],
        ["event_type", "type_class"],
    )


def materialize_rollup(
    stream_df: DataFrame, path: str, checkpoint: str, query_name: str = "rollup"
):
    """Continuous-aggregate sink (the hypertable-rollup pattern): each
    micro-batch rewrites the materialized rollup parquet atomically via
    foreachBatch — readers always see a complete, current rollup.
    Works with complete-mode aggregations (no watermark needed); for
    append-mode flows swap the overwrite for an idempotent
    partition-overwrite on the window column.

    Returns the StreamingQuery (caller awaits termination)."""

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def purchase_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (SURVEY.md §2.9; the reference's
    custreamz has no join operator — this is the Spark-native upgrade):
    each purchase is joined to the same user's clicks in the preceding
    ``horizon`` (0 <= purchase_ts - click_ts < horizon).

    In streaming mode BOTH sides carry watermarks and the join condition
    is time-bounded, so Spark can expire click state older than
    (watermark - horizon) — state stays O(clicks per horizon), not
    O(stream length).  On batch frames the same code plans as a
    SortMergeJoin keyed on user_id with the range predicate applied
    post-match: one shuffle per side, no broadcast (both sides are
    facts), skew-safe under AQE.

    ``how='left_outer'`` keeps purchases with NO prior click (lag_us
    null) — the outer stream-stream join Spark emits once the watermark
    passes the join horizon, i.e. when a missing match is provably
    missing rather than merely late.  Same state bound as the inner
    join.

    Pass two *independent* stream instances for the streaming case (two
    readStream handles over the same source), which sidesteps
    self-join-on-one-handle restrictions and mirrors the production
    topology (two topics)."""
    p = (
        _maybe_watermark(purchases, "ts", "1 hour")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        _maybe_watermark(clicks, "ts", "2 hours")
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["c_ts"] <= p["p_ts"])
        & (c["c_ts"] > p["p_ts"] - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond, how).select(
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )


def exactly_once_batch_writer(path: str):
    """foreachBatch body for exactly-once parquet ingestion: each
    micro-batch lands in its OWN hive partition (__batch_id=N) via
    dynamic partition overwrite, so a replayed batch (worker crash
    after write, before the checkpoint commit — Structured Streaming's
    documented at-least-once foreachBatch window) rewrites exactly its
    own partition with identical content instead of appending
    duplicates.  This is the canonical batchId-idempotence recipe from
    the Structured Streaming programming guide, on plain parquet with
    no table-format dependency.

    Exposed as a factory so tests can drive the SAME function the sink
    uses and replay a batch deliberately."""
    from ..sources.writers import upsert_partitions

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitions(
            batch_df.withColumn("__batch_id", F.lit(int(batch_id))),
            path,
            partition_on=["__batch_id"],
        )

    return write_batch


def ingest_exactly_once(
    stream_df: DataFrame, path: str, checkpoint: str, query_name: str = "ingest"
):
    """Append-mode exactly-once ingestion sink: foreachBatch +
    per-batch-partition idempotent upsert (see exactly_once_batch_writer).
    Returns the StreamingQuery (caller awaits termination)."""
    return (
        stream_df.writeStream.foreachBatch(exactly_once_batch_writer(path))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file-source micro-batch stream (the
    sandbox stand-in for a document-ingest topic), mirroring
    events_stream's construction."""
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def classify_documents(docs: DataFrame, centroids) -> DataFrame:
    """Online nearest-centroid inference: score each document against
    the trained centroid table ENTIRELY map-side — the feature-hash
    vector (q_feature_hash_embed's md5 dimension/sign, 1e6-scaled) is
    folded per row from the token array, distances to the centroid
    LITERALS are integer expressions, and the argmin is an array sort.
    No shuffle, no state: the same function classifies a batch frame or
    a readStream micro-batch (append mode) unchanged — this is the
    serving-path twin of q_nearest_centroid_classify's training
    pipeline, and the map-side vector arithmetic is exactly the sparse
    pipeline's (integer sums commute), which the convergence test
    asserts.

    ``centroids``: list of (lang, [16 scaled-int components]) from the
    training aggregation (driver-collected like every codebook here).

    Hot-path cost (r4 ADVICE fix): each token is md5-hashed exactly
    ONCE — the token array maps to packed (idx << 1 | signflag) longs
    in a single transform, then ONE fold accumulates all 16 vector
    components into an array.  Both intermediates live in their own
    projection as a multi-referenced non-cheap alias, which
    CollapseProject refuses to inline, so the optimizer cannot
    re-duplicate the hash into the 16 component consumers (the old
    shape folded 16 independent aggregates = 16 md5 per token)."""
    from ..functions.text import md5_long

    toks = F.split(F.col("text"), " ")

    def pack(t):
        th = md5_long(t)
        # bits 1..4: dimension idx; bit 0: sign flag (1 => -1)
        return th.bitwiseAND(F.lit(15)) * 2 + F.shiftright(th, 4).bitwiseAND(
            F.lit(1)
        )

    def fold_components(acc, x):
        return F.transform(
            acc,
            lambda v, j: v
            + F.when(
                F.shiftright(x, 1) == j,
                1 - 2 * x.bitwiseAND(F.lit(1)),
            ).otherwise(F.lit(0)),
        )

    staged = docs.withColumn(
        "__fhvec",
        F.aggregate(
            F.transform(toks, pack),
            F.array_repeat(F.lit(0).cast("long"), 16),
            fold_components,
        ),
    )
    vs = [
        F.element_at(F.col("__fhvec"), i + 1) * 1000000 for i in range(16)
    ]
    scored = F.array(
        *[
            F.struct(
                sum(
                    ((v - F.lit(int(c))) * (v - F.lit(int(c))))
                    for v, c in zip(vs, cvec)
                ).alias("dist"),
                F.lit(lang).alias("lang"),
            )
            for lang, cvec in sorted(centroids)
        ]
    )
    best = F.element_at(F.array_sort(scored), 1)
    return staged.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        best["lang"].alias("pred_lang"),
    )


def train_centroids(docs: DataFrame) -> list:
    """Train split (doc_id % 5 != 0) Rocchio centroids in the scaled
    feature-hash space — the training half of
    q_nearest_centroid_classify, returned as driver-side literals for
    classify_documents' serving path."""
    from ..functions.text import md5_long

    tok = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    h = md5_long(F.col("token"))
    comp = (
        tok.select(
            "doc_id",
            "lang",
            h.bitwiseAND(F.lit(15)).alias("idx"),
            F.when(F.shiftright(h, 4).bitwiseAND(F.lit(1)) == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sign"),
        )
        .groupBy("doc_id", "lang", "idx")
        .agg((F.sum("sign") * 1000000).cast("long").alias("V"))
    )
    n_train = (
        docs.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )
    cent = (
        comp.join(F.broadcast(n_train), "lang")
        .groupBy("lang", "idx")
        .agg((F.sum("V") / F.min("n")).cast("long").alias("C"))
        .collect()
    )
    dense: dict = {}
    for r in cent:
        dense.setdefault(r["lang"], [0] * 16)[r["idx"]] = int(r["C"])
    return sorted(dense.items())


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 30 * 60
) -> DataFrame:
    """Arbitrary-state streaming sessionization via
    ``applyInPandasWithState`` — the custom stateful operator the
    reference exposes through its streaming aggregation surface
    (SURVEY.md §2.9), on the Spark state-store API that works WITHOUT
    the protobuf dependency (transformWithStateInPandas needs
    google.protobuf, absent in this sandbox; applyInPandasWithState
    speaks the Arrow state protocol — probed round 5).

    State per user: the OPEN session (start, last_ts, n_events).  Each
    micro-batch merges its rows in event-time order; an inactivity gap
    > gap_seconds closes the current session (emitted final) and opens
    a new one; the still-open session is emitted provisionally every
    time it changes, so in update mode the LAST row per (user_id,
    session_start) converges to exactly the batch gaps-and-islands
    sessionization (q_sessionize_gaps) — the convergence test's
    contract.  Assumes per-user event-time ordering across micro-
    batches (true for the file replay; a production topic adds a
    watermark-sorted buffer stage in front).

    Scale: state is O(1) per user (three longs), the per-batch work is
    a sorted scan of that user's new rows, and the shuffle is the same
    single user_id exchange the batch twin pays."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        out = []
        gap_us = gap_seconds * 1_000_000
        for pdf in pdfs:
            for ts in sorted(pdf["ts_long"]):
                ts = int(ts)
                if start is None:
                    start, last, n = ts, ts, 1
                elif ts - last > gap_us:
                    out.append((key[0], start, last, n, True))
                    start, last, n = ts, ts, 1
                else:
                    last, n = ts, n + 1
        if start is not None:
            state.update((start, last, n))
            out.append((key[0], start, last, n, False))
        return iter(
            [
                pd.DataFrame(
                    out,
                    columns=[
                        "user_id",
                        "session_start",
                        "session_end",
                        "n_events",
                        "closed",
                    ],
                )
            ]
        )

    # MICROSECONDS, not cast("long") epoch seconds (r13 streaming-
    # corpus leg, seed 10017): a gap of 1800.8 s truncates to exactly
    # 1800 whole seconds, which is NOT > gap, so the seconds-domain
    # state machine merged two sessions the microsecond-exact batch
    # twin (q_sessionize_gaps, fixed r11) keeps apart.  The same
    # sub-second-precision class, one operator later.  session_start /
    # session_end are therefore epoch MICROSECONDS in the output.
    rows = events.select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_long")
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, session_start long, session_end long, "
        "n_events long, closed boolean",
        "start long, last long, n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def txlog_batch_writer(path: str):
    """foreachBatch body for exactly-once ingestion into a
    transaction-log table (sources.txlog): each micro-batch commits
    with its batch_id, so a replayed batch (the at-least-once
    foreachBatch window) is a log-level no-op instead of duplicate
    rows — the same idempotence contract as exactly_once_batch_writer,
    but with snapshot isolation and time travel on the result."""
    from ..sources.txlog import commit

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        commit(batch_df, path, "append", batch_id=int(batch_id))

    return write_batch


def ingest_txlog_exactly_once(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str = "txlog-ingest",
):
    """Exactly-once streaming ingestion into a txlog table; returns
    the StreamingQuery (caller awaits termination)."""
    return (
        stream_df.writeStream.foreachBatch(txlog_batch_writer(path))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_matview(
    stream_df: DataFrame,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    group_cols: list,
    aggs: dict,
    query_name: str = "stream-matview",
):
    """Streaming MATERIALIZED VIEW (round 7): each micro-batch commits
    exactly-once into the txlog source (batch_id idempotence), then
    incrementally refreshes the grouped-aggregate view
    (sources.matview) — so the view trails the stream by at most one
    micro-batch while every refresh reads only that batch's commit.

    The exactly-once contracts COMPOSE: a replayed batch no-ops at the
    commit (same batch_id), which leaves src_version unchanged, which
    makes the refresh a no-op too — the view can never double-count
    the at-least-once foreachBatch window.  This is the
    Kappa-architecture serving table: streaming ingest + incremental
    maintenance + snapshot-isolated readers, all on plain parquet.

    Returns the StreamingQuery (caller awaits termination)."""
    from ..sources.matview import refresh_matview
    from ..sources.txlog import commit

    def write_and_refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        commit(batch_df, src_path, "append", batch_id=int(batch_id))
        refresh_matview(spark, src_path, dst_path, group_cols, aggs)

    return (
        stream_df.writeStream.foreachBatch(write_and_refresh)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def cusum_stateful(events: DataFrame, k: int, threshold: int) -> DataFrame:
    """Streaming CUSUM drift detector (Page 1954) via
    applyInPandasWithState: per user, state carries the running
    (prefix, min_prefix, n_obs, max_cusum, n_alerts) of the deviation
    stream x - k, so the batch identity S = prefix - min(0, running
    min prefix) continues EXACTLY across micro-batches with O(1) state
    — the online twin of q_cusum_drift (same k and threshold converge
    to the same per-user rollup; the convergence test pins it).

    Emits the user's updated rollup each batch (update mode; final row
    per user is the answer)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            pfx, mn, n, mx, alerts = state.get
        else:
            pfx, mn, n, mx, alerts = 0, 0, 0, 0, 0
        rows = []
        for pdf in pdfs:
            for _, r in (
                pdf.sort_values(["ts_long", "event_id"]).iterrows()
            ):
                # NULL cents (a purchase with NULL value) mirrors the
                # batch twin exactly (r13 streaming-corpus leg): the
                # window's SUM(cents - k) SKIPS the null term — prefix
                # unchanged, including the -k — but the row still gets
                # a cusum evaluated at that prefix and counts in n_obs
                # and the alert CASE.  int(NaN) would raise here.
                if not pd.isna(r["cents"]):
                    pfx += int(r["cents"]) - k
                mn = min(mn, pfx)
                s = pfx - min(0, mn)
                n += 1
                mx = max(mx, s)
                if s > threshold:
                    alerts += 1
        state.update((pfx, mn, n, mx, alerts))
        rows.append((key[0], n, mx, alerts))
        return iter(
            [
                pd.DataFrame(
                    rows,
                    columns=["user_id", "n_obs", "max_cusum", "n_alerts"],
                )
            ]
        )

    x = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        # MICROSECONDS for the sort key (same r13 truncation class as
        # sessionize_stateful, latent here: cast("long") epoch seconds
        # collapses sub-second order among DISTINCT timestamps; the
        # batch twin orders by full-precision ts, event_id)
        F.unix_micros(F.col("ts")).alias("ts_long"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return x.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_obs long, max_cusum long, n_alerts long",
        "pfx long, mn long, n long, mx long, alerts long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
