"""Batch twins of the streaming jobs (SURVEY.md §2.9, §7 phase 5).

Each query runs the *same* transformation function as the streaming
smoke test (dask_cudf_spark/streaming/jobs.py) on the batch events
table, so the DuckDB oracle checks the streaming logic's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from ..streaming.jobs import session_agg, sliding_counts, tumbling_counts

_V4 = "CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)"


@register(
    "q_stream_tumbling",
    family="streaming",
    oracle=f"""
        SELECT
            time_bucket(INTERVAL '1 day', ts) AS window_start,
            time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
            event_type,
            COUNT(*) AS n_events,
            (SUM({_V4}) / 10000.0) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window per event_type (custreamz manual accumulation ->
    F.window)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), width="1 day")


@register(
    "q_stream_sliding",
    family="streaming",
    oracle="""
        WITH shifted AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start
            FROM events, UNNEST([0, 1]) AS t(k)
        )
        SELECT
            window_start,
            window_start + INTERVAL '1 hour' AS window_end,
            COUNT(*) AS n_events
        FROM shifted
        GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 1h/30m: every event lands in exactly 2 windows; the
    oracle materializes both bucket starts explicitly."""
    return sliding_counts(
        load_table(spark, sf_dir, "events"), width="1 hour", slide="30 minutes"
    )


@register(
    "q_stream_session",
    family="streaming",
    oracle=f"""
        WITH m AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        )
        SELECT
            user_id,
            MIN(ts) AS session_start,
            MAX(ts) + INTERVAL '30 minutes' AS session_end,
            COUNT(*) AS n_events,
            (SUM({_V4}) / 10000.0) AS sum_value
        FROM s
        GROUP BY user_id, sid
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30m gap) per user; oracle is the gaps-and-islands
    SQL with Spark's boundary semantics (gap >= 30m starts a new
    session; session_end = last event + gap)."""
    return session_agg(load_table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "q_stream_stateful",
    family="streaming",
    oracle=f"""
        SELECT
            user_id,
            COUNT(*) AS n_events,
            (SUM({_V4}) / 10000.0) AS total_value
        FROM events
        GROUP BY user_id
    """,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the arbitrary-stateful operator
    (streaming/jobs.stateful_user_totals; applyInPandasWithState on a
    stream).  The scaled-int accumulation makes stream slicing
    irrelevant to the result, so one oracle covers both modes."""
    from ..streaming.jobs import stateful_user_totals

    return stateful_user_totals(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_static_join",
    family="streaming",
    oracle=f"""
        WITH dims(event_type, type_class) AS (
            VALUES ('click', 'engagement'), ('view', 'engagement'),
                   ('purchase', 'conversion'), ('signup', 'conversion'),
                   ('error', 'problem')
        )
        SELECT e.event_type, d.type_class,
               COUNT(*) AS n_events,
               (SUM({_V4}) / 10000.0) AS sum_value
        FROM events e JOIN dims d USING (event_type)
        GROUP BY e.event_type, d.type_class
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join
    (streaming/jobs.stream_static_enrich): fact joined to a broadcast
    static dim, then aggregated."""
    from ..streaming.jobs import event_type_dims, stream_static_enrich

    return stream_static_enrich(
        load_table(spark, sf_dir, "events"), event_type_dims(spark)
    )


@register(
    "q_stream_stream_join",
    family="streaming",
    oracle="""
        SELECT
            p.event_id AS purchase_id,
            p.user_id,
            COUNT(*) AS n_prior_clicks,
            CAST(MIN(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS min_lag_us
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL '1 hour'
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        GROUP BY p.event_id, p.user_id
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/jobs.purchase_click_attribution): purchases joined to the
    same user's clicks in the prior hour, rolled up per purchase.  The
    join itself is the streaming-verified op (tests/test_streaming.py);
    the rollup here gives the oracle a compact deterministic surface."""
    from ..streaming.jobs import purchase_click_attribution

    ev = load_table(spark, sf_dir, "events")
    pairs = purchase_click_attribution(ev, ev, horizon="1 hour")
    return pairs.groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_prior_clicks"),
        F.min("lag_us").alias("min_lag_us"),
    )


@register(
    "q_stream_stream_left",
    family="streaming",
    oracle="""
        SELECT
            p.event_id AS purchase_id,
            p.user_id,
            CAST(COUNT(c.c_ts) AS BIGINT) AS n_prior_clicks,
            CAST(MIN(epoch_us(p.ts) - epoch_us(c.c_ts)) AS BIGINT)
                AS min_lag_us
        FROM events p
        LEFT JOIN (
            SELECT user_id AS c_user, ts AS c_ts
            FROM events WHERE event_type = 'click'
        ) c
          ON c.c_user = p.user_id
         AND c.c_ts <= p.ts
         AND c.c_ts > p.ts - INTERVAL '1 hour'
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
    """,
)
def q_stream_stream_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the OUTER stream-stream interval join: purchases
    with NO prior click are kept (n_prior_clicks = 0, null lag) —
    the row Spark's streaming left-outer join emits once the watermark
    passes the join horizon, proving the match is missing rather than
    late.  Same watermark-bounded state as the inner variant
    (streaming/jobs.purchase_click_attribution, how='left_outer');
    the rollup gives the oracle a compact deterministic surface."""
    from ..streaming.jobs import purchase_click_attribution

    ev = load_table(spark, sf_dir, "events")
    pairs = purchase_click_attribution(ev, ev, horizon="1 hour", how="left_outer")
    return pairs.groupBy("purchase_id", "user_id").agg(
        F.count("lag_us").alias("n_prior_clicks"),
        F.min("lag_us").alias("min_lag_us"),
    )


@register(
    "q_stream_topk",
    family="streaming",
    oracle="""
        SELECT window_start, event_type, n_events, rnk FROM (
            SELECT
                time_bucket(INTERVAL '1 day', ts) AS window_start,
                event_type,
                COUNT(*) AS n_events,
                -- NULLS LAST pinned both sides (r11 events corpus:
                -- a NULL type TIED with a real type split the engines
                -- — Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST)
                ROW_NUMBER() OVER (
                    PARTITION BY time_bucket(INTERVAL '1 day', ts)
                    ORDER BY COUNT(*) DESC, event_type NULLS LAST
                ) AS rnk
            FROM events
            GROUP BY 1, 2
        ) WHERE rnk <= 3
    """,
)
def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k: the trending-items streaming shape — per
    tumbling event-time window, the 3 most frequent event types with
    deterministic tie-break.  Batch twin of the streaming topology
    (windowed counts in update mode -> per-window rank in the sink or a
    foreachBatch re-rank; ranking over an open window is not
    append-mode-expressible, which is exactly why the production
    pattern re-ranks per micro-batch).  Two shuffles: the windowed
    count (partial agg map-side) and the per-window rank exchange."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    w = W.partitionBy("w").orderBy(
        F.desc("n_events"), F.asc_nulls_last("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "rnk",
        )
    )


@register(
    "q_kafka_roundtrip",
    family="streaming",
    oracle="""
        SELECT
            CAST(doc_id % 4 AS INT) AS partition,
            COUNT(*) AS n_msgs,
            CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
            CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
            COUNT(DISTINCT source) AS n_sources,
            CAST((COUNT(*) * (COUNT(*) - 1)) // 2 AS BIGINT) AS sum_offset
        FROM documents
        GROUP BY 1
    """,
)
def q_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka round trip under the oracle gate (the reference's
    custreamz Kafka source, upstream: custreamz/kafka.py): the
    documents table is produced onto an in-process wire-protocol
    broker (streaming/kafka_fixture.py) and read back through the
    jar-free ``format("kafka_py")`` Python DataSource — real Kafka
    bytes over TCP, one Spark task per Kafka partition — then
    aggregated per partition.  The oracle recomputes every column from
    the parquet alone: counts/sums check payload fidelity, n_sources
    the delimiter framing, and sum_offset = n*(n-1)/2 checks that
    broker offset assignment saw each record exactly once in order.
    Scale: against a real cluster the same source fans a
    1000-partition topic into 1000 fetch tasks; the per-partition
    aggregate is one shuffle with map-side partial aggregation."""
    from ..streaming.kafka_fixture import TOPIC, documents_broker
    from ..streaming.kafka_source import register_kafka_source

    broker = documents_broker(sf_dir)
    register_kafka_source(spark)
    raw = (
        spark.read.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", TOPIC)
        .load()
    )
    fields = F.split(F.col("value").cast("string"), r"\|")

    def denull(i):  # '\N' encodes NULL on the wire (kafka_fixture,
        # r10: was '' — which conflated genuine empty-string fields
        # with NULL; the empty-string injection leg found it).  r11:
        # genuine backslashes ride doubled (\ -> \\) so a literal-\N
        # value survives as \\N — test the sentinel FIRST, then
        # undouble (order matters: undoubling first would turn the
        # escaped \\N back into the sentinel)
        f = fields.getItem(i)
        return F.when(
            f != "\\N", F.replace(f, F.lit("\\\\"), F.lit("\\"))
        )

    return (
        raw.select(
            "partition",
            "offset",
            fields.getItem(0).cast("long").alias("doc_id"),
            denull(1).alias("source"),
            denull(2).cast("long").alias("n_chars"),
        )
        .groupBy("partition")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("n_chars").alias("sum_n_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("offset").alias("sum_offset"),
        )
    )
