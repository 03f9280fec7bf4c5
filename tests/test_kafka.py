"""Jar-free Kafka source/sink: wire protocol, client vs in-process
broker, Spark batch read/write, micro-batch streaming exactly-once,
backpressure, and checkpoint restart (SURVEY.md §2.1 / §2.9 Kafka row;
upstream: custreamz/kafka.py)."""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from dask_cudf_spark.streaming.kafka_protocol import (
    EARLIEST_TS,
    LATEST_TS,
    InProcBroker,
    KafkaClient,
    KafkaProtocolError,
    Record,
    decode_message_set,
    encode_message,
)
from dask_cudf_spark.streaming.kafka_source import register_kafka_source


@pytest.fixture()
def broker():
    with InProcBroker(num_partitions=3) as b:
        yield b


@pytest.fixture()
def client(broker):
    with KafkaClient(broker.bootstrap) as c:
        yield c


# ------------------------------------------------------------- codec

def test_murmur2_matches_java_partitioner_vectors():
    """The keyed-write partitioner must be byte-compatible with the
    Java producer's DefaultPartitioner: toPositive(murmur2(key)) %
    numPartitions.  Vectors are Apache Kafka's own public
    UtilsTest.testMurmur2 cases (signed 32-bit Java ints)."""
    from dask_cudf_spark.streaming.kafka_source import (
        _murmur2,
        _partition_for,
    )

    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"a-little-bit-longer-string": -1486304829,
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
        b"abc": 479470107,
        b"": 275646681,
    }
    for key, want_signed in vectors.items():
        got = _murmur2(key)
        signed = got - 0x100000000 if got >= 0x80000000 else got
        assert signed == want_signed, (key, signed, want_signed)
        # and the partitioner contract on top of it
        assert _partition_for(key, None, 12, 0) == (
            got & 0x7FFFFFFF
        ) % 12
    # explicit partition wins; keyless falls back to round-robin
    assert _partition_for(b"abc", 7, 12, 0) == 7
    assert [_partition_for(None, None, 3, s) for s in range(5)] == [
        0, 1, 2, 0, 1,
    ]


def test_message_set_roundtrip():
    buf = encode_message(7, 123456, b"k", b"v") + encode_message(
        8, 123457, None, b"w"
    )
    recs = decode_message_set(buf)
    assert recs == [
        Record(7, 123456, b"k", b"v"),
        Record(8, 123457, None, b"w"),
    ]


def test_message_set_drops_truncated_tail():
    buf = encode_message(0, 1, b"k", b"v" * 100)
    # a broker honoring max_bytes may cut the last entry mid-message
    assert decode_message_set(buf[:-10]) == []
    two = buf + encode_message(1, 2, None, b"x" * 50)
    assert [r.offset for r in decode_message_set(two[:-5])] == [0]


def test_message_set_crc_rejects_corruption():
    buf = bytearray(encode_message(0, 1, b"k", b"v"))
    buf[-1] ^= 0xFF
    with pytest.raises(KafkaProtocolError, match="crc"):
        decode_message_set(bytes(buf))


# ------------------------------------------------- client <-> broker

def test_api_versions_and_metadata(client):
    apis = client.api_versions()
    assert set(apis) == {0, 1, 2, 3, 18}
    meta = client.metadata(["t"])
    assert sorted(meta["topics"]["t"]["partitions"]) == [0, 1, 2]
    assert meta["brokers"][0]["port"] > 0


def test_produce_fetch_offsets(client):
    assert client.produce("t", 0, [(b"a", b"1"), (None, b"2")], 1000) == 0
    assert client.produce("t", 0, [(b"c", b"3")], 2000) == 2
    assert client.list_offsets("t", 0, EARLIEST_TS) == 0
    assert client.list_offsets("t", 0, LATEST_TS) == 3
    recs, hwm = client.fetch("t", 0, 1)
    assert hwm == 3
    assert [(r.offset, r.key, r.value) for r in recs] == [
        (1, None, b"2"),
        (2, b"c", b"3"),
    ]


def test_fetch_unknown_partition_errors(client):
    client.produce("t", 0, [(None, b"x")], 1)
    with pytest.raises(KafkaProtocolError):
        client.fetch("t", 9, 0)


def test_fetch_past_hwm_errors(client):
    client.produce("t", 0, [(None, b"x")], 1)
    with pytest.raises(KafkaProtocolError):
        client.fetch("t", 0, 5)


def test_fetch_range_paginates_under_max_bytes(client):
    client.produce("t", 1, [(None, bytes(64)) for _ in range(40)], 1)
    recs = client.fetch_range("t", 1, 3, 37, max_bytes=200)
    assert [r.offset for r in recs] == list(range(3, 37))


# ------------------------------------------------------ spark batch

def _read_kafka(spark, broker, topic):
    register_kafka_source(spark)
    return (
        spark.read.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", topic)
        .load()
    )


def test_spark_batch_read_schema_and_rows(spark, broker):
    with KafkaClient(broker.bootstrap) as c:
        for p in range(3):
            c.produce(
                "bt", p, [(str(i).encode(), f"v{p}-{i}".encode()) for i in range(7)],
                1_700_000_000_000,
            )
    df = _read_kafka(spark, broker, "bt")
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    ]
    rows = df.collect()
    assert len(rows) == 21
    # one Spark partition per Kafka partition, offsets exactly once
    assert len({(r.partition, r.offset) for r in rows}) == 21
    assert df.rdd.getNumPartitions() == 3
    got = {(r.partition, r.offset): bytes(r.value) for r in rows}
    assert got[(2, 4)] == b"v2-4"


def test_spark_batch_write_read_roundtrip(spark, broker):
    register_kafka_source(spark)
    src = spark.range(30).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.concat(F.lit("p-"), F.col("id").cast("string")).cast("binary").alias("value"),
    )
    (
        src.write.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "wt")
        .mode("append")
        .save()
    )
    back = _read_kafka(spark, broker, "wt")
    vals = {bytes(r.value) for r in back.collect()}
    assert vals == {f"p-{i}".encode() for i in range(30)}
    # default partitioner: same key -> same partition (stable hash)
    by_key = (
        back.groupBy(F.col("key").cast("string").alias("k"))
        .agg(F.countDistinct("partition").alias("nparts"))
    )
    assert by_key.filter("nparts > 1").count() == 0


# -------------------------------------------------- spark streaming

def _wait(predicate, timeout_s=60.0):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.3)
    return False


def test_spark_stream_exactly_once_two_waves(spark, broker):
    register_kafka_source(spark)
    with KafkaClient(broker.bootstrap) as c:
        c.produce("st", 0, [(None, f"a{i}".encode()) for i in range(12)], 1)
        c.produce("st", 1, [(None, f"b{i}".encode()) for i in range(12)], 1)
        stream = (
            spark.readStream.format("kafka_py")
            .option("bootstrap", broker.bootstrap)
            .option("subscribe", "st")
            .option("maxOffsetsPerTrigger", "5")
            .load()
            .select(F.col("value").cast("string").alias("v"), "partition", "offset")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("kafka_eo")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            n = lambda: spark.sql("select count(*) c from kafka_eo").first().c
            assert _wait(lambda: n() >= 24), f"phase1 stalled at {n()}"
            c.produce("st", 0, [(None, f"a{i}".encode()) for i in range(12, 20)], 2)
            assert _wait(lambda: n() >= 32), f"phase2 stalled at {n()}"
            dups = spark.sql(
                "select partition, offset from kafka_eo "
                "group by 1, 2 having count(*) > 1"
            ).count()
            assert dups == 0
            assert n() == 32
            # backpressure: cap 5/partition/batch forces phase 1's 12
            # rows/partition across >= 3 micro-batches (ids 0..2) and
            # phase 2 onto a 4th; uncapped, both waves fit in 2 total.
            assert _wait(lambda: (q.lastProgress or {}).get("batchId", 0) >= 3)
        finally:
            q.stop()


def test_spark_stream_restart_resumes_from_checkpoint(spark, broker):
    register_kafka_source(spark)
    ckpt = tempfile.mkdtemp()
    out = tempfile.mkdtemp() + "/out"

    def start():
        return (
            spark.readStream.format("kafka_py")
            .option("bootstrap", broker.bootstrap)
            .option("subscribe", "rt")
            .load()
            .select(F.col("value").cast("string").alias("v"), "partition", "offset")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def rows():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    with KafkaClient(broker.bootstrap) as c:
        c.produce("rt", 0, [(None, f"x{i}".encode()) for i in range(6)], 1)
        q = start()
        try:
            assert _wait(lambda: rows() >= 6)
        finally:
            q.stop()
        # records arriving while the query is DOWN...
        c.produce("rt", 1, [(None, f"y{i}".encode()) for i in range(4)], 2)
        q = start()
        try:
            # ...are picked up on restart, with no re-read of phase 1
            assert _wait(lambda: rows() >= 10)
            df = spark.read.parquet(out)
            assert df.count() == 10
            assert (
                df.groupBy("partition", "offset").count().filter("count > 1").count()
                == 0
            )
        finally:
            q.stop()


def test_spark_stream_write_sink(spark, broker):
    register_kafka_source(spark)
    src = spark.readStream.format("rate").option("rowsPerSecond", "40").load()
    q = (
        src.select(
            F.col("value").cast("string").cast("binary").alias("key"),
            F.concat(F.lit("r-"), F.col("value").cast("string"))
            .cast("binary")
            .alias("value"),
        )
        .writeStream.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("topic", "sink_t")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        with KafkaClient(broker.bootstrap) as c:
            c.metadata(["sink_t"])  # auto-create so list_offsets resolves
            total = lambda: sum(
                c.list_offsets("sink_t", p, LATEST_TS) for p in range(3)
            )
            assert _wait(lambda: total() >= 20)
    finally:
        q.stop()
    back = _read_kafka(spark, broker, "sink_t").collect()
    vals = sorted(int(bytes(r.value)[2:]) for r in back)
    # at-least-once sink contract: every produced rate row present
    assert vals[:20] == sorted(set(vals))[:20]


# ------------------------------------------------------ fixture query

def test_available_now_drains_backlog_in_bounded_batches(spark, broker):
    """Round-9 chunked AvailableNow drain: a pre-seeded backlog must
    drain in MULTIPLE cap-bounded batches exactly-once — the bare
    availableNow trigger would plan it as one unbounded batch (the
    Python DataSource wrapper latches latestOffset once and ignores
    maxOffsetsPerTrigger)."""
    import glob

    from dask_cudf_spark.streaming.kafka_source import (
        drain_available_now,
        register_kafka_source,
    )

    register_kafka_source(spark)
    # backlog: 20 rows on each of 2 partitions, pre-seeded BEFORE the
    # drain starts (the month-old-topic shape)
    with KafkaClient(broker.bootstrap) as c:
        for pid in (0, 1):
            c.produce(
                "drain", pid,
                [(None, f"p{pid}-{i}".encode()) for i in range(20)], 1,
            )
    out = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp()
    res = drain_available_now(
        spark,
        bootstrap=broker.bootstrap,
        topic="drain",
        checkpoint=ckpt,
        sink_builder=lambda df: (
            df.selectExpr(
                "CAST(value AS STRING) v", "partition", "offset"
            ).writeStream.format("parquet").option("path", out)
        ),
        max_offsets_per_trigger=8,
    )
    # 20 rows/partition at cap 8 -> ends advance 8,16,20 -> 3 runs
    assert res["runs"] == 3, res
    assert res["target"] == {0: 20, 1: 20, 2: 0}
    got = spark.read.parquet(out)
    # exactly-once: every (partition, offset) exactly once, all 40 rows
    assert got.count() == 40
    assert got.select("partition", "offset").distinct().count() == 40
    vals = {r.v for r in got.collect()}
    assert vals == {f"p{p}-{i}" for p in (0, 1) for i in range(20)}
    # bounded batches: each run wrote its own commit -> >= 3 parquet
    # commits in the sink (one-batch drain would write once)
    commits = glob.glob(f"{ckpt}/commits/*")
    assert len(commits) >= 3, commits
    # rows produced DURING/AFTER the latch are excluded until the next
    # drain, then picked up from the checkpoint exactly-once
    with KafkaClient(broker.bootstrap) as c:
        c.produce("drain", 0, [(None, b"late-0")], 2)
    res2 = drain_available_now(
        spark,
        bootstrap=broker.bootstrap,
        topic="drain",
        checkpoint=ckpt,
        sink_builder=lambda df: (
            df.selectExpr(
                "CAST(value AS STRING) v", "partition", "offset"
            ).writeStream.format("parquet").option("path", out)
        ),
        max_offsets_per_trigger=8,
    )
    assert res2["runs"] == 1
    got2 = spark.read.parquet(out)
    assert got2.count() == 41
    assert got2.select("partition", "offset").distinct().count() == 41


def test_documents_broker_idempotent_and_offsets():
    from dask_cudf_spark.streaming.kafka_fixture import (
        NUM_PARTITIONS,
        TOPIC,
        documents_broker,
    )

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    expected = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    b1 = documents_broker(sf)
    b2 = documents_broker(sf)
    assert b1 is b2  # one broker + one produce per process
    with KafkaClient(b1.bootstrap) as c:
        total = sum(
            c.list_offsets(TOPIC, p, LATEST_TS) for p in range(NUM_PARTITIONS)
        )
        assert total == expected  # every documents row exactly once
        recs = c.fetch_range(TOPIC, 0, 0, c.list_offsets(TOPIC, 0, LATEST_TS))
        doc_ids = [int(r.value.split(b"|")[0]) for r in recs]
        assert doc_ids == sorted(doc_ids)  # ascending doc_id per partition
        assert all(d % NUM_PARTITIONS == 0 for d in doc_ids)


# ------------------------------------- composition: windowed event time

def test_kafka_stream_tumbling_window_converges(spark, broker):
    """The jar-free source composes with the engine's event-time
    machinery: kafka_py stream -> parse event time from the payload ->
    watermark -> tumbling window + grouped sum must converge to the
    identical batch computation over the same Kafka bytes (the same
    stream/batch-twin contract every §2.9 query follows)."""
    register_kafka_source(spark)
    base = 1_700_000_000  # epoch seconds, windows at :00/:10/:20
    with KafkaClient(broker.bootstrap) as c:
        for pid in range(3):
            c.produce(
                "win",
                pid,
                [
                    (None, f"{base + 60 * i + pid}|u{i % 2}|{i + pid}".encode())
                    for i in range(30)
                ],
                1,
            )

    def parsed(df):
        f = F.split(F.col("value").cast("string"), r"\|")
        return df.select(
            F.col("partition"),
            F.to_timestamp(F.from_unixtime(f.getItem(0).cast("long"))).alias("ts"),
            f.getItem(1).alias("user"),
            f.getItem(2).cast("long").alias("v"),
        )

    def windowed(df):
        return (
            df.groupBy(F.window("ts", "10 minutes").alias("w"), "user")
            .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "user", "total", "n")
        )

    reader = (
        spark.readStream.format("kafka_py")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", "win")
        .load()
    )
    q = (
        windowed(parsed(reader).withWatermark("ts", "5 minutes"))
        .writeStream.format("memory")
        .queryName("kafka_win")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        batch = windowed(parsed(_read_kafka(spark, broker, "win"))).toPandas()
        expect = sorted(map(tuple, batch.itertuples(index=False)))
        got = lambda: sorted(
            map(tuple, spark.sql("select * from kafka_win").toPandas()
                .itertuples(index=False))
        )
        assert _wait(lambda: got() == expect), (
            f"stream={got()[:5]}... batch={expect[:5]}..."
        )
    finally:
        q.stop()
