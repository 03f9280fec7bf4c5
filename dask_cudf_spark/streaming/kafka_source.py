"""Jar-free Kafka source + sink for Spark via the Python DataSource
API (Spark 4, SPARK-44076) — closes the reference's custreamz Kafka
micro-batch boundary (upstream: custreamz/kafka.py) without the
spark-sql-kafka connector jar this sandbox lacks.

Design: the classic Scala connector's exact surface — schema
``key/value/topic/partition/offset/timestamp/timestampType``, options
``kafka.bootstrap.servers`` / ``subscribe`` / ``startingOffsets`` /
``maxOffsetsPerTrigger`` — re-expressed over the pure-Python wire
client in ``kafka_protocol.py``.

Scale story: one Spark ``InputPartition`` per Kafka partition, so a
1000-partition topic fans out to 1000 parallel fetch tasks, each
opening its own broker connection from its executor (nothing is
pickled but topic/partition/offset-range strings).  Offsets live in
the Spark checkpoint (``partitions(start, end)`` receives them back),
giving the same exactly-once replay contract as the jar connector;
``maxOffsetsPerTrigger`` bounds each micro-batch so one slow batch
cannot snowball.  Against a real cluster the wire client speaks the
same pinned public protocol versions every broker since 0.10 serves.

Usage::

    register_kafka_source(spark)
    df = (spark.readStream.format("kafka_py")
          .option("bootstrap", "host:9092").option("subscribe", "t")
          .load())
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from .kafka_protocol import EARLIEST_TS, LATEST_TS, KafkaClient

#: Mirror of the Scala connector's fixed read schema.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)

#: timestampType: 0 = CreateTime (we only serve magic-1 create-time).
_CREATE_TIME = 0


def _opt(options: dict, *names: str, default: str | None = None) -> str | None:
    for n in names:
        v = options.get(n.lower())
        if v is not None:
            return v
    return default


class KafkaRange(InputPartition):
    """One Kafka partition's [start, end) offset slice = one Spark
    task.  Plain strings/ints only — pickled to executors."""

    def __init__(self, bootstrap: str, topic: str, partition: int,
                 start: int, end: int):
        self.bootstrap = bootstrap
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


def _read_range(part: KafkaRange) -> Iterator[tuple]:
    with KafkaClient(part.bootstrap) as cli:
        for rec in cli.fetch_range(part.topic, part.partition,
                                   part.start, part.end):
            yield (
                rec.key,
                rec.value,
                part.topic,
                part.partition,
                rec.offset,
                # A broker signals "no timestamp" with ts = -1 (e.g. a
                # real broker down-converting a magic-0 segment for our
                # Fetch v0 read).  Surface that as NULL, exactly like
                # the jar connector — never as a 1969-era datetime.
                (
                    datetime.fromtimestamp(
                        rec.timestamp_ms / 1000.0, tz=timezone.utc
                    )
                    if rec.timestamp_ms >= 0
                    else None
                ),
                _CREATE_TIME,
            )


class _KafkaOptions:
    def __init__(self, options: dict):
        bootstrap = _opt(options, "bootstrap", "kafka.bootstrap.servers")
        topic = _opt(options, "subscribe", "topic")
        if not bootstrap or not topic:
            raise ValueError(
                "kafka_py requires options bootstrap (or "
                "kafka.bootstrap.servers) and subscribe (or topic)"
            )
        self.bootstrap = bootstrap
        self.topic = topic
        self.starting = (_opt(options, "startingoffsets", default="earliest")
                         or "earliest").lower()
        cap = _opt(options, "maxoffsetspertrigger")
        self.max_per_trigger = int(cap) if cap else None
        # endingoffsets: JSON {"<partition>": off} upper bound on what
        # latestOffset may report — the latch `drain_available_now`
        # uses to emulate a capped AvailableNow drain (the Python
        # DataSource API has no prepareForTriggerAvailableNow hook, so
        # the cap must come from outside the trigger machinery)
        ending = _opt(options, "endingoffsets")
        self.ending: dict[str, int] | None = None
        if ending and ending.lower() not in ("latest", ""):
            import json as _json

            self.ending = {
                str(k): int(v) for k, v in _json.loads(ending).items()
            }

    def partition_ids(self, cli: KafkaClient) -> list[int]:
        meta = cli.metadata([self.topic])
        return sorted(meta["topics"][self.topic]["partitions"])


class KafkaBatchReader(DataSourceReader):
    """Batch read: the full earliest..latest range per partition,
    snapshotted once at planning time on the driver."""

    def __init__(self, options: dict):
        self._opts = _KafkaOptions(options)

    def partitions(self) -> list[KafkaRange]:
        o = self._opts
        with KafkaClient(o.bootstrap) as cli:
            return [
                KafkaRange(
                    o.bootstrap, o.topic, pid,
                    cli.list_offsets(o.topic, pid, EARLIEST_TS),
                    cli.list_offsets(o.topic, pid, LATEST_TS),
                )
                for pid in o.partition_ids(cli)
            ]

    def read(self, partition: KafkaRange) -> Iterator[tuple]:
        return _read_range(partition)


class KafkaStreamReader(DataSourceStreamReader):
    """Micro-batch read: offsets are dicts ``{"<partition>": next_off}``
    checkpointed by Spark; each batch covers (start, min(latest,
    start + maxOffsetsPerTrigger)] per partition.

    Trigger note: under ``processingTime`` triggers the
    maxOffsetsPerTrigger cap yields genuine multi-batch backpressure
    (tested).  Under ``Trigger.AvailableNow`` Spark's Python
    DataSource wrapper snapshots latestOffset ONCE and drains it as a
    single planned batch — the public API has no
    prepareForTriggerAvailableNow hook for the capped-catch-up
    behavior the jar connector implements, so a bare availableNow +
    cap degrades to one (still exactly-once) batch.  For a BOUNDED
    drain of a large backlog use ``drain_available_now`` below: it
    latches the target end offsets once and advances an
    ``endingoffsets`` bound by at most the cap per run, so every
    planned batch is cap-bounded by construction (round 9)."""

    def __init__(self, options: dict):
        self._opts = _KafkaOptions(options)
        self._prev_end: dict[str, int] | None = None

    def initialOffset(self) -> dict:
        o = self._opts
        ts = LATEST_TS if o.starting == "latest" else EARLIEST_TS
        with KafkaClient(o.bootstrap) as cli:
            return {
                str(pid): cli.list_offsets(o.topic, pid, ts)
                for pid in o.partition_ids(cli)
            }

    def latestOffset(self) -> dict:
        o = self._opts
        with KafkaClient(o.bootstrap) as cli:
            latest = {
                str(pid): cli.list_offsets(o.topic, pid, LATEST_TS)
                for pid in o.partition_ids(cli)
            }
        if o.max_per_trigger is not None:
            # Backpressure: advance each partition at most cap rows past
            # the previous planned end.  After a restart _prev_end is
            # unknown until the first partitions() call, so the first
            # batch may exceed the cap — same relaxation the jar
            # connector documents for its first trigger.
            base = self._prev_end or {}
            latest = {
                p: min(off, base.get(p, 0) + o.max_per_trigger)
                if p in base else off
                for p, off in latest.items()
            }
        if o.ending is not None:
            latest = {
                p: min(off, o.ending.get(p, off))
                for p, off in latest.items()
            }
        self._prev_end = dict(latest)
        return latest

    def partitions(self, start: dict, end: dict) -> list[KafkaRange]:
        o = self._opts
        self._prev_end = {str(p): int(v) for p, v in end.items()}
        return [
            KafkaRange(o.bootstrap, o.topic, int(pid), int(start.get(pid, 0)),
                       int(off))
            for pid, off in sorted(end.items(), key=lambda kv: int(kv[0]))
            if int(off) > int(start.get(pid, 0))
        ]

    def read(self, partition: KafkaRange) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        # Offsets are owned by the Spark checkpoint; nothing to persist
        # broker-side (no consumer-group commit in this source, same as
        # the jar connector's default).
        pass


class _ProducedMsg(WriterCommitMessage):
    def __init__(self, counts: dict[int, int]):
        self.counts = counts


def _murmur2(data: bytes) -> int:
    """Kafka's 32-bit murmur2 (public algorithm: Apache Kafka
    ``org.apache.kafka.common.utils.Utils.murmur2``, seed 0x9747b28c)
    emulated over Java's signed-int overflow semantics.  Returned as
    an unsigned 32-bit value; callers mask with 0x7fffffff for the
    partitioner's toPositive."""
    length = len(data)
    m = 0x5BD1E995
    h = (0x9747B28C ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    rem = length & 3
    if rem >= 3:
        h ^= data[i + 2] << 16
    if rem >= 2:
        h ^= data[i + 1] << 8
    if rem >= 1:
        h ^= data[i]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def _partition_for(key: bytes | None, partition, nparts: int, seq: int) -> int:
    """The default Kafka partitioner contract: explicit partition wins,
    else ``toPositive(murmur2(key)) % numPartitions`` — byte-compatible
    with the Java producer's DefaultPartitioner, so keyed messages land
    on the SAME partition a Java producer would pick (round-9 ADVICE
    fix: this was crc32, which is stable but not the Kafka contract) —
    else round-robin."""
    if partition is not None:
        return int(partition) % nparts
    if key is not None:
        return (_murmur2(key) & 0x7FFFFFFF) % nparts
    return seq % nparts


class _KafkaWriteCore:
    def __init__(self, options: dict):
        bootstrap = _opt(options, "bootstrap", "kafka.bootstrap.servers")
        topic = _opt(options, "topic", "subscribe")
        if not bootstrap or not topic:
            raise ValueError("kafka_py writer requires bootstrap and topic")
        self.bootstrap = bootstrap
        self.topic = topic

    def write_rows(self, iterator) -> _ProducedMsg:
        """Executor-side: buffer rows per target partition, one produce
        round trip per partition.  Rows need a ``value`` column
        (binary or string); ``key`` / ``partition`` optional."""
        with KafkaClient(self.bootstrap) as cli:
            nparts = len(cli.metadata([self.topic])["topics"][self.topic]
                         ["partitions"])
            buckets: dict[int, list[tuple[bytes | None, bytes | None]]] = {}
            for seq, row in enumerate(iterator):
                d = row.asDict() if hasattr(row, "asDict") else dict(row)
                key = d.get("key")
                value = d.get("value")
                if isinstance(key, str):
                    key = key.encode("utf-8")
                if isinstance(value, str):
                    value = value.encode("utf-8")
                key = bytes(key) if key is not None else None
                value = bytes(value) if value is not None else None
                pid = _partition_for(key, d.get("partition"), nparts, seq)
                buckets.setdefault(pid, []).append((key, value))
            counts = {}
            for pid, records in sorted(buckets.items()):
                cli.produce(self.topic, pid, records)
                counts[pid] = len(records)
        return _ProducedMsg(counts)


class KafkaWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self._core = _KafkaWriteCore(options)

    def write(self, iterator) -> _ProducedMsg:
        return self._core.write_rows(iterator)


class KafkaStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch produce.  Kafka appends are not idempotent
    without the (v2 record format) transactional producer, so a
    replayed micro-batch after a crash can duplicate records —
    at-least-once, exactly like the jar connector's Kafka sink;
    downstream dedup on (topic, key) restores exactly-once."""

    def __init__(self, options: dict):
        self._core = _KafkaWriteCore(options)

    def write(self, iterator) -> _ProducedMsg:
        return self._core.write_rows(iterator)

    def commit(self, messages, batchId: int) -> None:
        pass

    def abort(self, messages, batchId: int) -> None:
        pass


class KafkaPyDataSource(DataSource):
    """``format("kafka_py")`` — batch + streaming read, batch +
    streaming write."""

    @classmethod
    def name(cls) -> str:
        return "kafka_py"

    def schema(self) -> str:
        return KAFKA_SOURCE_SCHEMA

    def reader(self, schema) -> KafkaBatchReader:
        return KafkaBatchReader(dict(self.options))

    def streamReader(self, schema) -> KafkaStreamReader:
        return KafkaStreamReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> KafkaWriter:
        return KafkaWriter(dict(self.options))

    def streamWriter(self, schema, overwrite: bool) -> KafkaStreamWriter:
        return KafkaStreamWriter(dict(self.options))


def register_kafka_source(spark) -> None:
    """Idempotent per-session registration of ``format("kafka_py")``.

    The DataSource class is shipped to executor Python workers by
    cloudpickle, which serializes classes from importable modules BY
    REFERENCE — and Spark workers do not inherit the driver's
    ``sys.path``, so on a cluster where this repo is not installed
    site-wide the reference would fail to resolve.  Registering the two
    self-contained Kafka modules for BY-VALUE pickling makes the
    source carry its own code — stdlib-only, so the payload is small
    and works on any executor."""
    from pyspark import cloudpickle

    from . import kafka_protocol
    from . import kafka_source as _self

    cloudpickle.register_pickle_by_value(kafka_protocol)
    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(KafkaPyDataSource)


def _committed_offsets(checkpoint: str) -> dict[str, int] | None:
    """Last COMMITTED per-partition offsets from a streaming
    checkpoint (offsets/<id> of the max id present in commits/), or
    None for a fresh checkpoint.  The offsets file is the public v1
    layout: a version line, a metadata JSON line, then one offset JSON
    line per source — ours is the ``{"<partition>": next_off}`` dict
    the reader checkpoints."""
    import glob
    import json
    import os

    commits = [
        int(os.path.basename(p))
        for p in glob.glob(f"{checkpoint}/commits/*")
        if os.path.basename(p).isdigit()
    ]
    if not commits:
        return None
    with open(f"{checkpoint}/offsets/{max(commits)}") as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    payload = json.loads(lines[-1])
    if isinstance(payload, str):  # python offsets may be double-encoded
        payload = json.loads(payload)
    return {str(k): int(v) for k, v in payload.items()}


def drain_available_now(
    spark,
    *,
    bootstrap: str,
    topic: str,
    checkpoint: str,
    sink_builder,
    max_offsets_per_trigger: int,
    transform=None,
    run_timeout_s: float = 300.0,
) -> dict:
    """Chunked ``Trigger.AvailableNow`` drain (round 9): process the
    backlog AVAILABLE AT CALL TIME in bounded micro-batches of at most
    ``max_offsets_per_trigger`` rows per Kafka partition, exactly-once
    through one shared ``checkpoint``.

    Why this exists: the Python DataSource API has no
    ``prepareForTriggerAvailableNow`` hook, and Spark's wrapper for
    non-supporting sources latches ``latestOffset()`` ONCE and plans
    the whole backlog as a single batch — ignoring
    ``maxOffsetsPerTrigger`` — so a month-old backlog becomes one
    unbounded batch.  The capped catch-up the jar connector implements
    inside the trigger is emulated here one level up:

    1. LATCH the per-partition end offsets at call time (AvailableNow's
       "available now" contract — rows produced during the drain are
       excluded, exactly like the jar connector).
    2. Run successive ``availableNow`` streams against the SAME
       checkpoint, each with ``endingoffsets`` advanced by at most the
       cap per partition; the wrapper's one-batch plan is then a
       bounded batch by construction.
    3. Stop when the latch is reached.  Exactly-once holds across runs
       because the checkpoint carries committed offsets between them —
       a crash between runs resumes, never replays into the sink.

    ``sink_builder(df) -> DataStreamWriter`` attaches the output sink
    (format/path/options); trigger and checkpointLocation are managed
    here.  ``transform(df) -> df`` optionally reshapes the stream.
    Returns ``{"runs": N, "target": {pid: off}, "start": {pid: off}}``.
    """
    from .kafka_protocol import KafkaClient

    with KafkaClient(bootstrap) as cli:
        pids = sorted(cli.metadata([topic])["topics"][topic]["partitions"])
        target = {p: cli.list_offsets(topic, p, LATEST_TS) for p in pids}
        start = {p: cli.list_offsets(topic, p, EARLIEST_TS) for p in pids}

    import json

    committed = _committed_offsets(checkpoint)
    if committed is not None:
        # resume: plan from the checkpoint's last committed offsets,
        # not from earliest — otherwise a re-drain replans (empty)
        # already-committed chunks
        start = {
            p: max(start[p], committed.get(str(p), start[p])) for p in pids
        }
    planned = dict(start)
    runs = 0
    while any(planned[p] < target[p] for p in pids):
        planned = {
            p: min(target[p], planned[p] + max_offsets_per_trigger)
            for p in pids
        }
        df = (
            spark.readStream.format("kafka_py")
            .option("bootstrap", bootstrap)
            .option("subscribe", topic)
            .option(
                "endingoffsets",
                json.dumps({str(p): planned[p] for p in pids}),
            )
            .load()
        )
        if transform is not None:
            df = transform(df)
        q = (
            sink_builder(df)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(run_timeout_s):
            q.stop()
            raise TimeoutError(
                f"drain run {runs} did not finish in {run_timeout_s}s"
            )
        runs += 1
    return {"runs": runs, "target": target, "start": start}
