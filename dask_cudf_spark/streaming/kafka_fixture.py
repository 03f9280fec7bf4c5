"""Deterministic in-process Kafka fixture: the documents table
produced onto a local wire-protocol broker, so the jar-free Kafka
source (kafka_source.py) can be exercised under the DuckDB oracle gate
— the transport is Kafka bytes end to end, while the ground truth
stays a plain SQL statement over the same parquet.

The broker lives for the process (daemon threads, module-level cache):
registry query functions return LAZY DataFrames that the driver
collects later, so the broker must outlive the function call.  One
broker per sf_dir; produce happens exactly once per (process, sf_dir).

Determinism contract the oracle relies on:
  - partition = doc_id % NUM_PARTITIONS (explicit partitioner);
  - within a partition, records are produced in ascending doc_id
    order, so broker-assigned offsets are 0..n_p-1 in doc_id order —
    which makes SUM(offset) per partition a closed form the oracle can
    state: n_p * (n_p - 1) / 2;
  - value bytes are "doc_id|source|n_chars" (the produce loop ASSERTS
    each field is delimiter-free, so a testdata regen that introduces
    '|' into source fails loudly instead of silently corrupting the
    split; NULL fields ride as the \\N sentinel with genuine
    backslashes doubled, undone by the consumer), timestamps a fixed
    constant.
"""

from __future__ import annotations

import threading

import pyarrow.parquet as pq

from .kafka_protocol import InProcBroker, KafkaClient

NUM_PARTITIONS = 4
TOPIC = "documents"
_FIXED_TS_MS = 1_700_000_000_000

_lock = threading.Lock()
_brokers: dict[str, InProcBroker] = {}


def documents_broker(sf_dir: str) -> InProcBroker:
    """Broker with the documents table of ``sf_dir`` produced onto
    TOPIC; started and loaded once per process."""
    with _lock:
        broker = _brokers.get(sf_dir)
        if broker is not None:
            return broker
        broker = InProcBroker(num_partitions=NUM_PARTITIONS)
        broker.ensure_topic(TOPIC)
        table = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        )
        rows = sorted(
            zip(
                table.column("doc_id").to_pylist(),
                table.column("source").to_pylist(),
                table.column("n_chars").to_pylist(),
            )
        )
        buckets: dict[int, list[tuple[bytes, bytes]]] = {}
        for doc_id, source, n_chars in rows:
            # the docstring's determinism contract, enforced: a '|'
            # inside any field would silently shift the consumer-side
            # split_part columns (round-9 ADVICE fix)
            for f in (doc_id, source, n_chars):
                if "|" in str(f):
                    raise ValueError(
                        f"kafka fixture delimiter collision: {f!r} "
                        "contains '|'; pick another delimiter"
                    )
            # NULL fields ride as \N (the classic text-format sentinel,
            # r10: was '' — which conflated genuine empty strings with
            # NULL; the empty-string injection leg found it).  r11
            # (r10 ADVICE item 3): genuine backslashes are ESCAPED
            # (\ -> \\) instead of a literal-\N value killing the whole
            # fixture with a raise — after doubling, a genuine field can
            # never equal the bare \N sentinel, so the wire stays
            # unambiguous and the consumer undoubles after the sentinel
            # test (queries/streaming.py denull).  doc_id is the key,
            # never null.
            payload = "|".join(
                "\\N" if v is None else str(v).replace("\\", "\\\\")
                for v in (doc_id, source, n_chars)
            )
            buckets.setdefault(int(doc_id) % NUM_PARTITIONS, []).append(
                (str(doc_id).encode(), payload.encode())
            )
        with KafkaClient(broker.bootstrap) as cli:
            for pid, records in sorted(buckets.items()):
                cli.produce(TOPIC, pid, records, timestamp_ms=_FIXED_TS_MS)
        _brokers[sf_dir] = broker
        return broker
