"""Structured Streaming (SURVEY.md §2.9).

The reference family's streaming story (custreamz: Kafka micro-batches,
processing-time only) is strictly upgraded here: event-time windows,
watermarks, stateful dedup.  Design rule: every transformation is a
plain DataFrame->DataFrame function that works on BOTH a batch frame
(spark.read) and a stream (spark.readStream) — the batch twin is what
the DuckDB oracle checks; the stream twin is smoke-tested with the
file source + availableNow trigger (tests/test_streaming.py).
"""

from .kafka_source import drain_available_now, register_kafka_source
from .jobs import (
    event_type_dims,
    classify_documents,
    cusum_stateful,
    documents_stream,
    exactly_once_batch_writer,
    ingest_exactly_once,
    ingest_txlog_exactly_once,
    txlog_batch_writer,
    train_centroids,
    materialize_rollup,
    events_stream,
    events_files_stream,
    purchase_click_attribution,
    sessionize_stateful,
    stateful_user_totals,
    stateful_user_totals_tws,
    stream_static_enrich,
    session_agg,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "events_files_stream",
    "classify_documents",
    "cusum_stateful",
    "documents_stream",
    "exactly_once_batch_writer",
    "ingest_exactly_once",
    "ingest_txlog_exactly_once",
    "txlog_batch_writer",
    "train_centroids",
    "event_type_dims",
    "materialize_rollup",
    "purchase_click_attribution",
    "stream_static_enrich",
    "sessionize_stateful",
    "stateful_user_totals",
    "stateful_user_totals_tws",
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "stream_dedup",
    "register_kafka_source",
    "drain_available_now",
]
