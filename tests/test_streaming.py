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
