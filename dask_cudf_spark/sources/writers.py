"""Sink wrappers (SURVEY.md §2.1 to_parquet/to_orc/to_csv/to_json).

``partition_on`` (reference hive-style partitioned write) maps to Spark's
``partitionBy``; at 100 TB add bucketing for join-heavy keys via
``bucket_by=(n, cols)`` which writes a bucketed+sorted table — the
persistent no-shuffle-join layout (SURVEY.md §2.3 sorted merge analog).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def _writer(
    df: DataFrame,
    mode: str,
    partition_on: Sequence[str] | None,
):
    w = df.write.mode(mode)
    if partition_on:
        w = w.partitionBy(*partition_on)
    return w


def to_parquet(
    df: DataFrame,
    path: str,
    partition_on: Sequence[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
    bucket_by: tuple[int, Sequence[str]] | None = None,
    sort_by: Sequence[str] | None = None,
    table_name: str | None = None,
) -> None:
    if bucket_by:
        n, cols = bucket_by
        w = df.write.mode(mode).option("path", path).bucketBy(n, *cols)
        if sort_by:
            w = w.sortBy(*sort_by)
        w.format("parquet").saveAsTable(table_name or path.rstrip("/").split("/")[-1])
        return
    _writer(df, mode, partition_on).option("compression", compression).parquet(path)


def to_orc(
    df: DataFrame,
    path: str,
    partition_on: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    _writer(df, mode, partition_on).orc(path)


def to_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    _writer(df, mode, None).option("sep", sep).option("header", header).csv(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _writer(df, mode, None).json(path)


def upsert_partitions(
    df: DataFrame,
    path: str,
    partition_on: Sequence[str],
    compression: str = "snappy",
) -> None:
    """Idempotent partition-level upsert via dynamic partition
    overwrite: only the hive partitions PRESENT IN ``df`` are replaced;
    every other partition under ``path`` is untouched.  This is the
    100 TB incremental-ingestion pattern on plain parquet (no
    table-format dependency): late or corrected data re-lands its own
    day/type partitions, reruns are idempotent, and readers never see a
    half-deleted dataset (each partition swap is a directory rename).

    The overwrite mode is scoped via the writer option, not session
    conf, so concurrent jobs with static overwrite semantics are not
    affected."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", compression)
        .partitionBy(*partition_on)
        .parquet(path)
    )
