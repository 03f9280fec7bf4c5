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


def to_parquet_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 20,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write (Delta/Iceberg OPTIMIZE ZORDER
    on plain parquet): rows are range-partitioned and sorted by the
    Morton interleave of (col_x, col_y) — queries/sorts.q_zorder_cluster's
    key — so every output file covers a TIGHT rectangle in both key
    dimensions and parquet's per-file column min/max footer stats prune
    on EITHER predicate, not just a primary sort key.

    Both keys are first min-max normalized onto the SAME ``bits``-wide
    integer range (the step Delta performs via range-bucketed ranks):
    interleaving raw keys of very different magnitudes leaves the
    z-value's high bits owned entirely by the wider key, which degrades
    to a single-key sort for the narrow one.

    Scale: one tiny min/max agg (broadcast back as a 1-row literal) +
    one range shuffle (RangePartitioner reservoir sample over the
    z-value) + a local sort — a global orderBy's cost; the interleave
    itself is codegen'd shifts/masks.  ``n_files`` caps the output
    layout (default: current shuffle parallelism)."""
    from pyspark.sql import functions as F

    from ..queries.sorts import _z_terms

    top = (1 << bits) - 1
    stats = df.agg(
        F.min(col_x).alias("__mnx"),
        F.max(col_x).alias("__mxx"),
        F.min(col_y).alias("__mny"),
        F.max(col_y).alias("__mxy"),
    )

    def norm(c, mn, mx):
        return F.floor(
            (F.col(c) - F.col(mn)).cast("double")
            * top
            / F.greatest(F.col(mx) - F.col(mn), F.lit(1)).cast("double")
        ).cast("long")

    z = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__zx", norm(col_x, "__mnx", "__mxx"))
        .withColumn("__zy", norm(col_y, "__mny", "__mxy"))
        .withColumn("__z", F.expr(_z_terms("__zx", "__zy", bits, spark=True)))
        .drop("__zx", "__zy", "__mnx", "__mxx", "__mny", "__mxy")
    )
    if n_files:
        z = z.repartitionByRange(n_files, "__z")
    else:
        z = z.repartitionByRange("__z")
    (
        z.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
