"""Named-table loading for the driver's testdata layout (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Spark has no nanosecond timestamps (TIMESTAMP is µs); events.ts is
# parquet TIMESTAMP(NANOS) (FIXTURES.md).  Read nanos as long, then
# truncate to µs — exactly what DuckDB's TIMESTAMP_NS -> TIMESTAMP cast
# does, so both engines see identical values.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan: vectorized reader,
    column pruning and filter pushdown apply automatically downstream."""
    # Timestamps must compare as naive UTC against the oracle even when
    # the caller's session (e.g. the driver's) didn't set a timezone.
    # Intentionally session-wide and never restored: NTZ casts and
    # timestamp rendering are re-evaluated lazily long after this call
    # returns (streaming micro-batches, deferred actions), so a
    # scoped save/restore would silently flip results mid-query.
    # streaming/jobs.events_stream documents the same contract.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set(_NANOS_CONF, "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # parquet timestamp[us] with isAdjustedToUTC=false surfaces
            # as TIMESTAMP_NTZ under Spark 4's NTZ inference; downstream
            # code (unix_* conversions, bigint casts, watermarks) is
            # written against TIMESTAMP, and with the session tz pinned
            # UTC above the instant values are identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scale_out(
    df: DataFrame,
    min_partitions: int | None = None,
    bytes_per_task: int = 256 << 10,
) -> DataFrame:
    """Ensure compute-bound stages use every core — without shattering
    tiny inputs into per-task overhead.

    A small parquet file arrives as ONE input split, so an expensive
    per-row stage (minhash signatures, simhash votes, cosine scoring —
    all interpreted higher-order functions) runs on one core while the
    rest idle.  At 100 TB the input has thousands of splits and this is
    a no-op; below the core count it round-robins once (the shuffle
    moves only what a single split holds, so it is cheap by
    construction).  This is the moral twin of dask-cudf's
    ``repartition(npartitions=...)`` before a compute-heavy
    ``map_partitions``.

    The target is SIZE-AWARE (r4): Catalyst's optimizedPlan statistics
    give the plan's estimated bytes for free, and the fan-out is
    ceil(bytes / bytes_per_task) clamped to [1, defaultParallelism].
    A 0.5 MB corpus becomes ~2 tasks instead of 32 (32 micro-tasks of
    scheduling + Arrow round trips measured 2x slower than 2 right-
    sized ones at sf0.1), while anything bigger than cores *
    bytes_per_task still fans out to every core exactly as before.
    Overestimated stats (post-join plans) only push the target back
    toward defaultParallelism — never under-parallelize below the
    explicit ``min_partitions``."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if min_partitions is not None:
        target = min_partitions
    else:
        target = cores
        try:
            size = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
            if 0 < size < cores * bytes_per_task:
                target = max(1, -(-size // bytes_per_task))
        except Exception:
            pass  # stats unavailable -> conservative full fan-out
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views so spark.sql() queries work."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
