"""Reader wrappers mapping the reference's read_* signatures onto Spark.

Reference surface (SURVEY.md §2.1; upstream: python/dask_cudf/dask_cudf/io/):
  read_parquet(path, columns=, filters=, blocksize=, split_row_groups=, ...)
  read_csv(path, sep=, header=, dtype=, names=, na_values=, blocksize=)
  read_json(path, lines=True)
  read_orc(path, columns=)
  read_text(path, delimiter=)
  read_avro(path)

Spark-first notes:
- ``blocksize``/``split_row_groups`` (the reference's manual partition
  sizing) map to ``spark.sql.files.maxPartitionBytes`` — a session conf,
  honored here when ``blocksize`` is passed.
- ``filters`` (disjunctive-normal-form row-group pushdown) is subsumed by
  Catalyst predicate pushdown; we still accept the argument and translate
  it to a ``.filter`` so the scan prunes row groups identically.
- ``columns`` maps to ``.select`` → column pruning reaches the scan
  (ReadSchema in .explain).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _apply_columns(df: DataFrame, columns: Sequence[str] | None) -> DataFrame:
    return df.select(*columns) if columns else df


def _filters_to_condition(filters: Sequence[Any]):
    """Translate pyarrow-style DNF filters [[(col, op, val), ...], ...]
    (the reference's read_parquet ``filters=``) into a Spark Column."""
    ops = {
        "=": lambda c, v: F.col(c) == v,
        "==": lambda c, v: F.col(c) == v,
        "!=": lambda c, v: F.col(c) != v,
        "<": lambda c, v: F.col(c) < v,
        "<=": lambda c, v: F.col(c) <= v,
        ">": lambda c, v: F.col(c) > v,
        ">=": lambda c, v: F.col(c) >= v,
        "in": lambda c, v: F.col(c).isin(list(v)),
        "not in": lambda c, v: ~F.col(c).isin(list(v)),
    }
    if filters and isinstance(filters[0], tuple):  # single conjunction
        filters = [filters]
    disjuncts = []
    for conj in filters:
        cond = None
        for col, op, val in conj:
            term = ops[op](col, val)
            cond = term if cond is None else (cond & term)
        disjuncts.append(cond)
    out = disjuncts[0]
    for d in disjuncts[1:]:
        out = out | d
    return out


def read_parquet(
    spark: SparkSession,
    path: str | list[str],
    columns: Sequence[str] | None = None,
    filters: Sequence[Any] | None = None,
    blocksize: int | str | None = None,
    **options: Any,
) -> DataFrame:
    if blocksize is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(blocksize))
    reader = spark.read.options(**{k: str(v) for k, v in options.items()})
    df = reader.parquet(*(path if isinstance(path, list) else [path]))
    if filters:
        df = df.filter(_filters_to_condition(filters))
    return _apply_columns(df, columns)


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    sep: str = ",",
    header: bool | int = True,
    names: Sequence[str] | None = None,
    dtype: dict[str, str] | None = None,
    na_values: Sequence[str] | None = None,
    **options: Any,
) -> DataFrame:
    reader = (
        spark.read.option("sep", sep)
        .option("header", bool(header))
        .option("inferSchema", dtype is None)
    )
    if na_values:
        reader = reader.option("nullValue", na_values[0])
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if names:
        df = df.toDF(*names)
    if dtype:
        df = df.select(
            *[
                F.col(c).cast(dtype[c]).alias(c) if c in dtype else F.col(c)
                for c in df.columns
            ]
        )
    return df


def read_json(
    spark: SparkSession, path: str | list[str], lines: bool = True, **options: Any
) -> DataFrame:
    reader = spark.read.option("multiLine", not lines)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str | list[str], columns: Sequence[str] | None = None
) -> DataFrame:
    return _apply_columns(spark.read.orc(path), columns)


def read_text(
    spark: SparkSession, path: str | list[str], delimiter: str | None = None
) -> DataFrame:
    reader = spark.read
    if delimiter is not None and delimiter != "\n":
        reader = reader.option("lineSep", delimiter)
    return reader.text(path)


def read_avro(
    spark: SparkSession, path: str | list[str], fallback: bool = True
) -> DataFrame:
    """Avro reader with two paths:

    1. The spark-avro datasource jar when present (the fast native
       path; on a real cluster add ``--packages
       org.apache.spark:spark-avro_2.13:<spark-version>``).
    2. A pure-stdlib FALLBACK (r4, sources/avro.py): ``binaryFile``
       scan + spec-compliant container decode in Arrow-batched
       ``mapInPandas`` — fully functional where the jar is absent
       (this sandbox ships only the avro CORE jars, probed round 2),
       parallel per file, null + deflate codecs.

    ``fallback=False`` restores the old raise-on-missing-jar behavior.
    """
    try:
        df = spark.read.format("avro").load(path)
        df.schema  # force datasource resolution now, not at the action
        return df
    except Exception as e:
        jar_missing = "avro" in str(e).lower() and (
            "failed to find" in str(e).lower()
            or "data source" in str(e).lower()
            or "classnotfound" in str(e).lower()
        )
        if not (fallback and jar_missing):
            raise
    from .avro import read_avro_fallback

    return read_avro_fallback(spark, path)


def read_binary_files(
    spark: SparkSession,
    path: str | list[str],
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Read raw files as binary rows via Spark's built-in ``binaryFile``
    source — the real multimodal ingestion path (images / audio / video
    land as one row per file: path, modificationTime, length, content).
    Pairs with operators/multimodal: ``content`` is the payload column
    the frame-sampling / feature-extraction / resample operators take.

    ``max_bytes`` filters oversized blobs BY METADATA (the `length`
    column comes from the file listing, so pruned files' bytes are
    never read — at 100 TB the filter is pushed to the source and this
    matters).  ``glob`` maps to pathGlobFilter (e.g. "*.png")."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
