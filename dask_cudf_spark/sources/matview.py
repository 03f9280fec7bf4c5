"""Incremental materialized-view maintenance over txlog tables
(round 7).

A grouped-aggregate view over an append-only txlog table refreshes by
aggregating ONLY the commits that landed since the last refresh and
merging those partials into the stored view — a commit-sized scan
instead of a full-table scan.  At 100 TB this is the difference
between re-reading the table and reading the day's appends; it is the
standard Delta/Iceberg incremental-MV pattern (and the batch twin of
a streaming aggregation with a txlog sink).

Supported aggregate functions are the SELF-DECOMPOSABLE ones — sum,
count, min, max — whose partials merge associatively (sum+sum,
count+count via sum, min-of-mins, max-of-maxes), the same property
Spark's own partial/final aggregation relies on.  mean = sum/count at
read time.  avg/median/etc. are deliberately absent: non-decomposable
aggregates cannot be maintained incrementally without auxiliary
state.

Source OVERWRITE commits (compaction rewrites live dirs, so "new dirs
since version N" no longer equals "new rows") invalidate the delta
shortcut; refresh detects them and falls back to a FULL recompute —
correct, and recorded as ``mode='full'`` in the result so operators
can see when incrementality was lost.

The view itself is a txlog table: every refresh is an ``overwrite``
commit whose stats blob carries ``{"matview": {"src_version": N}}``,
so (a) the next refresh knows where the delta starts, (b) time travel
over view states works like any table, and (c) a concurrent writer
race surfaces through the txlog's own exclusive-create primitive.

Upstream note: the reference family has no MV machinery; this extends
the engine's txlog (SURVEY.md §2.11) the way a production pipeline
over the reference would have to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txlog import _read_log, commit, read_snapshot

#: agg spec: out_col -> (fn, src_col); fn in _DECOMPOSABLE.  For
#: "count", src_col is ignored (row count).
_DECOMPOSABLE = ("sum", "count", "min", "max")
#: merge step per fn: how partials of the SAME group combine
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _check_spec(aggs: dict) -> None:
    for out, (fn, _col) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"{out}: {fn!r} is not incrementally maintainable "
                f"(decomposable fns: {_DECOMPOSABLE}); derive it at "
                "read time (e.g. mean = sum/count)"
            )


def _partial(df: DataFrame, group_cols: list[str], aggs: dict) -> DataFrame:
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            exprs.append(F.count(F.lit(1)).cast("long").alias(out))
        elif fn == "sum":
            exprs.append(F.sum(col).alias(out))
        else:
            exprs.append(getattr(F, fn)(col).alias(out))
    return df.groupBy(*group_cols).agg(*exprs)


def _merge(df: DataFrame, group_cols: list[str], aggs: dict) -> DataFrame:
    exprs = [
        _MERGE[fn](out).alias(out) for out, (fn, _c) in aggs.items()
    ]
    return df.groupBy(*group_cols).agg(*exprs)


def _last_refresh(spark: SparkSession, dst: str) -> int | None:
    """src_version recorded by the most recent refresh commit, or None
    for a view that does not exist yet (_read_log returns [] for a
    missing table)."""
    entries = _read_log(spark, dst)
    for e in reversed(entries):
        mv = (e.get("stats") or {}).get("matview")
        if mv is not None:
            return mv["src_version"]
    return None


def refresh_matview(
    spark: SparkSession,
    src: str,
    dst: str,
    group_cols: list[str],
    aggs: dict,
) -> dict:
    """Create or refresh the materialized view at ``dst`` for
    ``src.groupBy(group_cols).agg(aggs)``.

    Returns ``{"mode": 'full'|'incremental'|'noop',
    "src_version": N}``.  'full' on first build or after a source
    overwrite/compaction; 'incremental' reads only the delta commits;
    'noop' when the source has not advanced."""
    _check_spec(aggs)
    src_entries = _read_log(spark, src)
    if not src_entries:
        raise FileNotFoundError(f"no commits at {src}")
    src_version = src_entries[-1]["version"]
    base = src.rstrip("/")

    last = _last_refresh(spark, dst)
    if last is not None and last == src_version:
        return {"mode": "noop", "src_version": src_version}

    delta_entries = (
        [e for e in src_entries if e["version"] > last]
        if last is not None
        else None
    )
    incremental = delta_entries is not None and all(
        e["op"] == "append" for e in delta_entries
    )

    if incremental:
        delta_dirs = [d for e in delta_entries for d in e["dirs"]]
        delta = spark.read.option("mergeSchema", "true").parquet(
            *[f"{base}/{d}" for d in delta_dirs]
        )
        merged = _merge(
            _partial(delta, group_cols, aggs).unionByName(
                read_snapshot(spark, dst)
            ),
            group_cols,
            aggs,
        )
        mode = "incremental"
    else:
        merged = _partial(
            read_snapshot(spark, src), group_cols, aggs
        )
        mode = "full"

    commit(
        merged,
        dst,
        op="overwrite",
        extra_stats={"matview": {"src_version": src_version, "mode": mode}},
    )
    return {"mode": mode, "src_version": src_version}


def read_matview(spark: SparkSession, dst: str) -> DataFrame:
    """The view's current contents (latest refresh)."""
    return read_snapshot(spark, dst)


def matview_is_fresh(spark: SparkSession, src: str, dst: str) -> bool:
    """True when the view reflects the source's latest version."""
    entries = _read_log(spark, src)
    return bool(entries) and _last_refresh(spark, dst) == entries[-1][
        "version"
    ]


__all__ = [
    "refresh_matview",
    "read_matview",
    "matview_is_fresh",
]
