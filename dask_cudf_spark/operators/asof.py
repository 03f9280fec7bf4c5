"""As-of (point-in-time) join.

dask exposes merge_asof but it is unsupported on the cudf backend
(SURVEY.md §2.3); we provide it Spark-first.

Algorithm (backward direction): tag left rows 1 / right rows 0, union
on (by, on), then per `by` key take
``last(right_value, ignorenulls=True)`` over the event-time-ordered
window ending at the current row.  Right rows sort before left rows at
equal timestamps so exact matches are visible (pandas
allow_exact_matches=True semantics).

Scale: ONE hash shuffle on `by` + an in-partition sort — same cost
shape as any windowed op; never a nested-loop or range join.  Skewed
`by` keys can be salted upstream.  This is the standard
"union + last_value" point-in-time pattern used on Spark for
feature-store joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    right_value_cols: Sequence[str] | None = None,
    suffix: str = "right",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance=None,
) -> DataFrame:
    """pandas.merge_asof semantics on Spark DataFrames.

    For each left row, attach the most recent (backward), next
    (forward), or closest-in-time (nearest; ties prefer backward) right
    row's value columns within the same `by` group.  `nearest` costs
    one extra in-partition sort (both directions are evaluated over the
    same single shuffle), never a second shuffle.

    `tolerance` (a number for numeric `on`, or seconds for timestamp
    `on`) nulls out matches farther than the given distance, mirroring
    pandas; it is applied after the window pass so it adds no shuffle.

    PRECONDITION (r11 events-corpus finding): right rows must be
    UNIQUE per (by, on) — with duplicates, which right row's values
    carry is engine-arbitrary (pandas resolves such ties by input
    order, which has no distributed analog; DuckDB's native ASOF JOIN
    is equally unspecified).  Dedupe the point-in-time side first
    (e.g. groupBy(by, on).agg(max(value))), the standard feature-store
    discipline — see queries/joins._asof_inputs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in by_cols and c != on]
    out_names = {c: f"{suffix}_{c}" for c in right_value_cols}
    carry = list(right_value_cols)
    if direction == "nearest" or tolerance is not None:
        # carry the matched right timestamp to measure distance per side
        out_names = {**out_names, "__on": "__right_on"}
        carry = carry + ["__on"]

    # The carried right columns ride in ONE struct: `last(ignorenulls)`
    # must skip LEFT rows (struct NULL) but never tear fields apart —
    # per-column picks pulled a non-null `value` from an OLDER right
    # row than the matched `ts` whenever the matched row's value was
    # NULL (round-9 null-injection finding).  A struct over a right row
    # is non-null even when every field is null, so the pick stays
    # row-aligned.
    from pyspark.sql.types import StructField, StructType

    asof_struct = StructType(
        [
            StructField(
                out_names[c],
                right.schema[c if c != "__on" else on].dataType,
            )
            for c in carry
        ]
    )
    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(asof_struct).alias("__asof"),
    )
    right_tagged = right.select(
        *by_cols,
        F.col(on),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by_cols and c != on
        ],
        F.lit(0).alias("__is_left"),
        F.struct(
            *[
                F.col(c if c != "__on" else on).alias(out_names[c])
                for c in carry
            ]
        ).alias("__asof"),
    )
    unioned = left_tagged.unionByName(right_tagged)

    # Exact matches visible <=> right rows order before left at equal ts.
    tie = F.asc("__is_left") if allow_exact_matches else F.desc("__is_left")
    w_bwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.asc(on), tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.desc(on), tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def pick(c, w):
        return F.last(c, ignorenulls=True).over(w)

    from pyspark.sql.types import TimestampNTZType, TimestampType

    # parquet timestamps may surface as TIMESTAMP or TIMESTAMP_NTZ
    # depending on writer metadata; both need the µs conversion (a raw
    # ts - ts is an INTERVAL, not comparable to a numeric tolerance)
    is_ts = isinstance(left.schema[on].dataType, (TimestampType, TimestampNTZType))

    def micros(c):
        # cast NTZ -> instant first; unix_micros requires TIMESTAMP.
        # CONTRACT: the session timezone must be a fixed-offset zone
        # (load_table pins UTC session-wide).  Under a DST zone the
        # NTZ->instant offset is time-dependent, so tolerance/nearest
        # distances straddling a DST transition would shift by the DST
        # delta; with a fixed offset it cancels in every distance.
        return F.unix_micros(c.cast("timestamp")) if is_ts else c

    keep = [c for c in unioned.columns if c != "__asof"]

    def expand(struct_col):
        return [
            struct_col.getField(out_names[c]).alias(out_names[c])
            for c in carry
        ]

    if direction == "backward":
        picked = unioned.select(
            *keep, *expand(pick("__asof", w_bwd))
        )
    elif direction == "forward":
        picked = unioned.select(
            *keep, *expand(pick("__asof", w_fwd))
        )
    else:
        # nearest: evaluate both directions (one shuffle, two sorts),
        # then choose per row by time distance; ties -> backward
        both = unioned.select(
            *keep,
            pick("__asof", w_bwd).alias("__b"),
            pick("__asof", w_fwd).alias("__f"),
        )
        b_ts = F.col("__b").getField("__right_on")
        f_ts = F.col("__f").getField("__right_on")
        use_bwd = f_ts.isNull() | (
            b_ts.isNotNull()
            & (
                (micros(F.col(on)) - micros(b_ts))
                <= (micros(f_ts) - micros(F.col(on)))
            )
        )
        picked = both.select(
            *keep,
            *expand(F.when(use_bwd, F.col("__b")).otherwise(F.col("__f"))),
        )
    if tolerance is not None:
        # distance in µs for timestamps, raw units for numerics
        tol = int(tolerance * 1_000_000) if is_ts else tolerance
        dist = F.abs(micros(F.col(on)) - micros(F.col("__right_on")))
        within = F.col("__right_on").isNotNull() & (dist <= F.lit(tol))
        picked = picked.select(
            *[c for c in picked.columns if c not in out_names.values()],
            *[
                F.when(within, F.col(out_names[c])).alias(out_names[c])
                for c in right_value_cols
            ],
        )
    return (
        picked.filter(F.col("__is_left") == 1)
        .drop("__is_left", "__right_on")
    )
