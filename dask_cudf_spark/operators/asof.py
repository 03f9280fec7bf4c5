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
) -> DataFrame:
    """pandas.merge_asof semantics on Spark DataFrames.

    For each left row, attach the most recent (backward) or next
    (forward) right row's value columns within the same `by` group.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in by_cols and c != on]
    out_names = {c: f"{suffix}_{c}" for c in right_value_cols}

    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_value_cols],
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
        *[F.col(c).alias(out_names[c]) for c in right_value_cols],
    )
    unioned = left_tagged.unionByName(right_tagged)

    # Exact matches visible <=> right rows order before left at equal ts.
    tie = F.asc("__is_left") if allow_exact_matches else F.desc("__is_left")
    if direction == "backward":
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.asc(on), tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.desc(on), tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731

    picked = unioned.select(
        *[c for c in unioned.columns if c not in out_names.values()],
        *[pick(out_names[c]).over(w).alias(out_names[c]) for c in right_value_cols],
    )
    return picked.filter(F.col("__is_left") == 1).drop("__is_left")
