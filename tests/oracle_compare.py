"""Local replica of the driver's Spark-vs-DuckDB comparison
(__spark_entry__.py contract): row count + column names + an
order-insensitive exact value comparison.

Values are canonicalized cell-by-cell (floats must be bit-identical —
that is the whole point of the det.py discipline; timestamps normalized
to naive UTC) then compared as sorted row multisets.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import pandas as pd


def _canon(v: Any) -> Any:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        # exact repr: any bit difference must surface
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict)) or str(type(v).__name__) == "ndarray":
        # The DRIVER's canonicalizer (pandas.sort_values over all
        # columns) throws `unhashable type` on list cells — tuple-izing
        # here would ACCEPT locally what the driver rejects (that is
        # exactly how q_feature_hash_embed went driver-red in r9 while
        # the local replay stayed green).  Fail loudly instead: every
        # registered query must emit only scalar columns (array_join /
        # array_to_string the vector — see q_groupby_collect).
        raise TypeError(
            f"non-scalar cell {type(v).__name__} in query output — the "
            "driver's canonicalizer cannot hash this; emit a joined "
            "string instead (q_groupby_collect discipline)"
        )
    if isinstance(v, bytes):
        return v.hex()
    if pd.isna(v):
        return "<NULL>"
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort(key=repr)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch\n spark={sorted(spark_pdf.columns)}\n "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (i, s, d) for i, (s, d) in enumerate(zip(s_rows, d_rows)) if s != d
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (sorted-row idx, spark, duck):\n"
            + "\n".join(repr(x) for x in diffs)
        )
