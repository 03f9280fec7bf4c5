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
        if v == 0.0:
            # signed zero: Spark's ROUND strips the sign of an
            # underflowing result (round(-6e-19, 6) -> +0.0) where
            # DuckDB keeps it (-0.0).  IEEE equality holds, the repr
            # differs — normalize so the bit-exact rule below applies
            # only to nonzero floats (r11 corpus fuzz, q_vector_norms
            # on +/-1e-20 embedding vectors).
            return repr(0.0)
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


def normalize_nullable_ints(pdf: pd.DataFrame) -> pd.DataFrame:
    """Nullable-BIGINT artifact (shared by the injection/corpus replay
    legs): a NULL in an integer column makes BOTH duckdb.fetchdf and
    Spark.toPandas deliver float64, but not always on the same side —
    14080 then canonicalizes differently from 14080.0.  For replay legs
    whose DATA carries nulls, integral float columns that actually
    CONTAIN nulls are normalized to nullable Int64 on both frames before
    the strict compare (the driver-gate replica above stays byte-strict:
    clean data has no nullable-int columns).  Only null-bearing columns
    are touched — normalizing never-null integral float64 would mask a
    genuine double-vs-bigint schema divergence whenever the data happens
    to be integral (round-10 ADVICE fix)."""
    for c in pdf.columns:
        if str(pdf[c].dtype) == "float64" and pdf[c].isna().any():
            nonnull = pdf[c].dropna()
            if (
                len(nonnull)
                and (nonnull % 1 == 0).all()
                and nonnull.abs().max() < 2**62
            ):
                pdf[c] = pdf[c].astype("Int64")
    return pdf


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
