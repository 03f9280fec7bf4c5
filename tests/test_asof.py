"""merge_asof vs pandas.merge_asof on adversarial small frames.

Covers all three directions, allow_exact_matches, and tolerance —
pandas is the semantics oracle (dask exposes pandas' signature;
unsupported on the cudf backend per SURVEY.md §2.3).
"""
from __future__ import annotations

import pandas as pd
import pytest

from dask_cudf_spark.operators.asof import merge_asof

# left probes: before-all, exact-hit, between, tie-equidistant, after-all
LEFT = pd.DataFrame(
    {
        "g": ["a"] * 5 + ["b"] * 2 + ["c"],
        "t": [0, 10, 14, 15, 100, 5, 6, 7],
        "lid": list(range(8)),
    }
)
# right: group a has points 10/20; b has 6; c is absent
RIGHT = pd.DataFrame(
    {
        "g": ["a", "a", "b"],
        "t": [10, 20, 6],
        "v": [1.0, 2.0, 3.0],
    }
)


def _spark_asof(spark, direction, allow_exact=True, tolerance=None):
    ldf = spark.createDataFrame(LEFT)
    rdf = spark.createDataFrame(RIGHT)
    out = merge_asof(
        ldf,
        rdf,
        on="t",
        by="g",
        right_value_cols=["v"],
        suffix="r",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=tolerance,
    )
    return (
        out.toPandas()
        .sort_values("lid")
        .reset_index(drop=True)[["g", "t", "lid", "r_v"]]
    )


def _pandas_asof(direction, allow_exact=True, tolerance=None):
    out = pd.merge_asof(
        LEFT.sort_values("t"),
        RIGHT.sort_values("t"),
        on="t",
        by="g",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=tolerance,
    )
    return (
        out.rename(columns={"v": "r_v"})
        .sort_values("lid")
        .reset_index(drop=True)[["g", "t", "lid", "r_v"]]
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_directions_match_pandas(spark, direction, allow_exact):
    got = _spark_asof(spark, direction, allow_exact)
    want = _pandas_asof(direction, allow_exact)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_tolerance_matches_pandas(spark, direction):
    got = _spark_asof(spark, direction, tolerance=4)
    want = _pandas_asof(direction, tolerance=4)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_rejects_bad_direction(spark):
    ldf = spark.createDataFrame(LEFT)
    rdf = spark.createDataFrame(RIGHT)
    with pytest.raises(ValueError, match="direction"):
        merge_asof(ldf, rdf, on="t", by="g", direction="sideways")


def test_merge_asof_facade(spark):
    """Module-level pandas-parity entry point wraps the operator."""
    import pandas as pd

    from dask_cudf_spark import frame as dcs

    trades = dcs.from_pandas(
        spark,
        pd.DataFrame({"sym": ["A", "A"], "t": [5, 10], "qty": [1, 2]}),
    )
    quotes = dcs.from_pandas(
        spark,
        pd.DataFrame({"sym": ["A", "A"], "t": [4, 9], "px": [100.0, 101.0]}),
    )
    out = (
        dcs.merge_asof(trades, quotes, on="t", by="sym")
        .spark.orderBy("t")
        .toPandas()
    )
    assert out["right_px"].tolist() == [100.0, 101.0]
