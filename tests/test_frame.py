"""Facade API parity vs pandas (the reference's own test strategy:
oracle tests against pandas, SURVEY.md §5 — dd.assert_eq style)."""

from __future__ import annotations

import pandas as pd
import pytest

from dask_cudf_spark import frame as dcs

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def pdf_customer():
    return pd.read_parquet(f"{SF_DIR}/customer.parquet")


@pytest.fixture(scope="module")
def pdf_orders():
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def f_customer(spark):
    return dcs.read_parquet(spark, f"{SF_DIR}/customer.parquet")


@pytest.fixture(scope="module")
def f_orders(spark):
    return dcs.read_parquet(spark, f"{SF_DIR}/orders.parquet")


def eq(got: pd.DataFrame, want: pd.DataFrame, sort_by=None, **kw):
    if sort_by:
        got = got.sort_values(sort_by).reset_index(drop=True)
        want = want.sort_values(sort_by).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False, **kw)


def test_mask_filter_assign(f_customer, pdf_customer):
    got = (
        f_customer[(f_customer.c_acctbal > 1000) & (f_customer.c_mktsegment == "BUILDING")]
        .assign(bal_k=f_customer.c_acctbal / 1000.0)[["c_custkey", "bal_k"]]
        .compute()
    )
    want = pdf_customer[
        (pdf_customer.c_acctbal > 1000) & (pdf_customer.c_mktsegment == "BUILDING")
    ].assign(bal_k=pdf_customer.c_acctbal / 1000.0)[["c_custkey", "bal_k"]]
    eq(got, want, sort_by="c_custkey")


def test_query_string(f_customer, pdf_customer):
    got = f_customer.query("c_acctbal > 5000 and c_nationkey < 10").compute()
    want = pdf_customer.query("c_acctbal > 5000 and c_nationkey < 10")
    eq(got, want, sort_by="c_custkey")


def test_merge_inner_suffixes(f_orders, f_customer, pdf_orders, pdf_customer):
    got = (
        f_orders.merge(
            f_customer.rename({"c_custkey": "o_custkey"}), on="o_custkey", how="inner"
        )[["o_orderkey", "c_name"]]
        .compute()
    )
    want = pdf_orders.merge(
        pdf_customer.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey"
    )[["o_orderkey", "c_name"]]
    eq(got, want, sort_by="o_orderkey")


def test_merge_left_on_right_on(f_orders, f_customer, pdf_orders, pdf_customer):
    got = f_orders.merge(
        f_customer, left_on="o_custkey", right_on="c_custkey", how="left"
    )[["o_orderkey", "c_name"]].compute()
    want = pdf_orders.merge(
        pdf_customer, left_on="o_custkey", right_on="c_custkey", how="left"
    )[["o_orderkey", "c_name"]]
    eq(got, want, sort_by="o_orderkey")


def test_groupby_agg_dict(f_orders, pdf_orders):
    got = (
        f_orders.groupby("o_orderpriority")
        .agg({"o_totalprice": ["min", "max", "count"]})
        .compute()
    )
    want = (
        pdf_orders.groupby("o_orderpriority")["o_totalprice"]
        .agg(["min", "max", "count"])
        .reset_index()
        .rename(
            columns={
                "min": "o_totalprice_min",
                "max": "o_totalprice_max",
                "count": "o_totalprice_count",
            }
        )
    )
    eq(got, want, sort_by="o_orderpriority")


def test_groupby_mean(f_customer, pdf_customer):
    got = f_customer.groupby("c_mktsegment").mean(["c_acctbal"]).compute()
    want = (
        pdf_customer.groupby("c_mktsegment")["c_acctbal"].mean().reset_index()
    ).rename(columns={"c_acctbal": "c_acctbal"})
    eq(got, want, sort_by="c_mktsegment", check_exact=False)


def test_sort_nlargest(f_orders, pdf_orders):
    got = f_orders.nlargest(7, "o_totalprice").compute()
    want = pdf_orders.nlargest(7, "o_totalprice")
    eq(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
    )


def test_str_accessor(f_customer, pdf_customer):
    c = f_customer
    got = c.assign(
        up=c.c_mktsegment.str.lower(),
        has=c.c_mktsegment.str.contains("BUILD", regex=False),
        head3=c.c_mktsegment.str.slice(0, 3),
        nlen=c.c_name.str.len(),
    )[["c_custkey", "up", "has", "head3", "nlen"]].compute()
    want = pdf_customer.assign(
        up=pdf_customer.c_mktsegment.str.lower(),
        has=pdf_customer.c_mktsegment.str.contains("BUILD", regex=False),
        head3=pdf_customer.c_mktsegment.str.slice(0, 3),
        nlen=pdf_customer.c_name.str.len(),
    )[["c_custkey", "up", "has", "head3", "nlen"]]
    eq(got, want, sort_by="c_custkey")


def test_dt_accessor(f_orders, pdf_orders):
    got = f_orders.assign(
        yr=f_orders.o_orderdate.dt.year,
        dow=f_orders.o_orderdate.dt.dayofweek,
        q=f_orders.o_orderdate.dt.quarter,
    )[["o_orderkey", "yr", "dow", "q"]].compute()
    want = pdf_orders.assign(
        yr=pdf_orders.o_orderdate.dt.year,
        dow=pdf_orders.o_orderdate.dt.dayofweek,
        q=pdf_orders.o_orderdate.dt.quarter,
    )[["o_orderkey", "yr", "dow", "q"]]
    eq(got, want, sort_by="o_orderkey")


def test_drop_duplicates_value_counts(f_orders, pdf_orders):
    got = f_orders[["o_orderstatus"]].drop_duplicates().compute()
    want = pdf_orders[["o_orderstatus"]].drop_duplicates()
    eq(got, want, sort_by="o_orderstatus")

    got_vc = f_orders.value_counts("o_orderstatus").compute()
    want_vc = (
        pdf_orders["o_orderstatus"].value_counts().reset_index()
    )
    want_vc.columns = ["o_orderstatus", "count"]
    eq(got_vc, want_vc, sort_by="o_orderstatus")


def test_concat_missing_cols(spark):
    a = dcs.from_dict(spark, {"x": [1, 2], "y": ["a", "b"]})
    b = dcs.from_dict(spark, {"x": [3], "z": [9.0]})
    got = dcs.concat([a, b]).compute()
    assert sorted(got.columns) == ["x", "y", "z"]
    assert len(got) == 3
    assert got[got.x == 3]["y"].isna().all()


def test_map_partitions(f_customer, pdf_customer):
    got = f_customer.map_partitions(
        lambda pdf: pdf.assign(doubled=pdf.c_acctbal * 2)[["c_custkey", "doubled"]],
        schema="c_custkey bigint, doubled double",
    ).compute()
    want = pdf_customer.assign(doubled=pdf_customer.c_acctbal * 2)[
        ["c_custkey", "doubled"]
    ]
    eq(got, want, sort_by="c_custkey")


def test_groupby_apply(f_customer, pdf_customer):
    def topbal(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(1, "c_acctbal")[["c_mktsegment", "c_custkey"]]

    got = f_customer.groupby("c_mktsegment").apply(
        topbal, schema="c_mktsegment string, c_custkey bigint"
    ).compute()
    # equivalent to per-group nlargest(1, c_acctbal): stable desc sort
    # then head(1) per group (avoids pandas' groupby.apply deprecation)
    want = (
        pdf_customer.sort_values("c_acctbal", ascending=False, kind="stable")
        .groupby("c_mktsegment")
        .head(1)[["c_mktsegment", "c_custkey"]]
        .reset_index(drop=True)
    )
    eq(got, want, sort_by="c_mktsegment")


def test_rolling(f_orders, pdf_orders):
    got = (
        f_orders.groupby("o_custkey")
        .rolling(3, order_by="o_orderdate")
        .sum("o_totalprice")[["o_orderkey", "o_totalprice_roll_sum"]]
        .compute()
    )
    pdf = pdf_orders.sort_values(["o_custkey", "o_orderdate"])
    want = pdf.assign(
        o_totalprice_roll_sum=pdf.groupby("o_custkey")["o_totalprice"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )[["o_orderkey", "o_totalprice_roll_sum"]]
    eq(got, want, sort_by="o_orderkey", check_exact=False)


def test_set_index_layout(f_orders):
    laid = f_orders.set_index("o_custkey", npartitions=4)
    assert laid.npartitions == 4
    assert laid.count() == f_orders.count()


def test_sink_roundtrip(tmp_path, f_customer):
    out = str(tmp_path / "cust_out")
    f_customer.to_parquet(out, partition_on=["c_mktsegment"])
    back = pd.read_parquet(out)
    assert len(back) == f_customer.count()
    assert "c_mktsegment" in back.columns


def test_ffill_bfill(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "i": [1, 2, 3, 4, 1, 2],
            "v": [None, 10.0, None, 20.0, None, None],
        }
    )
    f = dcs.from_pandas(spark, pdf)

    def norm(vals):
        return [None if pd.isna(x) else x for x in vals]

    got_f = (
        f.ffill(["v"], by=["k"], order=["i"])
        .spark.orderBy("k", "i")
        .toPandas()["v"]
        .tolist()
    )
    exp_f = pdf.sort_values(["k", "i"]).groupby("k")["v"].ffill().tolist()
    assert norm(got_f) == norm(exp_f)

    got_b = (
        f.bfill(["v"], by=["k"], order=["i"])
        .spark.orderBy("k", "i")
        .toPandas()["v"]
        .tolist()
    )
    exp_b = pdf.sort_values(["k", "i"]).groupby("k")["v"].bfill().tolist()
    assert norm(got_b) == norm(exp_b)

    # chained fill plans a single exchange (shared partitioning)
    chained = f.ffill(["v"], by=["k"], order=["i"]).bfill(
        ["v"], by=["k"], order=["i"]
    )
    from dask_cudf_spark.plans import audit

    assert audit(chained.spark).n_shuffles == 1


def test_interpolate_linear(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "t": [0.0, 10.0, 20.0, 30.0, 0.0, 10.0],
            "v": [None, 1.0, None, 3.0, None, None],
        }
    )
    f = dcs.from_pandas(spark, pdf)
    got = (
        f.interpolate(["v"], by=["k"], axis_col="t")
        .spark.orderBy("k", "t")
        .toPandas()["v"]
        .tolist()
    )
    # leading gap copies next valid; interior gap is the t-weighted
    # line (t=20 halfway between 10 and 30 -> 2.0); all-null stays null
    exp = [1.0, 1.0, 2.0, 3.0, None, None]
    assert [None if pd.isna(x) else x for x in got] == exp

    from dask_cudf_spark.plans import audit

    assert audit(f.interpolate(["v"], by=["k"], axis_col="t").spark).n_shuffles == 1


def test_groupby_median_quantile_rolling_median(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "i": [1, 2, 3, 4, 1, 2, 3],
            "v": [1.0, 3.0, 2.0, 10.0, 5.0, 7.0, 6.0],
        }
    )
    f = dcs.from_pandas(spark, pdf)

    med = {
        r["k"]: r["v_median"]
        for r in f.groupby("k").median("v").spark.collect()
    }
    exp = pdf.groupby("k")["v"].median().to_dict()
    assert med == exp

    q75 = {
        r["k"]: r["v_q0_75"]
        for r in f.groupby("k").quantile("v", 0.75).spark.collect()
    }
    exp75 = pdf.groupby("k")["v"].quantile(0.75).to_dict()
    assert q75 == pytest.approx(exp75)

    roll = (
        f.groupby("k")
        .rolling(3, order_by="i")
        .median("v")
        .spark.orderBy("k", "i")
        .toPandas()["v_roll_median"]
        .tolist()
    )
    exp_roll = (
        pdf.sort_values(["k", "i"])
        .groupby("k")["v"]
        .rolling(3, min_periods=1)
        .median()
        .tolist()
    )
    assert roll == pytest.approx(exp_roll)


def test_melt_pivot_tail(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "x": [1.0, 2.0, 3.0],
            "y": [10.0, 20.0, 30.0],
        }
    )
    f = dcs.from_pandas(spark, pdf)

    long = (
        f.melt("k", ["x", "y"]).spark.orderBy("k", "variable", "value").toPandas()
    )
    exp = (
        pdf.melt(id_vars="k", value_vars=["x", "y"])
        .sort_values(["k", "variable", "value"])
        .reset_index(drop=True)
    )
    assert long.values.tolist() == exp.values.tolist()

    wide = (
        f.melt("k", ["x", "y"])
        .pivot_table(index="k", columns="variable", values="value",
                     aggfunc="sum", pivot_values=["x", "y"])
        .spark.orderBy("k")
        .toPandas()
    )
    assert wide["x"].tolist() == [3.0, 3.0]
    assert wide["y"].tolist() == [30.0, 30.0]

    assert len(f.tail(2)) == 2


def test_salted_join_same_name_keys_and_how_guard(spark):
    import pytest as _pytest

    from dask_cudf_spark.operators import salted_join
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 30.0)], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "name"])

    out = salted_join(fact, dim, "k", "k", salt_on=F.col("v"), n_salts=4)
    rows = sorted((r["v"], r["name"]) for r in out.collect())
    assert rows == [(10.0, "a"), (20.0, "a"), (30.0, "b")]

    with _pytest.raises(ValueError):
        salted_join(fact, dim, "k", "k", salt_on=F.col("v"), how="full")


def test_tail_preserves_dtypes(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": [1.5, 2.5, 3.5]})
    f = dcs.from_pandas(spark, pdf)
    t = f.tail(2)
    assert str(t["a"].dtype) == "int64"
    assert str(t["b"].dtype) == "float64"


def test_tail_matches_head_on_nullable_and_nested(spark):
    """Round-4 ADVICE: tail()'s old astype alignment silently left
    NULL-bearing numerics as object and structs as Row objects.  tail
    now rides toPandas() itself, so dtypes AND values must equal
    head()'s for nullable ints, timestamps, arrays, and structs."""
    import datetime

    from dask_cudf_spark.frame import Frame

    sdf = spark.createDataFrame(
        [
            (1, 1.5, "a", datetime.datetime(2024, 1, 1), [1, 2], {"x": 1}),
            (None, None, None, None, None, None),
            (3, 2.5, "c", datetime.datetime(2024, 1, 3), [3], {"x": 3}),
        ],
        "i long, f double, s string, ts timestamp,"
        " arr array<long>, st struct<x: long>",
    )
    f = Frame(sdf)
    h, t = f.head(3), f.tail(3)
    assert h.dtypes.to_dict() == t.dtypes.to_dict()
    assert str(t["i"].dtype) == "float64"  # nullable int -> float64/NaN
    assert isinstance(t["st"].iloc[0], dict)  # struct -> dict, not Row
    pd.testing.assert_frame_equal(h, t)


def test_frame_diff_pct_change_cum(spark):
    pdf = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "b"], "t": [1, 2, 3, 1, 2],
         "v": [10.0, 15.0, 5.0, 0.0, 4.0]}
    )
    f = dcs.from_pandas(spark, pdf)
    d = f.diff("v", order="t", by="k").compute().sort_values(["k", "t"])
    got = d["v_diff"].tolist()
    assert pd.isna(got[0]) and got[1] == 5.0 and got[2] == -10.0
    assert pd.isna(got[3]) and got[4] == 4.0

    p = f.pct_change("v", order="t", by="k").compute().sort_values(["k", "t"])
    pc = p["v_pct_change"].tolist()
    assert pc[1] == pytest.approx(0.5) and pc[2] == pytest.approx(-2 / 3)
    assert pd.isna(pc[4])  # try_divide by zero -> null, not error

    cm = f.cummax("v", order="t", by="k").compute().sort_values(["k", "t"])
    assert cm["v_cummax"].tolist() == [10.0, 15.0, 15.0, 0.0, 4.0]
    cp = f.cumprod("v", order="t", by="k").compute().sort_values(["k", "t"])
    assert cp["v_cumprod"].tolist() == [10.0, 150.0, 750.0, 0.0, 0.0]


def test_frame_mask_mode(spark):
    pdf = pd.DataFrame({"v": [1, 2, 2, 3, 3, 3], "w": [1, 1, 1, 1, 1, 1]})
    f = dcs.from_pandas(spark, pdf)
    from pyspark.sql import functions as F

    m = f.mask(F.col("v") > 2, other=-1).compute()
    assert sorted(m["v"].tolist()) == [-1, -1, -1, 1, 2, 2]
    # pandas mask semantics: cond-true rows replaced in EVERY column
    assert m["w"].tolist() == [1, 1, 1, -1, -1, -1]
    assert f.mode("v").compute()["v"].tolist() == [3]
    # tie -> both values, ordered
    f2 = dcs.from_pandas(spark, pd.DataFrame({"v": [5, 5, 9, 9, 1]}))
    assert f2.mode("v").compute()["v"].tolist() == [5, 9]


def test_groupby_first_last_cum_transform_filter(spark):
    pdf = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "b", "c"], "t": [3, 1, 2, 2, 1, 1],
         "v": [30.0, 10.0, 20.0, 2.0, 1.0, 7.0]}
    )
    f = dcs.from_pandas(spark, pdf)
    g = f.groupby("k")

    fi = {r["k"]: r["v_first"] for r in g.first("v", "t")._sdf.collect()}
    la = {r["k"]: r["v_last"] for r in g.last("v", "t")._sdf.collect()}
    assert fi == {"a": 10.0, "b": 1.0, "c": 7.0}
    assert la == {"a": 30.0, "b": 2.0, "c": 7.0}

    cc = g.cumcount("t").compute().sort_values(["k", "t"])
    assert cc["cumcount"].tolist() == [0, 1, 2, 0, 1, 0]
    cm = g.cummax("v", "t").compute().sort_values(["k", "t"])
    assert cm["v_cummax"].tolist() == [10.0, 20.0, 30.0, 1.0, 2.0, 7.0]

    tr = g.transform("v", "sum").compute().sort_values(["k", "t"])
    assert tr["v_sum"].tolist() == [60.0, 60.0, 60.0, 3.0, 3.0, 7.0]

    kept = g.filter("count(*)", lambda c: c >= 2).compute()
    assert sorted(kept["k"].unique().tolist()) == ["a", "b"]


def test_partition_stats_counts_every_row(spark):
    from dask_cudf_spark.frame import Frame

    f = Frame(spark.range(0, 1000).repartition(8))
    stats = f.partition_stats()
    assert stats["n_rows"].sum() == 1000
    assert len(stats) <= 8
    assert (stats["n_rows"] > 0).all()
    # round-robin repartition: no pathological skew
    assert stats["n_rows"].max() <= 4 * stats["n_rows"].min()


def test_rollup_grouping_null_vs_data_null(spark):
    """The NULLS.md grouping-NULL vs data-NULL contract: a NULL data key
    aggregates as its own group (GROUPING()=0) and stays disjoint from
    the rolled-up subtotal row (GROUPING()=1) that also prints NULL."""
    from dask_cudf_spark.frame import from_dict

    f = from_dict(
        spark,
        {
            "lang": ["en", "en", None, None, "de"],
            "source": ["a", "b", "a", "a", "a"],
            "n": [1, 2, 4, 8, 16],
        },
    )
    out = (
        f.rollup(["lang", "source"])
        .agg({"n": "sum"}, grouping_flags=True)
        .spark.toPandas()
        .sort_values(["g_lang", "g_source", "lang", "source"], na_position="first")
    )
    # NULL data-lang group: g_lang=0, lang NULL, subtotal over source
    data_null = out[(out.g_lang == 0) & (out.g_source == 1) & (out.lang.isna())]
    assert data_null.n.tolist() == [12]
    # rolled-up grand total: g_lang=1, also prints NULL lang
    grand = out[(out.g_lang == 1) & (out.g_source == 1)]
    assert grand.n.tolist() == [31]
    # the flags keep the two NULL-printing rows disjoint
    assert len(out) == 4 + 3 + 1  # leaf groups + lang subtotals + grand


def test_cube_and_grouping_sets_surface(spark):
    from dask_cudf_spark.frame import from_dict

    f = from_dict(
        spark,
        {"k1": ["x", "x", "y"], "k2": ["p", "q", "p"], "v": [1, 2, 4]},
    )
    cube = f.cube(["k1", "k2"]).count().spark.toPandas()
    # 3 present leaf combos + 2 k1 margins + 2 k2 margins + grand total
    assert len(cube) == 3 + 2 + 2 + 1
    gs = (
        f.grouping_sets([["k1"], []], ["k1", "k2"])
        .agg({"v": "sum"}, grouping_flags=True)
        .spark.toPandas()
    )
    # exactly the asked-for margins: 2 k1 groups + 1 grand total
    assert len(gs) == 3
    assert sorted(gs.v.tolist()) == [3, 4, 7]
    # k2 is rolled up in every emitted set
    assert set(gs.g_k2.tolist()) == {1}


def test_grouping_modes_reject_window_shaped_ops(spark):
    """r12 ADVICE item 2: GroupBy.apply/rolling/shift/cumsum/cumcount
    hardcode a plain groupBy (or a plain window partitioning), so a
    rollup/cube/grouping_sets GroupBy must REFUSE them instead of
    silently executing plain-groupby semantics.  agg() keeps working."""
    import pytest as _pytest

    from dask_cudf_spark.frame import from_dict

    f = from_dict(
        spark,
        {"k1": ["x", "x", "y"], "k2": ["p", "q", "p"], "v": [1, 2, 4]},
    )
    for gb in (f.rollup(["k1", "k2"]), f.cube(["k1", "k2"]),
               f.grouping_sets([["k1"], []], ["k1", "k2"])):
        for op, args in (
            ("apply", (lambda pdf: pdf, "k1 string, k2 string, v bigint")),
            ("rolling", (2, "v")),
            ("shift", ("v",)),
            ("cumsum", ("v", "v")),
            ("cumcount", ("v",)),
        ):
            with _pytest.raises(NotImplementedError, match="plain groupby"):
                getattr(gb, op)(*args)
        # agg stays the supported surface
        assert gb.agg({"v": "sum"}).spark.count() > 0
    # plain groupby is unaffected
    assert f.groupby(["k1"]).cumsum("v", "v").spark.count() == 3


def test_levenshtein_counts_codepoints_not_bytes(spark):
    """Fixed-expectation pin (r11 ADVICE item 3): q_edit_distance's
    registered differential projects to ASCII because DuckDB's
    levenshtein counts BYTE edits — so the public F.levenshtein path
    would otherwise have NO non-ASCII coverage.  Spark's contract is
    CODEPOINT edits, including astral-plane (surrogate-pair) emoji;
    these expectations are the probed-and-frozen values (DuckDB reads
    2, 2, 2 and 4 for the CJK/accent/astral rows respectively)."""
    from pyspark.sql import functions as F

    pairs = [
        ("猫", "犬", 1),          # CJK substitution: 1 codepoint, 3 bytes
        ("日本語", "日本話", 1),
        ("café", "cafe", 1),      # é is 2 bytes
        ("αβγ", "αβδ", 1),
        ("😀😁", "😀😂", 1),      # astral plane: 4-byte codepoints
        ("a😀b", "ab", 1),        # single astral INSERTION, not 4 bytes
        ("", "😀", 1),
        ("abc", "abc", 0),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in pairs], "a string, b string"
    ).select("a", "b", F.levenshtein("a", "b").alias("d"))
    got = {(r.a, r.b): r.d for r in df.collect()}
    for a, b, want in pairs:
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)
