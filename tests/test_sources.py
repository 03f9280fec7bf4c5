"""Reader/writer round-trips (SURVEY.md §2.1): every reference io
format maps onto Spark readers with identical contents back."""

from __future__ import annotations

import pandas as pd
import pytest

from dask_cudf_spark import sources
from dask_cudf_spark.sources import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def customer(spark):
    return load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


def _sorted_pdf(df):
    return (
        df.toPandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
        .astype({"c_custkey": "int64", "c_acctbal": "float64"})
    )


def test_parquet_roundtrip(spark, tmp_path, customer):
    out = str(tmp_path / "pq")
    sources.to_parquet(customer, out, partition_on=["c_mktsegment"])
    back = sources.read_parquet(spark, out)
    assert sorted(back.columns) == sorted(customer.columns)
    pd.testing.assert_frame_equal(
        _sorted_pdf(back.select(*customer.columns)), _sorted_pdf(customer)
    )


def test_csv_roundtrip(spark, tmp_path, customer):
    out = str(tmp_path / "csv")
    sources.to_csv(customer, out, sep="|")
    back = sources.read_csv(spark, out, sep="|", header=True)
    pd.testing.assert_frame_equal(
        _sorted_pdf(back.select(*customer.columns)), _sorted_pdf(customer)
    )


def test_json_roundtrip(spark, tmp_path, customer):
    out = str(tmp_path / "json")
    sources.to_json(customer, out)
    back = sources.read_json(spark, out)
    pd.testing.assert_frame_equal(
        _sorted_pdf(back.select(*customer.columns)), _sorted_pdf(customer)
    )


def test_orc_roundtrip(spark, tmp_path, customer):
    out = str(tmp_path / "orc")
    sources.to_orc(customer, out)
    back = sources.read_orc(spark, out)
    pd.testing.assert_frame_equal(
        _sorted_pdf(back.select(*customer.columns)), _sorted_pdf(customer)
    )


def test_read_text(spark, tmp_path, customer):
    out = str(tmp_path / "txt_src")
    customer.select("c_name").write.mode("overwrite").text(out)
    back = sources.read_text(spark, out)
    assert back.columns == ["value"]
    assert back.count() == customer.count()


def test_read_parquet_filters_pushdown(spark):
    # reference read_parquet(filters=[(col,op,val)]) -> pushed predicate
    df = sources.read_parquet(
        spark,
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        filters=[("l_quantity", "<", 10.0)],
    )
    assert df.columns == ["l_orderkey", "l_quantity"]
    from dask_cudf_spark.plans import audit

    a = audit(df)
    assert any("l_quantity" in f for f in a.pushed_filters)
