"""JSON acceptance-profile pins (r11 events-corpus fuzz finding).

Spark (Jackson) and DuckDB (yyjson) disagree on which JSON EXTENSIONS
they accept, in BOTH directions, and Spark even disagrees with itself
between get_json_object and from_json on duplicate keys.  These are
definitional engine semantics — no DuckDB oracle can replicate
Jackson's acceptance profile — so the differential corpus fuzzer
(tests/corpus_gen._json_hostile) excludes exactly these forms, and
this module pins each engine's observed behavior as FIXED expectations
instead: if either engine's profile ever shifts (Spark upgrade, DuckDB
upgrade), a pin trips and the generator's exclusion list must be
re-derived.

Profile (probed 2026-08-16, Spark 4.1 / DuckDB bundled):

| form                    | spark get_json_object | spark from_json | duckdb |
|-------------------------|-----------------------|-----------------|--------|
| {"k": 5,}  trailing ,   | NULL (reject)         | NULL            | 5      |
| {'k': 5}   single-quote | 5 (accept)            | 5               | NULL   |
| {"k": 5, "k": 6}  dup   | 5 (FIRST)             | 6 (LAST)        | 5      |
| {"k": 18446744073709551616} | literal string    | literal string  | doubleized |
| {"k": 1e308}            | '1.0E308'             | '1.0E308'       | '1e308' |

Everything else probed — root scalars/arrays, NaN/Infinity literals,
unquoted keys, leading-zero numbers, truncations, whitespace padding —
agrees between the engines and stays inside the differential fuzz.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _spark_pair(spark, payload: str):
    row = (
        spark.createDataFrame([(payload,)], "p string")
        .select(
            F.get_json_object("p", "$.k").alias("g"),
            F.from_json("p", "k string").getField("k").alias("fj"),
        )
        .collect()[0]
    )
    return row.g, row.fj


def _duck(payload: str):
    return duckdb.execute(
        "select CASE WHEN json_valid(?) THEN json_extract_string(?, '$.k') END",
        [payload, payload],
    ).fetchone()[0]


def test_trailing_comma_spark_rejects_duck_accepts(spark):
    g, fj = _spark_pair(spark, '{"k": 5,}')
    assert g is None and fj is None  # Jackson: strict
    assert _duck('{"k": 5,}') == "5"  # yyjson: lenient


def test_single_quotes_spark_accepts_duck_rejects(spark):
    g, fj = _spark_pair(spark, "{'k': 5}")
    assert g == "5" and fj == "5"  # Jackson ALLOW_SINGLE_QUOTES
    assert _duck("{'k': 5}") is None


def test_duplicate_keys_spark_disagrees_with_itself(spark):
    """get_json_object streams and takes the FIRST occurrence;
    from_json materializes a struct and the LAST write wins; DuckDB
    extracts the first.  A pipeline mixing the two Spark APIs over
    duplicate-key payloads silently reads different fields."""
    g, fj = _spark_pair(spark, '{"k": 5, "k": 6}')
    assert g == "5"
    assert fj == "6"
    assert _duck('{"k": 5, "k": 6}') == "5"


def test_uint64_overflow_rendering_diverges(spark):
    payload = '{"k": 18446744073709551616}'
    g, fj = _spark_pair(spark, payload)
    assert g == "18446744073709551616"  # Jackson keeps the literal
    assert _duck(payload) == "18446744073709552000.0"  # yyjson doubleizes


def test_float_rendering_diverges(spark):
    g, _ = _spark_pair(spark, '{"k": 1e308}')
    assert g == "1.0E308"
    assert _duck('{"k": 1e308}') == "1e308"


@pytest.mark.parametrize(
    "payload",
    ["{k: 1}", "{", "not json", "[1, 2,", "NaN", "Infinity", '{"k": 05}',
     "5", "true", "null", '"str"', "[5, 6]"],
)
def test_agreed_rejections_stay_agreed(spark, payload):
    """The forms the differential fuzzer DOES emit: both engines must
    keep rejecting them identically (extraction yields NULL/None)."""
    g, fj = _spark_pair(spark, payload)
    assert g is None and fj is None
    assert _duck(payload) is None
