"""Deterministic float aggregation (the oracle-hash discipline).

Summing doubles is order-dependent; Spark's partial/final aggregation
order differs run-to-run and from DuckDB's, so ``round(sum(x), 6)`` is
NOT safe at 60k+ rows (accumulated ulp error can exceed the rounding
granularity).  The testdata's monetary columns are exact 2-decimal
values (FIXTURES.md, profiled), so we sum *scaled integers* instead:

    sum(x)  ->  sum(cast(floor(x*100 + 0.5) as bigint)) / 100.0

Integer sums are associative -> bit-identical in any engine, and the
final division of an exactly-representable integer (< 2^53) by 100.0
is a single deterministic IEEE op.  Each Spark helper here has a
matching SQL-string builder so query and oracle stay in lockstep.

At petabyte scale the same trick is how you'd keep monetary aggregates
exact anyway (sum DECIMAL / scaled BIGINT, never FLOAT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- Spark side


def scaled_int(col: Column | str, scale: int) -> Column:
    """Exact fixed-point encode: floor(x*scale + 0.5) as long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(scale) + F.lit(0.5)).cast("long")


def cents(col: Column | str) -> Column:
    return scaled_int(col, 100)


def scaled_sum(col: Column | str, scale: int) -> Column:
    """sum(x) over a scale-decimal double column, bit-deterministic."""
    return F.sum(scaled_int(col, scale)) / F.lit(float(scale))


def sum_cents(col: Column | str) -> Column:
    return scaled_sum(col, 100)


def avg_from_cents(col: Column | str, scale: int = 100) -> Column:
    """avg(x) with a deterministic numerator: (sum_scaled/scale)/count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(scaled_int(c, scale)) / F.lit(float(scale))) / F.count(c)


# --------------------------------------------------------------- oracle side
# SQL-string builders producing the *identical* arithmetic in DuckDB.


def sql_scaled_int(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"


def sql_scaled_sum(expr: str, scale: int) -> str:
    return f"(SUM({sql_scaled_int(expr, scale)}) / {float(scale)})"


def sql_sum_cents(expr: str) -> str:
    return sql_scaled_sum(expr, 100)


def sql_avg_from_cents(expr: str, scale: int = 100) -> str:
    return f"({sql_scaled_sum(expr, scale)} / COUNT({expr}))"
