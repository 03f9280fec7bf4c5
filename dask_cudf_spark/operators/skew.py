"""Skew-aware aggregation and join helpers (SURVEY.md §2.11, §4).

The reference exposes ``split_out`` / ``split_every`` to keep hot
groupby keys from overwhelming one partition (upstream:
python/dask_cudf/dask_cudf/groupby.py).  Spark's partial->final
HashAggregate already handles decomposable aggs; the cases that still
hurt at 100 TB are (a) aggregations where the partial state itself is
big per key (collect_list/countDistinct on hot keys) and (b) joins with
a hot key on the big side.  The standard answer is SALTING: append a
random-ish factor to the key, do the heavy step over (key, salt), then
recombine — two cheap shuffles with bounded partition sizes instead of
one unbounded one.  AQE's skew-join splitting covers (b) for sort-merge
joins; salted_collect/salted_sum cover (a) and make the pattern
available as an explicit, testable operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, on: Column | str | None = None) -> DataFrame:
    """Append a deterministic __salt in [0, n_salts): hash of a
    high-cardinality column when given (reproducible runs), else a
    per-row random draw (fine for aggregation: results don't depend on
    salt assignment)."""
    if on is not None:
        salt = F.pmod(F.xxhash64(on), F.lit(n_salts))
    else:
        salt = (F.rand() * n_salts).cast("int")
    return df.withColumn("__salt", salt)


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    salt_on: Column | str | None = None,
) -> DataFrame:
    """Two-phase skew-safe sum: partial sum over (keys, salt) — at most
    ``n_salts`` partials per hot key per shuffle partition — then final
    sum over keys.  Result identical to a direct groupBy().sum()."""
    partial = (
        with_salt(df, n_salts, salt_on)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(f"sum_{value_col}"))


def salted_collect(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    salt_on: Column | str | None = None,
) -> DataFrame:
    """Skew-safe collect_list: collect per (keys, salt), then flatten the
    per-salt lists — no single task ever materializes a hot key's full
    list during the shuffle.  Output sorted for determinism."""
    partial = (
        with_salt(df, n_salts, salt_on)
        .groupBy(*keys, "__salt")
        .agg(F.collect_list(value_col).alias("__chunk"))
    )
    return partial.groupBy(*keys).agg(
        F.array_sort(F.flatten(F.collect_list("__chunk"))).alias(f"{value_col}_list")
    )


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe exact distinct count: salt BY THE VALUE (same value ->
    same salt, so cross-salt double counting is impossible), distinct
    within (keys, salt), count partials, sum.  The hot key's distinct
    set is split across n_salts tasks.

    NULL values are excluded, matching COUNT(DISTINCT x) / Spark's own
    countDistinct (r12 relational corpus, seed 9000: a nullable value
    column previously counted NULL as one extra distinct value — the
    salted rewrite must be result-identical to the aggregate it
    replaces).  Counting count(value_col) rather than filtering keeps
    groups whose values are ALL null in the output with n=0, exactly
    as GROUP BY does; NULL GROUP KEYS aggregate as their own group."""
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(value_col), F.lit(n_salts)))
        .select(*keys, "__salt", value_col)
        .distinct()
        .groupBy(*keys, "__salt")
        .agg(F.count(value_col).alias("__n"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias(f"n_distinct_{value_col}")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    left_on: str,
    right_on: str,
    salt_on: Column | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join for a hot-keyed fact against a dim too big
    to broadcast: the fact side gets a deterministic salt in
    [0, n_salts) from ``salt_on`` (any high-cardinality sibling column),
    the dim side is replicated once per salt, and the join runs on
    (key, salt) — a hot key's rows spread over ``n_salts`` tasks instead
    of melting one.  Result is identical to the unsalted join: each fact
    row matches exactly the one dim replica carrying its salt.

    Decision ladder at 100 TB: broadcast the dim if it fits; else let
    AQE's skew-join splitting handle sort-merge skew; reach for explicit
    salting when the skew is known and extreme (a handful of keys with
    ~all the rows) — AQE splits partitions, but a single monster KEY
    still lands in one partition without salting.  Cost: dim side grows
    n_salts×, so keep n_salts small and the dim projected to the joined
    columns."""
    if how not in ("inner", "left"):
        # right/full would emit n_salts null-padded copies of every
        # UNMATCHED dim key (one per exploded replica) — not the
        # unsalted join's answer; those joins need a different recipe
        # (salt the other side, or dedup unmatched replicas after)
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salts)).cast("int")
    )
    d = dim.withColumn(
        "__salt_d", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(
        d,
        (f[left_on] == d[right_on]) & (f["__salt"] == d["__salt_d"]),
        how,
    )
    return joined.drop("__salt", "__salt_d")


__all__ = [
    "with_salt",
    "salted_sum",
    "salted_collect",
    "salted_count_distinct",
    "salted_join",
]
