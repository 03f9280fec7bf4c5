"""TPC-H query shapes (SURVEY.md §2.3/§2.4 composites).

The reference engines (dask-cudf / cudf) publish TPC-H-derived
benchmarks as their canonical end-to-end workloads; this module adds the
shapes expressible over the trimmed testdata schemas (no partsupp, no
l_commitdate / l_receiptdate / l_shipmode — see TESTDATA.md), beyond the
Q3/Q5/Q10/Q18 shapes in queries/joins.py.

Every monetary aggregate follows the scaled-integer discipline in
functions/det.py; aggregates whose scaled sums could exceed 2^53 (Q1's
1e6-scaled charge at sf>=0.1) are returned AS the scaled BIGINT rather
than divided back, keeping the oracle hash exact at any SF.

Scale design: dims (part / supplier / nation) broadcast; only fact-fact
joins and the final aggregations shuffle.  Each query's docstring notes
the intended 100 TB plan; tests/test_plans.py asserts the headline ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import (
    scaled_int,
    scaled_sum,
    sql_scaled_int,
    sql_scaled_sum,
)
from ..registry import register
from ..sources import load_table


@register(
    "q_tpch_q1",
    family="tpch",
    oracle=f"""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
            CAST(SUM({sql_scaled_int("l_extendedprice", 100)}) AS BIGINT)
                AS sum_base_price_c,
            CAST(SUM({sql_scaled_int("l_extendedprice * (1 - l_discount)", 10000)})
                 AS BIGINT) AS sum_disc_price_s4,
            CAST(SUM({sql_scaled_int(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000)})
                 AS BIGINT) AS sum_charge_s6,
            (SUM(CAST(l_quantity AS BIGINT)) * 1.0) / COUNT(*) AS avg_qty,
            ({sql_scaled_sum("l_extendedprice", 100)}) / COUNT(*) AS avg_price,
            ({sql_scaled_sum("l_discount", 100)}) / COUNT(*) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): the canonical wide-agg scan.
    Single pass over lineitem, filter pushed to the scan, partial
    aggregation map-side into ~6 groups — the shuffle moves only
    |groups| x |partitions| rows, so this is scan-bound at 100 TB.
    The 1e6-scaled charge sum stays a BIGINT (dividing back would pass
    through double > 2^53 at sf >= 0.1 and flake the hash)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(scaled_int("l_extendedprice", 100)).alias("sum_base_price_c"),
            F.sum(scaled_int(disc_price, 10000)).alias("sum_disc_price_s4"),
            F.sum(scaled_int(charge, 1000000)).alias("sum_charge_s6"),
            (F.sum(F.col("l_quantity").cast("long")) * F.lit(1.0) / F.count("*")).alias(
                "avg_qty"
            ),
            (scaled_sum("l_extendedprice", 100) / F.count("*")).alias("avg_price"),
            (scaled_sum("l_discount", 100) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_tpch_q6",
    family="tpch",
    oracle=f"""
        SELECT {sql_scaled_sum("l_extendedprice * l_discount", 10000)} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure filter + global sum.
    All four predicates push into the parquet scan (PushedFilters); the
    aggregation is a map-side partial -> single-row final, so the
    shuffle is |partitions| rows.  The textbook scan-bound query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        scaled_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias(
            "revenue"
        )
    )


@register(
    "q_tpch_q7",
    family="tpch",
    oracle=f"""
        SELECT
            n1.n_name AS supp_nation,
            n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS BIGINT) AS l_year,
            {sql_scaled_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): two-fact join
    with a disjunctive cross-nation predicate.  nation broadcasts twice
    (aliased); supplier broadcasts; the only shuffles are
    lineitem-orders and orders-customer on their keys.  The nation-pair
    filter is applied AFTER both nation joins but Catalyst pushes the
    IN-(1,2) halves down each side, shrinking both facts before the
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch_q13",
    family="tpch",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): outer join kept
    NULL-aware (COUNT(col) skips the no-order customers' NULLs), then a
    second aggregation over the first's output.  First shuffle is on
    custkey (fact-sized); the second groups ~50 distinct counts, so it's
    map-side partial into a tiny exchange.  The left join must NOT be
    broadcast at real SF (customer is fact-sized); we leave strategy to
    AQE rather than forcing it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_tpch_q14",
    family="tpch",
    oracle=f"""
        SELECT
            CAST(FLOOR(
                (100.0 * (SUM(CASE WHEN p_type = 'ECONOMY'
                    THEN {sql_scaled_int("l_extendedprice * (1 - l_discount)", 10000)}
                    ELSE 0 END) * 1.0)
                 / SUM({sql_scaled_int("l_extendedprice * (1 - l_discount)", 10000)}))
                * 1000000 + 0.5) AS BIGINT) AS promo_share_u
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect; 'ECONOMY' plays PROMO in this
    dataset's p_type vocabulary): conditional aggregate ratio.  part
    broadcasts to the date-filtered lineitem, one partial agg, single
    output row.  Both sums are exact scaled BIGINTs; the ratio is the
    one float op and is re-encoded floor(x*1e6+0.5) so the output is an
    exact BIGINT micro-percent (round() half-mode differs between
    engines on ties)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = scaled_int(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.floor(
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0))
                    )
                    * F.lit(1.0)
                    / F.sum(rev)
                )
                * F.lit(1000000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("promo_share_u")
        )
    )


@register(
    "q_tpch_q15",
    family="tpch",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({sql_scaled_int(
                       "l_extendedprice * (1 - l_discount)", 10000)})
                        AS BIGINT) AS total_revenue_s4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_s4
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue_s4 = (SELECT MAX(total_revenue_s4) FROM revenue)
        ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): aggregate -> global-max filter -> dim
    join.  The per-supplier revenue aggregates once and is reused for
    both the max subquery and the final filter (cached via a window max
    over an empty frame would single-partition; instead the 1-row max
    relation cross-broadcasts — exact integer equality, no float
    compare).  supplier broadcasts.  Revenue kept as scaled BIGINT so
    the max/equality is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            scaled_int(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
        ).alias("total_revenue_s4")
    )
    max_rev = revenue.agg(F.max("total_revenue_s4").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue_s4") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_s4")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q17",
    family="tpch",
    oracle=f"""
        WITH target AS (
            SELECT p_partkey FROM part WHERE p_brand = 'Brand#7'
        ),
        avg_qty AS (
            SELECT l_partkey, (SUM(CAST(l_quantity AS BIGINT)) * 1.0)
                       / COUNT(*) AS aq
            FROM lineitem JOIN target ON l_partkey = p_partkey
            GROUP BY l_partkey
        )
        SELECT CAST(SUM({sql_scaled_int("l_extendedprice", 100)}) AS BIGINT)
                   AS total_price_c,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN target  ON l_partkey = p_partkey
        JOIN avg_qty USING (l_partkey)
        WHERE l_quantity < 0.2 * aq
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part
    average re-expressed as agg + self-join — the standard decorrelation
    Catalyst would produce.  The brand filter broadcasts into BOTH
    lineitem passes (semi-join pruning first), the per-part average is
    part-sized so it broadcasts back, and only the filtered fact scans
    shuffle.  avg is the one float (deterministic single division);
    the comparison l_quantity < 0.2*aq uses identical literal arithmetic
    in both engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7")
    target = p.select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    li_t = li.join(F.broadcast(target), li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    avg_qty = li_t.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast("long")) * F.lit(1.0) / F.count("*")).alias(
            "aq"
        )
    )
    return (
        li_t.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
        .agg(
            F.sum(scaled_int("l_extendedprice", 100)).alias("total_price_c"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q19",
    family="tpch",
    oracle=f"""
        SELECT {sql_scaled_sum("l_extendedprice * (1 - l_discount)", 10000)}
                   AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1  AND l_quantity <= 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates;
    container/shipmode dropped with the trimmed schema): equi-join on
    partkey with an OR-of-ANDs residual.  The join stays a broadcast
    HASH join on p_partkey — the disjunction is a post-join filter, NOT
    a join condition, so Catalyst never degrades to nested-loop.  Each
    disjunct's part-side half (brand+size) could be pushed as a
    pre-filter p_brand IN (...) at real scale; the brand IN-list prune
    is applied here explicitly."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
