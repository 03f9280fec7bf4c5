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
            CAST(SUM(CAST(TRUNC(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
            CAST(SUM({sql_scaled_int("l_extendedprice", 100)}) AS BIGINT)
                AS sum_base_price_c,
            CAST(SUM({sql_scaled_int("l_extendedprice * (1 - l_discount)", 10000)})
                 AS BIGINT) AS sum_disc_price_s4,
            CAST(SUM({sql_scaled_int(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000)})
                 AS BIGINT) AS sum_charge_s6,
            (SUM(CAST(TRUNC(l_quantity) AS BIGINT)) * 1.0) / COUNT(*) AS avg_qty,
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
            SELECT l_partkey, (SUM(CAST(TRUNC(l_quantity) AS BIGINT)) * 1.0)
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


# ---------------------------------------------------------------------------
# Completing the 22-query TPC-H suite.  The trimmed testdata schema has no
# partsupp table and no l_commitdate / l_receiptdate / l_shipmode /
# c_phone columns, so Q2/Q11/Q16/Q20 bridge part<->supplier through the
# DISTINCT (l_partkey, l_suppkey) pairs actually shipped, Q4/Q21 replace
# the commit/receipt-date lateness predicate with l_shipdate vs
# o_orderdate, Q12 groups by l_returnflag instead of l_shipmode, and Q22
# derives the "country code" from c_nationkey.  The join/agg/subquery
# TOPOLOGY of each query — which is what the optimizer and the 100 TB
# plan care about — is preserved.


@register(
    "q_tpch_q2",
    family="tpch",
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ),
        cand AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal
            FROM part
            JOIN ps ON l_partkey = p_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_type = 'LARGE' AND p_size <= 15
        ),
        mn AS (
            SELECT p_partkey AS mk, MIN(s_acctbal) AS min_bal
            FROM cand GROUP BY 1
        )
        SELECT p_partkey, p_name, s_name, n_name, s_acctbal
        FROM cand JOIN mn ON p_partkey = mk AND s_acctbal = min_bal
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    supplier(s) with the minimum cost — here s_acctbal stands in for the
    missing ps_supplycost, and the shipped (partkey, suppkey) pairs for
    partsupp.  The correlated MIN subquery becomes a window min over
    p_partkey: ONE shuffle of the (already part-filtered, tiny) candidate
    set, not a groupBy + self-join rescan.  part/supplier/nation all
    broadcast; the only wide op is the DISTINCT pair extraction, which at
    100 TB is a map-side-combined shuffle of two int columns."""
    from pyspark.sql import Window

    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cand = (
        pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .drop("min_bal")
    )


@register(
    "q_tpch_q4",
    family="tpch",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): EXISTS semi-join from orders
    into lineitem with a non-equi lateness predicate (l_shipdate >
    o_orderdate replaces the missing commit/receipt dates), then a
    5-group count.  LEFT SEMI keeps the probe side at one row per order
    (no fan-out, no distinct needed); the date filter prunes orders
    before the shuffle, and the final agg is map-side partial into 5
    groups."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q_tpch_q8",
    family="tpch",
    oracle="""
        WITH v AS (
            SELECT
                CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                     AS BIGINT) AS vol_s4,
                n2.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n2 ON n2.n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = n1.n_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT
            o_year,
            CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol_s4 ELSE 0 END)
                 AS BIGINT) AS nation_vol_s4,
            CAST(SUM(vol_s4) AS BIGINT) AS total_vol_s4,
            SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol_s4 ELSE 0 END) * 1.0
                / SUM(vol_s4) AS mkt_share
        FROM v
        GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_2's share of PROMO-part
    revenue sold to ASIA customers, per year.  The deepest join tree in
    the suite (8 tables).  Scale plan: part / supplier / nation x2 /
    region broadcast; the two fact tables join on orderkey after both
    are filtered — the date filter prunes orders to 2 of 6+ years, and
    (round-5 fix, same class as the Q5 late-prune) the ASIA restriction
    hits ORDERS below the fact-fact shuffle via a broadcast LEFT SEMI
    on the ASIA customer key set, instead of joining customer -> nation
    -> region above the li|x|o shuffle and discarding ~4/5 of its
    output there.  The share is a ratio of two scaled-int sums (both
    returned for the oracle hash), so the division is one deterministic
    IEEE op on exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c_asia = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .join(
            F.broadcast(c_asia),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
    )
    vol = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("vol_s4")).otherwise(F.lit(0)))
    tot = F.sum("vol_s4")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("vol_s4"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            nat.alias("nation_vol_s4"),
            tot.alias("total_vol_s4"),
            (nat * F.lit(1.0) / tot).alias("mkt_share"),
        )
    )


@register(
    "q_tpch_q9",
    family="tpch",
    oracle="""
        SELECT
            n_name AS nation,
            CAST(year(o_orderdate) AS BIGINT) AS o_year,
            CAST(SUM(CAST(FLOOR(
                (l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity) * 10000 + 0.5)
                AS BIGINT)) AS BIGINT) AS sum_profit_s4
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE 'red%'
        GROUP BY n_name, year(o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on red parts by supplier
    nation and year.  Cost basis is 0.5 * p_retailprice * l_quantity in
    place of the missing ps_supplycost — same expression shape (a
    part-side attribute times quantity).  part (LIKE-filtered),
    supplier, nation broadcast; lineitem-orders is the one fact-fact
    shuffle.  The LIKE filter reaches the part scan, cutting the
    broadcast to ~1/8 of parts before it ships."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000
        + 0.5
    ).cast("long")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("sum_profit_s4"))
    )


@register(
    "q_tpch_q11",
    family="tpch",
    oracle="""
        WITH v AS (
            SELECT
                l_partkey AS partkey,
                CAST(SUM(CAST(FLOOR(
                    l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) AS BIGINT) AS value_s4
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            WHERE n_regionkey = 3
            GROUP BY l_partkey
        )
        SELECT partkey, value_s4
        FROM v
        WHERE value_s4 > (SELECT AVG(value_s4) * 1.5 FROM v)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): per-part shipped
    value from region-3 suppliers, keeping parts 1.5x above the GLOBAL
    per-part average — the scalar-aggregate-subquery HAVING shape.  The
    lineitem bridge stands in for partsupp.  Spark plan: one shuffle for
    the per-part agg; the threshold is a single-row re-aggregation of
    that (small) result, broadcast back as a one-row cross join.  The
    static plan prints the lineitem subtree under both branches, but
    AQE exchange reuse collapses them at runtime (ReusedExchange,
    asserted in tests/test_plans.py) — the fact is scanned and shuffled
    ONCE per execution.  At 100 TB the threshold side is a one-row
    exchange, not a rescan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    val = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val).alias("value_s4"))
    )
    total = v.agg((F.avg("value_s4") * F.lit(1.5)).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value_s4") > F.col("threshold"))
        .select("partkey", "value_s4")
    )


@register(
    "q_tpch_q12",
    family="tpch",
    oracle="""
        SELECT
            l_returnflag,
            CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
            CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / critical priority): conditional
    pivot-count of order priorities per line class (l_returnflag stands
    in for the missing l_shipmode).  The date filter prunes lineitem at
    the scan; the orderkey join is the single shuffle; the CASE sums are
    map-side partials into 3 groups."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q16",
    family="tpch",
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT
            p_brand, p_type, p_size,
            COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count
    per (brand, type, size) excluding flagged suppliers — NOT IN
    anti-join + count-distinct shape.  The complaint filter becomes
    s_acctbal < 0 (the only supplier-side predicate available).  Plan:
    the DISTINCT pair shuffle is the wide op; the excluded-supplier set
    is tiny and anti-joins as a broadcast; part broadcasts; the final
    count-distinct re-shuffles only the filtered groups."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    return (
        pairs.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q20",
    family="tpch",
    oracle="""
        WITH excess AS (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(TRUNC(l_quantity) AS BIGINT)) > 60
        )
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers who shipped more
    than a threshold quantity of any red part in 1997 — nested
    IN-subquery over a grouped HAVING, i.e. agg -> semi-join.  Plan:
    part LIKE-filter broadcasts into the lineitem scan (date filter
    pushed down), ONE shuffle on (suppkey, partkey) for the HAVING agg,
    then the small qualifying-supplier set semi-joins the supplier dim.
    At 100 TB nothing but the filtered agg ever shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    excess = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q_tpch_q21",
    family="tpch",
    oracle="""
        WITH fl AS (
            SELECT l_orderkey, l_suppkey, l_shipdate
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
        ),
        per_order AS (
            SELECT l_orderkey AS ok,
                   MAX(l_shipdate) AS max_ship,
                   COUNT(DISTINCT l_suppkey) AS n_supp
            FROM fl GROUP BY 1
        ),
        late AS (
            SELECT fl.l_orderkey, fl.l_suppkey
            FROM fl JOIN per_order ON fl.l_orderkey = ok
            WHERE n_supp >= 2 AND fl.l_shipdate = max_ship
            GROUP BY 1, 2
        ),
        uniq AS (
            SELECT l_orderkey FROM late GROUP BY 1 HAVING COUNT(*) = 1
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late
        JOIN uniq USING (l_orderkey)
        JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_name
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finished
    multi-supplier orders, the supplier whose shipment was STRICTLY last
    (l_shipdate vs the missing receipt/commit dates) — the EXISTS /
    NOT-EXISTS double self-join, re-expressed over ONE l_orderkey
    partitioning (round-5 plan fix: the previous two-groupBy + re-join
    shape recomputed the filtered lineitem subtree and audited at 8
    exchanges): per-order max shipdate and supplier set come from
    windows over the semi-joined lineitem, the late-row filter and the
    per-order uniqueness count are windows/aggregates on the SAME
    partitioning (HashPartitioning(l_orderkey) satisfies every
    downstream distribution, distinct included, since its keys are a
    superset), so lineitem crosses the wire once.  Supplier broadcasts
    at the end onto a tiny result."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    fl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    w = Window.partitionBy("l_orderkey")
    late = (
        fl.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    uniq = late.withColumn(
        "n_late", F.count("*").over(Window.partitionBy("l_orderkey"))
    ).filter(F.col("n_late") == 1)
    s = load_table(spark, sf_dir, "supplier")
    return (
        uniq.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q_tpch_q22",
    family="tpch",
    oracle="""
        WITH avgbal AS (
            SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0
                       / COUNT(*) AS abal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT
            CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
            COUNT(*) AS numcust,
            (SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0)
                AS totacctbal
        FROM customer, avgbal
        WHERE c_acctbal > abal
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c_nationkey % 5
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): dormant high-balance
    customers per country code — scalar AVG subquery + NOT EXISTS
    anti-join + grouped count/sum.  Adaptations: country code =
    c_nationkey % 5 (no c_phone), and "no orders" becomes "no orders
    since 2000" (every testdata customer has SOME order).  The average
    uses the scaled-int discipline so the threshold is bit-identical in
    both engines.  Plan: the scalar avg is a one-row broadcast; the
    anti-join shuffles customer against the date-filtered, custkey-
    projected orders; final agg into 5 groups is map-side partial."""
    c = load_table(spark, sf_dir, "customer")
    avgbal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(scaled_int("c_acctbal", 100)) / F.lit(100.0) / F.count("*")
            ).alias("abal")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("abal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("long").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(scaled_int("c_acctbal", 100)) / F.lit(100.0)).alias("totacctbal"),
        )
    )
