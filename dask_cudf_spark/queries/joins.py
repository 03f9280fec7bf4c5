"""Join family (SURVEY.md §2.3).

Reference: dask merge -> shuffle hash join / broadcast join selection
(upstream: dask_cudf/core.py DataFrame.merge over cpp/src/join/*).
Spark-first: declare the join, let Catalyst+AQE pick broadcast vs
shuffle; we force `F.broadcast` only where the dim side is known-small
(nation/region/supplier — broadcast-sized at every SF, FIXTURES.md).

Scale notes per query in docstrings; plans asserted in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import scaled_sum, sql_scaled_sum
from ..registry import register
from ..sources import load_table


@register(
    "q_join_inner",
    family="join",
    oracle=f"""
        SELECT
            c_mktsegment,
            {sql_scaled_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
            COUNT(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join lineitem⋈orders⋈customer + agg (reference shuffle hash
    join; upstream dd.merge -> hash_join).  At scale: lineitem⋈orders
    shuffles on orderkey (both huge); customer side broadcasts under
    AQE.  Revenue uses scaled-int sums (det.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_join_broadcast",
    family="join",
    oracle="""
        SELECT n_name, r_name, COUNT(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim joins (reference broadcast_join: small side
    replicated to every partition).  Explicit F.broadcast — the plan
    must show BroadcastHashJoin, zero shuffle of the fact side."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_cust"))
    )


@register(
    "q_join_left",
    family="join",
    oracle="""
        SELECT
            c.c_custkey,
            c.c_name,
            COALESCE(o.n_orders, 0) AS n_orders,
            COALESCE(o.total_spent, 0.0) AS total_spent
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey,
                   COUNT(*) AS n_orders,
                   (SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0) AS total_spent
            FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-fill (reference merge(how='left') +
    fillna).  Aggregate-before-join keeps the shuffle small at scale
    (pre-aggregation pushdown a human would write; Catalyst won't)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            scaled_sum("o_totalprice", 100).alias("total_spent"),
        )
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
    )


@register(
    "q_join_outer",
    family="join",
    oracle="""
        SELECT
            COALESCE(a.k, b.k) AS k,
            a.n_f AS n_f,
            b.n_o AS n_o
        FROM (SELECT o_custkey AS k, COUNT(*) AS n_f FROM orders
              WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
        FULL OUTER JOIN
             (SELECT o_custkey AS k, COUNT(*) AS n_o FROM orders
              WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
        ON a.k = b.k
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join + coalesce — the reference's combine_first/align
    idiom (SURVEY §2.7)."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_f"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_o"))
    )
    return a.join(b, a.k == b.k, "full").select(
        F.coalesce(a.k, b.k).alias("k"), "n_f", "n_o"
    )


@register(
    "q_join_semi",
    family="join",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 150000.0
        )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (reference cudf left_semi_join,
    cpp/src/join/semi_join.cu): customers with >=1 big order.  Semi join
    never duplicates left rows — cheaper than inner+distinct at scale."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_anti",
    family="join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (reference cudf left_anti_join): customers with no
    orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    family="join",
    oracle="""
        SELECT r_name, n_name
        FROM region CROSS JOIN nation
        WHERE r_regionkey <> n_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (reference how='cross', cpp/src/join/cross_join.cu)
    — only ever sane when one side is tiny; plan is BroadcastNestedLoop."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).filter(F.col("r_regionkey") != F.col("n_regionkey")).select(
        "r_name", "n_name"
    )


@register(
    "q_join_range",
    family="join",
    oracle="""
        SELECT l_orderkey, l_linenumber, p_partkey, p_size, l_quantity
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
                 AND l_quantity >= p_size - 2
                 AND l_quantity <= p_size + 2
        WHERE p_size <= 15
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join + residual range condition (reference libcudf
    mixed_join: equality + AST condition).  Spark plans the equi part as
    the join key and evaluates the range as a post-join filter — the
    right shape at scale (never a nested-loop over the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return li.join(
        p,
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2),
    ).select("l_orderkey", "l_linenumber", "p_partkey", "p_size", "l_quantity")


@register(
    "q_join_theta",
    family="join",
    oracle="""
        SELECT s.s_suppkey, s.s_name, c.c_custkey
        FROM supplier s
        JOIN customer c
          ON c.c_nationkey = s.s_nationkey AND c.c_acctbal > s.s_acctbal
        WHERE s.s_acctbal > 0
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (theta) join on inequality (reference libcudf
    conditional_join.cu — not even surfaced through dask-cudf's API;
    we exceed the reference here).  Broadcast the 10-row supplier side:
    BroadcastNestedLoop on the small side only."""
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    c = load_table(spark, sf_dir, "customer")
    return c.join(
        F.broadcast(s),
        (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal),
    ).select("s_suppkey", "s_name", "c_custkey")


@register(
    "q_join_asof",
    family="join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, p.ts AS last_purchase_ts,
               p.value AS last_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') e
        ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS value FROM events
              WHERE event_type = 'purchase' GROUP BY user_id, ts) p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (dask merge_asof — unsupported on the cudf backend;
    we implement it, SURVEY §2.3).  Engine op: operators/asof.merge_asof
    (union + last(ignorenulls) over window — one shuffle, no NLJ).
    Oracle: DuckDB native ASOF JOIN."""
    from ..operators.asof import merge_asof

    clicks, purchases = _asof_inputs(spark, sf_dir)
    out = merge_asof(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_value_cols=["ts", "value"],
        suffix="last_purchase",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_purchase_ts"),
        F.col("last_purchase_value"),
    )


def _asof_inputs(spark: SparkSession, sf_dir: str):
    """Click/purchase sides for the four asof queries.

    The purchase side is DEDUPED to one row per (user_id, ts) keeping
    MAX(value) — the r11 events corpus (15% exact-tie timestamps)
    showed that merge_asof's pick among right rows TIED on the match
    key is engine-arbitrary (pandas resolves such ties by input order,
    which has no distributed analog), and DuckDB's native ASOF JOIN is
    equally unspecified there.  Deduping the point-in-time side before
    an as-of join is the production feature-store discipline; the
    identical GROUP BY rides in every oracle.  merge_asof itself
    documents the precondition."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return clicks, purchases


@register(
    "q_join_asof_forward",
    family="join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, p.ts AS next_purchase_ts,
               p.value AS next_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') e
        ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS value FROM events
              WHERE event_type = 'purchase' GROUP BY user_id, ts) p
          ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click gets the NEXT purchase at-or-after
    it (pandas merge_asof direction='forward'; dask surface, unsupported
    on the cudf backend).  Same single-shuffle union+window plan as
    backward — only the in-partition sort order flips.
    Oracle: DuckDB native ASOF with the inequality reversed."""
    from ..operators.asof import merge_asof

    clicks, purchases = _asof_inputs(spark, sf_dir)
    out = merge_asof(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_value_cols=["ts", "value"],
        suffix="next_purchase",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("next_purchase_ts"),
        F.col("next_purchase_value"),
    )


@register(
    "q_join_asof_nearest",
    family="join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, p.ts AS near_purchase_ts,
               p.value AS near_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') e
        LEFT JOIN LATERAL (
            SELECT ts, MAX(value) AS value FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
            GROUP BY ts
            ORDER BY abs(epoch_us(ts) - epoch_us(e.ts)), ts
            LIMIT 1
        ) p ON true
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each click gets the closest-in-time purchase,
    ties to the earlier (backward) one — pandas direction='nearest'.
    Engine evaluates both directions over ONE shuffle (two in-partition
    sorts) then picks per row by µs distance; never a nested loop.
    Oracle: LEFT JOIN LATERAL ordered by absolute distance (the
    tie-break `p.ts` ASC prefers the backward side, matching pandas)."""
    from ..operators.asof import merge_asof

    clicks, purchases = _asof_inputs(spark, sf_dir)
    out = merge_asof(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_value_cols=["ts", "value"],
        suffix="near_purchase",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("near_purchase_ts"),
        F.col("near_purchase_value"),
    )


@register(
    "q_join_asof_tolerance",
    family="join",
    oracle="""
        SELECT event_id, user_id, ts,
               CASE WHEN p_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(p_ts) <= 86400000000
                    THEN p_ts END AS recent_purchase_ts,
               CASE WHEN p_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(p_ts) <= 86400000000
                    THEN p_value END AS recent_purchase_value
        FROM (
            SELECT e.event_id, e.user_id, e.ts,
                   p.ts AS p_ts, p.value AS p_value
            FROM (SELECT * FROM events WHERE event_type = 'click') e
            ASOF LEFT JOIN
                 (SELECT user_id, ts, MAX(value) AS value FROM events
              WHERE event_type = 'purchase' GROUP BY user_id, ts) p
              ON e.user_id = p.user_id AND e.ts >= p.ts
        )
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 24-hour tolerance: matches farther
    than the window are nulled out (pandas merge_asof tolerance=).
    The tolerance check is a post-window filter on the carried right
    timestamp — no extra shuffle.  Median purchase gap in events is
    ~34 h, so the cut is discriminating on this corpus.
    Oracle: ASOF JOIN wrapped in a distance CASE."""
    from ..operators.asof import merge_asof

    clicks, purchases = _asof_inputs(spark, sf_dir)
    out = merge_asof(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        right_value_cols=["ts", "value"],
        suffix="recent_purchase",
        direction="backward",
        tolerance=86400,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("recent_purchase_ts"),
        F.col("recent_purchase_value"),
    )


@register(
    "q_tpch_q3_shape",
    family="join",
    oracle=f"""
        SELECT
            l_orderkey,
            {sql_scaled_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
            CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
            o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority): selective dim filter ->
    two-fact join -> agg -> top-10.  Catalyst pushes both date filters
    into the scans and broadcasts the filtered customer side; the top-k
    is TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_q5_shape",
    tags=["flagship"],
    family="join",
    oracle=f"""
        SELECT
            n_name,
            {sql_scaled_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): six-way join with two
    fact tables, plus the local-supplier condition c_nationkey =
    s_nationkey.

    Scale plan (standard Q5, round-5 fix): the region='ASIA'
    restriction is pushed BELOW the fact-fact joins.  The 5-row ASIA
    nationkey set (nation ⋈ region) broadcasts onto customer and
    supplier BEFORE c ⋈ o ⋈ li, so ~4/5 of customers never enter the
    big shuffles — at 100 TB the c⋈o⋈li shuffle volume carries only
    surviving rows instead of discarding 80% post-join.  n_name rides
    the customer side (valid because the local-supplier predicate
    forces s_nationkey = c_nationkey)."""
    # 5-row ASIA nation set: map-side derivation, broadcast everywhere.
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(asia), F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1999-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(asia.select(F.col("n_nationkey").alias("sn_key"))),
        F.col("s_nationkey") == F.col("sn_key"),
        "left_semi",
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@register(
    "q_tpch_q10_shape",
    family="join",
    oracle=f"""
        SELECT
            c_custkey,
            c_name,
            {sql_scaled_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
            n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): date-windowed orders,
    return-flag-filtered lineitem, customer + nation dims, top-20 by
    lost revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            scaled_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q18_shape",
    family="join",
    oracle="""
        SELECT
            c_custkey,
            o_orderkey,
            CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
            CAST(big.total_qty AS BIGINT) AS total_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN (
            SELECT l_orderkey, SUM(CAST(TRUNC(l_quantity) AS BIGINT)) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(TRUNC(l_quantity) AS BIGINT)) > 150
        ) big ON o_orderkey = big.l_orderkey
    """,
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): aggregate subquery with
    HAVING feeding a join — the group-filter-then-join pattern.  The
    aggregate runs BEFORE the join, so only qualifying orderkeys (few)
    reach the fact-fact join; at scale this ordering is the difference
    between joining 150M rows and joining thousands."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


@register(
    "q_exists_subquery",
    family="join",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 300000
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F'
              AND o2.o_totalprice < 50000
        )
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries — Catalyst decorrelates
    them into semi/anti joins automatically (SURVEY.md §4: dask-expr has
    no subquery support at all; the reference idiom is manual isin over
    a computed key list)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__c_ex")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__o_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM __c_ex c
        WHERE EXISTS (
            SELECT 1 FROM __o_ex o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        AND NOT EXISTS (
            SELECT 1 FROM __o_ex o2
            WHERE o2.o_custkey = c.c_custkey
              AND o2.o_orderstatus = 'F'
              AND o2.o_totalprice < 50000
        )
        """
    )


@register(
    "q_merge_indicator",
    family="join",
    oracle="""
        WITH c AS (
            SELECT c_custkey, c_name FROM customer WHERE c_nationkey <= 12
        ),
        o AS (
            SELECT o_custkey, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT
            COALESCE(c.c_custkey, o.o_custkey) AS custkey,
            c.c_name,
            COALESCE(o.n_orders, 0) AS n_orders,
            CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
                 THEN 'both'
                 WHEN o.o_custkey IS NULL THEN 'left_only'
                 ELSE 'right_only' END AS merge_ind
        FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def q_merge_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas/dask merge(how='outer', indicator=True) (upstream: dask
    merge passthrough of pandas _merge categorical): full outer join
    plus the provenance column ('both' / 'left_only' / 'right_only').
    The left side is restricted to nations 0-12 so all three indicator
    values actually occur.  One shuffle per side on the key; the
    indicator is a null-test projection on top of the join — no extra
    pass.  At scale this is the standard reconciliation/diff topology
    (which keys are only in yesterday's snapshot?)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") <= 12)
        .select("c_custkey", "c_name")
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = cust.join(od, cust["c_custkey"] == od["o_custkey"], "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(
            F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), "both"
        )
        .when(F.col("o_custkey").isNull(), "left_only")
        .otherwise("right_only")
        .alias("merge_ind"),
    )


@register(
    "q_join_bucketed",
    family="join",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed CO-LOCATED join (SURVEY §2.3 'sorted/partitioned
    merge', §2.11 persistent layout — upgraded from pytest-only to the
    oracle gate in round 7): both sides are written ``bucketBy(8,
    custkey)`` + ``sortBy`` first, so the subsequent join needs NO
    exchange on either side — the plan is asserted shuffle-free for
    the join core before the (unavoidable, |segments|-row) rollup
    shuffle.  At 100 TB this is THE repeated-join strategy: pay the
    bucketed write once, join for free forever after; Spark plans the
    same zero-exchange SortMergeJoin from the catalog bucket spec that
    a co-partitioned dask-cudf merge gets from matching divisions.

    The bucketed tables land under a per-session tmp dir and are
    overwritten (not dropped — the returned frame reads them lazily)
    on re-execution."""
    import tempfile

    from ..plans.audit import audit
    from ..sources.writers import to_parquet

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="spark-graft-bucketed-")
    to_parquet(
        cust,
        f"{root}/cust",
        bucket_by=(8, ["c_custkey"]),
        sort_by=["c_custkey"],
        table_name="spark_graft_bucketed_cust",
    )
    to_parquet(
        orders,
        f"{root}/orders",
        bucket_by=(8, ["c_custkey"]),
        sort_by=["c_custkey"],
        table_name="spark_graft_bucketed_orders",
    )
    j = spark.table("spark_graft_bucketed_orders").join(
        spark.table("spark_graft_bucketed_cust").hint("merge"),
        on="c_custkey",
    )
    n_sh = audit(j).n_shuffles
    if n_sh != 0:
        raise AssertionError(
            f"bucketed join planned {n_sh} exchanges; co-location lost"
        )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("revenue_c"),
    )


@register(
    "q_join_null_keys",
    family="join",
    oracle="""
        -- null-join-key semantics, stated as an oracle fact: an
        -- equi-join NEVER matches a NULL key (NULL = NULL is UNKNOWN),
        -- so null-keyed left rows survive a LEFT join as unmatched and
        -- vanish from an INNER join — identically in both engines
        WITH e AS (
            SELECT event_id,
                   NULLIF(event_id % 1000, 0) + 1 AS k
            FROM events WHERE event_id < 5000
        )
        SELECT
            CASE WHEN e.k IS NULL THEN 'null_key'
                 WHEN o.o_orderkey IS NULL THEN 'unmatched'
                 ELSE 'matched' END AS match_class,
            CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_joined
        FROM e LEFT JOIN orders o ON e.k = o.o_orderkey
        GROUP BY 1
    """,
)
def q_join_null_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null join keys, pinned as engine semantics (round-9 NULLS.md
    companion): the driving side NULLIFs a fraction of its keys; the
    LEFT join must carry every null-keyed row through as unmatched
    (never matching, never dropping) and the match-class rollup proves
    the exact three-way split against the oracle.  The INNER-join twin
    (dropping null keys) is this result restricted to 'matched' —
    checked by the same hash.

    Scale: one broadcast/shuffle equi-join exactly like any other; a
    null-keyed row costs nothing (it short-circuits the probe)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 5000)
        .select(
            "event_id",
            (F.nullif(F.col("event_id") % 1000, F.lit(0)) + 1).alias("k"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    j = ev.join(F.broadcast(o), ev["k"] == o["o_orderkey"], "left")
    return (
        j.select(
            F.when(F.col("k").isNull(), "null_key")
            .when(F.col("o_orderkey").isNull(), "unmatched")
            .otherwise("matched")
            .alias("match_class"),
            "o_orderkey",
        )
        .groupBy("match_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("o_orderkey").cast("long").alias("n_joined"),
        )
    )
