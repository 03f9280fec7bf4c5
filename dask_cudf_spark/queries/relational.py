"""Scans, projections, filters, scalar-function packs (SURVEY.md §2.1-2.2, 2.8).

Plan-quality invariants (checked in tests/test_plans.py):
- projections reach the parquet scan (ReadSchema lists only used cols)
- predicates reach the scan (PushedFilters non-empty)
- everything stays in WholeStageCodegen (no Python in the pipeline)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_scan_parquet",
    family="scan",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected + filtered parquet scan (reference read_parquet with
    columns= and filters=; upstream: dask_cudf/io/parquet.py).  Both the
    projection and the predicate must push into the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "q_project_arith",
    family="projection",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            l_extendedprice * (1 - l_discount) AS disc_price,
            l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
            l_quantity * 2 + 1 AS qty_adj,
            -- TRUNC before the cast (r12 relational corpus, seed 9001):
            -- Spark cast(double AS long) TRUNCATES while DuckDB CAST
            -- rounds-half-even — invisible on the integral clean-data
            -- quantities, divergent on fractional/negative ones
            CAST(TRUNC(l_quantity) AS BIGINT) % 7 AS qty_mod
        FROM lineitem
        WHERE l_orderkey <= 1000
    """,
)
def q_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection (reference assign/withColumn).  Per-row
    IEEE arithmetic written identically on both sides is deterministic —
    no rounding needed (unlike aggregates, see functions/det.py)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") * 2 + 1).alias("qty_adj"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@register(
    "q_filter_pred",
    family="filter",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' OR o_totalprice > 100000.0)
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND NOT (o_custkey % 10 = 3)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean-mask filter (reference df[(a|b) & c.isin(...)];
    cudf apply_boolean_mask, upstream: cpp/src/stream_compaction/)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 100000.0))
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & ~(F.col("o_custkey") % 10 == 3)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "q_sql_query",
    family="filter",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE p_size > 20 AND p_type LIKE '%PROMO%' AND p_brand <> 'Brand#13'
    """,
)
def q_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-predicate query (reference df.query('size > 20 and ...'),
    cudf queryutils numba kernel) — Spark SQL string filter is the
    strictly-more-general equivalent."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_brand, p_size
        FROM part
        WHERE p_size > 20 AND p_type LIKE '%PROMO%' AND p_brand <> 'Brand#13'
        """
    )


@register(
    "q_when_clip",
    family="projection",
    oracle="""
        SELECT
            c_custkey,
            CASE WHEN c_acctbal < 0 THEN 'debt'
                 WHEN c_acctbal < 5000 THEN 'low'
                 ELSE 'high' END AS bal_band,
            LEAST(GREATEST(c_acctbal, 0.0), 9000.0) AS bal_clipped,
            COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked
        FROM customer
    """,
)
def q_when_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional replace / clip / mask (reference where/mask/clip;
    upstream: cpp/src/copying/copy_if_else.cu)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.least(F.greatest(F.col("c_acctbal"), F.lit(0.0)), F.lit(9000.0)).alias(
            "bal_clipped"
        ),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("seg_masked"),
    )


@register(
    "q_scalar_pack_str",
    family="scalar",
    oracle="""
        SELECT
            p_partkey,
            LENGTH(p_name) AS name_len,
            UPPER(p_brand) AS brand_upper,
            LOWER(p_type) AS type_lower,
            SUBSTRING(p_name, 1, 5) AS name_head,
            CONCAT_WS('|', p_brand, p_type) AS brand_type,
            REPLACE(p_type, ' ', '_') AS type_snake,
            -- trim(x, ' ') never bare TRIM (the r11 rule, newly hit
            -- here by the r12 dims corpus): DuckDB's bare TRIM strips
            -- unicode whitespace (NBSP, ideographic space) that
            -- Spark's ASCII-space-only trim keeps
            TRIM(p_name, ' ') AS name_trim,
            LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
            CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo,
            CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END AS starts_word,
            regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devowel,
            -- DuckDB split_part(NULL, ...) returns '' (documented
            -- upstream quirk); Spark follows the SQL null-in-null-out
            -- convention — pin NULL explicitly (round-9 null leg)
            CASE WHEN p_type IS NULL THEN NULL
                 ELSE split_part(p_type, ' ', 1) END AS type_first_word,
            -- codepoint-wise reverse twin (r12 dims corpus, seeds
            -- 9750-9752): DuckDB's reverse() keeps grapheme clusters
            -- (base + combining mark) together while Spark's reverses
            -- raw codepoints — split-to-codepoints + list_reverse
            -- replays Spark's exact semantics
            array_to_string(list_reverse(string_split(p_brand, '')), '')
                AS brand_rev,
            REPEAT('-', 3) AS dashes
        FROM part
    """,
)
def q_scalar_pack_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function pack (reference Series.str.* — upstream:
    python/cudf/cudf/core/column/string.py over cpp/src/strings/)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("is_promo"),
        F.when(F.col("p_name").rlike(r"^[a-z]+ "), 1).otherwise(0).alias("starts_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devowel"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.repeat(F.lit("-"), 3).alias("dashes"),
    )


@register(
    "q_scalar_pack_date",
    family="scalar",
    oracle="""
        SELECT
            o_orderkey,
            EXTRACT(year FROM o_orderdate) AS yr,
            EXTRACT(month FROM o_orderdate) AS mo,
            EXTRACT(day FROM o_orderdate) AS dy,
            EXTRACT(quarter FROM o_orderdate) AS qtr,
            EXTRACT(doy FROM o_orderdate) AS doy,
            dayofweek(o_orderdate) + 1 AS dow,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
            strftime(o_orderdate, '%Y-%m-%d') AS date_str,
            CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
            datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
        FROM orders
        WHERE o_orderkey <= 500
    """,
)
def q_scalar_pack_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function pack (reference Series.dt.*; upstream:
    cpp/src/datetime/datetime_ops.cu).  Note dayofweek off-by-one:
    Spark Sun=1 vs DuckDB Sun=0 — oracle adds 1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@register(
    "q_scalar_pack_math",
    family="scalar",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            ABS(l_extendedprice - 50000.0) AS price_dev,
            FLOOR(l_quantity / 7) AS qty_div7,
            CAST(CEIL(l_extendedprice / 1000) AS DOUBLE) AS price_kceil,
            -- domain guards on BOTH sides (r12 relational corpus, seed
            -- 9000): DuckDB RAISES on sqrt(negative) / ln(<=0) where
            -- Spark returns NaN / NULL — same contract class as the
            -- price_log10 guard below
            CASE WHEN l_extendedprice >= 0
                 THEN ROUND(SQRT(l_extendedprice), 6) END AS price_sqrt,
            CASE WHEN l_quantity + 1 > 0
                 THEN ROUND(LN(l_quantity + 1), 6) END AS qty_ln,
            CASE WHEN l_extendedprice > 0
                 THEN ROUND(LOG10(l_extendedprice), 6) END AS price_log10,
            POWER(l_quantity, 2) AS qty_sq,
            CAST(TRUNC(l_quantity) AS BIGINT) & 15 AS qty_and,
            xor(CAST(TRUNC(l_quantity) AS BIGINT), 5) AS qty_xor,
            CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        FROM lineitem
        WHERE l_orderkey <= 300
    """,
)
def q_scalar_pack_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/bitwise pack (reference unary/binary ops; upstream:
    cpp/src/unary/math_ops.cu, cpp/src/binaryop/).  Transcendentals
    (ln/log10) are rounded to 6dp — libm last-ulp may differ between
    JVM and DuckDB; sqrt is IEEE-correctly-rounded so exact.

    log of a non-positive value is pinned to NULL on BOTH sides (the
    explicit `> 0` guard): Spark's log10(0) quietly returns NULL while
    DuckDB RAISES "cannot take logarithm of zero" — the r10
    zero-injection leg's finding.  The domain guard is the contract a
    100TB pipeline needs anyway: one 0.0 in a price column must not
    decide between NULL and a crashed query."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    q, ep = F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(ep - 50000.0).alias("price_dev"),
        F.floor(q / 7).cast("double").alias("qty_div7"),
        F.ceil(ep / 1000).cast("double").alias("price_kceil"),
        # sqrt(negative) is NaN in Spark but RAISES in DuckDB — the
        # guard pins NULL on both sides (r12 relational corpus)
        F.when(ep >= 0, F.round(F.sqrt(ep), 6)).alias("price_sqrt"),
        F.when(q + 1 > 0, F.round(F.log(q + 1), 6)).alias("qty_ln"),
        F.when(ep > 0, F.round(F.log10(ep), 6)).alias("price_log10"),
        F.pow(q, 2).alias("qty_sq"),
        q.cast("long").bitwiseAND(F.lit(15)).alias("qty_and"),
        q.cast("long").bitwiseXOR(F.lit(5)).alias("qty_xor"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "q_dropna_fillna",
    family="filter",
    oracle="""
        SELECT
            c_custkey,
            COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg_filled,
            CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos
        FROM customer
        WHERE (CASE WHEN c_acctbal < -900 THEN NULL ELSE c_acctbal END) IS NOT NULL
    """,
)
def q_dropna_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling pack (reference dropna/fillna/replace; upstream:
    cpp/src/replace/).  Testdata has no nulls, so nulls are introduced
    via NULLIF and then handled — exercises na.drop/na.fill paths."""
    c = load_table(spark, sf_dir, "customer")
    with_nulls = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_n"),
        F.when(F.col("c_acctbal") < -900, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_filtered"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal_pos"),
    )
    return (
        with_nulls.na.drop(subset=["bal_filtered"])
        .na.fill({"seg_n": "UNKNOWN"})
        .select(
            "c_custkey",
            F.col("seg_n").alias("seg_filled"),
            "bal_pos",
        )
    )


@register(
    "q_sample",
    family="filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE substr(md5(COALESCE(CAST(l_orderkey AS VARCHAR), '-') || ':'
                         || COALESCE(CAST(l_linenumber AS VARCHAR), '-')), 1, 1)
                  IN ('0', '1')
    """,
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket sample (reference df.sample(frac=,
    random_state=)).  Instead of engine-private RNG, bucket each row by
    md5 of its primary key and keep 2/16 of the hash space (~12.5%):
    reproducible across engines, runs, AND cluster sizes — the sampling
    idiom that survives a 100 TB re-run (RNG-seeded sample does not,
    since Spark's seed is per-partition-index).  `DataFrame.sample` is
    still exposed on the frame facade for the API-parity path."""
    li = load_table(spark, sf_dir, "lineitem")
    # COALESCE sentinel, not bare concat_ws (r12 relational corpus,
    # seed 9000): concat_ws SKIPS null components AND their separators,
    # so (NULL, 212) and (212, NULL) both hash as '212' — while the
    # oracle's || nullifies and drops the row entirely.  The sentinel
    # makes the bucket key total and identical on both engines.
    key = F.concat_ws(
        ":",
        F.coalesce(F.col("l_orderkey").cast("string"), F.lit("-")),
        F.coalesce(F.col("l_linenumber").cast("string"), F.lit("-")),
    )
    return li.filter(
        F.substring(F.md5(key), 1, 1).isin("0", "1")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q_stratified_sample",
    family="filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem
        WHERE CASE WHEN l_returnflag = 'N'
                   THEN substr(md5(COALESCE(CAST(l_orderkey AS VARCHAR), '-')
                               || ':'
                               || COALESCE(CAST(l_linenumber AS VARCHAR), '-')
                               ), 1, 1)
                        IN ('0', '1')
                   ELSE substr(md5(COALESCE(CAST(l_orderkey AS VARCHAR), '-')
                               || ':'
                               || COALESCE(CAST(l_linenumber AS VARCHAR), '-')
                               ), 1, 1)
                        IN ('0', '1', '2', '3', '4', '5', '6', '7')
              END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-class) hash sample — the class-rebalancing step of
    a training-data pipeline: downsample the majority class ('N', ~half
    of lineitem) to 2/16 of the hash space while keeping 8/16 of the
    minority classes.  Same md5 hash-bucket idiom as q_sample: the keep
    decision is a pure function of the row key, so it is reproducible
    across engines, reruns, and cluster sizes, and the filter runs
    map-side — no shuffle, no driver round-trip, survives 100 TB
    unchanged.  (df.stat.sampleBy is the RNG-seeded API-parity path;
    its per-partition seeding is not stable under repartitioning.)"""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.coalesce(F.col("l_orderkey").cast("string"), F.lit("-")),
                F.coalesce(F.col("l_linenumber").cast("string"), F.lit("-")),
            )
        ),
        1,
        1,
    )
    keep = F.when(
        F.col("l_returnflag") == "N", bucket.isin("0", "1")
    ).otherwise(bucket.isin("0", "1", "2", "3", "4", "5", "6", "7"))
    return li.filter(keep).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@register(
    "q_combine_first",
    family="projection",
    oracle="""
        SELECT
            COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
            COALESCE(a.price_a, b.price_b) AS price,
            COALESCE(a.prio_a, b.prio_b) AS priority
        FROM (
            SELECT o_orderkey, o_totalprice AS price_a,
                   o_orderpriority AS prio_a
            FROM orders WHERE o_orderkey < 500
        ) a
        FULL OUTER JOIN (
            SELECT o_orderkey, o_totalprice AS price_b,
                   o_orderpriority AS prio_b
            FROM orders WHERE o_orderkey BETWEEN 250 AND 750
        ) b USING (o_orderkey)
    """,
)
def q_combine_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine_first / align (reference index-aligned null-filling
    merge): full outer join on the key + per-column COALESCE — the SQL
    realization of pandas alignment.  Shuffles both sides on the key
    once; at scale prefer the larger side pre-partitioned."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price_a"),
        F.col("o_orderpriority").alias("prio_a"),
    )
    b = o.filter(F.col("o_orderkey").between(250, 750)).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price_b"),
        F.col("o_orderpriority").alias("prio_b"),
    )
    return a.join(b, on="o_orderkey", how="full_outer").select(
        "o_orderkey",
        F.coalesce("price_a", "price_b").alias("price"),
        F.coalesce("prio_a", "prio_b").alias("priority"),
    )


@register(
    "q_scalar_pack_str2",
    family="scalar",
    oracle="""
        SELECT
            c_custkey,
            translate(c_name, 'Customer#', 'KUSTOMER-') AS translated,
            reverse(c_name) AS reversed,
            repeat(left(c_name, 3), 2) AS repeated,
            right(c_name, 5) AS tail5,
            ascii(c_name) AS first_code,
            chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS letter,
            CAST(strpos(c_name, '1') AS BIGINT) AS pos_one,
            CAST(bit_count(c_custkey) AS BIGINT) AS key_bits
        FROM customer
        WHERE c_custkey < 300
    """,
)
def q_scalar_pack_str2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function pack (reference Series.str surface,
    upstream cpp/src/strings/): translate/reverse/repeat/left/right/
    ascii/chr/locate plus bit_count — all codegen expressions verified
    against the identical DuckDB functions."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.translate("c_name", "Customer#", "KUSTOMER-").alias("translated"),
        F.reverse("c_name").alias("reversed"),
        F.repeat(F.substring("c_name", 1, 3), 2).alias("repeated"),
        F.substring("c_name", -5, 5).alias("tail5"),
        F.ascii("c_name").alias("first_code"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26)).alias("letter"),
        F.locate("1", F.col("c_name")).cast("long").alias("pos_one"),
        F.bit_count("c_custkey").cast("long").alias("key_bits"),
    )


@register(
    "q_melt_unpivot",
    family="projection",
    oracle="""
        -- manual UNION-ALL melt, NOT SQL UNPIVOT: pandas/cudf melt
        -- KEEPS null values (one output row per id x metric, val NULL),
        -- while UNPIVOT excludes them (round-9 null-injection leg) —
        -- the oracle must encode the pandas convention the engine
        -- implements
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               CAST(l_quantity AS DOUBLE) AS val
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE)
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
               CAST(l_discount AS DOUBLE)
        FROM lineitem WHERE l_orderkey < 100
    """,
)
def q_melt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """melt / wide-to-long unpivot (reference dask dd.melt over cudf):
    Spark's native unpivot — one narrow scan, no shuffle, rows expand
    partition-locally."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "q_map_dict",
    family="projection",
    oracle="""
        SELECT event_id, event_type,
               CASE event_type
                   WHEN 'click' THEN 1.0
                   WHEN 'view' THEN 0.5
                   WHEN 'purchase' THEN 10.0
                   WHEN 'signup' THEN 5.0
                   ELSE 0.0
               END AS type_weight
        FROM events
    """,
)
def q_map_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas/cudf Series.map({...}) (upstream: cudf Series.map dict
    path): value recoding through a small literal mapping.  Implemented
    as a MapType literal + element_at — stays a pure projection (no
    join, no shuffle, codegen'd), which is the right shape for a <1k
    mapping at any scale; bigger mappings graduate to a broadcast
    join.  Unmapped keys default via coalesce (pandas NaN -> 0.0 here
    to keep the column non-null)."""
    ev = load_table(spark, sf_dir, "events")
    weights = {"click": 1.0, "view": 0.5, "purchase": 10.0, "signup": 5.0}
    pairs: list = []
    for k, v in weights.items():
        pairs.extend([F.lit(k), F.lit(v)])
    mapping = F.create_map(*pairs)
    return ev.select(
        "event_id",
        "event_type",
        F.coalesce(
            F.element_at(mapping, F.col("event_type")), F.lit(0.0)
        ).alias("type_weight"),
    )


@register(
    "q_scan_pushdown_ts",
    family="scan",
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-12 00:00:00'
          AND event_type IN ('click', 'purchase')
    """,
)
def q_scan_pushdown_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-range + IN-list scan over the events stream table
    (reference read_parquet(filters=[...]) time-slice pattern — the
    hot path of any log/event store query).

    Scale: both predicates and the 4-column projection reach the parquet
    scan (PushedFilters shows GreaterThanOrEqual/LessThan on ts and
    In(event_type) even through load_table's NTZ-normalization cast —
    verified via explain), so at 100 TB the reader prunes row groups by
    ts min/max stats and never materializes dropped columns.  Zero
    shuffles, zero UDFs."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
        & F.col("event_type").isin("click", "purchase")
    ).select("event_id", "ts", "user_id", "event_type")
