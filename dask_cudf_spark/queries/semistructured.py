"""Semi-structured: JSON, arrays/lists, explode, struct (SURVEY.md §2.8, §2.10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "q_json_extract",
    family="semistructured",
    oracle="""
        SELECT
            event_id,
            CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS k_str,
            CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT) AS k_int
        FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONPath field extraction on events.props (reference libcudf
    get_json_object, cpp/src/json/json_path.cu)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
    )


@register(
    "q_explode",
    family="semistructured",
    oracle="""
        SELECT vec_id, u.pos AS pos, CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT vec_id,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> struct_pack(pos := i - 1, v := embedding[i]))) AS u
            FROM embeddings WHERE vec_id < 20
        )
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding array (reference cudf explode,
    cpp/src/lists/explode.cu).  Table-function: 1 row -> N rows."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), F.col("v").cast("double").alias("v"))


@register(
    "q_array_pack",
    family="semistructured",
    oracle="""
        SELECT
            vec_id,
            len(embedding) AS dim,
            CAST(embedding[1] AS DOUBLE) AS first_v,
            CAST(embedding[64] AS DOUBLE) AS last_v,
            CAST(list_max(embedding) AS DOUBLE) AS max_v,
            CAST(list_min(embedding) AS DOUBLE) AS min_v,
            len(list_filter(embedding, x -> x > 0)) AS n_pos,
            CAST(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1] AS DOUBLE) AS sorted_first,
            CASE WHEN list_contains(list_transform(embedding, x -> x > 0.2), true)
                 THEN 1 ELSE 0 END AS has_big
        FROM embeddings
        WHERE vec_id < 100
    """,
)
def q_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List-function pack on embedding (reference Series.list.*,
    cpp/src/lists/): size/get/min/max/filter/sort/contains."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding")
    return em.select(
        "vec_id",
        F.size(e).cast("long").alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_v"),
        F.element_at(e, 64).cast("double").alias("last_v"),
        F.array_max(e).cast("double").alias("max_v"),
        F.array_min(e).cast("double").alias("min_v"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.element_at(F.array_sort(F.transform(e, lambda x: x.cast("double"))), 1).alias(
            "sorted_first"
        ),
        F.when(F.exists(e, lambda x: x > 0.2), 1).otherwise(0).alias("has_big"),
    )


@register(
    "q_struct_ops",
    family="semistructured",
    oracle="""
        SELECT
            o_orderkey,
            struct_extract(s, 'custkey') AS custkey,
            struct_extract(s, 'price') AS price
        FROM (
            SELECT o_orderkey,
                   struct_pack(custkey := o_custkey, price := o_totalprice) AS s
            FROM orders WHERE o_orderkey <= 400
        )
    """,
)
def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct pack/extract (reference Series.struct accessor) — build a
    nested column then project fields back out."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("custkey"), F.col("o_totalprice").alias("price")
        ).alias("s"),
    )
    return nested.select(
        "o_orderkey",
        F.col("s.custkey").alias("custkey"),
        F.col("s.price").alias("price"),
    )


@register(
    "q_sequence_zip",
    family="semistructured",
    oracle="""
        SELECT
            n_nationkey,
            array_to_string(list_transform(range(1, 4), x -> CAST(x * n_nationkey AS VARCHAR)), ',') AS multiples
        FROM nation
    """,
)
def q_sequence_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array generation + transform (reference sequence/take idioms) —
    note DuckDB range(1,4) is end-exclusive = Spark sequence(1,3)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda x: (x.cast("long") * F.col("n_nationkey").cast("long")).cast(
                    "string"
                ),
            ),
            ",",
        ).alias("multiples"),
    )


@register(
    "q_explode_udtf",
    family="udf",
    oracle="""
        SELECT o_orderkey, u.part AS priority_word, u.pos AS word_idx
        FROM (
            SELECT o_orderkey,
                   unnest(list_transform(range(1, len(string_split(o_orderpriority, '-')) + 1),
                          i -> struct_pack(pos := i - 1,
                                           part := string_split(o_orderpriority, '-')[i]))) AS u
            FROM orders WHERE o_orderkey <= 200
        )
    """,
)
def q_explode_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + posexplode as the table-function surface (reference
    str.split(expand) + explode)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.posexplode(F.split("o_orderpriority", "-")).alias("word_idx", "priority_word"),
    ).select(
        "o_orderkey", "priority_word", F.col("word_idx").cast("long").alias("word_idx")
    )


@register(
    "q_json_full_parse",
    family="semistructured",
    oracle="""
        WITH p AS (
            SELECT event_id,
                   -- typed-parse gate (r11 events-corpus fuzz): Spark's
                   -- from_json with a BIGINT schema accepts only
                   -- integer-TYPED JSON numbers — a quoted "18", a 1.9,
                   -- or a true all parse to NULL, they are never
                   -- coerced.  json_type replicates that gate; the
                   -- plain extract-and-CAST the oracle used before
                   -- coerces strings and diverges.
                   -- TRY_CAST, not CAST (r11 ADVICE, amended): DuckDB
                   -- types EVERY non-negative JSON integer as UBIGINT
                   -- (87 -> 'UBIGINT', -87 -> 'BIGINT'), so UBIGINT
                   -- must stay accepted — but a value past int64 max
                   -- then CRASHES a plain CAST while Spark's from_json
                   -- yields NULL.  TRY_CAST maps exactly that overflow
                   -- to NULL on the oracle side too.
                   TRY_CAST(CASE WHEN json_valid(props)
                             AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                        THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
            FROM events
            WHERE event_id < 300
        )
        SELECT event_id, k, k % 10 AS k_mod,
               CASE WHEN k > 50 THEN 'high' ELSE 'low' END AS k_band
        FROM p
    """,
)
def q_json_full_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full JSON parse to a typed struct (from_json — exceeds the
    reference's path-extraction-only surface, SURVEY.md §2.8) with
    downstream typed arithmetic on the parsed fields."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    parsed = ev.withColumn(
        "p", F.from_json("props", "struct<k: bigint>")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"),
        F.when(F.col("p.k") > 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "q_map_ops",
    family="semistructured",
    oracle="""
        SELECT
            doc_id,
            map(['lang', 'source'], [lang, source])['lang'][1] AS lang_val,
            map(['lang', 'source'], [lang, source])['source'][1] AS source_val,
            CAST(cardinality(map(['lang', 'source'], [lang, source])) AS BIGINT)
                AS n_entries,
            array_to_string(map_keys(map(['lang', 'source'], [lang, source])), ',')
                AS keys_csv
        FROM documents
        WHERE doc_id < 200
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType operations — cuDF has NO map type (SURVEY.md §1: modeled
    there as list<struct<k,v>>); Spark's MapType is a strict superset,
    exercised here: construction from arrays, key lookup, cardinality,
    key enumeration.  Output flattened to scalars so the cross-engine
    hash compare stays well-defined."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.size(m).cast("long").alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "q_python_udtf",
    family="udf",
    oracle="""
        SELECT doc_id,
               CAST(u.token_idx AS BIGINT) AS token_idx,
               u.token AS token
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                          i -> struct_pack(token_idx := i - 1,
                                           token := string_split(text, ' ')[i]))) AS u
            FROM documents WHERE doc_id < 50
        )
    """,
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Python UDTF (@udtf, Spark 3.5+): one input row -> N output
    rows from arbitrary Python, consumed via LATERAL join.  Determinism
    declared so results are oracle-checkable; the reference's table-
    function surface (explode / str.split(expand)) has no user-defined
    equivalent at all."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token_idx bigint, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:  # NULL text -> zero rows, like LATERAL
                return  # UNNEST over a NULL split (round-9 null leg)
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token_idx, t.token
        FROM __docs_udtf d, LATERAL tokenize_udtf(d.text) t
        """
    )


@register(
    "q_arrow_batch_stats",
    family="udf",
    oracle="""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT)
                   AS n_nonspace
        FROM documents
        WHERE doc_id < 200
    """,
)
def q_arrow_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface (the closest Spark analog to the
    reference's map_partitions-over-a-columnar-batch escape hatch,
    SURVEY.md §2.10): per-batch pyarrow.compute kernels compute char /
    token / non-space counts with ZERO pandas materialization — the
    Arrow RecordBatch flows from Tungsten into pyarrow and back with
    no row conversion, which is the entire point of the API vs
    mapInPandas.  Deterministic per-row outputs, so the DuckDB oracle
    checks it like any scalar query.

    Scale: embarrassingly map-side; batch size rides
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            toks = pc.split_pattern(text, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(
                        pc.utf8_length(
                            pc.replace_substring(text, " ", "")
                        ),
                        pa.int64(),
                    ),
                ],
                ["doc_id", "n_chars", "n_tokens", "n_nonspace"],
            )

    return d.select("doc_id", "text").mapInArrow(
        stats,
        "doc_id long, n_chars long, n_tokens long, n_nonspace long",
    )
