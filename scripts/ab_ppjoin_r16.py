"""Same-session interleaved A/B for the r16 ppjoin hot-bucket guard:
OLD = r15 candidate block (explosion only, bucketed NOT checkpointed),
NEW = registry q_ppjoin_neardup (guarded routes + bucketed
localCheckpoint).  min-of-N, both arms in one session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_cudf_spark.registry import all_queries
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "4"))


def old_ppjoin(spark, sf_dir):
    t = 0.5
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(w) >= 3 THEN "
                    "transform(sequence(0, size(w) - 3),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2])) "
                    "ELSE array() END"
                )
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .localCheckpoint(eager=False)
    )
    tok = d.select("doc_id", F.explode("toks").alias("token"))
    df_rank = tok.groupBy("token").agg(F.count("*").alias("df"))
    ranked = (
        tok.join(df_rank, "token")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "token"))).alias(
                "ordered"
            )
        )
    )
    n_ord = F.size("ordered")
    prefix = ranked.select(
        "doc_id",
        F.explode(
            F.slice(
                F.col("ordered"),
                1,
                F.greatest(
                    F.lit(1), (n_ord - F.ceil(t * n_ord) + 1).cast("int")
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.token").alias("token"))
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        prefix.groupBy("token")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.id_a").alias("id_a"), F.col("pr.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", inter)
        .filter(
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= t
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "CAST(1000000 * inter div (n_a + n_b - inter) AS LONG)"
            ).alias("jaccard_ppm"),
        )
    )


def twolevel_ppjoin(spark, sf_dir):
    """Variant B: universal two-level explode — no branch, no extra
    checkpoint; per-cell memory O(|bucket|) always."""
    t = 0.5
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "CASE WHEN size(w) >= 3 THEN "
                    "transform(sequence(0, size(w) - 3),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2])) "
                    "ELSE array() END"
                )
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .localCheckpoint(eager=False)
    )
    tok = d.select("doc_id", F.explode("toks").alias("token"))
    df_rank = tok.groupBy("token").agg(F.count("*").alias("df"))
    ranked = (
        tok.join(df_rank, "token")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "token"))).alias(
                "ordered"
            )
        )
    )
    n_ord = F.size("ordered")
    prefix = ranked.select(
        "doc_id",
        F.explode(
            F.slice(
                F.col("ordered"),
                1,
                F.greatest(
                    F.lit(1), (n_ord - F.ceil(t * n_ord) + 1).cast("int")
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.token").alias("token"))
    cand = (
        prefix.groupBy("token")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select("ids", F.posexplode("ids").alias("__i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(F.col("ids"), F.col("__i") + 2, F.size("ids"))
            ).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", inter)
        .filter(
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= t
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "CAST(1000000 * inter div (n_a + n_b - inter) AS LONG)"
            ).alias("jaccard_ppm"),
        )
    )


def main():
    spark = get_spark(
        app_name="ab_ppjoin_r16",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = all_queries()["q_ppjoin_neardup"]

    def run(fn):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).agg(F.count(F.lit(1)).alias("n")).collect()
        return time.perf_counter() - t0

    # result-set sanity: all three arms must agree
    def rows(fn):
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard_ppm"])
            for r in fn(spark, SF_DIR).collect()
        )

    assert rows(old_ppjoin) == rows(new_fn) == rows(twolevel_ppjoin)

    arms = [("old", old_ppjoin), ("guarded", new_fn), ("twolevel", twolevel_ppjoin)]
    for _, fn in arms * 2:  # warmups
        run(fn)
    res = {name: [] for name, _ in arms}
    for _ in range(RUNS):
        for name, fn in arms:
            res[name].append(run(fn))
    for name in res:
        print(
            f"ppjoin {name}: min={min(res[name]):.3f}s "
            f"all={['%.2f' % x for x in res[name]]}"
        )


if __name__ == "__main__":
    main()
