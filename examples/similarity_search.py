"""Similarity-search serving on the engine's public API.

The retrieval recipe a vector-heavy pipeline runs at scale, end to
end on the `embeddings` table (`array<float>` column, 64-dim):

    exact baseline (brute-force cosine top-k, corpus never shuffles)
      -> two approximate indexes (IVF inverted lists; LSH hyperplane
         buckets)
      -> recall@k of each index measured IN-ENGINE against the exact
         baseline (self-matches are excluded by the operators)

Scale shape (the part that matters at 100 TB): every path scans the
corpus exactly once with NO corpus shuffle — queries broadcast, IVF
centroids are driver-collected codebook literals, only candidate rows
move for the per-query top-k.  The recall join is query-keyed.

Run:  python examples/similarity_search.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

K = 5
N_QUERIES = 20


def recall_at_k(approx, exact, k: int = K) -> float:
    """Mean fraction of the exact top-k recovered per query — computed
    as a DataFrame job (semi join on (query_id, vec_id)), not a
    driver-side loop."""
    hits = exact.join(
        approx, ["query_id", "vec_id"], "left_semi"
    ).groupBy("query_id").agg(F.count("*").alias("n_hit"))
    row = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            F.avg(F.coalesce(F.col("n_hit"), F.lit(0)) / k).alias("r")
        )
        .collect()[0]
    )
    return float(row["r"])


def run_search(spark, sf_dir: str) -> dict:
    from dask_cudf_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_bucket_topk,
    )

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # deterministic query workload: every 25th vector asks "who are my
    # neighbors?" (self-match included — standard recall protocol)
    queries = (
        corpus.filter(F.col("vec_id") % 25 == 0)
        .limit(N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
        )
    )

    def pairs(df):  # all three ops emit (query_id, neighbor_id, ...)
        return df.select("query_id", F.col("neighbor_id").alias("vec_id"))

    exact = pairs(cosine_topk(corpus, queries, k=K))
    # the recall/cost dial: more lists probed -> more candidates ->
    # higher recall, linearly more re-rank work (never more shuffles)
    ivf_lo = pairs(ivf_topk(corpus, queries, n_centroids=16, nprobe=2, k=K))
    ivf_hi = pairs(ivf_topk(corpus, queries, n_centroids=16, nprobe=8, k=K))
    lsh = pairs(lsh_bucket_topk(corpus, queries, dim=64, n_planes=3, k=K))

    return {
        "corpus_vectors": corpus.count(),
        "queries": queries.count(),
        "k": K,
        "recall_ivf_nprobe2@k": round(recall_at_k(ivf_lo, exact), 3),
        "recall_ivf_nprobe8@k": round(recall_at_k(ivf_hi, exact), 3),
        "recall_lsh_8buckets@k": round(recall_at_k(lsh, exact), 3),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dask_cudf_spark.session import get_spark

    spark = get_spark(app_name="similarity-search-example")
    print(json.dumps(run_search(spark, sf_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
