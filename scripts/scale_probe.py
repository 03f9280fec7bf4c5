"""Scale-evidence probe (round-3 VERDICT item 6): blow the sf0.1
inputs up 10x DETERMINISTICALLY, run the most expensive headline
queries at 1x and 10x, and report wall-time scaling factors.

All correctness evidence runs at <= 600k rows; this probe is the guard
against accidental O(n^2) that plan digests can't see.  Expected:
~linear (ratio ~10 with fixed parallelism, lower where the 1x run is
overhead-dominated); anything clearly superlinear is a bug.

Blow-up construction (no driver fixtures — copies are derived from
sf0.1 itself and written once to /tmp/scale_probe/x{K}):
- facts (lineitem, orders): copy i offsets the join keys
  (l_orderkey / o_orderkey) by i * 10^9, so copies are disjoint
  subgraphs and per-key group sizes stay constant (dims stay
  unscaled, as dims do at 100 TB).
- events: copy i offsets user_id — sessions-per-user constant.
- documents: copy i offsets doc_id AND rotates the text alphabet by i
  (translate a->b->c...), so shingle spaces of different copies are
  DISJOINT: the near-duplicate rate stays exactly sf0.1's instead of
  every doc gaining 9 synthetic near-dups (which would measure a
  harder problem, not a bigger one).
- embeddings: copy i offsets vec_id (vectors repeat; timing is
  magnitude-driven, not value-driven).
- dims (region nation customer supplier part): symlinked unscaled.

Usage: python scripts/scale_probe.py [factor] [runs] [name-substr ...]
Prints one JSON line {"factor": K, "queries": {name: {"x1": s,
"x10": s, "ratio": r}}, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources import load_table

SRC = "/root/testdata/sf0.1"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BASE = "/tmp/scale_probe"
OFFSET = 10**9
# CELL=zipf (r11 VERDICT item 4): document copies KEEP the source
# alphabet instead of rotating it, so the global vocabulary stays FIXED
# as the corpus grows — the realistic property of web-scale text
# (Heaps' law: vocab grows sublinearly; token frequencies stay
# Zipfian).  The default (rotated, disjoint per-copy vocabularies) is
# deliberately hostile to any per-token pre-aggregation: distinct
# (doc, token) rows scale with the full token stream.  Under zipf the
# bigram/unigram count tables stop growing with corpus size, which is
# exactly the regime q_bigram_lm_score's distinct-(doc,bigram)
# pre-aggregation is designed for — record BOTH cells side by side.
ZIPF = os.environ.get("CELL", "") == "zipf"

PROBES = [
    "q_tpch_q5_shape",
    "q_minhash_dedup",
    "q_join_inner",
    "q_stream_session",
    "q_cosine_sim",
    "q_ngram_span_dedup",
    # r4 additions: the new compute-heavy operators (q_semdedup is
    # deliberately absent — O(N^2/K) with FIXED K is quadratic by
    # construction, documented in operators/similarity.semdedup)
    "q_kmeans_step",
    "q_ann_pq",
    "q_bm25_topk",
    "q_pmi_collocations",
    "q_nearest_centroid_classify",
    # r5 additions: q_semdedup NOW probes cleanly — the registered
    # query derives K from the corpus count, so 10x rows -> 10x cells
    # at ~constant cell width (the r4 exclusion reason is fixed)
    "q_semdedup",
    "q_pagerank_items",
    "q_bloom_decontaminate",
    "q_countmin_heavy_hitters",
    "q_dsir_lift",
    # r7 additions: the distributed exact ranking rewrites — a global
    # NTILE/rank over the FULL fact table is exactly the shape the
    # single-partition window form could never scale
    "q_qcut",
    "q_rank_global",
    # r7: heavy compositions newly inside the driver's scored window
    "q_curation_pipeline",
    "q_tpch_q9",
    "q_peak_concurrency",
    "q_minhash_pairs",
    # r9 (r8 VERDICT item 6): the CDC pair — the lakehouse write+merge
    # +changefeed path builds its txlog INSIDE the timed callable, so
    # the probe measures commit, MERGE, dir-diff feed, and (for the
    # matview) signed-delta refresh against row volume
    "q_txlog_change_feed",
    "q_matview_cdc",
    # r11 additions: the bigram-LM fluency filter (two vocabulary-count
    # shuffles joined back to the bigram stream — the query family whose
    # cost is join-volume-bound) and the one-scan embedding ingest gate
    "q_bigram_lm_score",
    "q_embedding_audit",
    # r12 additions: the grouping-sets family — the Expand multiplier
    # (k+1 rollup replicas / |sets| explicit) must scale linearly with
    # rows, never as extra scans
    "q_grouping_sets_lineitem",
    "q_cube_orders",
]

DIMS = ["region", "nation", "customer", "supplier", "part"]


def _rot(i: int) -> tuple[str, str]:
    """Copy-i alphabet permutation: affine cipher x -> a*x + b (mod 26)
    with a coprime to 26.  A plain rotation caps at 26 distinct maps
    (and i >= 26 silently degenerated to the identity via slicing past
    the string end), which at factor 100 would hand every doc ~3
    synthetic near-dups; the affine family gives 12*26 = 312 distinct
    bijections, so all 100 copies keep (near-)disjoint shingle spaces
    and the dup problem scales in SIZE, not hardness.  i=0 stays the
    identity (a=1, b=0)."""
    alpha = string.ascii_lowercase
    coprimes = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    a, b = coprimes[(i // 26) % 12], i % 26
    return alpha, "".join(alpha[(a * x + b) % 26] for x in range(26))


def build(spark, factor: int) -> str:
    out = f"{BASE}/x{factor}" + ("z" if ZIPF else "")
    marker = f"{out}/_COMPLETE"
    if os.path.exists(marker):
        return out
    # a dir without the marker is a crashed partial build: rebuild
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    def blow(name, mk_copy):
        df = load_table(spark, SRC, name)
        parts = [mk_copy(df, i) for i in range(factor)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # one file per table like the source fixtures; timestamps are
        # written as naive us so load_table's normalization still applies
        u.coalesce(max(1, factor // 2)).write.mode("overwrite").parquet(
            f"{out}/_{name}"
        )
        # flatten to <table>.parquet directory path convention: the
        # loaders accept a directory, so just rename
        os.rename(f"{out}/_{name}", f"{out}/{name}.parquet")

    blow(
        "lineitem",
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * OFFSET)
        ),
    )
    blow(
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * OFFSET)
        ),
    )
    blow(
        "events",
        lambda df, i: df.withColumn(
            "user_id", F.col("user_id") + F.lit(i * OFFSET)
        ).withColumn("event_id", F.col("event_id") + F.lit(i * OFFSET)),
    )
    blow(
        "documents",
        lambda df, i: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * OFFSET)
        ).withColumn(
            "text",
            # zipf cell: identical alphabet across copies (fixed vocab)
            F.col("text") if ZIPF else F.translate("text", *_rot(i)),
        ),
    )
    blow(
        "embeddings",
        lambda df, i: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * OFFSET)
        ),
    )
    open(marker, "w").write("ok\n")
    return out


def main() -> None:
    from dask_cudf_spark.registry import all_queries

    spark = get_spark(
        app_name="scale-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    x1 = build(spark, 1)
    xk = build(spark, FACTOR)

    substrs = sys.argv[3:]
    probes = (
        [n for n in PROBES if any(s in n for s in substrs)]
        if substrs
        else PROBES
    )
    result: dict[str, dict] = {}
    for name in probes:
        fn = queries[name]
        times: dict[str, float] = {}
        for label, d in (("x1", x1), (f"x{FACTOR}", xk)):
            fn(spark, d).count()  # warm (JIT, python workers, footers)
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                ts.append(time.perf_counter() - t0)
            times[label] = round(min(ts), 3)
            times[f"{label}_rows"] = n
        times["ratio"] = round(times[f"x{FACTOR}"] / times["x1"], 2)
        result[name] = times
        print(f"  {name:20s} {times}", file=sys.stderr)
    print(
        json.dumps(
            {
                "factor": FACTOR,
                "runs": RUNS,
                "cell": "zipf" if ZIPF else "hostile",
                "queries": result,
            }
        )
    )


if __name__ == "__main__":
    main()
