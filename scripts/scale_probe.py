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
#
# CELL=longdoc (r13, r12 VERDICT item 4): each document's text is
# repeated REPEAT times WITHIN the document (fixed alphabet) — the
# long/boilerplate-document regime a 100-TB crawl contains (nav bars,
# footers, templated pages).  This is the cell where the
# distinct-(doc,bigram) pre-aggregation is SUPPOSED to win: within-doc
# bigram repetition grows ~REPEAT-fold while distinct (doc,bigram)
# rows stay ~constant.  The probe records the measured pre-agg cut
# (row cut and wall-time cut vs a raw-stream variant) next to the
# hostile/zipf rows, closing the r12 claim audit.
CELL = os.environ.get("CELL", "")
ZIPF = CELL == "zipf"
LONGDOC = CELL == "longdoc"
REPEAT = int(os.environ.get("REPEAT", "8"))

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
    # r13 additions (r12 VERDICT item 6, coverage-ledger audit): the
    # scored-window queries whose no-probe reason did NOT hold —
    # q_udaf_grouped is the applyInPandas Python hot path (Arrow batch
    # transfer scales with rows, no family proxy); q_sessionize_gaps is
    # the canonical gaps-and-islands double window; q_edit_distance
    # carries a per-row O(len^2) pandas_udf; q_token_rarity joins the
    # unigram vocabulary back to the token stream (the unigram sibling
    # of the bigram family, but with an IDF-style join fan-in);
    # q_fk_integrity_audit fuses domain scans + two LEFT ANTI probes
    # (the relational ingest gate must stay counts-only at any SF)
    "q_udaf_grouped",
    "q_sessionize_gaps",
    "q_edit_distance",
    "q_token_rarity",
    "q_fk_integrity_audit",
    # r14 additions (r13 VERDICT item 6): the two r13 text queries whose
    # worst regime is the longdoc/boilerplate cell — q_first_dup_span's
    # per-(doc,gram) collect_list(pos) grows with WITHIN-doc repetition
    # (run with CELL=longdoc REPEAT=32); q_template_prefixes' prefix
    # groupBy fan-in grows with the token stream
    "q_template_prefixes",
    "q_first_dup_span",
    # r14 wave: the three new scored-window queries with a scale
    # dimension (q_containment_scores is a bounded 300-doc verification
    # slice — its scale path is per-pair map-side scoring on LSH
    # candidates, proxied by the q_minhash_pairs probes)
    "q_jsd_drift",
    "q_iqr_anomaly_days",
    "q_class_balance",
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
    out = f"{BASE}/x{factor}" + ("z" if ZIPF else f"L{REPEAT}" if LONGDOC else "")
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
    def _doc_text(i: int):
        # zipf/longdoc cells: identical alphabet across copies (fixed
        # vocab); default: disjoint affine rotations per copy
        base = (
            F.col("text")
            if (ZIPF or LONGDOC)
            else F.translate("text", *_rot(i))
        )
        if LONGDOC:
            # boilerplate regime: the doc's own text repeated REPEAT
            # times (empty/NULL docs stay empty/NULL via the concat_ws
            # null-skip — a NULL text repeated is '')
            return F.when(
                F.col("text").isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat_ws(" ", *([base] * REPEAT)))
        return base

    blow(
        "documents",
        lambda df, i: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * OFFSET)
        ).withColumn("text", _doc_text(i)),
    )
    blow(
        "embeddings",
        lambda df, i: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * OFFSET)
        ),
    )
    open(marker, "w").write("ok\n")
    return out


def _bigram_lm(spark, d: str, preagg: bool):
    """Mirror of queries/text.q_bigram_lm_score with the
    distinct-(doc,bigram) pre-aggregation SWITCHABLE, so the probe can
    measure its wall-time win directly (preagg=False rides every
    downstream join on the raw bigram stream — the rejected form)."""
    # toks bound as a column (NOT inline split): the r13 finding this
    # very probe produced — expressions in a HOF lambda re-evaluate per
    # element, O(len^2) per doc
    staged = load_table(spark, d, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prev"),
                F.element_at(toks, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    pairs = staged.select("doc_id", F.explode(bigrams).alias("bg")).select(
        "doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur")
    )
    bc = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c_bg"))
    pc = pairs.groupBy("prev").agg(F.count("*").alias("c_prev"))
    if preagg:
        occ = pairs.groupBy("doc_id", "prev", "cur").agg(
            F.count("*").alias("n_occ")
        )
    else:
        occ = pairs.withColumn("n_occ", F.lit(1).cast("long"))
    scored = (
        occ.join(bc, ["prev", "cur"])
        .join(pc, ["prev"])
        .select(
            "doc_id",
            "n_occ",
            F.floor((F.lit(1000000.0) * F.col("c_bg")) / F.col("c_prev"))
            .cast("long")
            .alias("p_s6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_bigrams"),
        F.sum(F.col("n_occ") * F.col("p_s6")).alias("fluency_sum_s6"),
        F.expr("sum(n_occ * p_s6) div sum(n_occ)").alias("fluency_mean_s6"),
    )


def bigram_preagg_cut(spark, d: str, runs: int) -> dict:
    """The r12 claim-audit closer: measured pre-aggregation savings on
    one corpus dir — raw-vs-distinct ROW cut at the join input, and
    wall-time of the query with/without the pre-aggregation."""
    staged = load_table(spark, d, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    # raw bigram-stream rows: sum of per-doc (n_tokens - 1), guarded
    raw_rows = staged.select(
        F.sum(
            F.when(F.size(toks) >= 2, F.size(toks) - 1).otherwise(0)
        ).alias("n")
    ).collect()[0][0]
    bg = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prev"),
                F.element_at(toks, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    pairs = staged.select("doc_id", F.explode(bg).alias("b")).select(
        "doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur")
    )
    occ_rows = pairs.groupBy("doc_id", "prev", "cur").count().count()
    out = {
        "raw_pair_rows": int(raw_rows or 0),
        "distinct_doc_bigram_rows": int(occ_rows),
        "row_cut": round((raw_rows or 0) / max(1, occ_rows), 2),
    }
    for label, preagg in (("preagg", True), ("raw_stream", False)):
        _bigram_lm(spark, d, preagg).count()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _bigram_lm(spark, d, preagg).count()
            ts.append(time.perf_counter() - t0)
        out[f"{label}_sec"] = round(min(ts), 3)
    out["wall_cut"] = round(out["raw_stream_sec"] / out["preagg_sec"], 2)
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
    payload = {
        "factor": FACTOR,
        "runs": RUNS,
        "cell": CELL or "hostile",
        "queries": result,
    }
    if LONGDOC:
        payload["repeat"] = REPEAT
    # the pre-agg claim audit (r12 VERDICT item 4): measured on the
    # blown-up dir whenever the bigram query is probed
    if any("bigram" in n for n in probes):
        payload["bigram_preagg"] = bigram_preagg_cut(spark, xk, RUNS)
        print(f"  bigram_preagg {payload['bigram_preagg']}", file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
