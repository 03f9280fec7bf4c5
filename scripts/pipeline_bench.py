"""Pipeline-level bench (r15 directive 5): per-query anchors exist for
every operator, but a real curation run composes quality-filter ->
exact dedup -> fuzzy dedup -> decontaminate -> split -> publish as ONE
job.  Composition has its own failure mode no per-query anchor can
see: a pipeline that re-executes the corpus scan per stage (each
intermediate .count() action replays the whole lineage above it) costs
O(stages x scans) at 100 TB.

This bench runs examples/curation_pipeline.run_pipeline in its
production shape (funnel_counts=False: the only actions are the txlog
publish write and one final-stats aggregation) at corpus x1 and x10,
and audits the composed publish plan:

  - wall-clock x1 vs x10 (should scale sublinearly — fixed JVM/job
    overhead amortizes; superlinear = a quadratic stage snuck in);
  - documents.parquet SCAN COUNT in the one composed plan == the small
    constant the dataflow needs (main flow + LSH signature build +
    decontam benchmark sample), NOT stages x scans;
  - shuffle count of the composition (exchanges in the final plan).

Usage:  python scripts/pipeline_bench.py [sf_dir] [repeat]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

from pyspark.sql import functions as F  # noqa: E402

from dask_cudf_spark.session import get_spark  # noqa: E402
from curation_pipeline import run_pipeline  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark(app_name="pipeline-bench")
spark.sparkContext.setLogLevel("ERROR")

root = tempfile.mkdtemp(prefix="spark-graft-pipebench-")

# ---- corpus x10: ten doc_id-shifted copies of documents.parquet ------
x10_dir = f"{root}/x10"
os.makedirs(x10_dir)
docs = spark.read.parquet(f"{SF}/documents.parquet")
n_docs = docs.count()
shift = 10 ** len(str(n_docs * 10))  # keep ids unique + disjoint
x10 = docs
for i in range(1, 10):
    x10 = x10.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
    )
x10.write.mode("overwrite").parquet(f"{x10_dir}/documents.parquet")


def timed_run(sf_dir: str, tag: str) -> tuple[float, dict]:
    best, funnel = None, None
    for r in range(REPEAT):
        out = f"{root}/out-{tag}-{r}"
        t0 = time.time()
        funnel = run_pipeline(spark, sf_dir, out, funnel_counts=False)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        shutil.rmtree(out, ignore_errors=True)
    return best, funnel


t_x1, funnel_x1 = timed_run(SF, "x1")
t_x10, funnel_x10 = timed_run(x10_dir, "x10")

# sanity: the x10 corpus really is 10x on INPUT...
n_x10 = spark.read.parquet(f"{x10_dir}/documents.parquet").count()
assert n_x10 == 10 * n_docs, (n_x10, n_docs)
# ...and since the 10 copies are byte-identical text under shifted
# ids, exact dedup must collapse the corpus straight back to the x1
# survivor set — the composed pipeline's end-to-end dedup property
# (a published count that GREW ~10x would mean dedup silently broke)
assert funnel_x10["published"] == funnel_x1["published"], (
    funnel_x1,
    funnel_x10,
)

# ---- plan audit of the COMPOSED dataflow -----------------------------
# Rebuild the pipeline's final frame (pre-publish) and audit one plan:
# scan count of documents.parquet must be the constant the dataflow
# needs, not stages x scans.
from dask_cudf_spark.frame import read_parquet  # noqa: E402
from dask_cudf_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    near_dedup_minhash,
)
from dask_cudf_spark.plans.audit import audit  # noqa: E402

docs_f = read_parquet(spark, f"{SF}/documents.parquet")
docs_f = docs_f.assign(
    n_tokens=docs_f.text.str.split().list.len(),
    alpha_ratio=(
        docs_f.text.str.count(r"[A-Za-z]").astype("double")
        / docs_f.text.str.len().clip(lower=1)
    ),
)
kept = docs_f[
    (docs_f.n_tokens >= 5)
    & (docs_f.alpha_ratio > 0.4)
    & docs_f.lang.isin(["en", "de", "fr"])
]
sdf = exact_dedup(kept.spark, text_col="text", id_col="doc_id")
sdf = near_dedup_minhash(
    sdf, text_col="text", id_col="doc_id", threshold=0.8, clusters=True
)
bench = (
    spark.read.parquet(f"{SF}/documents.parquet")
    .filter(F.pmod(F.crc32(F.col("text")), F.lit(50)) == 0)
    .select(F.md5(F.col("text")).alias("bench_fp"))
    .distinct()
)
sdf = (
    sdf.withColumn("fp", F.md5(F.col("text")))
    .join(F.broadcast(bench), F.col("fp") == F.col("bench_fp"), "left_anti")
    .drop("fp")
)
a = audit(sdf)
n_scans = a.text.count("documents.parquet")

summary = {
    "metric": "pipeline_bench",
    "sf": SF,
    "repeat": REPEAT,
    "x1_s": round(t_x1, 2),
    "x10_s": round(t_x10, 2),
    "x10_over_x1": round(t_x10 / t_x1, 2),
    "published_x1": funnel_x1["published"],
    "published_x10": funnel_x10["published"],
    "composed_plan": {
        "documents_scans": n_scans,
        "shuffles": a.n_shuffles,
        "broadcast_joins": a.n_broadcast_hash_joins,
        "sort_merge_joins": a.n_sort_merge_joins,
        "python_nodes": a.python_nodes,
    },
}
print(json.dumps(summary))
shutil.rmtree(root, ignore_errors=True)
