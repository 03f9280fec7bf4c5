"""r16 measurement (r15 VERDICT item 5): what does q_minhash_dedup's
persist+count edge probe actually cost?  Three arms, one session,
interleaved min-of-N:

  current   — registry q_minhash_dedup (persist+count probe -> local
              union-find; the probe job materializes the LSH pipeline
              into the cache, the main job reuses it)
  noprobe   — identical pipeline but the components switch is FORCED
              local with NO persist and NO count: the whole pipeline
              runs once inside the union-find job (the theoretical
              best case of "fold the probe away")
  probeonly — just the probe job (persist+count of the edge frame),
              isolating the probe's share of the total

If current - noprobe is small, the probe is already near-free (the
count is the cache-fill action the main job needs anyway) and VERDICT
item 5 has no real headroom; the numbers decide.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dask_cudf_spark.operators import dedup as ddp
from dask_cudf_spark.registry import all_queries
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "4"))


def _edges(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pairs = ddp.minhash_sig_pairs(
        d, "text", "doc_id", num_hashes=16, bands=4, shingle=5,
        distinct=False,
    )
    return d, pairs.filter(
        F.col("n_match").cast("double") / 16 >= 0.8
    ).select("id_a", "id_b")


def noprobe(spark, sf_dir):
    d, edges = _edges(spark, sf_dir)
    e = edges.select(
        F.col("id_a").alias("n"),
        F.col("id_b").cast(edges.schema["id_a"].dataType).alias("m"),
    )
    comp = ddp._cc_local_unionfind(e, edges.schema["id_a"].dataType)
    to_drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return d.join(to_drop, on="doc_id", how="left_anti").select(
        "doc_id", "lang", "source"
    )


def probeonly(spark, sf_dir):
    _, edges = _edges(spark, sf_dir)
    e = edges.persist()
    try:
        n = e.count()
    finally:
        e.unpersist(False)
    return n


def main():
    spark = get_spark(
        app_name="ab_minhash_r16",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    cur = all_queries()["q_minhash_dedup"]

    def run_df(fn):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).agg(F.count(F.lit(1)).alias("n")).collect()
        return time.perf_counter() - t0

    def run_probe():
        t0 = time.perf_counter()
        probeonly(spark, SF_DIR)
        return time.perf_counter() - t0

    # result equality of the two full arms
    def rows(fn):
        return sorted(tuple(r) for r in fn(spark, SF_DIR).collect())

    assert rows(cur) == rows(noprobe)

    arms = [
        ("current", lambda: run_df(cur)),
        ("noprobe", lambda: run_df(noprobe)),
        ("probeonly", run_probe),
    ]
    for _, f in arms * 2:
        f()
    res = {n: [] for n, _ in arms}
    for _ in range(RUNS):
        for n, f in arms:
            res[n].append(f())
    for n in res:
        print(
            f"minhash {n}: min={min(res[n]):.3f}s "
            f"all={['%.2f' % x for x in res[n]]}"
        )


if __name__ == "__main__":
    main()
