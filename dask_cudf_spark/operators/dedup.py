"""Deduplication operators (SURVEY.md §2.12; the NeMo-Curator-on-dask-cudf
pattern re-expressed Spark-first).

Pipeline shapes, all shuffle-bounded:
- exact_dedup: hash -> groupBy(hash) -> keep min id.  One shuffle on the
  digest (uniformly distributed -> no skew).
- minhash LSH: signature (embarrassingly parallel, no shuffle)
  -> band -> explode bands -> groupBy(band_hash) bucket join (one shuffle
  on band hash) -> candidate pairs -> exact-jaccard verification.
  At 100 TB: band buckets with huge identical-band groups are the skew
  risk; we cap bucket size (cap_bucket) before pairing so a degenerate
  bucket can't produce O(n^2) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    band_buckets_from_sig,
    doc_fingerprint,
    minhash_band_buckets,
    minhash_signature_np,
    tokenize,
)
from ..sources.tables import scale_out


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep one row (lowest id) per content fingerprint."""
    fp = doc_fingerprint(text_col, normalize=normalize)
    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        df.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
    cap_bucket: int = 1000,
    distinct: bool = True,
    impl: str = "vectorized",
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Returns (id_a, id_b) with id_a < id_b, distinct.  Two docs become a
    candidate iff they agree on ALL hashes of >=1 band — standard
    (bands x rows-per-band) S-curve tuning.

    ``distinct=False`` skips the final dedup shuffle: pairs sharing >1
    band repeat (measured ~1% on the test corpus).  Use it when the
    consumer re-aggregates anyway (near_dedup_minhash does).

    ``impl``: 'vectorized' (default) computes signatures in an
    Arrow-batched numpy pandas_udf — fastest and timing-stable;
    'sql' keeps the whole pipeline JVM-side in pure expressions
    (no Python workers needed) at higher interpreted-HOF cost.
    Candidate SETS differ slightly between impls (different shingle
    hash function); dedup semantics are identical.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # signature evaluation is compute-bound -> never run on one input split
    df = scale_out(df)
    if impl == "vectorized":
        # materialize the UDF output as a column first: a Python UDF may
        # not appear inside a higher-order-function lambda
        sig_df = df.select(
            F.col(id_col).alias("__id"),
            minhash_signature_np(
                text_col, num_hashes=num_hashes, shingle=shingle
            ).alias("__sig"),
        )
        banded = sig_df.select(
            "__id",
            F.posexplode(
                band_buckets_from_sig(F.col("__sig"), bands, rows_per_band)
            ).alias("band", "bucket"),
        )
    else:
        # one self-contained expression -> the signature fold runs
        # exactly once per row (see functions/text.py)
        banded = df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(
                minhash_band_buckets(
                    text_col,
                    bands=bands,
                    rows_per_band=rows_per_band,
                    shingle=shingle,
                )
            ).alias("band", "bucket"),
        )

    # Pair generation inside each bucket via collect_list + nested
    # transform: ONE shuffle (the groupBy), no self-join (a self-join
    # would recompute the whole signature pipeline for both sides).
    # slice(...) caps pathological buckets (skew guard): a degenerate
    # bucket contributes at most cap_bucket^2/2 pairs, never O(n^2).
    buckets = banded.groupBy("band", "bucket").agg(
        F.slice(F.array_sort(F.collect_list("__id")), 1, cap_bucket).alias("ids")
    )
    # pair generation is compute-bound but its INPUT bytes are tiny, so
    # AQE coalesces the post-agg stage to one partition (measured: the
    # whole pair explode ran on 1 of 32 cores).  An explicit repartition
    # is exempt from AQE coalescing and keeps the quadratic-per-bucket
    # work spread across the cluster; the extra exchange moves only the
    # (band, bucket, ids) aggregates.
    buckets = scale_out(buckets)
    pair = F.explode(
        F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size("ids")),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )
    )
    pairs = (
        buckets.filter(F.size("ids") > 1)
        .select(pair.alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )
    return pairs.distinct() if distinct else pairs


def token_jaccard(df_pairs: DataFrame, text_a: str, text_b: str) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs (the verify step)."""
    ta = F.array_distinct(tokenize(text_a))
    tb = F.array_distinct(tokenize(text_b))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return df_pairs.withColumn("jaccard", inter / union)


def near_dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
    impl: str = "vectorized",
    clusters: bool = False,
) -> DataFrame:
    """Full fuzzy-dedup: LSH candidates -> exact-jaccard verify ->
    connected docs collapse to the min id.

    ``clusters=False`` (default): one-hop min-id propagation — chains
    beyond one hop are rare at high thresholds (documented
    approximation).  ``clusters=True``: full connected components over
    the verified-pair graph (operators/dedup.connected_components), the
    exact single-link semantics production pipelines use."""
    # duplicate candidate pairs (docs agreeing on >1 band) are harmless
    # here — the min-id groupBy re-aggregates — so skip their dedup
    # shuffle and spend ~1% extra verify work instead
    cands = minhash_lsh_candidates(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle=shingle,
        distinct=False,
        impl=impl,
    )
    # tokenize ONCE per doc before the pair join (the projection stays
    # below the join in the plan), not once per candidate pair; plain
    # split (codegen) instead of the HOF tokenize (interpreted) — the
    # corpus is single-space separated, so the empty-token filter is
    # redundant here
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.split(text_col, " ")).alias("__toks"),
    )
    pairs = (
        cands.join(
            toks.select(F.col("__id").alias("id_a"), F.col("__toks").alias("toks_a")),
            on="id_a",
        )
        .join(
            toks.select(F.col("__id").alias("id_b"), F.col("__toks").alias("toks_b")),
            on="id_b",
        )
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    verified = pairs.withColumn("jaccard", inter / union).filter(
        F.col("jaccard") >= threshold
    )
    if clusters:
        # production shape: collapse each connected CLUSTER of verified
        # pairs to its min-id representative (full transitive closure,
        # not one hop) — survivors = nodes that are their own component
        comp = connected_components(verified.select("id_a", "id_b"))
        to_drop = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
        return df.join(to_drop, on=id_col, how="left_anti")
    # one-hop: every verified dup (id_b side) maps to the smallest
    # matching id_a
    to_drop = verified.groupBy("id_b").agg(F.min("id_a").alias("keep_id"))
    return df.join(
        to_drop.select(F.col("id_b").alias(id_col)), on=id_col, how="left_anti"
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    final step of production fuzzy dedup (duplicate PAIRS -> duplicate
    CLUSTERS; one survivor per component).  Returns (node, component)
    where component = the smallest node id reachable.

    Each iteration: every node takes min(own label, neighbors' labels) —
    one shuffle join + one aggregation; converges in O(graph diameter)
    iterations (near-dup graphs are shallow).  Lineage is truncated per
    iteration with localCheckpoint so the plan doesn't grow
    exponentially; on a cluster use a checkpoint dir instead.  The
    driver-side loop with an early-exit count is the documented pattern
    for iterative algorithms on DataFrames (no GraphX dependency).
    """
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .union(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertex_pool = und.select("n")
    if nodes is not None:
        vertex_pool = vertex_pool.union(nodes.select(F.col(nodes.columns[0]).alias("n")))
    labels = (
        vertex_pool.distinct()
        .withColumn("component", F.col("n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            und.join(labels.withColumnRenamed("n", "m"), on="m")
            .groupBy("n")
            .agg(F.min("component").alias("__nbr_min"))
        )
        updated = (
            labels.join(nbr, on="n", how="left")
            .select(
                "n",
                F.least(
                    F.col("component"), F.coalesce("__nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("__nbr_min", F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels.select(F.col("n").alias("node"), "component")
