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

from ..functions.text import doc_fingerprint, minhash_signature, tokenize


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
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Returns (id_a, id_b) with id_a < id_b, distinct.  Two docs become a
    candidate iff they agree on ALL hashes of >=1 band — standard
    (bands x rows-per-band) S-curve tuning.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        minhash_signature(text_col, num_hashes=num_hashes, shingle=shingle).alias(
            "__sig"
        ),
    )
    banded = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("__sig", b * rows_per_band + r + 1).cast(
                                        "string"
                                    )
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # Cap pathological buckets (skew guard): at most cap_bucket ids pair up.
    wb = Window.partitionBy("band", "bucket").orderBy("__id")
    capped = banded.withColumn("__rn", F.row_number().over(wb)).filter(
        F.col("__rn") <= cap_bucket
    )
    a = capped.select("band", "bucket", F.col("__id").alias("id_a"))
    b = capped.select("band", "bucket", F.col("__id").alias("id_b"))
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


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
) -> DataFrame:
    """Full fuzzy-dedup: LSH candidates -> exact-jaccard verify ->
    connected docs collapse to the min id (single-link via min-id
    propagation on verified pairs; one iteration — chains beyond one hop
    are rare at high thresholds, documented approximation)."""
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands, shingle=shingle
    )
    docs = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    pairs = (
        cands.join(docs.withColumnRenamed("__id", "id_a"), on="id_a")
        .withColumnRenamed("__text", "text_a")
        .join(
            docs.withColumnRenamed("__id", "id_b").withColumnRenamed(
                "__text", "text_b"
            ),
            on="id_b",
        )
    )
    verified = token_jaccard(pairs, "text_a", "text_b").filter(
        F.col("jaccard") >= threshold
    )
    # every verified dup (id_b side) maps to the smallest matching id_a
    to_drop = verified.groupBy("id_b").agg(F.min("id_a").alias("keep_id"))
    return df.join(
        to_drop.select(F.col("id_b").alias(id_col)), on=id_col, how="left_anti"
    )
