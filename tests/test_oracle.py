"""Replay the driver's DuckDB-oracle gate locally at sf0.001 for every
registered query (fast feedback; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from dask_cudf_spark.registry import REGISTRY, _ensure_loaded

from .conftest import SF_DIR
from .oracle_compare import assert_frames_match

_ensure_loaded()

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_driver_scoring_window_covers_every_family():
    """The driver records CORRECTNESS rows for only the FIRST 50
    queries() entries (round-1 VERDICT finding): that window must hold
    at least one oracle-backed query of EVERY family, and no oracle-less
    query may burn a scored slot."""
    from dask_cudf_spark.registry import ordered_specs

    specs = ordered_specs()
    all_families = {s.family for s in specs}
    window = specs[:50]
    assert {s.family for s in window} == all_families
    assert all(s.oracle is not None for s in window)


# The exact scoring window the driver sees (50/50 green in
# CORRECTNESS_r02/r03; deliberately ROTATED in r4 per round-3 VERDICT
# item 7 to pull the flagship differentiators — q_tpch_q5_shape,
# q_minhash_dedup, q_bpe_encode — inside the scored window, displacing
# q_join_left / q_exact_dedup_rows / q_token_count, which all remain
# oracle-backed in the full registry; q_semdedup later displaced
# q_hash_exact_dedup the same deliberate way; late in r4 the second-wave
# flagships q_ann_pq and q_kmeans_step displaced q_cosine_sim's siblings
# q_centroids / q_ann_lsh, after a full 191-query sf0.01 driver-style
# replay of the registry including every window member).
# Registrations, family renames,
# or ordering tweaks must not silently displace a proven-green row;
# update this list ONLY deliberately, together with a local
# driver_replay of the new window.
_PINNED_WINDOW = [
    # round-6 rotation (r5 VERDICT item 1): six long-green slots
    # (explode, json_extract, union_all, head_sorted, intersect,
    # groupby_mean) ceded to the heaviest never-driver-scored queries
    # (pagerank, ppjoin, bloom decontamination, HLL merge, MRL recall,
    # ALS half-step) — registry._ROTATIONS round-6 entry.
    # scalar_pack_str stays as the scalar family's only window rep;
    # explode_udtf keeps the udtf family covered.
    "q_groupby_sum", "q_udaf_grouped", "q_skew_salted_sum",
    "q_tpch_q5_shape", "q_multimodal_meta", "q_scan_parquet",
    "q_project_arith", "q_filter_pred", "q_scalar_pack_str",
    "q_ann_pq", "q_minhash_dedup", "q_sort_global",
    "q_stream_tumbling", "q_bpe_encode", "q_tpch_q1",
    "q_window_rolling", "q_cogroup_udf", "q_skew_salted_collect",
    "q_join_inner", "q_multimodal_frames", "q_scan_pushdown_ts",
    "q_union_missing_cols", "q_kmeans_step", "q_neardup_embedding",
    "q_topk", "q_stream_sliding", "q_text_stats",
    "q_tpch_q6", "q_window_time_range", "q_groupby_std",
    "q_explode_udtf", "q_skew_salted_nunique", "q_join_broadcast",
    "q_multimodal_features", "q_array_pack", "q_cosine_sim",
    "q_semdedup", "q_stream_session", "q_bm25_topk",
    "q_nearest_centroid_classify", "q_pmi_collocations",
    "q_ngram_span_dedup", "q_tpch_q21", "q_retention_cohort",
    "q_pagerank_items", "q_ppjoin_neardup", "q_bloom_decontaminate",
    "q_hll_merge", "q_mrl_recall", "q_als_user_step",
]


def test_driver_scoring_window_is_pinned():
    """Round-2 VERDICT item 4: pin the exact first-50 names so new
    registrations can't silently push a green row out of the driver's
    scored window."""
    from dask_cudf_spark.registry import ordered_specs

    window = [s.name for s in ordered_specs()[:50]]
    assert window == _PINNED_WINDOW, (
        "driver scoring window changed; diff: "
        f"dropped={sorted(set(_PINNED_WINDOW) - set(window))}, "
        f"added={sorted(set(window) - set(_PINNED_WINDOW))}"
    )
