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
    # round-7 rotation (r6 VERDICT item 2): EVERY slot except five pins
    # ceded to a never-driver-scored query — registry._ROTATIONS
    # round-7 entry.  Pins: q_scan_parquet (no never-scored scan
    # queries remain), q_skew_salted_sum / q_udaf_grouped (family
    # reps), q_groupby_sum / q_filter_pred (sub-100-ms canaries).
    # Ever-driver-scored union after this round: 142 of 234
    # (q_multimodal_mjpeg registered this round, outside the window).
    "q_groupby_sum", "q_udaf_grouped", "q_skew_salted_sum",
    "q_scan_parquet", "q_filter_pred",
    "q_kaplan_meier", "q_basket_pairs", "q_bootstrap_ci",
    "q_rfm_segmentation", "q_crosstab",
    "q_minhash_pairs", "q_dedup_components", "q_neardup_blocked",
    "q_simhash", "q_dedup_keep_best",
    "q_stratified_sample",
    "q_join_asof_forward", "q_join_asof_tolerance", "q_merge_indicator",
    "q_multimodal_avi", "q_multimodal_jpeg", "q_multimodal_wav",
    "q_skew_salted_join", "q_repartition_sorted",
    "q_melt_unpivot",
    "q_scalar_pack_str2",
    "q_json_full_parse", "q_struct_ops",
    "q_except",
    "q_ann_ivf", "q_ann_recall", "q_jl_projection",
    "q_group_head", "q_zorder_cluster",
    "q_stream_stateful", "q_stream_stream_join",
    "q_curation_pipeline", "q_countmin_heavy_hitters",
    "q_tfidf_topterms", "q_gopher_rules", "q_dsir_lift",
    "q_inverted_index",
    "q_tpch_q9", "q_tpch_q8", "q_tpch_q7",
    "q_python_udtf", "q_arrow_batch_stats",
    "q_peak_concurrency", "q_multitouch_attribution",
    # round 7b: the jar-free Kafka wire-protocol source lands its
    # flagship oracle row in the scored window; q_acf_daily_revenue
    # cedes (union-neutral — both never-driver-scored) and waits for
    # the round-8 rotation.
    "q_kafka_roundtrip",
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
