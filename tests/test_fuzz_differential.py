"""Bounded in-suite slice of the differential plan fuzzer
(tests/fuzz_gen.py; long sweeps via scripts/fuzz_differential.py).

30 deterministic seeds — enough to keep the generator and both
execution paths honest on every suite run without dominating suite
wall time.  Any mismatch prints the full plan + DuckDB SQL so the
failing seed reproduces standalone:

    python scripts/fuzz_differential.py 1 /root/testdata/sf0.001 <seed>
"""

from __future__ import annotations

import pytest

from .fuzz_gen import gen_asof_plan, gen_plan, gen_txlog_plan
from .oracle_compare import assert_frames_match
from .conftest import SF_DIR

N_SEEDS = 30
N_ASOF_SEEDS = 10
N_TXLOG_SEEDS = 3


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_plan_matches_duckdb(spark, duck, seed):
    plan = gen_plan(seed)
    spark_pdf = plan.run_spark(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(plan.duck_sql()).fetchdf()
    try:
        assert_frames_match(spark_pdf, duck_pdf, f"fuzz seed {seed}")
    except AssertionError:
        print(f"plan: {plan.describe()}")
        print(f"sql:  {plan.duck_sql()}")
        raise


@pytest.mark.parametrize("seed", range(N_ASOF_SEEDS))
def test_fuzz_asof_matches_duckdb(spark, duck, seed):
    """Grammar-v4 slice (r9 VERDICT item 7): the engine's merge_asof
    vs DuckDB's native ASOF JOIN, null-bearing right value columns —
    the r9 row-tearing surface, fuzzed instead of fixed-cased.
    Reproduce standalone:
        GRAMMAR=asof python scripts/fuzz_differential.py 1 <sf_dir> <seed>
    """
    plan = gen_asof_plan(seed)
    spark_pdf = plan.run_spark(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(plan.duck_sql()).fetchdf()
    try:
        assert_frames_match(spark_pdf, duck_pdf, f"asof fuzz seed {seed}")
    except AssertionError:
        print(f"plan: {plan.describe()}")
        print(f"sql:  {plan.duck_sql()}")
        raise


@pytest.mark.parametrize("seed", range(N_TXLOG_SEEDS))
def test_fuzz_txlog_matches_model(spark, seed, tmp_path):
    """Grammar-v5 slice (r10 VERDICT item 2): random commit sequences
    over the txlog/matview/CDC layer checked against a pure-python
    model — snapshot equality, time travel, change_feed composition,
    matview == recompute with the expected refresh mode, stats-pruned
    reads.  Reproduce standalone:
        GRAMMAR=txlog python scripts/fuzz_differential.py 1 <sf_dir> <seed>
    """
    plan = gen_txlog_plan(seed)
    try:
        plan.execute(spark, str(tmp_path / f"tx{seed}"))
    except AssertionError:
        print(f"plan: {plan.describe()}")
        raise


@pytest.mark.parametrize("seed", range(2))
def test_corpus_fuzz_smoke(spark, seed, tmp_path):
    """Adversarial-corpus slice (r11): two seeds x four fixed queries
    over hostile generated documents/embeddings, Spark vs oracle on
    the SAME parquet — keeps the generator and the replay harness
    honest on every suite run.  Full sweeps:
        python scripts/corpus_fuzz.py 100 <start_seed> 20
    """
    import shutil

    import duckdb
    import pyarrow.parquet as pq

    from dask_cudf_spark.registry import ordered_specs

    from .corpus_gen import gen_documents, gen_embeddings, gen_events
    from .oracle_compare import normalize_nullable_ints

    sf = str(tmp_path / f"corpus{seed}")
    import os

    os.makedirs(sf)
    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf}/{t}.parquet")
    pq.write_table(gen_documents(seed), f"{sf}/documents.parquet")
    pq.write_table(gen_embeddings(seed), f"{sf}/embeddings.parquet")
    pq.write_table(gen_events(seed), f"{sf}/events.parquet")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    by_name = {s.name: s for s in ordered_specs()}
    # one rep per hardened class: tokenization, byte-oracle multimodal,
    # directional geometry, dedup normalization, JSON typed-parse,
    # sub-second sessionization
    for qname in (
        "q_token_filter",
        "q_multimodal_features",
        "q_cosine_sim",
        "q_exact_dedup_rows",
        "q_json_full_parse",
        "q_sessionize_gaps",
    ):
        spec = by_name[qname]
        spdf = spec.fn(spark, sf).toPandas()
        ddf = con.execute(spec.oracle).fetchdf()
        assert_frames_match(
            normalize_nullable_ints(spdf),
            normalize_nullable_ints(ddf),
            f"corpus seed {seed}/{qname}",
        )
    con.close()


@pytest.mark.parametrize("seed", [9000, 9001])
def test_relational_corpus_fuzz_smoke(spark, seed, tmp_path):
    """Relational-corpus slice (r12): the two finder seeds x one fixed
    query per hardened contract class over hostile generated
    lineitem/orders/customer (documents/events stay real), Spark vs
    oracle on the SAME parquet.  Full sweeps:
        RELATIONAL=1 python scripts/corpus_fuzz.py 100 <start_seed> 25
    """
    import os
    import shutil

    import duckdb
    import pyarrow.parquet as pq

    from dask_cudf_spark.registry import ordered_specs

    from .corpus_gen import gen_relational
    from .oracle_compare import normalize_nullable_ints

    sf = str(tmp_path / f"rel{seed}")
    os.makedirs(sf)
    for t in (
        "region nation supplier part events documents embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf}/{t}.parquet")
    for t, tbl in gen_relational(seed).items():
        pq.write_table(tbl, f"{sf}/{t}.parquet")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    by_name = {s.name: s for s in ordered_specs()}
    # one rep per r12-hardened class: cast-rounding twin, salted
    # nunique NULL fix, cogroup LEFT-join contract, percentile rank
    # contract, cumprod saturation + NULLS LAST, concat_ws sentinel,
    # collect_list null twin, sqrt/ln domain guards
    for qname in (
        "q_project_arith",
        "q_skew_salted_nunique",
        "q_cogroup_udf",
        "q_approx_quantile",
        "q_cumprod",
        "q_sample",
        "q_groupby_collect",
        "q_scalar_pack_math",
    ):
        spec = by_name[qname]
        spdf = spec.fn(spark, sf).toPandas()
        ddf = con.execute(spec.oracle).fetchdf()
        assert_frames_match(
            normalize_nullable_ints(spdf),
            normalize_nullable_ints(ddf),
            f"relational corpus seed {seed}/{qname}",
        )
