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

from .fuzz_gen import gen_plan
from .oracle_compare import assert_frames_match
from .conftest import SF_DIR

N_SEEDS = 30


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
