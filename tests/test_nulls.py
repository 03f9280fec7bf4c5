"""Null-injection regression guard (round 9).

The full leg lives in scripts/null_replay.py (3% or 30% nulls into
every nullable non-key column of sf0.01, full-registry replay —
NULLS.md records the findings at both densities).  This test pins the
invariant for the queries that DIVERGED in the sweeps: they replay
against a 30%-injected sf0.001 copy on every suite run (the
high-density mask, which also produces the all-null groups/frames the
3% mask cannot), so a refactor that reintroduces a null-unsafe join,
a torn asof pick, an unpinned null sort order, or a crash-on-None
kernel fails here instead of waiting for the next manual leg.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dask_cudf_spark.registry import REGISTRY, _ensure_loaded

from .conftest import SF_DIR
from .oracle_compare import assert_frames_match

_ensure_loaded()

# Every query that diverged (crash, silent row loss, row tearing, or
# cross-engine null idiom) in the round-9 sf0.01 sweep before its fix
# — see NULLS.md for the per-query classification.
NULL_SENSITIVE = [
    "q_ann_ivf",
    "q_ann_pq",
    "q_ann_recall",
    "q_cogroup_udf",
    "q_cosine_sim",
    "q_cumprod",
    "q_dedup_keep_best",
    "q_drop_dup_keep_first",
    "q_event_paths",
    "q_ewm",
    "q_factorize",
    "q_gini_coefficient",
    "q_jaccard",
    "q_join_asof",
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_join_asof_tolerance",
    "q_kafka_roundtrip",
    "q_kmeans_step",
    "q_lorenz_deciles",
    "q_melt_unpivot",
    "q_mode_bool_agg",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_multimodal_jpeg",
    "q_multimodal_png",
    "q_multimodal_resample",
    "q_multimodal_wav",
    "q_ngrams",
    "q_null_audit",  # the audit op itself must count injected nulls
    "q_python_udtf",
    "q_qcut",
    "q_rank_global",
    "q_rank_methods",
    "q_rolling_fingerprint",
    "q_scalar_pack_str",
    "q_semdedup",
    "q_split_leakage",
    "q_stem_tokens",
    "q_subword_tokens",
    "q_txlog_change_feed",
    "q_window_ntile",
]

NULL_FRACTION = 0.3  # the HIGH-DENSITY leg: all-null groups/frames
# (30% caught four gaps the 3% mask missed — NULLS.md); both
# densities are certified 242/242 at sf0.01 via scripts/null_replay.py
INJECT = {
    "customer": ["c_name", "c_acctbal", "c_mktsegment"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["embedding", "label"],
    "events": ["event_type", "value", "props"],
    "lineitem": [
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ],
    "orders": [
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "supplier": ["s_name", "s_acctbal"],
}
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _mask(table: str, col: str, n: int) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.md5(f"nulls|{table}|{col}".encode()).digest()[:4], "big"
    )
    return np.random.default_rng(seed).random(n) < NULL_FRACTION


@pytest.fixture(scope="session")
def nulls_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("nulls_sf"))
    for t in TABLES:
        tab = pq.read_table(f"{SF_DIR}/{t}.parquet")
        cols = INJECT.get(t, [])
        if cols:
            n = tab.num_rows
            arrays, names = [], []
            for field in tab.schema:
                arr = tab.column(field.name)
                if field.name in cols:
                    keep = pa.array(~_mask(t, field.name, n))
                    arr = pa.compute.if_else(
                        keep, arr.combine_chunks(), pa.nulls(n, field.type)
                    )
                arrays.append(arr)
                names.append(field.name)
            tab = pa.table(dict(zip(names, arrays)))
        pq.write_table(tab, f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="session")
def null_duck(nulls_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nulls_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize_nullable_ints(pdf):
    """See scripts/null_replay.py: nullable BIGINT round-trips through
    pandas as float64 on either side; normalize integral float columns
    to Int64 symmetrically before the strict compare.  Only columns
    that actually CONTAIN nulls — the artifact needs a null, and
    normalizing never-null float64 columns would mask a genuine
    double-vs-bigint schema divergence (round-10 ADVICE fix)."""
    for c in pdf.columns:
        if str(pdf[c].dtype) == "float64" and pdf[c].isna().any():
            nonnull = pdf[c].dropna()
            if (
                len(nonnull)
                and (nonnull % 1 == 0).all()
                and nonnull.abs().max() < 2**62
            ):
                pdf[c] = pdf[c].astype("Int64")
    return pdf


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_null_injected_oracle_match(spark, null_duck, nulls_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, nulls_dir).toPandas()
    duck_pdf = null_duck.execute(spec.oracle).fetchdf()
    assert_frames_match(
        _normalize_nullable_ints(spark_pdf),
        _normalize_nullable_ints(duck_pdf),
        name,
    )
