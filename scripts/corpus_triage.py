"""Repro/triage one (seed, query) divergence from scripts/corpus_fuzz.py.

    python scripts/corpus_triage.py SEED QNAME [key_col]

Regenerates the seed's corpus, runs query + oracle, prints the joined
row-level diff (on key_col, default doc_id when present) and the
offending source rows.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from corpus_gen import (  # noqa: E402
    gen_documents,
    gen_embeddings,
    gen_events,
    gen_relational,
    gen_dims,
)
from oracle_compare import canonical_rows, normalize_nullable_ints  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    seed = int(sys.argv[1])
    qname = sys.argv[2]
    ragged = os.environ.get("RAGGED", "") == "1"
    sf = f"/tmp/cfz/s{seed}" + ("r" if ragged else "")
    shutil.rmtree(sf, ignore_errors=True)
    os.makedirs(sf)
    # axis selection must MATCH corpus_fuzz.py exactly (one axis = one
    # generator; documents/embeddings are fuzzed only in the default
    # axis) or the repro reads different bytes than the failure did
    events_mode = os.environ.get("EVENTS", "") == "1"
    rel_mode = os.environ.get("RELATIONAL", "") == "1"
    dims_mode = os.environ.get("DIMS", "") == "1"
    for t in TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet"
        )
    if not (events_mode or rel_mode or dims_mode):
        pq.write_table(gen_documents(seed), f"{sf}/documents.parquet")
        pq.write_table(
            gen_embeddings(seed, ragged=ragged), f"{sf}/embeddings.parquet"
        )
    if events_mode:
        pq.write_table(gen_events(seed), f"{sf}/events.parquet")
    if rel_mode:
        for t, tbl in gen_relational(seed).items():
            pq.write_table(tbl, f"{sf}/{t}.parquet")
    if dims_mode:
        for t, tbl in gen_dims(seed).items():
            pq.write_table(tbl, f"{sf}/{t}.parquet")

    from dask_cudf_spark.registry import ordered_specs
    from dask_cudf_spark.session import get_spark

    spark = get_spark(
        app_name="corpus-triage",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spec = {s.name: s for s in ordered_specs()}[qname]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    sp = normalize_nullable_ints(spec.fn(spark, sf).toPandas())
    dk = normalize_nullable_ints(con.execute(spec.oracle).fetchdf())
    print(f"rows: spark={len(sp)} duck={len(dk)}")
    key = sys.argv[3] if len(sys.argv) > 3 else next(
        (k for k in ("doc_id", "event_id", "vec_id") if k in sp.columns), None
    )
    if key and len(sp) and key in dk.columns:
        m = pd.merge(sp, dk, on=key, suffixes=("_s", "_d"), how="outer",
                     indicator=True)
        scols = [c for c in m.columns if c.endswith("_s")]
        bad = m[
            (m["_merge"] != "both")
            | (
                m[scols].astype(str).values
                != m[[c[:-2] + "_d" for c in scols]].astype(str).values
            ).any(axis=1)
        ]
        print(bad.head(12).to_string())
        if key == "doc_id":
            docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
            for i in bad[key].dropna().head(6):
                row = docs[docs.doc_id == i]
                if len(row):
                    print(i, repr(row[["text", "lang", "source"]].iloc[0].to_dict())[:400])
        elif key == "event_id":
            ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
            for i in bad[key].dropna().head(8):
                row = ev[ev.event_id == i]
                if len(row):
                    print(i, repr(row[["event_type", "props"]].iloc[0].to_dict())[:300])
    else:
        s_rows, d_rows = canonical_rows(sp), canonical_rows(dk)
        only_s = [r for r in s_rows if r not in d_rows][:8]
        only_d = [r for r in d_rows if r not in s_rows][:8]
        print("spark-only:", *only_s, sep="\n  ")
        print("duck-only:", *only_d, sep="\n  ")


if __name__ == "__main__":
    main()
