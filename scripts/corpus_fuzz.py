"""Corpus fuzz leg (round 11): replay registry text/similarity/dedup/
multimodal queries over per-seed ADVERSARIAL documents/embeddings
tables (tests/corpus_gen.py) and compare each against its committed
DuckDB oracle on the SAME parquet.

The injection legs (scripts/null_replay.py) mutate cells of the real
testdata; this leg replaces the whole text/embedding distribution with
hostile content — unicode soup, regex metacharacters, control bytes,
whitespace pathologies, planted dup/near-dup clusters, zero/duplicate
embedding vectors — closing the last fuzz-coverage asymmetry the r10
verdict named: the tokenizer/multimodal families previously had fixed
cases and single-axis injections only, no randomized-data leg.

Usage:
    python scripts/corpus_fuzz.py [N_SEEDS] [START_SEED] [Q_PER_SEED]
    RAGGED=1 python scripts/corpus_fuzz.py ...   # phase-2 ragged vectors
    RELATIONAL=1 ...                             # r12: hostile lineitem/orders/customer
    EVENTS=1 ...                                 # r11: hostile events/JSON
    DIMS=1 ...                                   # r12: hostile part/supplier
    GEO=1 ...                                    # r13: hostile nation/region
    ONLY=<substr> ...                            # name/family filter
    HOSTILE=tz|noaqe|noarrow|oddparts|nocodegen  # session-config cell

RAGGED adds empty / wrong-dim / NaN-Inf vectors; geometry queries are
NOT expected to pass it (declared ingest contract, NULLS.md) — use it
with ONLY=q_embedding_audit, the gate that is verified against it.
HOSTILE composes the driver_replay session cells onto the corpus
sweep (the fuzz-grammar x hostile-config matrix of r10).

Per seed: gen documents+embeddings parquet into a scratch dir (other
tables copied from sf0.001 — unfuzzed, some queries join them for
payload sizing), pick Q_PER_SEED eligible queries (seeded shuffle, so
coverage spreads across seeds), run Spark query vs DuckDB oracle with
the driver-replica compare.  Exit 0 = every (seed, query) matched.
Prints the one-line JSON summary the FUZZ_r*.json artifacts record.

Eligibility: oracle-backed specs whose SQL references at least one
FUZZED table.  One axis = one generator (r12): the default axis fuzzes
documents/embeddings, EVENTS=1 fuzzes events, RELATIONAL=1 fuzzes
lineitem/orders/customer — non-fuzzed tables stay real copies, so
mixed-table queries join them freely and a divergence implicates
exactly one generator.  (r11's recorded events legs predate this and
fuzzed documents alongside events.)  Set multiple env vars to compose.  EXCLUDED entries are listed with reasons — exclusions must
stay empty or documented.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from corpus_gen import (  # noqa: E402
    gen_dims,
    gen_documents,
    gen_embeddings,
    gen_events,
    gen_geo,
    gen_relational,
)
from oracle_compare import assert_frames_match, normalize_nullable_ints  # noqa: E402

BASE_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: (name -> reason) — queries whose oracles reference only the fuzzed
#: tables but are deliberately NOT corpus-fuzzed.  Keep empty unless a
#: divergence is a DOCUMENTED data-contract, not an engine bug.
EXCLUDE: dict[str, str] = {}


def eligible_specs(fuzzed: tuple[str, ...]):
    """Oracle-backed specs whose SQL references at least one FUZZED
    table.  Non-fuzzed tables stay real copies, so a query may join
    them freely; a query touching no fuzzed input would just replay
    clean data and waste the sweep's wall time."""
    from dask_cudf_spark.registry import ordered_specs

    return [
        s
        for s in ordered_specs()
        if s.oracle is not None
        and s.name not in EXCLUDE
        # word-boundary match: 'part' must not fire on 'PARTITION BY'
        and any(
            __import__("re").search(rf"\b{t}\b", s.oracle) for t in fuzzed
        )
    ]


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    per_seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    ragged = os.environ.get("RAGGED", "") == "1"
    only = os.environ.get("ONLY", "")  # substring filter (name or family)
    hostile = os.environ.get("HOSTILE", "")

    from fuzz_differential import HOSTILE_CONF

    from dask_cudf_spark.session import get_spark

    if hostile not in HOSTILE_CONF:
        raise SystemExit(f"unknown HOSTILE mode: {hostile!r}")
    conf = {"spark.sql.shuffle.partitions": "8"}
    conf.update(HOSTILE_CONF[hostile])
    spark = get_spark(app_name="corpus-fuzz", extra_conf=conf)
    if hostile:
        print(f"== HOSTILE config: {hostile} ==")
    events_mode = os.environ.get("EVENTS", "") == "1"
    # RELATIONAL=1 (r12 third axis): hostile lineitem/orders/customer
    # (dup-key storms on the FK side, negative/zero/boundary amounts,
    # epoch-edge and leap-day dates with tie storms, unicode +
    # whitespace-pathological dim attributes, per-seed skew modes up
    # to 100%-one-key) — see corpus_gen.gen_relational for the kept
    # ingest contracts (unique non-null PKs, bounded magnitudes).
    rel_mode = os.environ.get("RELATIONAL", "") == "1"
    # DIMS=1 (r12 fourth axis): hostile part/supplier attribute tables
    # — reaches the five dim-only queries and the string-pack twins
    dims_mode = os.environ.get("DIMS", "") == "1"
    # GEO=1 (r13 fifth axis, r12 VERDICT item 7): hostile nation/region
    # — the only tables never fuzzed; the TPC-H q5/q7/q8 oracles join
    # through them and filter on their names (PKs stay unique non-null
    # 0..N-1, FK customer/supplier keys keep resolving)
    geo_mode = os.environ.get("GEO", "") == "1"
    # each axis fuzzes ONLY its own tables (the others stay real
    # copies) so eligibility targets the axis's query families and
    # a divergence implicates exactly one generator; set both env
    # vars to compose axes.
    fuzzed = (
        (
            ("documents", "embeddings")
            if not (rel_mode or events_mode or dims_mode or geo_mode)
            else ()
        )
        + (("events",) if events_mode else ())
        + (("lineitem", "orders", "customer") if rel_mode else ())
        + (("part", "supplier") if dims_mode else ())
        + (("nation", "region") if geo_mode else ())
    )
    specs = eligible_specs(fuzzed)
    if only:
        specs = [s for s in specs if only in s.name or only == s.family]
    names = [s.name for s in specs]
    per_seed = min(per_seed, len(names))
    by_name = {s.name: s for s in specs}
    print(
        f"== corpus fuzz: {len(specs)} eligible queries, {n_seeds} seeds"
        f" x {per_seed} queries/seed, ragged={ragged} =="
    )

    scratch = f"/tmp/corpusfuzz-{os.getpid()}"
    failures: list[tuple[int, str, str]] = []
    ran = 0
    t0 = time.time()
    for seed in range(start, start + n_seeds):
        sf_dir = f"{scratch}/s{seed}"
        shutil.rmtree(sf_dir, ignore_errors=True)
        os.makedirs(sf_dir)
        for t in TABLES:
            if t not in fuzzed:
                shutil.copy(f"{BASE_SF}/{t}.parquet", f"{sf_dir}/{t}.parquet")
        if "documents" in fuzzed:
            docs = gen_documents(seed)
            embs = gen_embeddings(seed, ragged=ragged)
            pq.write_table(docs, f"{sf_dir}/documents.parquet")
            pq.write_table(embs, f"{sf_dir}/embeddings.parquet")
        else:
            docs = embs = None
        if events_mode:
            pq.write_table(gen_events(seed), f"{sf_dir}/events.parquet")
        if rel_mode:
            for t, tbl in gen_relational(seed).items():
                pq.write_table(tbl, f"{sf_dir}/{t}.parquet")
        if dims_mode:
            for t, tbl in gen_dims(seed).items():
                pq.write_table(tbl, f"{sf_dir}/{t}.parquet")
        if geo_mode:
            for t, tbl in gen_geo(seed).items():
                pq.write_table(tbl, f"{sf_dir}/{t}.parquet")

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        # seeded query subset: disjoint-ish across seeds, full coverage
        # over any ~(len/per_seed)-seed stretch
        order = list(np.random.default_rng(seed * 31 + 7).permutation(names))
        picked = order[:per_seed]
        seed_fail = 0
        for qname in picked:
            spec = by_name[qname]
            ran += 1
            try:
                spdf = spec.fn(spark, sf_dir).toPandas()
                ddf = con.execute(spec.oracle).fetchdf()
                assert_frames_match(
                    normalize_nullable_ints(spdf),
                    normalize_nullable_ints(ddf),
                    f"seed {seed}/{qname}",
                )
            except Exception as e:  # noqa: BLE001 — record and continue
                failures.append((seed, qname, str(e)[:400]))
                seed_fail += 1
                print(f"  seed {seed:5d}  {qname}  FAIL: {str(e)[:200]}")
        size_note = (
            f"docs={docs.num_rows}, vecs={embs.num_rows}"
            if docs is not None
            else "generated-axis tables"
        )
        print(
            f"  seed {seed:5d}  {len(picked) - seed_fail}/{len(picked)} MATCH"
            f"  ({size_note})"
        )
        con.close()
        shutil.rmtree(sf_dir, ignore_errors=True)

    wall = time.time() - t0
    print(
        json.dumps(
            {
                "grammar": "corpus"
                + ("-ragged" if ragged else "")
                + ("-events" if events_mode else "")
                + ("-relational" if rel_mode else "")
                + ("-dims" if dims_mode else "")
                + ("-geo" if geo_mode else ""),
                "hostile": hostile,
                "seeds": n_seeds,
                "start_seed": start,
                "queries_per_seed": per_seed,
                "executions": ran,
                "matches": ran - len(failures),
                "failures": [[s, q] for s, q, _ in failures][:40],
                "eligible": len(specs),
                "wall_s": round(wall, 1),
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
