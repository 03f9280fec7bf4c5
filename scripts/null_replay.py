"""Null-injection robustness leg (round 9, r7 VERDICT item 5):
deterministically NULL ~3% of every nullable NON-KEY column in a copy
of a testdata scale dir, then replay the full oracle registry —
Spark and DuckDB both run on the SAME injected parquet, so any
mismatch is a real engine-vs-engine null-semantics divergence, not a
data artifact.

Key columns (join/group identities: *_key, *_id) are NOT injected —
null join keys are a separate, deliberate semantics choice (SQL inner
joins drop them; that is not a robustness gap).  Injection is
deterministic: each (table, column) gets an md5-seeded mask, so the
replay is reproducible bit-for-bit.

Usage:
    python scripts/null_replay.py [src_sf_dir] [out_dir] [name ...]

Writes the injected copy, replays every registry oracle on it, and
prints the per-query table (same format as driver_replay).  Exit 0
only on 240/240 MATCH: every cross-engine null idiom the first sweep
surfaced is now pinned explicitly on both sides (NULLS.md records the
catalog), so any new divergence is a regression, not noise.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nulls_sf0.01"
ONLY = sys.argv[3:]

# 0.03 is the standard leg; NULL_FRACTION=0.3 (env) runs the
# high-density variant whose point is ALL-NULL groups, frames, and
# windows — shapes a 3% mask cannot produce at sf0.01 group sizes;
# NULL_FRACTION=1.0 is the degenerate endpoint (every nullable
# non-key column fully null — empty-input conventions)
NULL_FRACTION = float(os.environ.get("NULL_FRACTION", "0.03"))

# INJECT_MODE=zero (r10): instead of NULLing, set masked NUMERIC cells
# to 0 — the divisor/log/sqrt domain probe.  A 0.0 that lands in a
# denominator crashes Spark under ANSI sessions (the driver's plain
# session) with DIVIDE_BY_ZERO while DuckDB yields NULL — the exact
# class the 100%-null leg caught in q_abtest_ztest, now probed where
# the zero arrives through VALUES, not emptiness.  String/timestamp
# columns are left untouched in this mode (zero has no meaning there).
#
# INJECT_MODE=empty (r10): set masked STRING cells to '' — the
# degenerate-text probe (split/regex/tokenizer/length paths) for what
# web data actually contains: empty documents, empty language tags,
# empty event types (and '' props = malformed JSON).  Numeric/
# timestamp columns untouched.  First run found 18 divergences across
# six classes (descending sequence() walks, DuckDB NULL-on-empty-join,
# tokenizer '' conventions, malformed-JSON leniency, empty-payload
# decoder stats, the Kafka '' NULL-sentinel conflation) — NULLS.md.
# INJECT_MODE=mixed (r11, r10 VERDICT item 4): the single-axis legs
# above each mutate ONE failure mode; real corrupt data composes them.
# Per cell, an independent uniform draw picks null (< f), the
# type-appropriate degenerate value — 0 for numerics, '' for strings —
# (f..2f), or valid (rest), so one TABLE simultaneously carries nulls,
# zeros, and empty strings through every query.  This is where
# guard-ORDERING bugs show (a zero-guard evaluated before a null-guard
# passes each single-axis leg and fails here).  Seeded separately from
# the single legs so the masks are not correlated.
INJECT_MODE = os.environ.get("INJECT_MODE", "null")
if INJECT_MODE not in ("null", "zero", "empty", "mixed"):
    raise SystemExit(f"unknown INJECT_MODE: {INJECT_MODE!r}")

#: nullable non-key columns per table.  region/nation are excluded
#: entirely: their name columns serve as group keys for most TPC-H
#: shapes and the tables are 5/25 rows — a 3% mask rounds to ~0 rows.
INJECT: dict[str, list[str]] = {
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


def _uniform(table: str, col: str, n: int) -> np.ndarray:
    """Per-cell uniform draw for the mixed leg (own seed namespace)."""
    seed = int.from_bytes(
        hashlib.md5(f"mixed|{table}|{col}".encode()).digest()[:4], "big"
    )
    return np.random.default_rng(seed).random(n)


def inject(src: str, out: str) -> dict[str, int]:
    os.makedirs(out, exist_ok=True)
    injected: dict[str, int] = {}
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        cols = INJECT.get(t, [])
        if cols:
            n = tab.num_rows
            arrays, names = [], []
            total = 0
            for field in tab.schema:
                arr = tab.column(field.name)
                is_num = pa.types.is_floating(field.type) or pa.types.is_integer(
                    field.type
                )
                is_str = pa.types.is_string(field.type) or pa.types.is_large_string(
                    field.type
                )
                if INJECT_MODE == "null" or INJECT_MODE == "mixed":
                    inject_this = field.name in cols
                elif INJECT_MODE == "zero":
                    inject_this = field.name in cols and is_num
                else:  # empty
                    inject_this = field.name in cols and is_str
                if inject_this and INJECT_MODE == "mixed":
                    # null at < f, the type-appropriate degenerate value
                    # at f..2f, valid elsewhere — all three failure modes
                    # live in the same column at once
                    u = _uniform(t, field.name, n)
                    null_m = u < NULL_FRACTION
                    alt_m = (u >= NULL_FRACTION) & (u < 2 * NULL_FRACTION)
                    arr = pa.compute.if_else(
                        pa.array(~null_m),
                        arr.combine_chunks(),
                        pa.nulls(n, field.type),
                    )
                    total += int(null_m.sum())
                    if is_num:
                        fill = pa.array(np.zeros(n), type=field.type, from_pandas=True)
                    elif is_str:
                        fill = pa.array([""] * n, type=field.type)
                    else:
                        fill = None  # timestamps etc.: null is the only mode
                    if fill is not None:
                        arr = pa.compute.if_else(pa.array(~alt_m), arr, fill)
                        total += int(alt_m.sum())
                elif inject_this:
                    m = _mask(t, field.name, n)
                    total += int(m.sum())
                    keep = pa.array(~m)  # True where the value survives
                    if INJECT_MODE == "null":
                        fill = pa.nulls(n, field.type)
                    elif INJECT_MODE == "zero":
                        fill = pa.array(
                            np.zeros(n), type=field.type, from_pandas=True
                        )
                    else:
                        fill = pa.array([""] * n, type=field.type)
                    arr = pa.compute.if_else(
                        keep, arr.combine_chunks(), fill
                    )
                arrays.append(arr)
                names.append(field.name)
            tab = pa.table(dict(zip(names, arrays)))
            injected[t] = total
        pq.write_table(tab, f"{out}/{t}.parquet")
    return injected


def main() -> None:
    counts = inject(SRC, OUT)
    print(
        f"== injected copy at {OUT} (fraction={NULL_FRACTION}, "
        f"mode={INJECT_MODE}) =="
    )
    for t, n in sorted(counts.items()):
        print(f"  {t:12s} {n} nulled cells")

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("null-replay")
        .getOrCreate()
    )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if ONLY:
        qs = {n: f for n, f in qs.items() if any(s in n for s in ONLY)}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{OUT}/{t}.parquet')"
        )
    sys.path.insert(0, "/root/repo/tests")
    from oracle_compare import assert_frames_match
    from oracle_compare import normalize_nullable_ints as _normalize_nullable_ints

    results: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            spdf = fn(spark, OUT).toPandas()
            if name in oracles:
                ddf = con.execute(oracles[name]).fetchdf()
                assert_frames_match(
                    _normalize_nullable_ints(spdf),
                    _normalize_nullable_ints(ddf),
                    name,
                )
                status = f"MATCH ({len(spdf)} rows)"
            else:
                status = f"rows-only ({len(spdf)} rows)"
        except Exception as e:  # noqa: BLE001 — replay records, not raises
            status = f"DIVERGE: {type(e).__name__}: {str(e)[:160]}"
        results[name] = status
        print(f"  {name:28s} {status}  [{time.time()-t0:.1f}s]")

    diverged = {n: s for n, s in results.items() if s.startswith("DIVERGE")}
    print(f"\n== {len(results)} replayed, {len(diverged)} diverged ==")
    for n, s in sorted(diverged.items()):
        print(f"  {n}: {s}")
    sys.exit(1 if diverged else 0)


if __name__ == "__main__":
    main()
