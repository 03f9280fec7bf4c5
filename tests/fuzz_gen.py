"""Differential plan fuzzer: seeded random relational plans executed
BOTH as a PySpark DataFrame composition and as DuckDB SQL, compared
with the same order-insensitive exact-value rule as the driver's
oracle gate (tests/oracle_compare.py).

This extends the 237-query fixed-oracle methodology (SURVEY.md §5) to
an unbounded plan space, the way SQLancer/NoREC fuzz real engines:
every seed deterministically derives one plan over the TPC-H-ish test
tables — scan -> [filter] -> [join] -> project / groupBy.agg ->
[having] — emitted from ONE AST into two dialects, so any mismatch is
an engine-semantics divergence, not a test bug.

Determinism discipline (same rules as det.py / the registry oracles):

- SUM/AVG only over integer expressions (associative & exact; float
  accumulation order would differ by partitioning).  DuckDB's HUGEINT
  sums are cast back to BIGINT so pandas keeps them exact.
- MIN/MAX allowed on any type (order-free).
- Per-row double arithmetic is allowed (one IEEE evaluation per row on
  identical operands is bit-identical in both engines); ROUND is not
  (half-up vs banker's divergence between engines).
- double->int casts are expressed as CAST(FLOOR(x) AS BIGINT) (Spark
  CAST truncates where DuckDB rounds — the one cast rule the two
  engines genuinely disagree on, so the fuzzer must not emit it raw).
- Every output column carries an explicit top-level CAST so the two
  pandas frames land on identical dtypes (Spark year() is INT where
  DuckDB's is BIGINT, etc.).
- No LIMIT / ORDER BY (results compared as sorted multisets).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Expression fragments: (spark SQL text, duckdb SQL text, kind)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ex:
    s: str  # Spark fragment (fed to F.expr)
    d: str  # DuckDB fragment
    kind: str  # int | double | str | ts | bool


def _same(sql: str, kind: str) -> Ex:
    return Ex(sql, sql, kind)


# base columns per table (all present in /root/testdata/sf*/ parquet)
_LINEITEM = {
    "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "double": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "str": ["l_returnflag", "l_linestatus"],
    "ts": ["l_shipdate"],
}
_ORDERS = {
    "int": ["o_orderkey", "o_custkey"],
    "double": ["o_totalprice"],
    "str": ["o_orderstatus", "o_orderpriority"],
    "ts": ["o_orderdate"],
}
_EVENTS = {
    "int": ["event_id", "user_id"],
    "double": ["value"],
    "str": ["event_type"],
    "ts": ["ts"],
}


#: Per-table ORDER BY key list under which row_number / lag / running
#: frames are MULTISET-deterministic.  o_orderkey / event_id are
#: verified unique in the testdata (all SFs).  The synthetic lineitem
#: has NO unique key — not even (l_orderkey, l_linenumber); fuzz seed
#: 101 caught row_number diverging on the duplicates — so lineitem
#: relations order by EVERY column: ties are then fully-identical rows,
#: and swapping identical rows between consecutive ranks cannot change
#: the output multiset (any projection of them is identical too).  For
#: joined relations the order-side row is a pure function of the
#: already-included join key, so listing both sides keeps the property.
_LI_ALL = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]
_UNIQUE_ORDER = {
    "lineitem": _LI_ALL,
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "join": _LI_ALL,
    "leftjoin": ["o_orderkey"] + _LI_ALL,
    "fullouter": ["o_orderkey"] + _LI_ALL,
}


def _env(table: str) -> dict[str, list]:
    cols: dict[str, list] = {"int": [], "double": [], "str": [], "ts": []}
    srcs = {
        "lineitem": [_LINEITEM],
        "orders": [_ORDERS],
        "events": [_EVENTS],
        "join": [_LINEITEM, _ORDERS],
        # LEFT JOIN: orders is the preserved side, lineitem columns are
        # null-extended for orders whose (pre-filtered) lineitems all
        # drop out — every downstream expression sees genuine nulls
        "leftjoin": [_LINEITEM, _ORDERS],
        # FULL OUTER: both sides null-extend (filtered lineitem misses
        # orders AND keeps orphaned lineitems of filtered-out orders)
        "fullouter": [_LINEITEM, _ORDERS],
    }[table]
    for src in srcs:
        for kind, names in src.items():
            cols[kind].extend(_same(n, kind) for n in names)
    if table == "events":
        # JSON path extraction — the one base expression whose NAME
        # differs between the engines (semantics identical: string out,
        # NULL on missing path)
        cols["int"].append(
            Ex(
                "CAST(get_json_object(props, '$.k') AS BIGINT)",
                "CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS BIGINT)",
                "int",
            )
        )
    # per-table timestamp constant pool so range predicates stay
    # selective-but-not-empty (events live in 2024, TPC-H in the 90s)
    cols["ts_consts"] = (
        [
            "2024-01-08 00:00:00",
            "2024-01-15 12:00:00",
            "2024-01-22 00:00:00",
            "2024-01-29 06:30:00",
        ]
        if table == "events"
        else list(_TS_CONSTS)
    )
    # identical on both sides; explicit NULLS FIRST on EVERY key because
    # the engines' ASC defaults differ (Spark NULLS FIRST, DuckDB NULLS
    # LAST) and outer-join plans genuinely produce null key components
    cols["unique_order"] = ", ".join(
        f"{k} ASC NULLS FIRST" for k in _UNIQUE_ORDER[table]
    )
    return cols


# ---------------------------------------------------------------------------
# Random expression generators (all closed over rng + env)
# ---------------------------------------------------------------------------


def _ts_expr(rng: random.Random, env) -> Ex:
    """Timestamp-valued expression.  DuckDB date_trunc returns DATE for
    day-or-coarser granularity where Spark keeps TIMESTAMP, so both
    sides carry an explicit TIMESTAMP cast (also the verify-skill rule:
    never emit DATE-typed output columns)."""
    base = rng.choice(env["ts"])
    if rng.random() < 0.45:
        return base
    g = rng.choice(["year", "quarter", "month", "day"])
    return Ex(
        f"CAST(date_trunc('{g}', {base.s}) AS TIMESTAMP)",
        f"CAST(date_trunc('{g}', {base.d}) AS TIMESTAMP)",
        "ts",
    )


def _int_expr(rng: random.Random, env, depth: int = 0) -> Ex:
    base = rng.choice(env["int"])
    if depth >= 2:
        return base
    roll = rng.random()
    if roll < 0.18:
        return base
    if roll < 0.26:  # r9: conditional + null-generating constructs —
        # CASE / NULLIF / COALESCE are exact on integers and share one
        # SQL surface in both dialects; NULLIF manufactures nulls deep
        # inside expressions so downstream aggregates/joins/windows get
        # fuzzed against three-valued logic even on clean tables
        a = _int_expr(rng, env, depth + 1)
        b = _int_expr(rng, env, depth + 1)
        if rng.random() < 0.5:
            p = _pred(rng, env, depth=2)
            return Ex(
                f"(CASE WHEN {p.s} THEN {a.s} ELSE {b.s} END)",
                f"(CASE WHEN {p.d} THEN {a.d} ELSE {b.d} END)",
                "int",
            )
        k = rng.choice([0, 1, 2])
        return Ex(
            f"COALESCE(NULLIF(({a.s} % 3), {k}), {b.s})",
            f"COALESCE(NULLIF(({a.d} % 3), {k}), {b.d})",
            "int",
        )
    if roll < 0.44:  # small modulus -> bounded group-key-able value
        k = rng.choice([3, 5, 7, 11, 13])
        a = _int_expr(rng, env, depth + 1)
        return Ex(f"({a.s} % {k})", f"({a.d} % {k})", "int")
    if roll < 0.56:
        a = _int_expr(rng, env, depth + 1)
        b = _int_expr(rng, env, depth + 1)
        return Ex(f"({a.s} + {b.s})", f"({a.d} + {b.d})", "int")
    if roll < 0.66:
        a = _int_expr(rng, env, depth + 1)
        k = rng.randint(2, 9)
        return Ex(f"({a.s} * {k})", f"({a.d} * {k})", "int")
    if roll < 0.74:  # the SAFE double->int bridge (see module docstring)
        dc = rng.choice(env["double"])
        return Ex(
            f"CAST(FLOOR({dc.s}) AS BIGINT)",
            f"CAST(FLOOR({dc.d}) AS BIGINT)",
            "int",
        )
    if roll < 0.80:  # abs / greatest / least (null-skipping in BOTH)
        a = _int_expr(rng, env, depth + 1)
        b = _int_expr(rng, env, depth + 1)
        f = rng.choice(["greatest", "least"])
        if rng.random() < 0.4:
            return Ex(f"abs({a.s} - {b.s})", f"abs({a.d} - {b.d})", "int")
        return Ex(f"{f}({a.s}, {b.s})", f"{f}({a.d}, {b.d})", "int")
    if roll < 0.86:  # string introspection: length / instr
        sc = _str_expr(rng, env, 1)
        if rng.random() < 0.5:
            return Ex(f"length({sc.s})", f"length({sc.d})", "int")
        ch = rng.choice(["A", "O", "1", "e"])
        return Ex(f"instr({sc.s}, '{ch}')", f"instr({sc.d}, '{ch}')", "int")
    if roll < 0.92:  # day difference: Spark datediff(end, start) ==
        # DuckDB datediff('day', start, end); may be negative — exact int
        a = _ts_expr(rng, env)
        c = rng.choice(env["ts_consts"])
        return Ex(
            f"datediff({a.s}, TIMESTAMP '{c}')",
            f"datediff('day', TIMESTAMP '{c}', {a.d})",
            "int",
        )
    # date part extraction
    ts = rng.choice(env["ts"])
    part = rng.choice(["year", "month", "day", "quarter"])
    return Ex(f"{part}({ts.s})", f"{part}({ts.d})", "int")


def _double_expr(rng: random.Random, env, depth: int = 0) -> Ex:
    base = rng.choice(env["double"])
    if depth >= 2 or rng.random() < 0.45:
        return base
    roll = rng.random()
    if roll < 0.40:
        a = _double_expr(rng, env, depth + 1)
        b = _double_expr(rng, env, depth + 1)
        return Ex(f"({a.s} + {b.s})", f"({a.d} + {b.d})", "double")
    if roll < 0.75:
        a = _double_expr(rng, env, depth + 1)
        b = _double_expr(rng, env, depth + 1)
        return Ex(f"({a.s} * {b.s})", f"({a.d} * {b.d})", "double")
    # int / nonzero-int-const -> double in BOTH engines (duck `/` is
    # float division; integer division there is `//`)
    a = _int_expr(rng, env, depth + 1)
    k = rng.randint(2, 9)
    return Ex(
        f"(CAST({a.s} AS DOUBLE) / {k})",
        f"(CAST({a.d} AS DOUBLE) / {k})",
        "double",
    )


def _str_expr(rng: random.Random, env, depth: int = 0) -> Ex:
    base = rng.choice(env["str"])
    if depth >= 1 or rng.random() < 0.5:
        return base
    roll = rng.random()
    if roll < 0.22:
        f = rng.choice(["upper", "lower", "reverse"])
        return Ex(f"{f}({base.s})", f"{f}({base.d})", "str")
    if roll < 0.42:
        k = rng.randint(1, 3)
        return Ex(
            f"substring({base.s}, 1, {k})",
            f"substring({base.d}, 1, {k})",
            "str",
        )
    if roll < 0.56:  # 3-arg pad (DuckDB's lpad/rpad REQUIRE the pad char)
        k = rng.randint(3, 8)
        f = rng.choice(["lpad", "rpad"])
        return Ex(
            f"{f}({base.s}, {k}, '*')", f"{f}({base.d}, {k}, '*')", "str"
        )
    if roll < 0.68:
        k = rng.randint(1, 3)
        f = rng.choice(["left", "right"])
        return Ex(f"{f}({base.s}, {k})", f"{f}({base.d}, {k})", "str")
    if roll < 0.80:
        src = rng.choice(["A", "O", "E", "-"])
        return Ex(
            f"replace({base.s}, '{src}', '#')",
            f"replace({base.d}, '{src}', '#')",
            "str",
        )
    other = rng.choice(env["str"])
    # Spark concat() is NULL-propagating; DuckDB concat() SKIPS null
    # args — DuckDB's || operator is the null-propagating equivalent
    return Ex(
        f"concat({base.s}, '_', {other.s})",
        f"({base.d} || '_' || {other.d})",
        "str",
    )


# value pools grounded in the generators' actual ranges so predicates
# are selective-but-not-empty at any SF
_STR_CONSTS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "event_type": ["click", "error", "purchase", "signup", "view"],
}
_TS_CONSTS = [
    "1993-06-30 00:00:00",
    "1994-01-01 00:00:00",
    "1995-06-17 00:00:00",
    "1996-12-31 00:00:00",
    "1997-03-15 00:00:00",
]


def _pred(rng: random.Random, env, depth: int = 0) -> Ex:
    roll = rng.random()
    if depth < 2 and roll < 0.25:
        a = _pred(rng, env, depth + 1)
        b = _pred(rng, env, depth + 1)
        op = rng.choice(["AND", "OR"])
        return Ex(f"({a.s} {op} {b.s})", f"({a.d} {op} {b.d})", "bool")
    if depth < 2 and roll < 0.32:
        a = _pred(rng, env, depth + 1)
        return Ex(f"(NOT {a.s})", f"(NOT {a.d})", "bool")
    leaf = rng.random()
    if leaf < 0.22:  # numeric comparison on an int expression
        a = _int_expr(rng, env, 1)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        k = rng.randint(0, 12)
        return Ex(f"({a.s} {op} {k})", f"({a.d} {op} {k})", "bool")
    if leaf < 0.30:  # r9: BETWEEN / int IN-list (same surface in both)
        a = _int_expr(rng, env, 1)
        if rng.random() < 0.5:
            lo = rng.randint(0, 6)
            hi = lo + rng.randint(0, 8)
            return Ex(
                f"({a.s} BETWEEN {lo} AND {hi})",
                f"({a.d} BETWEEN {lo} AND {hi})",
                "bool",
            )
        vals = sorted(rng.sample(range(0, 13), k=rng.randint(1, 4)))
        lst = ", ".join(str(v) for v in vals)
        return Ex(f"({a.s} IN ({lst}))", f"({a.d} IN ({lst}))", "bool")
    if leaf < 0.50:  # double comparison against a grid constant
        dc = rng.choice(env["double"])
        op = rng.choice(["<", ">", "<=", ">="])
        c = {
            "l_quantity": rng.choice([10.0, 25.0, 40.0]),
            "l_extendedprice": rng.choice([5000.0, 20000.0, 50000.0]),
            "l_discount": rng.choice([0.02, 0.05, 0.08]),
            "l_tax": rng.choice([0.02, 0.04, 0.06]),
            "o_totalprice": rng.choice([50000.0, 150000.0, 300000.0]),
            "value": rng.choice([50.0, 150.0, 250.0]),
        }[dc.s]
        return Ex(f"({dc.s} {op} {c})", f"({dc.d} {op} {c})", "bool")
    if leaf < 0.68:  # string equality / IN / LIKE
        sc = rng.choice([c for c in env["str"] if c.s in _STR_CONSTS])
        pool = _STR_CONSTS[sc.s]
        sub = rng.random()
        if sub < 0.4:
            v = rng.choice(pool)
            op = rng.choice(["=", "<>"])
            return Ex(f"({sc.s} {op} '{v}')", f"({sc.d} {op} '{v}')", "bool")
        if sub < 0.7:
            vals = rng.sample(pool, k=min(len(pool), rng.randint(1, 3)))
            lst = ", ".join(f"'{v}'" for v in sorted(vals))
            return Ex(f"({sc.s} IN ({lst}))", f"({sc.d} IN ({lst}))", "bool")
        v = rng.choice(pool)[0]
        return Ex(f"({sc.s} LIKE '{v}%')", f"({sc.d} LIKE '{v}%')", "bool")
    if leaf < 0.85:  # timestamp range
        ts = rng.choice(env["ts"])
        op = rng.choice(["<", ">=", ">"])
        c = rng.choice(env["ts_consts"])
        return Ex(
            f"({ts.s} {op} TIMESTAMP '{c}')",
            f"({ts.d} {op} TIMESTAMP '{c}')",
            "bool",
        )
    # NULL-injection probe: NULLIF creates nulls, IS [NOT] NULL tests
    # three-valued logic end to end
    dc = rng.choice(env["double"])
    v = {
        "l_quantity": 26.0,
        "l_extendedprice": 10000.0,
        "l_discount": 0.05,
        "l_tax": 0.04,
        "o_totalprice": 100000.0,
        "value": 100.0,
    }[dc.s]
    neg = rng.choice(["", "NOT "])
    return Ex(
        f"(NULLIF({dc.s}, {v}) IS {neg}NULL)",
        f"(NULLIF({dc.d}, {v}) IS {neg}NULL)",
        "bool",
    )


def _group_key(rng: random.Random, env) -> Ex:
    roll = rng.random()
    if roll < 0.40:
        return _str_expr(rng, env)
    if roll < 0.58:  # bounded int key
        a = _int_expr(rng, env, 1)
        k = rng.choice([3, 5, 7])
        return Ex(f"({a.s} % {k})", f"({a.d} % {k})", "int")
    if roll < 0.65:  # r9: NULL-GENERATING bounded key — a genuine null
        # group must flow through groupBy/ROLLUP/CUBE identically in
        # both engines (the classic grouping-sets ambiguity surface:
        # subtotal rows also carry NULL keys; the multiset compare must
        # still agree exactly)
        a = _int_expr(rng, env, 1)
        k = rng.choice([3, 5, 7])
        z = rng.randint(0, k - 1)
        return Ex(
            f"NULLIF(({a.s} % {k}), {z})",
            f"NULLIF(({a.d} % {k}), {z})",
            "int",
        )
    if roll < 0.78:
        ts = rng.choice(env["ts"])
        part = rng.choice(["year", "quarter", "month"])
        return Ex(f"{part}({ts.s})", f"{part}({ts.d})", "int")
    if roll < 0.88:  # calendar-bucket key, timestamp-typed
        ts = rng.choice(env["ts"])
        g = rng.choice(["year", "quarter", "month"])
        return Ex(
            f"CAST(date_trunc('{g}', {ts.s}) AS TIMESTAMP)",
            f"CAST(date_trunc('{g}', {ts.d}) AS TIMESTAMP)",
            "ts",
        )
    p = _pred(rng, env, 1)  # CASE bucket
    return Ex(
        f"(CASE WHEN {p.s} THEN 'hi' ELSE 'lo' END)",
        f"(CASE WHEN {p.d} THEN 'hi' ELSE 'lo' END)",
        "str",
    )


def _agg(rng: random.Random, env) -> Ex:
    roll = rng.random()
    if roll < 0.12:
        return _same("count(*)", "int")
    if roll < 0.24:
        e = _int_expr(rng, env, 1)
        return Ex(f"count({e.s})", f"count({e.d})", "int")
    if roll < 0.44:  # exact integer sum; duck HUGEINT -> BIGINT
        e = _int_expr(rng, env, 1)
        return Ex(f"sum({e.s})", f"CAST(sum({e.d}) AS BIGINT)", "int")
    if roll < 0.58:
        e = _int_expr(rng, env, 1)
        f = rng.choice(["min", "max"])
        return Ex(f"{f}({e.s})", f"{f}({e.d})", "int")
    if roll < 0.72:  # min/max are order-free: doubles allowed here
        dc = rng.choice(env["double"])
        f = rng.choice(["min", "max"])
        return Ex(f"{f}({dc.s})", f"{f}({dc.d})", "double")
    if roll < 0.78:
        sc = _str_expr(rng, env)
        f = rng.choice(["min", "max"])
        return Ex(f"{f}({sc.s})", f"{f}({sc.d})", "str")
    if roll < 0.86:  # order-free timestamp extrema
        te = _ts_expr(rng, env)
        f = rng.choice(["min", "max"])
        return Ex(f"{f}({te.s})", f"{f}({te.d})", "ts")
    if roll < 0.92:
        e = rng.choice([_str_expr(rng, env), _int_expr(rng, env, 1)])
        return Ex(
            f"count(DISTINCT {e.s})", f"count(DISTINCT {e.d})", "int"
        )
    # exact integer mean: one division of exact operands
    e = _int_expr(rng, env, 1)
    return Ex(
        f"(CAST(sum({e.s}) AS DOUBLE) / count({e.s}))",
        f"(CAST(CAST(sum({e.d}) AS BIGINT) AS DOUBLE) / count({e.d}))",
        "double",
    )


def _window_partition_key(rng: random.Random, env) -> Ex:
    """Partition key for window expressions.  A partition key only
    needs to induce the same equivalence classes on both sides, so the
    two dialects may differ textually.

    FOUND ENGINE BUG (fuzzer seed 351, r7): DuckDB 1.0.0's window
    PARTITION BY over a date_trunc-derived expression on an OUTER-JOIN
    relation is internally inconsistent — its own window max() disagrees
    with its own GROUP BY max() over the identical expression (NULL rows
    split across two partitions, and one month partition inherits the
    NULL partition's max).  Verified self-contained: raw-timestamp, int,
    and string partition keys are consistent; plain-table date_trunc is
    consistent; only outer-join + date_trunc triggers it.  Spark agrees
    with the GROUP BY ground truth on every variant.  Workaround: keep
    the real date_trunc partition on the SPARK side (the engine under
    test) and give DuckDB the class-equivalent integer key
    (year*K + part), which partitions identically (NULL ts -> NULL int
    -> one NULL class)."""
    k = _group_key(rng, env)
    if k.kind != "ts":
        return k
    ts = rng.choice(env["ts"])
    g = rng.choice(["year", "quarter", "month"])
    duck_int = {
        "year": f"year({ts.d})",
        "quarter": f"(year({ts.d}) * 10 + quarter({ts.d}))",
        "month": f"(year({ts.d}) * 100 + month({ts.d}))",
    }[g]
    return Ex(
        f"CAST(date_trunc('{g}', {ts.s}) AS TIMESTAMP)", duck_int, "ts"
    )


def _nullable_int(rng: random.Random, env) -> Ex:
    """Guaranteed-null-BEARING bounded int expression: NULLIF over a
    small modulus nulls one residue class, so any frame/window fed this
    value meets genuine nulls even on clean tables (grammar v4 — the
    two real r9 bugs, asof row-tearing and rank null-drop, lived
    exactly on the null-over-frame surface the older grammars never
    generated)."""
    a = _int_expr(rng, env, 1)
    k = rng.choice([3, 5, 7])
    z = rng.randint(0, k - 1)
    return Ex(
        f"NULLIF(({a.s} % {k}), {z})",
        f"NULLIF(({a.d} % {k}), {z})",
        "int",
    )


def _frame(rng: random.Random) -> str:
    """Random ROWS frame spec (identical text in both dialects).  ROWS
    frames over the unique total order are tie-proof: lineitem ties are
    fully-identical rows, so any frame sees the same value multiset
    regardless of which identical row occupies which position."""
    roll = rng.random()
    if roll < 0.30:
        return "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    if roll < 0.55:
        m = rng.randint(1, 4)
        return f"ROWS BETWEEN {m} PRECEDING AND CURRENT ROW"
    if roll < 0.80:
        m, n = rng.randint(1, 3), rng.randint(1, 3)
        return f"ROWS BETWEEN {m} PRECEDING AND {n} FOLLOWING"
    return "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"


def _window_expr(rng: random.Random, env) -> Ex:
    """Windows that are deterministic regardless of physical row order:

    - unordered frames (sum/count/min/max OVER PARTITION BY) are exact
      in any evaluation order;
    - rank()/dense_rank() are functions of each row's SORT-KEY VALUE,
      not its position among ties, so ANY order expression is safe;
    - row_number / lag / running frames ARE position-dependent, so they
      order by the table's proven-unique key list (env["unique_order"],
      explicit NULLS FIRST — the engines' ASC null defaults differ).
    ntile stays excluded: tie placement inside buckets is physical.

    Grammar v4 (r9 VERDICT item 7): explicit ROWS frame specs with
    null-BEARING value columns — first/last IGNORE NULLS over a frame
    (Spark `last(e, true)` == DuckDB `last_value(e IGNORE NULLS)`),
    bounded sliding-frame aggregates, and lead/lag with offset+default
    — the exact surface where the r9 asof row-tearing and rank
    null-drop bugs lived and which the older grammars never emitted."""
    k = _window_partition_key(rng, env)
    roll = rng.random()
    if roll < 0.16:
        e = _int_expr(rng, env, 1)
        return Ex(
            f"sum({e.s}) OVER (PARTITION BY {k.s})",
            f"sum({e.d}) OVER (PARTITION BY {k.d})",
            "int",
        )
    if roll < 0.28:
        return Ex(
            f"count(*) OVER (PARTITION BY {k.s})",
            f"count(*) OVER (PARTITION BY {k.d})",
            "int",
        )
    if roll < 0.40:
        dc = rng.choice(env["double"])
        f = rng.choice(["min", "max"])
        return Ex(
            f"{f}({dc.s}) OVER (PARTITION BY {k.s})",
            f"{f}({dc.d}) OVER (PARTITION BY {k.d})",
            "double",
        )
    if roll < 0.54:  # rank over an arbitrary expression (tie-safe)
        e = rng.choice([_int_expr(rng, env, 1), _str_expr(rng, env, 1)])
        f = rng.choice(["rank", "dense_rank"])
        dirn = rng.choice(["ASC NULLS FIRST", "DESC NULLS LAST"])
        return Ex(
            f"{f}() OVER (PARTITION BY {k.s} ORDER BY {e.s} {dirn})",
            f"{f}() OVER (PARTITION BY {k.d} ORDER BY {e.d} {dirn})",
            "int",
        )
    uo = env["unique_order"]
    if roll < 0.62:
        return Ex(
            f"row_number() OVER (PARTITION BY {k.s} ORDER BY {uo})",
            f"row_number() OVER (PARTITION BY {k.d} ORDER BY {uo})",
            "int",
        )
    if roll < 0.70:
        e = _int_expr(rng, env, 1)
        return Ex(
            f"lag({e.s}, 1) OVER (PARTITION BY {k.s} ORDER BY {uo})",
            f"lag({e.d}, 1) OVER (PARTITION BY {k.d} ORDER BY {uo})",
            "int",
        )
    if roll < 0.78:
        # running exact-integer sum over the unique total order
        e = _int_expr(rng, env, 1)
        frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        return Ex(
            f"sum({e.s}) OVER (PARTITION BY {k.s} ORDER BY {uo} {frame})",
            f"sum({e.d}) OVER (PARTITION BY {k.d} ORDER BY {uo} {frame})",
            "int",
        )
    if roll < 0.86:  # v4: first/last IGNORE NULLS over an explicit frame
        # — the asof-operator shape (operators/asof.py's
        # last(ignorenulls) over a running window); the null-bearing
        # operand guarantees the skip path executes
        e = _nullable_int(rng, env)
        frame = _frame(rng)
        f_s, f_d = rng.choice(
            [("last", "last_value"), ("first", "first_value")]
        )
        return Ex(
            f"{f_s}({e.s}, true) OVER "
            f"(PARTITION BY {k.s} ORDER BY {uo} {frame})",
            f"{f_d}({e.d} IGNORE NULLS) OVER "
            f"(PARTITION BY {k.d} ORDER BY {uo} {frame})",
            "int",
        )
    if roll < 0.90:  # v4: bounded sliding-frame aggregate over a
        # null-bearing int (exact: sum/min/max/count skip nulls
        # identically; integer-only so accumulation order is moot)
        e = _nullable_int(rng, env)
        frame = _frame(rng)
        f = rng.choice(["sum", "min", "max", "count"])
        return Ex(
            f"{f}({e.s}) OVER (PARTITION BY {k.s} ORDER BY {uo} {frame})",
            f"{f}({e.d}) OVER (PARTITION BY {k.d} ORDER BY {uo} {frame})",
            "int",
        )
    if roll < 0.94:  # v4.1: time-RANGE interval frame — the rolling-
        # by-time family (q_window_time_range class).  RANGE frames
        # are VALUE-based, so peer rows (equal timestamps) share one
        # frame and physical tie order is irrelevant: any aggregate
        # here is order-free by construction — no unique-order crutch
        # needed, just a raw timestamp sort key.
        ts = rng.choice(env["ts"])
        e = _nullable_int(rng, env)
        n, unit = rng.choice(
            [(1, "HOUR"), (6, "HOUR"), (1, "DAY"), (7, "DAY"),
             (30, "MINUTE")]
        )
        shape = rng.random()
        if shape < 0.45:
            frame = (
                f"RANGE BETWEEN INTERVAL {n} {unit} PRECEDING "
                "AND CURRENT ROW"
            )
        elif shape < 0.75:
            frame = (
                f"RANGE BETWEEN CURRENT ROW AND INTERVAL {n} {unit} "
                "FOLLOWING"
            )
        else:
            frame = (
                f"RANGE BETWEEN INTERVAL {n} {unit} PRECEDING "
                f"AND INTERVAL {n} {unit} FOLLOWING"
            )
        f = rng.choice(["sum", "min", "max", "count"])
        order = f"{ts.s} ASC NULLS FIRST"
        order_d = f"{ts.d} ASC NULLS FIRST"
        return Ex(
            f"{f}({e.s}) OVER (PARTITION BY {k.s} ORDER BY {order} {frame})",
            f"{f}({e.d}) OVER (PARTITION BY {k.d} ORDER BY {order_d} {frame})",
            "int",
        )
    # v4: lead/lag with offset + default over a null-bearing value —
    # default fills only OUT-OF-FRAME positions; an in-frame NULL value
    # must stay NULL (the classic lag-null conflation both engines get
    # right and a reimplementation gets wrong)
    e = _nullable_int(rng, env)
    f = rng.choice(["lag", "lead"])
    off = rng.randint(1, 3)
    dflt = rng.choice([-1, 0, 99])
    return Ex(
        f"{f}({e.s}, {off}, {dflt}) OVER "
        f"(PARTITION BY {k.s} ORDER BY {uo})",
        f"{f}({e.d}, {off}, {dflt}) OVER "
        f"(PARTITION BY {k.d} ORDER BY {uo})",
        "int",
    )


# top-level dtype pinning so both pandas frames agree bit-for-bit
_CAST = {
    "int": ("BIGINT", "BIGINT"),
    "double": ("DOUBLE", "DOUBLE"),
    "str": ("STRING", "VARCHAR"),
    "ts": ("TIMESTAMP", "TIMESTAMP"),
}


def _pin(e: Ex) -> Ex:
    cs, cd = _CAST[e.kind]
    return Ex(f"CAST({e.s} AS {cs})", f"CAST({e.d} AS {cd})", e.kind)


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------


@dataclass
class Plan:
    seed: int
    table: str  # lineitem | orders | join | leftjoin
    rpred: Ex | None  # leftjoin only: filter on lineitem BEFORE the join
    pred: Ex | None
    keys: list[Ex]  # aliased k0, k1, ...   (empty => scalar plan)
    aggs: list[Ex]  # aliased a0, a1, ...
    projs: list[Ex]  # scalar plan: aliased c0, c1, ...
    having: tuple[int, int] | None  # (agg index with kind int, threshold)
    distinct: bool = False  # scalar plan: dedup the projection
    # single-table plans only: ('semi'|'anti', filter on the OTHER
    # table) -> Spark left_semi/left_anti join == SQL [NOT] EXISTS
    # (correlated subquery).  NOT [NOT] IN: anti-join is NOT-EXISTS-
    # shaped, and the r13 grammar-x-hostile-corpus quadrant proved the
    # difference matters — NULL probe/subquery keys (absent in clean
    # testdata, mass-produced by gen_relational) make NOT IN
    # three-valued and the twins diverged on 27/600 seeds.
    subq: tuple[str, Ex] | None = None
    # aggregate plans: GROUP BY ROLLUP with a grouping_id marker column
    # (disambiguates subtotal NULLs from genuine null keys, which
    # leftjoin plans really produce).  Exercises Spark's Expand.
    rollup: bool = False
    # scalar plans: set operation between two filter branches of the
    # same table — (op, second branch predicate).  Distinct-based ops
    # treat NULLs as equal in both engines (SQL standard).
    setop: tuple[str, Ex] | None = None
    # fullouter only: pre-join filter on the ORDERS side, so BOTH sides
    # null-extend (FK integrity means unfiltered orders always match)
    opred: Ex | None = None
    # aggregate plans: GROUP BY CUBE instead of ROLLUP (same grouping_id
    # marker and empty-input twin rule)
    cube: bool = False

    def describe(self) -> str:
        bits = [f"seed={self.seed}", self.table]
        if self.subq:
            bits.append(f"{self.subq[0].upper()}-SUBQ WHERE {self.subq[1].d}")
        if self.rpred:
            bits.append(f"RIGHT-FILTER {self.rpred.d}")
        if self.opred:
            bits.append(f"LEFT-FILTER {self.opred.d}")
        if self.pred:
            bits.append(f"WHERE {self.pred.d}")
        if self.keys:
            kw = "ROLLUP " if self.rollup else ("CUBE " if self.cube else "")
            bits.append(
                f"GROUP BY {kw}" + ", ".join(k.d for k in self.keys)
            )
            bits.append("AGG " + ", ".join(a.d for a in self.aggs))
        else:
            d = "DISTINCT " if self.distinct else ""
            bits.append(f"PROJECT {d}" + ", ".join(p.d for p in self.projs))
            if self.setop:
                bits.append(f"{self.setop[0]} [branch2 WHERE {self.setop[1].d}]")
        if self.having:
            bits.append(f"HAVING a{self.having[0]} > {self.having[1]}")
        return "  ".join(bits)

    # -- Spark side: genuine DataFrame composition ------------------------
    def run_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet")
        if self.table == "events":
            df = spark.read.parquet(f"{sf_dir}/events.parquet")
        elif self.table == "lineitem":
            df = li
            if self.subq is not None:
                how, sp = self.subq
                other = od.filter(F.expr(sp.s))
                df = df.join(
                    other,
                    df.l_orderkey == other.o_orderkey,
                    "left_semi" if how == "semi" else "left_anti",
                )
        elif self.table == "orders":
            df = od
            if self.subq is not None:
                how, sp = self.subq
                other = li.filter(F.expr(sp.s))
                df = df.join(
                    other,
                    df.o_orderkey == other.l_orderkey,
                    "left_semi" if how == "semi" else "left_anti",
                )
        elif self.table == "join":
            df = li.join(od, li.l_orderkey == od.o_orderkey, "inner")
        elif self.table == "fullouter":
            # both sides pre-filtered so both genuinely null-extend
            rt = li.filter(F.expr(self.rpred.s))
            lt = od.filter(F.expr(self.opred.s))
            df = lt.join(rt, lt.o_orderkey == rt.l_orderkey, "full")
        else:  # leftjoin: orders preserved, filtered lineitem nullable
            rt = li
            if self.rpred is not None:
                rt = rt.filter(F.expr(self.rpred.s))
            df = od.join(rt, od.o_orderkey == rt.l_orderkey, "left")
        base = df  # pre-predicate relation (setop branch 2 starts here)
        if self.pred is not None:
            df = df.filter(F.expr(self.pred.s))
        if self.keys:
            if self.rollup or self.cube:
                # grouping() demands REAL columns, not aliased exprs —
                # pre-project the keys, then rollup/cube over the names
                for i, k in enumerate(self.keys):
                    df = df.withColumn(f"k{i}", F.expr(k.s))
                names = [f"k{i}" for i in range(len(self.keys))]
                gid = " + ".join(
                    f"grouping({n}) * {2 ** (len(names) - 1 - i)}"
                    for i, n in enumerate(names)
                )
                grouped = (df.rollup if self.rollup else df.cube)(*names)
                res = grouped.agg(
                    F.expr(f"CAST(({gid}) AS BIGINT)").alias("g"),
                    *[
                        F.expr(a.s).alias(f"a{i}")
                        for i, a in enumerate(self.aggs)
                    ],
                )
            else:
                res = df.groupBy(
                    *[
                        F.expr(k.s).alias(f"k{i}")
                        for i, k in enumerate(self.keys)
                    ]
                ).agg(
                    *[F.expr(a.s).alias(f"a{i}") for i, a in enumerate(self.aggs)]
                )
            if self.having is not None:
                idx, thr = self.having
                res = res.filter(F.col(f"a{idx}") > thr)
            return res
        cols = [F.expr(p.s).alias(f"c{i}") for i, p in enumerate(self.projs)]
        res = df.select(*cols)
        if self.setop is not None:
            op, p2 = self.setop
            other = base.filter(F.expr(p2.s)).select(*cols)
            res = {
                "UNION ALL": res.union,
                "INTERSECT": res.intersect,
                "INTERSECT ALL": res.intersectAll,
                "EXCEPT": res.subtract,  # EXCEPT DISTINCT semantics
                "EXCEPT ALL": res.exceptAll,
            }[op](other)
        return res.distinct() if self.distinct else res

    # -- DuckDB side -------------------------------------------------------
    def duck_sql(self) -> str:
        if self.table == "leftjoin":
            rw = f" WHERE {self.rpred.d}" if self.rpred is not None else ""
            frm = (
                "orders LEFT JOIN (SELECT * FROM lineitem" + rw + ") l "
                "ON o_orderkey = l_orderkey"
            )
        elif self.table == "fullouter":
            frm = (
                f"(SELECT * FROM orders WHERE {self.opred.d}) o "
                f"FULL JOIN (SELECT * FROM lineitem WHERE {self.rpred.d}) l "
                "ON o_orderkey = l_orderkey"
            )
        else:
            frm = {
                "lineitem": "lineitem",
                "orders": "orders",
                "events": "events",
                "join": "lineitem JOIN orders ON l_orderkey = o_orderkey",
            }[self.table]
        conj = []
        base_conj = []  # pre-predicate conjuncts (shared by setop branch 2)
        if self.pred is not None:
            conj.append(self.pred.d)
        if self.subq is not None:
            how, sp = self.subq
            if self.table == "lineitem":
                key, okey, other = "l_orderkey", "o_orderkey", "orders"
            else:
                key, okey, other = "o_orderkey", "l_orderkey", "lineitem"
            neg = "" if how == "semi" else "NOT "
            # [NOT] EXISTS, never [NOT] IN (r13 grammar-x-corpus
            # finding, seeds 30000-30599: 27 divergences, ONE class):
            # Spark's left_anti is NOT-EXISTS-shaped — a NULL probe key
            # never matches, so the row is KEPT; NOT IN over a list
            # with any NULL (or with a NULL probe) is three-valued NULL
            # and drops the row — in DuckDB 0 rows survive whenever the
            # subquery column carries one NULL.  The clean testdata has
            # no NULL keys so the trap could never fire; the hostile
            # relational corpus mass-produces them.  Same contract the
            # fk-audit oracle pinned in r12 (aggregates.py NOT EXISTS).
            sq = (
                f"{neg}EXISTS (SELECT 1 FROM {other} "
                f"WHERE ({sp.d}) AND {okey} = {key})"
            )
            conj.append(sq)
            base_conj.append(sq)
        where = f" WHERE {' AND '.join(conj)}" if conj else ""
        if self.keys:
            if self.rollup or self.cube:
                names = [f"k{i}" for i in range(len(self.keys))]
                proj = ", ".join(
                    f"{k.d} AS k{i}" for i, k in enumerate(self.keys)
                )
                gid = " + ".join(
                    f"GROUPING({n}) * {2 ** (len(names) - 1 - i)}"
                    for i, n in enumerate(names)
                )
                aggs = ", ".join(
                    f"{a.d} AS a{i}" for i, a in enumerate(self.aggs)
                )
                # FOUND DIVERGENCE (fuzzer seed 5, r7): over EMPTY
                # input, the SQL standard (and DuckDB/Postgres) emit
                # the () grand-total grouping-set row; Spark's rollup
                # (and cube) return 0 rows.  For non-empty input every
                # grouping-set row has count(*) >= 1, so HAVING
                # count(*) > 0 emulates Spark exactly and is a no-op
                # otherwise.
                gkw = "ROLLUP" if self.rollup else "CUBE"
                inner = (
                    f"SELECT {', '.join(names)}, "
                    f"CAST(({gid}) AS BIGINT) AS g, {aggs} "
                    f"FROM (SELECT *, {proj} FROM {frm}{where}) rsrc "
                    f"GROUP BY {gkw} ({', '.join(names)}) "
                    f"HAVING count(*) > 0"
                )
                if self.having is not None:
                    idx, thr = self.having
                    return f"SELECT * FROM ({inner}) h WHERE a{idx} > {thr}"
                return inner
            sel = ", ".join(
                f"{k.d} AS k{i}" for i, k in enumerate(self.keys)
            ) + ", " + ", ".join(
                f"{a.d} AS a{i}" for i, a in enumerate(self.aggs)
            )
            gb = ", ".join(str(i + 1) for i in range(len(self.keys)))
            inner = f"SELECT {sel} FROM {frm}{where} GROUP BY {gb}"
            if self.having is not None:
                idx, thr = self.having
                return f"SELECT * FROM ({inner}) h WHERE a{idx} > {thr}"
            return inner
        sel = ", ".join(f"{p.d} AS c{i}" for i, p in enumerate(self.projs))
        if self.setop is not None:
            op, p2 = self.setop
            b2 = base_conj + [p2.d]
            w2 = f" WHERE {' AND '.join(b2)}"
            combined = (
                f"(SELECT {sel} FROM {frm}{where}) {op} "
                f"(SELECT {sel} FROM {frm}{w2})"
            )
            if self.distinct:
                return f"SELECT DISTINCT * FROM ({combined}) s"
            return combined
        kw = "SELECT DISTINCT" if self.distinct else "SELECT"
        return f"{kw} {sel} FROM {frm}{where}"


def gen_plan(seed: int) -> Plan:
    """One deterministic random plan per seed."""
    rng = random.Random(seed)
    table = rng.choice(
        ["lineitem", "lineitem", "orders", "events", "join", "leftjoin",
         "fullouter"]
    )
    rpred = opred = None
    if table == "leftjoin":
        # selective filter on the lineitem side so a real fraction of
        # orders null-extend (every order has lineitems otherwise)
        rpred = _pred(rng, _env("lineitem"))
    elif table == "fullouter":
        # pre-join filters on BOTH sides so both genuinely null-extend
        rpred = _pred(rng, _env("lineitem"))
        opred = _pred(rng, _env("orders"))
    subq = None
    if table in ("lineitem", "orders") and rng.random() < 0.3:
        other = "orders" if table == "lineitem" else "lineitem"
        subq = (
            rng.choice(["semi", "anti"]),
            _pred(rng, _env(other)),
        )
    env = _env(table)
    pred = _pred(rng, env) if rng.random() < 0.8 else None
    if rng.random() < 0.75:  # aggregate plan
        keys = [_pin(_group_key(rng, env)) for _ in range(rng.randint(1, 2))]
        aggs = [_pin(_agg(rng, env)) for _ in range(rng.randint(1, 3))]
        having = None
        int_aggs = [i for i, a in enumerate(aggs) if a.kind == "int"]
        if int_aggs and rng.random() < 0.3:
            having = (rng.choice(int_aggs), rng.randint(0, 20))
        rollup = cube = False
        gs = rng.random()
        if len(keys) >= 1 and gs < 0.25:
            rollup = True
        elif len(keys) >= 1 and gs < 0.40:
            cube = True
        return Plan(seed, table, rpred, pred, keys, aggs, [], having,
                    False, subq, rollup, None, opred, cube)
    projs = [
        _pin(
            rng.choice([_int_expr, _double_expr, _str_expr, _ts_expr])(
                rng, env
            )
        )
        for _ in range(rng.randint(2, 4))
    ]
    if rng.random() < 0.4:  # order-safe window functions alongside
        projs += [_pin(_window_expr(rng, env)) for _ in range(rng.randint(1, 2))]
    distinct = rng.random() < 0.3
    setop = None
    if rng.random() < 0.3:
        setop = (
            rng.choice(
                ["UNION ALL", "INTERSECT", "INTERSECT ALL",
                 "EXCEPT", "EXCEPT ALL"]
            ),
            _pred(rng, env),
        )
    return Plan(seed, table, rpred, pred, [], [], projs, None, distinct,
                subq, False, setop, opred, False)


# ---------------------------------------------------------------------------
# Grammar v4 (r9 VERDICT item 7): merge_asof-shaped differential plans.
#
# The Spark side runs the ENGINE's own operators/asof.merge_asof (the
# union + struct-carry + last(ignorenulls)-over-window implementation
# whose r9 row-tearing bug the fixed-query null leg caught); the DuckDB
# side uses native ASOF JOIN (backward/forward, strict or exact) or a
# two-ASOF emulation (nearest).  The right side carries a GUARANTEED
# null-bearing value column (max of a NULLIF expression), so every seed
# exercises the exact tear surface: a matched right row whose value is
# NULL must surface as NULL, never as an older row's non-null value.
#
# Determinism: the right side is deduplicated on (user_id, ts), so the
# at-or-before/after match is unique; left rows are keyed by the unique
# event_id; both sides filter ts/user_id IS NOT NULL (pandas
# merge_asof rejects null keys outright — the pinned contract).
# ---------------------------------------------------------------------------


@dataclass
class AsofPlan:
    seed: int
    lpred: Ex          # extra filter on the left events slice
    rpred: Ex          # extra filter on the right events slice
    rv1: Ex            # null-bearing int expr aggregated as the value col
    rv2: Ex            # string expr aggregated as the second value col
    direction: str     # backward | forward | nearest
    allow_exact: bool  # nearest is always exact (engine contract)
    tolerance: float | None  # seconds (ts on) / raw units (numeric on)
    # v4.1: as-of over a NUMERIC ordering column (`value`) instead of
    # event time — merge_asof's non-timestamp `on` path (raw-unit
    # distances and tolerance, no µs conversion)
    on_numeric: bool = False

    def describe(self) -> str:
        return (
            f"seed={self.seed}  ASOF {self.direction}"
            f"{' NUMERIC-ON' if self.on_numeric else ''}"
            f"{'' if self.allow_exact else ' STRICT'}"
            f"{f' TOL {self.tolerance}' if self.tolerance else ''}  "
            f"LEFT WHERE {self.lpred.d}  RIGHT WHERE {self.rpred.d}  "
            f"rv1=max({self.rv1.d}) rv2=max({self.rv2.d})"
        )

    @property
    def _on(self) -> str:
        return "value" if self.on_numeric else "ts"

    def run_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from dask_cudf_spark.operators.asof import merge_asof

        on = self._on
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        base = ev.filter(
            F.col(on).isNotNull() & F.col("user_id").isNotNull()
        )
        left = base.filter(F.expr(self.lpred.s)).select(
            "event_id", "user_id", on
        )
        right = (
            base.filter(F.expr(self.rpred.s))
            .groupBy("user_id", on)
            .agg(
                F.expr(f"CAST(max({self.rv1.s}) AS BIGINT)").alias("rv1"),
                F.expr(f"CAST(max({self.rv2.s}) AS STRING)").alias("rv2"),
            )
        )
        out = merge_asof(
            left,
            right,
            on=on,
            by="user_id",
            right_value_cols=[on, "rv1", "rv2"],
            suffix="m",
            direction=self.direction,
            allow_exact_matches=self.allow_exact,
            tolerance=self.tolerance,
        )
        on_t = "double" if self.on_numeric else "timestamp"
        return out.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col(on).cast(on_t).alias(on),
            F.col(f"m_{on}").cast(on_t).alias(f"m_{on}"),
            F.col("m_rv1").cast("long").alias("m_rv1"),
            F.col("m_rv2").cast("string").alias("m_rv2"),
        )

    def duck_sql(self) -> str:
        on = self._on

        def dist(a: str, b: str) -> str:
            # µs for timestamps, raw units for the numeric on-column
            if self.on_numeric:
                return f"({a} - {b})"
            return f"(epoch_us({a}) - epoch_us({b}))"

        nn = f"{on} IS NOT NULL AND user_id IS NOT NULL"
        lf = (
            f"SELECT event_id, user_id, {on} FROM events "
            f"WHERE {nn} AND {self.lpred.d}"
        )
        rt = (
            f"SELECT user_id, {on}, "
            f"CAST(max({self.rv1.d}) AS BIGINT) AS rv1, "
            f"CAST(max({self.rv2.d}) AS VARCHAR) AS rv2 "
            f"FROM events WHERE {nn} AND {self.rpred.d} "
            f"GROUP BY user_id, {on}"
        )
        if self.direction in ("backward", "forward"):
            op = {
                ("backward", True): ">=",
                ("backward", False): ">",
                ("forward", True): "<=",
                ("forward", False): "<",
            }[(self.direction, self.allow_exact)]
            inner = (
                f"WITH lf AS ({lf}), rt AS ({rt}) "
                f"SELECT lf.event_id, lf.user_id, lf.{on}, "
                f"rt.{on} AS m_{on}, rt.rv1 AS m_rv1, rt.rv2 AS m_rv2 "
                f"FROM lf ASOF LEFT JOIN rt "
                f"ON lf.user_id = rt.user_id AND lf.{on} {op} rt.{on}"
            )
        else:  # nearest: both directions, pick by distance, tie->backward
            use_bwd = (
                f"(f.rts IS NULL OR (b.rts IS NOT NULL AND "
                f"{dist(f'b.{on}', 'b.rts')} <= "
                f"{dist('f.rts', f'b.{on}')}))"
            )
            inner = (
                f"WITH lf AS ({lf}), rt AS ({rt}), "
                f"b AS (SELECT lf.event_id, lf.user_id, lf.{on}, "
                f"rt.{on} AS rts, rt.rv1, rt.rv2 FROM lf ASOF LEFT JOIN rt "
                f"ON lf.user_id = rt.user_id AND lf.{on} >= rt.{on}), "
                f"f AS (SELECT lf.event_id, rt.{on} AS rts, rt.rv1, rt.rv2 "
                f"FROM lf ASOF LEFT JOIN rt "
                f"ON lf.user_id = rt.user_id AND lf.{on} <= rt.{on}) "
                f"SELECT b.event_id, b.user_id, b.{on}, "
                f"CASE WHEN {use_bwd} THEN b.rts ELSE f.rts END AS m_{on}, "
                f"CASE WHEN {use_bwd} THEN b.rv1 ELSE f.rv1 END AS m_rv1, "
                f"CASE WHEN {use_bwd} THEN b.rv2 ELSE f.rv2 END AS m_rv2 "
                f"FROM b JOIN f ON b.event_id = f.event_id"
            )
        if self.tolerance is None:
            return inner
        tol = (
            self.tolerance
            if self.on_numeric
            else int(self.tolerance * 1_000_000)
        )
        ok = (
            f"(m_{on} IS NOT NULL AND "
            f"abs({dist(on, f'm_{on}')}) <= {tol})"
        )
        return (
            f"SELECT event_id, user_id, {on}, "
            f"CASE WHEN {ok} THEN m_{on} END AS m_{on}, "
            f"CASE WHEN {ok} THEN m_rv1 END AS m_rv1, "
            f"CASE WHEN {ok} THEN m_rv2 END AS m_rv2 "
            f"FROM ({inner}) i"
        )


def gen_asof_plan(seed: int) -> AsofPlan:
    """One deterministic random merge_asof plan per seed."""
    rng = random.Random(seed)
    env = _env("events")
    direction = rng.choice(["backward", "backward", "forward", "nearest"])
    allow_exact = (
        True if direction == "nearest" else rng.random() < 0.7
    )
    on_numeric = rng.random() < 0.25
    if rng.random() < 0.35:
        tolerance = (
            rng.choice([5.0, 25.0, 100.0])
            if on_numeric
            else rng.choice([3600, 21600, 86400, 7 * 86400])
        )
    else:
        tolerance = None
    return AsofPlan(
        seed=seed,
        lpred=_pred(rng, env),
        rpred=_pred(rng, env),
        rv1=_nullable_int(rng, env),
        rv2=_str_expr(rng, env),
        direction=direction,
        allow_exact=allow_exact,
        tolerance=tolerance,
        on_numeric=on_numeric,
    )


# ---------------------------------------------------------------------------
# Grammar v5 (r11, r10 VERDICT item 2): txlog / matview / CDC layer.
#
# The two most expensive bench queries' correctness surface
# (sources/txlog.py, sources/matview.py) was pinned only by fixed cases
# — this grammar fuzzes it with MODEL-BASED differential testing: every
# seed derives a random commit sequence (append / MERGE / overwrite /
# OPTIMIZE / VACUUM over small key/value frames) executed against the
# real txlog on a scratch dir, while a pure-python dict mirrors the
# table's logical state.  The oracle is the model (plus the engine's
# own frozen snapshots), so no DuckDB twin exists or is needed.
#
# Checks per seed:
#   (1) after every commit, read_snapshot(latest) == model;
#   (2) time travel: read_snapshot(v) == the python snapshot frozen
#       when v committed, for every still-readable v (vacuum advances
#       the readable horizon — versions older than the last vacuum's
#       keep-window are deliberately dropped from the check, matching
#       the documented retention contract);
#   (3) change_feed COMPOSES: applying feed(v_i, v_j) to frozen[v_i]
#       reproduces frozen[v_j] exactly — preimages must match the
#       frozen rows they claim to delete, and feed(v, v) is empty;
#   (4) the matview (group-by-g count/sum view, key='k') equals a
#       pure-python recompute after every refresh, AND each refresh
#       takes exactly the expected mode (full on first build, noop on
#       no-advance, incremental for append-only deltas, cdc when a
#       merge/overwrite/compaction intervened) — a silent fall-through
#       to 'full' would pass an equality-only check while never
#       exercising the CDC path;
#   (5) stats-pruned reads (prune=('k', lo, hi)) + the row filter
#       equal the model filtered — data skipping must never skip a
#       matching row (dirs without stats are conservatively kept).
#
# Retention discipline: a matview refresh is forced BEFORE every
# vacuum, because change_feed from a version older than the vacuum
# horizon reads retired dirs that no longer exist — the same
# CDC-consumers-must-stay-within-retention contract Delta's CDF
# documents.  The fuzzer encodes the contract instead of tripping it.
# ---------------------------------------------------------------------------

#: key space; small enough that merges hit existing keys constantly,
#: large enough that appends rarely exhaust fresh keys
_TX_KEYSPACE = 40
_TX_GROUPS = 3


@dataclass
class TxlogPlan:
    seed: int
    kinds: list  # op kinds in order; kinds[0] is always 'append'
    refresh_after: list  # bool per op: refresh+check the matview after it

    def describe(self) -> str:
        steps = [
            k + ("+mv" if r else "")
            for k, r in zip(self.kinds, self.refresh_after)
        ]
        return f"seed={self.seed}  txlog[{' -> '.join(steps)}]"

    # -- model helpers ------------------------------------------------

    @staticmethod
    def _model_rows(model: dict) -> list:
        return sorted(
            ((k, g, v) for k, (g, v) in model.items()),
            key=lambda t: (t[0],),
        )

    @staticmethod
    def _model_view(model: dict) -> list:
        by_g: dict = {}
        for _k, (g, v) in model.items():
            n, s, any_v = by_g.get(g, (0, 0, False))
            by_g[g] = (
                n + 1,
                s + (v or 0),
                any_v or v is not None,
            )
        return sorted(
            (g, n, s if any_v else None)
            for g, (n, s, any_v) in by_g.items()
        )

    # -- execution ----------------------------------------------------

    def execute(self, spark, workdir: str) -> dict:
        """Run the sequence + all five checks; raises AssertionError on
        any divergence.  Returns {'commits': N, 'checks': M}."""
        import shutil

        from pyspark.sql import functions as F

        from dask_cudf_spark.sources import matview as mv
        from dask_cudf_spark.sources import txlog

        rng = random.Random(self.seed * 7919 + 13)
        shutil.rmtree(workdir, ignore_errors=True)
        src = f"{workdir}/t"
        dst = f"{workdir}/view"
        schema = "k bigint, g bigint, v bigint"
        aggs = {"n": ("count", "k"), "s": ("sum", "v")}

        model: dict = {}  # k -> (g, v)
        frozen: dict = {}  # version -> model copy
        entries: list = []  # (version, 'append'|'overwrite')
        min_readable = 0
        last_refresh = [None]  # src version of last matview refresh
        checks = 0

        def df_of(rows):
            # SQL VALUES -> LocalRelation: writes in ONE task.  A list
            # createDataFrame parallelizes into defaultParallelism
            # slices (32 scheduled tasks to write 6 rows — measured 6x
            # slower) and coalesce(1) defeats the fast path entirely.
            if not rows:
                return spark.createDataFrame([], schema=schema)
            vals = ", ".join(
                f"({k}, {g}, {'NULL' if v is None else v})"
                for k, (g, v) in rows
            )
            return spark.sql(
                "SELECT CAST(col1 AS BIGINT) AS k, CAST(col2 AS BIGINT)"
                " AS g, CAST(col3 AS BIGINT) AS v"
                f" FROM VALUES {vals}"
            )

        def rand_val():
            return None if rng.random() < 0.15 else rng.randrange(-99, 100)

        def rand_rows(keys):
            return [
                (k, (k % _TX_GROUPS, rand_val())) for k in keys
            ]

        def snap_rows(version=None):
            df = txlog.read_snapshot(spark, src, version)
            return sorted(
                ((r["k"], r["g"], r["v"]) for r in df.collect()),
                key=lambda t: (t[0],),
            )

        def record(version, logical_op):
            entries.append((version, logical_op))
            frozen[version] = dict(model)
            got, want = snap_rows(None), self._model_rows(model)
            assert got == want, (
                f"seed {self.seed}: snapshot v{version} != model:\n"
                f"  engine {got}\n  model  {want}"
            )

        def refresh_and_check():
            nonlocal checks
            res = mv.refresh_matview(
                spark, src, dst, ["g"], aggs, key="k"
            )
            if last_refresh[0] is None:
                exp = "full"
            elif res["src_version"] == last_refresh[0]:
                exp = "noop"
            else:
                delta = [
                    op for (ver, op) in entries if ver > last_refresh[0]
                ]
                exp = (
                    "incremental"
                    if all(o == "append" for o in delta)
                    else "cdc"
                )
            assert res["mode"] == exp, (
                f"seed {self.seed}: refresh mode {res['mode']!r} != "
                f"expected {exp!r} at src v{res['src_version']}"
            )
            last_refresh[0] = res["src_version"]
            got = sorted(
                ((r["g"], r["n"], r["s"]) for r in
                 mv.read_matview(spark, dst).collect()),
                key=lambda t: (t[0],),
            )
            want = self._model_view(model)
            assert got == want, (
                f"seed {self.seed}: matview != model recompute "
                f"(mode {res['mode']}):\n  engine {got}\n  model  {want}"
            )
            checks += 1

        for kind, do_refresh in zip(self.kinds, self.refresh_after):
            live = set(model)
            free = sorted(set(range(_TX_KEYSPACE)) - live)
            if kind == "append" and not free:
                kind = "merge"  # keyspace exhausted: append would dup
            if kind in ("merge", "optimize", "vacuum") and not entries:
                kind = "append"  # table must exist first

            if kind == "append":
                n = rng.randint(1, min(6, len(free)))
                rows = rand_rows(rng.sample(free, n))
                ver = txlog.commit(
                    df_of(rows), src, op="append", stats_cols=["k"]
                )
                model.update(dict(rows))
                record(ver, "append")
            elif kind == "merge":
                n_upd = rng.randint(0, min(4, len(live)))
                n_ins = rng.randint(0 if n_upd else 1, 3)
                keys = rng.sample(sorted(live), n_upd) + (
                    rng.sample(free, min(n_ins, len(free)))
                )
                rows = rand_rows(keys)
                ver = txlog.merge_by_key(df_of(rows), src, key="k")
                model.update(dict(rows))
                record(ver, "overwrite")
            elif kind == "overwrite":
                # occasionally overwrite to EMPTY (the degenerate
                # snapshot every reader path must survive)
                n = 0 if rng.random() < 0.12 else rng.randint(1, 8)
                rows = rand_rows(rng.sample(range(_TX_KEYSPACE), n))
                ver = txlog.commit(
                    df_of(rows), src, op="overwrite", stats_cols=["k"]
                )
                model.clear()
                model.update(dict(rows))
                record(ver, "overwrite")
            elif kind == "optimize":
                ver = txlog.optimize(
                    spark, src, target_partitions=rng.randint(1, 2)
                )
                record(ver, "overwrite")  # model unchanged by design
            else:  # vacuum
                # CDC retention contract: catch the view up FIRST
                refresh_and_check()
                keep = rng.randint(1, 3)
                txlog.vacuum(spark, src, keep_versions=keep,
                             min_age_seconds=0.0)
                horizon = entries[-1][0] - keep + 1
                min_readable = max(min_readable, horizon)
                got, want = snap_rows(None), self._model_rows(model)
                assert got == want, (
                    f"seed {self.seed}: post-vacuum snapshot != model"
                )
            if do_refresh:
                refresh_and_check()
        refresh_and_check()  # final state always checked

        # (2) time travel against every still-readable frozen snapshot
        readable = sorted(v for v in frozen if v >= min_readable)
        for v in readable:
            got = snap_rows(v)
            want = self._model_rows(frozen[v])
            assert got == want, (
                f"seed {self.seed}: time travel v{v} != frozen:\n"
                f"  engine {got}\n  model  {want}"
            )
            checks += 1

        # (3) change_feed composition over random readable pairs.
        # Cap the target at the number of DISTINCT pairs that exist
        # (C(n, 2)) — after a keep_versions=1 vacuum only 1-2 versions
        # may be readable, and asking for 4 pairs would spin forever
        # (the r11 sweep's own first bug: 24 workers pegged at 100%
        # python CPU drawing the same single pair).
        n_readable = len(readable)
        pairs = {(readable[0], readable[-1])}
        want = min(4, n_readable * (n_readable - 1) // 2)
        while len(pairs) < want:
            a, b = sorted(rng.sample(readable, 2))
            pairs.add((a, b))
        for a, b in sorted(pairs):
            feed = txlog.change_feed(spark, src, "k", a, b).collect()
            state = dict(frozen[a])
            posts = []
            for r in feed:
                if r["change_type"] in ("delete", "update_preimage"):
                    assert state.get(r["k"]) == (r["g"], r["v"]), (
                        f"seed {self.seed}: feed({a},{b}) preimage for "
                        f"k={r['k']} is {(r['g'], r['v'])}, frozen has "
                        f"{state.get(r['k'])}"
                    )
                    del state[r["k"]]
                else:
                    posts.append(r)
            for r in posts:
                assert r["k"] not in state, (
                    f"seed {self.seed}: feed({a},{b}) inserts existing "
                    f"key {r['k']}"
                )
                state[r["k"]] = (r["g"], r["v"])
            assert state == frozen[b], (
                f"seed {self.seed}: feed({a},{b}) does not compose:\n"
                f"  applied {sorted(state.items())}\n"
                f"  frozen  {sorted(frozen[b].items())}"
            )
            checks += 1
        a = readable[-1]
        assert txlog.change_feed(spark, src, "k", a, a).count() == 0, (
            f"seed {self.seed}: feed(v, v) not empty"
        )
        checks += 1

        # (5) stats-pruned read == model filtered
        lo, hi = sorted(
            (rng.randrange(_TX_KEYSPACE), rng.randrange(_TX_KEYSPACE))
        )
        got = sorted(
            ((r["k"], r["g"], r["v"]) for r in
             txlog.read_snapshot(spark, src, None, prune=("k", lo, hi))
             .filter(F.col("k").between(lo, hi)).collect()),
            key=lambda t: (t[0],),
        )
        want = [t for t in self._model_rows(model) if lo <= t[0] <= hi]
        assert got == want, (
            f"seed {self.seed}: pruned read k in [{lo},{hi}] != model:\n"
            f"  engine {got}\n  model  {want}"
        )
        checks += 1

        shutil.rmtree(workdir, ignore_errors=True)
        return {"commits": len(entries), "checks": checks}


def gen_txlog_plan(seed: int) -> TxlogPlan:
    """One deterministic random commit-sequence plan per seed."""
    rng = random.Random(seed)
    n_ops = rng.randint(4, 9)
    kinds = ["append"] + [
        rng.choices(
            ["append", "merge", "overwrite", "optimize", "vacuum"],
            weights=[30, 30, 15, 15, 10],
        )[0]
        for _ in range(n_ops - 1)
    ]
    refresh_after = [rng.random() < 0.55 for _ in range(n_ops)]
    return TxlogPlan(seed=seed, kinds=kinds, refresh_after=refresh_after)
