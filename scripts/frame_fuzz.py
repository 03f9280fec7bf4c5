"""Frame-API differential fuzzer vs PANDAS (r14 directive 4).

The dask-like facade (frame.py: Frame / Col / StrAccessor / DtAccessor
/ GroupBy) is example-tested in tests/test_frame.py, but its
accessor/axis/NULL semantics had never seen seeded random CHAINS.  This
leg generates random method chains over small hostile corpus frames and
executes the SAME chain through pandas, comparing canonicalized
results.

Usage:
    python scripts/frame_fuzz.py [n_seeds] [seed_base]
    ONLY=op_name python scripts/frame_fuzz.py ...   # restrict op pool
    VERBOSE=1  -> print each chain

Seed etiquette (COVERAGE.md): r14 frame-fuzz legs use 40000+.

DECLARED pandas-vs-SQL contract differences (the twin encodes the
engine's documented SQL-side semantics; these are pins, not bugs):

  filter/query   Spark WHERE is three-valued: NULL predicate drops the
                 row.  Twin: mask.fillna(False).
  isin           SQL IN on NULL input is NULL (row dropped by a
                 filter); pandas isin(NA) == False.  Twin masks NA back.
  groupby        SQL groups NULL keys like values; pandas drops them
                 unless dropna=False.  Twin: dropna=False.
  groupby.sum    SQL SUM of an all-NULL group is NULL; pandas sum()
                 of all-NA is 0 unless min_count=1.  Twin: min_count=1.
  merge          SQL NULL join keys never match; pandas merges NaN==NaN.
                 Twin: drop null-key rows from the RIGHT side (left/
                 inner joins), so left NULL-key rows stay unmatched.
  round          Spark ROUND is HALF_UP (away from zero); pandas rounds
                 HALF_EVEN.  Twin implements HALF_UP on the same double.
  cumsum         SQL running SUM at a NULL row carries the prior sum;
                 pandas cumsum leaves NA at that position.  Fuzzed over
                 fillna'd columns; the NULL-position divergence is the
                 documented window-function contract.
  str.title      initcap (SQL) splits words on whitespace and lowercases
                 the rest; pandas title() also splits on digits/punct.
                 Excluded from the pool; documented approximation.

Engine bugs FOUND by this leg's construction (fixed in frame.py r14):
str.capitalize was initcap (title-cases every word; pandas/cudf upper
FIRST char only), str.zfill dropped the +/- sign handling and, like
str.pad, TRUNCATED values already wider than `width`.
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SEED_BASE = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
ONLY = os.environ.get("ONLY", "")
VERBOSE = os.environ.get("VERBOSE", "") == "1"

from dask_cudf_spark import frame as fr  # noqa: E402
from dask_cudf_spark.session import get_spark  # noqa: E402

# HOSTILE=oddparts|nocodegen: facade results must be invariant to the
# physical config (prime-tiny shuffle partitioning stresses every
# window/groupby/merge layout; nocodegen the interpreted evaluator)
_HOSTILE = os.environ.get("HOSTILE", "")
_HCONF = {
    "": {},
    "oddparts": {"spark.sql.shuffle.partitions": "7"},
    "nocodegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
}[_HOSTILE]
spark = get_spark(app_name="frame-fuzz", extra_conf=_HCONF)

# ------------------------------------------------------------ corpus
STR_POOL = [
    None, "", " ", "  a b ", "abc", "ABC", "aBc", "abc123", "123",
    "-5", "+42", "héłło", "ÉCLAIR", "ñandú", "a]b[c", "\tx\n",
    "hello world", "The Quick", "no", "0.5", "NaN", "null", "a,b,c",
    "x" * 30, "%a_b%", "line1\nline2", "ß", "ʼn",
]
CAT_POOL = ["x", "y", "z", None]


def gen_corpus(rng: random.Random):
    n = rng.randint(18, 48)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.randint(-50, 50) if rng.random() > 0.15 else None,
                rng.randint(-9, 9) if rng.random() > 0.15 else None,
                (
                    round(rng.randint(-10000, 10000) / 100.0, 2)
                    if rng.random() > 0.15
                    else None
                ),
                rng.choice(STR_POOL),
                rng.choice(STR_POOL),
                rng.choice(CAT_POOL),
                (
                    __import__("datetime").datetime(
                        2024, rng.randint(1, 12), rng.randint(1, 28),
                        rng.randint(0, 23), rng.randint(0, 59),
                        rng.randint(0, 59),
                    )
                    if rng.random() > 0.15
                    else None
                ),
                rng.choice([True, False, None]),
            )
        )
    schema = (
        "id long, i1 long, i2 long, f1 double, s1 string, s2 string, "
        "c1 string, t1 timestamp, b1 boolean"
    )
    eng = fr.Frame(spark.createDataFrame(rows, schema))
    pdf = pd.DataFrame(
        rows, columns="id i1 i2 f1 s1 s2 c1 t1 b1".split()
    ).astype(
        {
            "id": "Int64",
            "i1": "Int64",
            "i2": "Int64",
            "f1": "Float64",
            "s1": "string",
            "s2": "string",
            "c1": "string",
            "t1": "datetime64[ns]",
            "b1": "boolean",
        }
    )
    kinds = {
        "id": "int", "i1": "int", "i2": "int", "f1": "float",
        "s1": "str", "s2": "str", "c1": "cat", "t1": "ts", "b1": "bool",
    }
    return eng, pdf, kinds


# ------------------------------------------------------- canonicalize
def _norm(v):
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:
        if v is None or pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isinf(f):
            return "inf" if f > 0 else "-inf"
        if f == 0:
            return "0"
        return f"{f:.6g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon(pdf: pd.DataFrame):
    cols = sorted(map(str, pdf.columns))
    pdf = pdf[cols] if len(pdf.columns) else pdf
    body = sorted(
        tuple(_norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, body


# ----------------------------------------------------------- op pool
# Each op: name, needs (kind predicate over current kinds), f (engine
# lambda: Frame -> Frame), p (pandas twin: pdf -> pdf), adds (new
# col kinds or None when shape-only).  Self-contained: every op carries
# its own guards (fillna before cumsum, abs before mod, ...).

def _has(kinds, *need):
    return all(any(k == n for k in kinds.values()) for n in need)


def _col(kinds, kind, rng):
    return rng.choice(sorted(c for c, k in kinds.items() if k == kind))


OPS = []


def op(name, need_kinds=()):
    def deco(builder):
        OPS.append((name, need_kinds, builder))
        return builder

    return deco


# ---- arithmetic / Col ops
@op("add_cols", ("int",))
def _(rng, kinds):
    a, b = _col(kinds, "int", rng), _col(kinds, "int", rng)
    return (
        lambda f: f.assign(v_add=f[a] + f[b]),
        lambda p: p.assign(v_add=p[a] + p[b]),
        {"v_add": "int"},
    )


@op("mul_lit", ("int",))
def _(rng, kinds):
    a, k = _col(kinds, "int", rng), rng.randint(-3, 3)
    return (
        lambda f: f.assign(v_mul=f[a] * k),
        lambda p: p.assign(v_mul=p[a] * k),
        {"v_mul": "int"},
    )


@op("sub_neg_abs", ("int",))
def _(rng, kinds):
    a, b = _col(kinds, "int", rng), _col(kinds, "int", rng)
    return (
        lambda f: f.assign(v_sub=(f[a] - f[b]).abs()),
        lambda p: p.assign(v_sub=(p[a] - p[b]).abs()),
        {"v_sub": "int"},
    )


@op("div_lit", ("float",))
def _(rng, kinds):
    a = _col(kinds, "float", rng)
    k = rng.choice([2, -4, 8])  # powers of two: exact in binary
    return (
        lambda f: f.assign(v_div=f[a] / k),
        lambda p: p.assign(v_div=p[a] / k),
        {"v_div": "float"},
    )


@op("floordiv_lit", ("int",))
def _(rng, kinds):
    a, k = _col(kinds, "int", rng), rng.choice([2, 3, 7])
    return (
        lambda f: f.assign(v_fd=f[a] // k),
        lambda p: p.assign(v_fd=p[a] // k),
        {"v_fd": "int"},
    )


@op("mod_abs", ("int",))
def _(rng, kinds):
    # non-negative dividend: Spark % truncates (dividend sign), pandas
    # floors (divisor sign) — identical only when dividend >= 0
    a, k = _col(kinds, "int", rng), rng.choice([3, 5])
    return (
        lambda f: f.assign(v_mod=f[a].abs() % k),
        lambda p: p.assign(v_mod=p[a].abs() % k),
        {"v_mod": "int"},
    )


@op("round_half_up", ("float",))
def _(rng, kinds):
    a, d = _col(kinds, "float", rng), rng.choice([0, 1])
    m = 10 ** d

    def twin(p):
        x = p[a].astype("Float64")
        r = np.sign(x.to_numpy(dtype=float, na_value=np.nan)) * np.floor(
            np.abs(x.to_numpy(dtype=float, na_value=np.nan)) * m + 0.5
        ) / m
        return p.assign(v_rnd=pd.array(r, dtype="Float64"))

    return (
        lambda f: f.assign(v_rnd=f[a].round(d)),
        twin,
        {"v_rnd": "float"},
    )


@op("clip", ("int",))
def _(rng, kinds):
    a = _col(kinds, "int", rng)
    lo, hi = sorted((rng.randint(-20, 0), rng.randint(0, 20)))
    return (
        lambda f: f.assign(v_clip=f[a].clip(lo, hi)),
        lambda p: p.assign(v_clip=p[a].clip(lo, hi)),
        {"v_clip": "int"},
    )


@op("fillna_col", ("int",))
def _(rng, kinds):
    a, v = _col(kinds, "int", rng), rng.randint(-5, 5)
    return (
        lambda f: f.assign(v_fill=f[a].fillna(v)),
        lambda p: p.assign(v_fill=p[a].fillna(v)),
        {"v_fill": "int"},
    )


@op("isna_flag", ("int",))
def _(rng, kinds):
    a = _col(kinds, "int", rng)
    return (
        lambda f: f.assign(v_na=f[a].isna()),
        lambda p: p.assign(v_na=p[a].isna()),
        {"v_na": "bool"},
    )


@op("between", ("int",))
def _(rng, kinds):
    a = _col(kinds, "int", rng)
    lo, hi = sorted((rng.randint(-30, 10), rng.randint(-10, 30)))
    return (
        lambda f: f.assign(v_btw=f[a].between(lo, hi)),
        lambda p: p.assign(v_btw=p[a].between(lo, hi)),
        {"v_btw": "bool"},
    )


@op("isin_sql_nulls", ("cat",))
def _(rng, kinds):
    a = _col(kinds, "cat", rng)
    vals = rng.sample(["x", "y", "z", "w"], k=2)
    return (
        lambda f: f.assign(v_in=f[a].isin(vals)),
        # SQL IN: NULL input -> NULL, pandas isin: NA -> False
        lambda p: p.assign(v_in=p[a].isin(vals).mask(p[a].isna())),
        {"v_in": "bool"},
    )


@op("where_col", ("int",))
def _(rng, kinds):
    a, b = _col(kinds, "int", rng), _col(kinds, "int", rng)
    return (
        # Col.where(cond, other): NULL cond -> other on BOTH sides
        # (pandas treats NA-cond as False)
        lambda f: f.assign(v_whr=f[a].where(f[b] > 0, 0)),
        lambda p: p.assign(v_whr=p[a].where((p[b] > 0).fillna(False), 0)),
        {"v_whr": "int"},
    )


@op("astype_float", ("int",))
def _(rng, kinds):
    a = _col(kinds, "int", rng)
    return (
        lambda f: f.assign(v_cast=f[a].astype("double")),
        lambda p: p.assign(v_cast=p[a].astype("Float64")),
        {"v_cast": "float"},
    )


# ---- str accessor
@op("str_len", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    return (
        lambda f: f.assign(v_len=f[a].str.len()),
        lambda p: p.assign(v_len=p[a].str.len().astype("Int64")),
        {"v_len": "int"},
    )


@op("str_case", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    which = rng.choice(["lower", "upper", "capitalize"])

    def twin(p):
        if which == "capitalize":
            # PIN: engine capitalize = upper(first) + lower(rest) with
            # the FULL uppercase mapping (ß -> 'SS'); Python/pandas
            # capitalize TITLECASES the first char (ß -> 'Ss').  The
            # divergence exists only for one-to-many case mappings.
            v = p[a].str.slice(0, 1).str.upper() + p[a].str.slice(1).str.lower()
        else:
            v = getattr(p[a].str, which)()
        return p.assign(v_case=v)

    return (
        lambda f: f.assign(v_case=getattr(f[a].str, which)()),
        twin,
        {"v_case": "str"},
    )


@op("str_strip", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    which = rng.choice(["strip", "lstrip", "rstrip"])

    def twin(p):
        # Spark trim/ltrim/rtrim strip SPACES only; pandas strips all
        # whitespace — twin restricts to ' ' (documented SQL contract)
        return p.assign(
            v_strip=getattr(p[a].str, which)(" ")
        )

    return (
        lambda f: f.assign(v_strip=getattr(f[a].str, which)()),
        twin,
        {"v_strip": "str"},
    )


@op("str_contains_lit", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    pat = rng.choice(["a", "b", "1", " ", "ł"])
    return (
        lambda f: f.assign(v_has=f[a].str.contains(pat, regex=False)),
        lambda p: p.assign(v_has=p[a].str.contains(pat, regex=False)),
        {"v_has": "bool"},
    )


@op("str_startswith", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    pre = rng.choice(["a", "A", " ", "-"])
    which = rng.choice(["startswith", "endswith"])
    return (
        lambda f: f.assign(v_sw=getattr(f[a].str, which)(pre)),
        lambda p: p.assign(v_sw=getattr(p[a].str, which)(pre)),
        {"v_sw": "bool"},
    )


@op("str_find", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    sub = rng.choice(["a", "b", "c", "1"])
    return (
        lambda f: f.assign(v_find=f[a].str.find(sub)),
        lambda p: p.assign(v_find=p[a].str.find(sub).astype("Int64")),
        {"v_find": "int"},
    )


@op("str_replace_lit", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    pat, repl = rng.choice([("a", "_"), ("b", ""), (" ", ".")])
    return (
        lambda f: f.assign(v_rep=f[a].str.replace(pat, repl, regex=False)),
        lambda p: p.assign(v_rep=p[a].str.replace(pat, repl, regex=False)),
        {"v_rep": "str"},
    )


@op("str_slice", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    start, stop = rng.choice([(0, 2), (1, 3), (2, None)])
    return (
        lambda f: f.assign(v_sl=f[a].str.slice(start, stop)),
        lambda p: p.assign(v_sl=p[a].str.slice(start, stop)),
        {"v_sl": "str"},
    )


@op("str_get", ("str",))
def _(rng, kinds):
    a, i = _col(kinds, "str", rng), rng.choice([0, 1])

    def twin(p):
        # pandas .str.get(i) out-of-range -> NaN; Spark substring -> ''
        g = p[a].str.get(i)
        g = g.mask(p[a].notna() & g.isna(), "")
        return p.assign(v_get=g)

    return (
        lambda f: f.assign(v_get=f[a].str.get(i)),
        twin,
        {"v_get": "str"},
    )


@op("str_zfill", ("str",))
def _(rng, kinds):
    a, w = _col(kinds, "str", rng), rng.choice([3, 5])
    return (
        lambda f: f.assign(v_z=f[a].str.zfill(w)),
        lambda p: p.assign(v_z=p[a].str.zfill(w)),
        {"v_z": "str"},
    )


@op("str_pad", ("str",))
def _(rng, kinds):
    a, w = _col(kinds, "str", rng), rng.choice([4, 6])
    side = rng.choice(["left", "right"])
    return (
        lambda f: f.assign(v_pad=f[a].str.pad(w, side, "*")),
        lambda p: p.assign(v_pad=p[a].str.pad(w, side=side, fillchar="*")),
        {"v_pad": "str"},
    )


@op("str_repeat", ("str",))
def _(rng, kinds):
    a, n = _col(kinds, "str", rng), rng.choice([2, 3])
    return (
        lambda f: f.assign(v_rpt=f[a].str.repeat(n)),
        lambda p: p.assign(v_rpt=p[a].str.repeat(n)),
        {"v_rpt": "str"},
    )


@op("str_cat", ("str",))
def _(rng, kinds):
    a, b = _col(kinds, "str", rng), _col(kinds, "str", rng)

    def twin(p):
        # concat_ws SKIPS nulls (never returns NULL); pandas str.cat
        # with na_rep='' twins the null-skipping, but a null in BOTH
        # still yields '' on the SQL side
        va = p[a].fillna("")
        vb = p[b].fillna("")
        return p.assign(v_cat=(va + "|" + vb).mask(p[a].isna() & p[b].isna(),
                                                   "").mask(p[a].isna(), vb).mask(
            p[a].notna() & p[b].isna(), va))

    return (
        lambda f: f.assign(v_cat=f[a].str.cat(f[b], sep="|")),
        twin,
        {"v_cat": "str"},
    )


# ---- dt accessor
@op("dt_field", ("ts",))
def _(rng, kinds):
    a = _col(kinds, "ts", rng)
    which = rng.choice(
        ["year", "month", "day", "hour", "minute", "second",
         "dayofweek", "dayofyear", "quarter", "days_in_month"]
    )
    return (
        lambda f: f.assign(v_dt=getattr(f[a].dt, which)),  # dt fields are properties
        lambda p: p.assign(
            v_dt=pd.array(getattr(p[a].dt, which), dtype="Int64")
        ),
        {"v_dt": "int"},
    )


@op("dt_flag", ("ts",))
def _(rng, kinds):
    a = _col(kinds, "ts", rng)
    which = rng.choice(["is_month_start", "is_month_end", "is_leap_year"])

    def twin(p):
        v = pd.Series(
            pd.array(getattr(p[a].dt, which), dtype="boolean"),
            index=p.index,
        )
        return p.assign(v_dtf=v.mask(p[a].isna()))

    return (
        lambda f: f.assign(v_dtf=getattr(f[a].dt, which)),
        twin,
        {"v_dtf": "bool"},
    )


@op("dt_floor", ("ts",))
def _(rng, kinds):
    a = _col(kinds, "ts", rng)
    spark_freq, pd_freq = rng.choice(
        [("h", "h"), ("D", "D"), ("min", "min")]
    )
    return (
        lambda f: f.assign(v_flr=f[a].dt.floor(spark_freq)),
        lambda p: p.assign(v_flr=p[a].dt.floor(pd_freq)),
        {"v_flr": "ts"},
    )


# ---- frame-level ops
@op("filter_gt", ("int",))
def _(rng, kinds):
    a, k = _col(kinds, "int", rng), rng.randint(-10, 10)
    return (
        lambda f: f[f[a] > k],
        lambda p: p[(p[a] > k).fillna(False)],
        None,
    )


@op("filter_conj", ("int",))
def _(rng, kinds):
    a, b = _col(kinds, "int", rng), _col(kinds, "int", rng)
    k = rng.randint(-5, 5)
    return (
        lambda f: f[(f[a] > k) & (f[b].notna())],
        lambda p: p[((p[a] > k) & p[b].notna()).fillna(False)],
        None,
    )


@op("query_sql", ("int",))
def _(rng, kinds):
    a, k = _col(kinds, "int", rng), rng.randint(-10, 10)
    return (
        lambda f: f.query(f"{a} >= {k}"),
        lambda p: p[(p[a] >= k).fillna(False)],
        None,
    )


@op("dropna_subset", ("int",))
def _(rng, kinds):
    cols = sorted(
        c for c, k in kinds.items() if k in ("int", "float", "str", "cat")
    )
    sub = rng.sample(cols, k=min(2, len(cols)))
    how = rng.choice(["any", "all"])
    return (
        lambda f: f.dropna(subset=sub, how=how),
        lambda p: p.dropna(subset=sub, how=how),
        None,
    )


@op("rename_drop", ())
def _(rng, kinds):
    victims = sorted(set(kinds) - {"id"})
    if not victims:
        return None
    v = rng.choice(victims)
    newk = dict(kinds)
    del newk[v]
    return (
        lambda f: f.drop(v),
        lambda p: p.drop(columns=[v]),
        ("replace_kinds", newk),
    )


@op("distinct_rows", ())
def _(rng, kinds):
    keep = sorted(set(kinds) - {"id"})
    if len(keep) < 2:
        return None
    sub = rng.sample(keep, k=2)
    newk = {c: kinds[c] for c in sub}
    return (
        lambda f: f[sub].drop_duplicates(),
        lambda p: p[sub].drop_duplicates(),
        ("replace_kinds", newk),
    )


@op("groupby_agg", ("cat", "int"))
def _(rng, kinds):
    key = _col(kinds, "cat", rng)
    val = _col(kinds, "int", rng)
    fn = rng.choice(["sum", "mean", "min", "max"])

    def twin(p):
        g = p.groupby(key, dropna=False)[val]
        if fn == "sum":
            out = g.sum(min_count=1)
        else:
            out = getattr(g, fn)()
        out = out.reset_index()
        if fn == "mean":
            out[val] = pd.array(out[val], dtype="Float64")
        return out

    newk = {key: "cat", val: "float" if fn == "mean" else "int"}
    return (
        lambda f: getattr(f.groupby(key), fn)([val]),
        twin,
        ("replace_kinds", newk),
    )


@op("groupby_count", ("cat",))
def _(rng, kinds):
    key = _col(kinds, "cat", rng)
    newk = {key: "cat", "count": "int"}
    return (
        lambda f: f.groupby(key).count(),
        lambda p: p.groupby(key, dropna=False)
        .size()
        .reset_index(name="count"),
        ("replace_kinds", newk),
    )


@op("groupby_nunique", ("cat", "int"))
def _(rng, kinds):
    key = _col(kinds, "cat", rng)
    val = _col(kinds, "int", rng)
    newk = {key: "cat", f"{val}_nunique": "int"}
    return (
        lambda f: f.groupby(key).nunique(val),
        lambda p: p.groupby(key, dropna=False)[val]
        .nunique()
        .reset_index(name=f"{val}_nunique"),
        ("replace_kinds", newk),
    )


@op("value_counts", ("cat",))
def _(rng, kinds):
    a = _col(kinds, "cat", rng)
    newk = {a: "cat", "count": "int"}
    return (
        lambda f: f.value_counts(a),
        lambda p: p[a]
        .value_counts(dropna=False)
        .reset_index()
        .set_axis([a, "count"], axis=1),
        ("replace_kinds", newk),
    )


@op("merge_dim", ("cat", "int"))
def _(rng, kinds):
    if "count" in kinds:  # suffix collision with a prior count column
        return None
    key = _col(kinds, "cat", rng)
    val = _col(kinds, "int", rng)
    how = rng.choice(["inner", "left"])

    def eng(f):
        dim = f.groupby(key).count()
        return f.merge(dim, on=key, how=how)

    def twin(p):
        dim = (
            p.groupby(key, dropna=False).size().reset_index(name="count")
        )
        # SQL NULL keys never match — drop the null-key dim row so the
        # pandas NaN==NaN merge can't fabricate the match
        dim = dim[dim[key].notna()]
        out = p.merge(dim, on=key, how=how)
        out["count"] = pd.array(out["count"], dtype="Int64")
        return out

    newk = dict(kinds)
    newk["count"] = "int"
    return (eng, twin, ("replace_kinds", newk))


@op("concat_self", ())
def _(rng, kinds):
    # id stops being unique: demote it so order-dependent ops skip
    newk = dict(kinds)
    if newk.get("id") == "int":
        newk["id"] = "int_dup"
    return (
        lambda f: fr.concat([f, f]),
        lambda p: pd.concat([p, p], ignore_index=True),
        ("replace_kinds", newk),
    )


@op("nsmallest_id", ())
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    n = rng.choice([3, 7])
    which = rng.choice(["nlargest", "nsmallest"])
    return (
        lambda f: getattr(f, which)(n, "id"),
        lambda p: getattr(p, which)(n, "id"),
        None,
    )


@op("cumsum_filled", ("int",))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    a = _col(kinds, "int", rng)

    def eng(f):
        g = f.assign(v_cs_in=f[a].fillna(0))
        return g.cumsum("v_cs_in", order="id")

    def twin(p):
        q = p.assign(v_cs_in=p[a].fillna(0)).sort_values("id")
        q["v_cs_in_cumsum"] = q["v_cs_in"].cumsum()
        return q

    return (eng, twin, {"v_cs_in": "int", "v_cs_in_cumsum": "int"})


@op("diff_ordered", ("int",))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    a = _col(kinds, "int", rng)

    def eng(f):
        g = f.assign(v_df_in=f[a].fillna(0))
        return g.diff("v_df_in", order="id")

    def twin(p):
        q = p.assign(v_df_in=p[a].fillna(0)).sort_values("id")
        q["v_df_in_diff"] = q["v_df_in"].diff().astype("Int64")
        return q

    return (eng, twin, {"v_df_in": "int", "v_df_in_diff": "int"})


@op("groupby_shift", ("cat", "int"))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    key = _col(kinds, "cat", rng)
    a = _col(kinds, "int", rng)

    def eng(f):
        return f.groupby(key).shift(a, periods=1, order_by="id")

    def twin(p):
        q = p.sort_values("id").copy()
        q[f"{a}_shift"] = q.groupby(key, dropna=False)[a].shift(1)
        return q

    newk = dict(kinds)
    newk[f"{a}_shift"] = "int"
    return (eng, twin, ("replace_kinds", newk))



# ---- r14 wave-2 ops: rank/melt/mode/pct_change, groupby transform/
# filter/first/last/cumcount/median/rolling, ffill, list accessor,
# frame replace

@op("rank_methods", ("int",))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    a = _col(kinds, "int", rng)
    method = rng.choice(["average", "min", "max", "dense", "first"])
    pct = rng.random() < 0.3 and method != "first"

    def eng(f):
        g = f.assign(v_rk_in=f[a].fillna(0))
        kw = {"tiebreak": "id"} if method == "first" else {}
        return g.rank("v_rk_in", method=method, pct=pct, out="v_rank", **kw)

    def twin(p):
        q = p.assign(v_rk_in=p[a].fillna(0))
        if method == "first":
            q = q.sort_values("id")
        r = q["v_rk_in"].astype("float").rank(method=method, pct=pct)
        return q.assign(v_rank=r)

    return (eng, twin, {"v_rk_in": "int", "v_rank": "float"})


@op("melt_ints", ("int",))
def _(rng, kinds):
    if "id" not in kinds or "variable" in kinds or "value" in kinds:
        return None
    vals = sorted(c for c, k in kinds.items() if k == "int" and c != "id")
    if len(vals) < 2:
        return None
    value_vars = rng.sample(vals, k=2)
    return (
        lambda f: f.melt(id_vars="id", value_vars=value_vars),
        lambda p: p.melt(
            id_vars=["id"], value_vars=value_vars,
            var_name="variable", value_name="value",
        ),
        # id is DUPLICATED after melt: order-dependent ops must skip
        ("replace_kinds", {"id": "int_dup", "variable": "cat", "value": "int"}),
    )


@op("mode_cat", ("cat",))
def _(rng, kinds):
    a = _col(kinds, "cat", rng)

    def twin(p):
        # SQL mode: NULL is a candidate value (groupBy groups it);
        # pandas Series.mode drops NaN — recompute from value_counts
        vc = p[a].value_counts(dropna=False)
        top = vc[vc == vc.max()].index.to_frame(index=False, name=a)
        return top.sort_values(a).reset_index(drop=True)

    return (lambda f: f.mode(a), twin, ("replace_kinds", {a: "cat"}))


@op("pct_change_ordered", ("int",))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    a = _col(kinds, "int", rng)

    def eng(f):
        g = f.assign(v_pc_in=f[a].fillna(0))
        return g.pct_change("v_pc_in", order="id")

    def twin(p):
        import numpy as np

        q = p.assign(v_pc_in=p[a].fillna(0)).sort_values("id")
        pc = q["v_pc_in"].astype("Float64").pct_change(fill_method=None)
        # PIN: engine try_divide yields NULL where prev == 0; pandas
        # yields +/-inf (and 0/0 -> NaN == NULL already)
        pc = pc.mask(np.isinf(pc.astype(float).to_numpy()))
        return q.assign(v_pc_in_pct_change=pc)

    return (eng, twin, {"v_pc_in": "int", "v_pc_in_pct_change": "float"})


@op("gb_transform_sum", ("cat", "int"))
def _(rng, kinds):
    key = _col(kinds, "cat", rng)
    a = _col(kinds, "int", rng)

    def twin(p):
        # PIN: SQL window SUM of an all-NULL group is NULL (min_count=1)
        t = p.groupby(key, dropna=False)[a].transform(
            lambda s: s.sum(min_count=1)
        )
        return p.assign(**{f"{a}_sum": pd.array(t, dtype="Int64")})

    newk = dict(kinds)
    newk[f"{a}_sum"] = "int"
    return (
        lambda f: f.groupby(key).transform(a, "sum"),
        twin,
        ("replace_kinds", newk),
    )


@op("gb_filter_count", ("cat",))
def _(rng, kinds):
    key = _col(kinds, "cat", rng)
    k = rng.randint(2, 8)
    return (
        lambda f: f.groupby(key).filter("count(*)", lambda c: c > k),
        lambda p: p.groupby(key, dropna=False).filter(lambda g: len(g) > k),
        None,
    )


@op("gb_first_last", ("cat", "int"))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    key = _col(kinds, "cat", rng)
    a = _col(kinds, "int", rng)
    which = rng.choice(["first", "last"])

    def eng(f):
        return getattr(f.groupby(key), which)(a, order_by="id")

    def twin(p):
        q = p.sort_values("id")
        g = q.groupby(key, dropna=False)[a]
        # engine first/last = min_by/max_by on the ORDER column: the
        # value AT the order extreme, NULL included; pandas
        # first()/last() skip NaN, so twin via head/tail
        v = g.apply(lambda s: s.iloc[0] if which == "first" else s.iloc[-1])
        out = v.reset_index(name=f"{a}_{which}")
        out[f"{a}_{which}"] = pd.array(out[f"{a}_{which}"], dtype="Int64")
        return out

    return (eng, twin, ("replace_kinds", {key: "cat", f"{a}_{which}": "int"}))


@op("gb_cumcount", ("cat",))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    key = _col(kinds, "cat", rng)

    def twin(p):
        q = p.sort_values("id").copy()
        q["cumcount"] = q.groupby(key, dropna=False).cumcount()
        return q

    newk = dict(kinds)
    newk["cumcount"] = "int"
    return (
        lambda f: f.groupby(key).cumcount(order_by="id"),
        twin,
        ("replace_kinds", newk),
    )


@op("gb_median", ("cat", "int"))
def _(rng, kinds):
    key = _col(kinds, "cat", rng)
    a = _col(kinds, "int", rng)

    def twin(p):
        m = p.groupby(key, dropna=False)[a].median()
        return m.reset_index(name=f"{a}_median")

    return (
        lambda f: f.groupby(key).median(a),
        twin,
        ("replace_kinds", {key: "cat", f"{a}_median": "float"}),
    )


@op("gb_rolling", ("cat", "int"))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    key = _col(kinds, "cat", rng)
    a = _col(kinds, "int", rng)
    which = rng.choice(["sum", "mean", "min", "max"])

    def eng(f):
        g = f.assign(v_rl_in=f[a].fillna(0))
        return getattr(g.groupby(key).rolling(3, order_by="id"), which)(
            "v_rl_in"
        )

    def twin(p):
        q = p.assign(v_rl_in=p[a].fillna(0)).sort_values("id").copy()
        r = (
            q.groupby(key, dropna=False)["v_rl_in"]
            .rolling(3, min_periods=1)
            .agg(which)
            .reset_index(level=0, drop=True)
        )
        q[f"v_rl_in_roll_{which}"] = r
        return q

    newk = dict(kinds)
    newk["v_rl_in"] = "int"
    newk[f"v_rl_in_roll_{which}"] = "float" if which == "mean" else "int"
    return (eng, twin, ("replace_kinds", newk))


@op("ffill_grouped", ("cat", "int"))
def _(rng, kinds):
    if kinds.get("id") != "int":
        return None
    key = _col(kinds, "cat", rng)
    a = _col(kinds, "int", rng)

    def twin(p):
        q = p.sort_values("id").copy()
        q[a] = q.groupby(key, dropna=False)[a].ffill()
        return q

    return (
        lambda f: f.ffill(subset=[a], by=[key], order=["id"]),
        twin,
        None,
    )


@op("list_ops", ("str",))
def _(rng, kinds):
    a = _col(kinds, "str", rng)
    needle = rng.choice(["a", "abc", "b"])

    def eng(f):
        g = f.assign(v_ls=f[a].str.split())
        return g.assign(
            v_ll=g.v_ls.list.len(),
            v_lc=g.v_ls.list.contains(needle),
        ).drop("v_ls")

    def twin(p):
        ls = p[a].str.split(r"\s+", regex=True)
        ll = pd.array(ls.apply(lambda v: len(v) if isinstance(v, list) else None), dtype="Int64")
        lc = pd.Series(
            ls.apply(
                lambda v: (needle in v) if isinstance(v, list) else None
            ),
            dtype="boolean",
        )
        return p.assign(v_ll=ll, v_lc=lc)

    return (eng, twin, {"v_ll": "int", "v_lc": "bool"})


@op("replace_cat", ("cat",))
def _(rng, kinds):
    old, new = rng.choice([("x", "xx"), ("y", "why"), ("z", "x")])
    return (
        lambda f: f.replace(old, new),
        lambda p: p.replace(old, new),
        None,
    )


# --------------------------------------------------------------- driver
def run_seed(seed: int) -> tuple[bool, str]:
    rng = random.Random(seed)
    eng, pdf, kinds = gen_corpus(rng)
    chain = []
    n_ops = rng.randint(2, 5)
    pool = [o for o in OPS if not ONLY or ONLY in o[0]]
    for _i in range(n_ops):
        candidates = [
            (name, builder)
            for name, need, builder in pool
            if _has(kinds, *need)
        ]
        if not candidates:
            break
        name, builder = rng.choice(candidates)
        built = builder(rng, kinds)
        if built is None:
            continue
        f_fn, p_fn, adds = built
        try:
            eng2, pdf2 = f_fn(eng), p_fn(pdf)
        except Exception as e:  # engine or twin crashed mid-chain
            return False, f"{name} RAISED: {type(e).__name__}: {e}"
        eng, pdf = eng2, pdf2
        chain.append(name)
        if isinstance(adds, tuple) and adds[0] == "replace_kinds":
            kinds = dict(adds[1])
        elif isinstance(adds, dict):
            kinds.update(adds)
    if not chain:
        return True, "no-op"
    try:
        got = eng.compute()
    except Exception as e:
        return False, f"compute RAISED after {chain}: {e}"
    c1, b1 = canon(got)
    c2, b2 = canon(pdf)
    if c1 != c2:
        return False, f"cols {c1} vs {c2} after {chain}"
    if b1 != b2:
        diff_a = [r for r in b1 if r not in b2][:3]
        diff_b = [r for r in b2 if r not in b1][:3]
        return (
            False,
            f"values diverge after {chain}: engine-only {diff_a} "
            f"pandas-only {diff_b}",
        )
    return True, "+".join(chain)


def main():
    bad = 0
    for s in range(SEED_BASE, SEED_BASE + N_SEEDS):
        ok, msg = run_seed(s)
        if not ok:
            bad += 1
            print(f"SEED {s} DIVERGED: {msg}")
        elif VERBOSE:
            print(f"seed {s} ok: {msg}")
        if (s - SEED_BASE + 1) % 50 == 0:
            print(f"  ... {s - SEED_BASE + 1}/{N_SEEDS}, {bad} divergent")
    print(f"frame-fuzz: {N_SEEDS} seeds, {bad} divergent")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
