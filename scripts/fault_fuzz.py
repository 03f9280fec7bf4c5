"""Fault-injection differential leg (r14 directive 3): task RETRIES and
SPECULATIVE EXECUTION over every Python-boundary path + the txlog
exactly-once contract.

Every determinism contract in the engine (det.py scaled sums,
hash-sampling, mapInPandas codecs, batch_id-idempotent txlog commits)
had been tested under query RESTARTS but never under task
RE-EXECUTION — the thing a real 1000-executor cluster does constantly
(lost executors, speculation).  This leg runs the registry with every
Python boundary wrapped in a fault shim and oracle-compares results:

  FAULT=failonce  (default)
      master local[32,3] (task maxFailures=3 — local[] defaults to 1,
      where ANY task failure kills the job).  EVERY wrapped task raises
      a transient RuntimeError on attempt 0 and succeeds on the retry,
      so each Python-boundary stage executes twice; results must be
      byte-identical to the DuckDB oracle.
  FAULT=speculate
      master local-cluster[2,2,2048]: REAL multi-executor topology —
      separate executor JVMs, cross-process Python workers, broadcasts
      and shuffles over RPC — which local[32] never exercises, with
      speculation armed (speculation is hard-disabled in local[] —
      TaskSchedulerImpl guards on !isLocal) and attempt-0 stragglers
      injected (partition 0 of every wrapped stage sleeps).

      ADJUDICATION (probed live, r14): a speculative COPY can never
      EXECUTE on a single machine — the scheduler refuses to place a
      speculative attempt on a host that already has a running attempt
      of the same task (TaskSetManager dequeue's hasAttemptOnHost bar),
      and both local-cluster workers report the same host.  Copy
      re-execution semantics (a second attempt of the same task must
      produce identical output) are covered by the failonce leg, which
      drives the SAME attempt-1 path through every Python boundary.
      If a speculative attempt ever does run (multi-host future), the
      marker files record it; its absence here is expected and is NOT
      a failure.

Usage:
    FAULT=failonce  python scripts/fault_fuzz.py [sf_dir] [only ...]
    FAULT=speculate python scripts/fault_fuzz.py [sf_dir] [only ...]

The txlog exactly-once cell runs in both modes: a commit whose write
stage carries a wrapped (fail-once / slow) boundary must produce
exactly ONE commit record, no duplicate rows, and an unchanged live-dir
set; a batch_id replay must stay a no-op.

Injection shims are installed by monkeypatching the five Python-boundary
APIs (DataFrame.mapInPandas / mapInArrow, GroupedData.applyInPandas /
applyInPandasWithState, PandasCogroupedOps.applyInPandas, and
pandas_udf) BEFORE the engine imports, so every engine path is covered
without engine-side hooks.  Wrappers live in __main__ (cloudpickle
ships them by value — the round-2 pickle-by-reference lesson) and use
functools.wraps so pandas_udf's type-hint eval-type inference still
sees the original annotations.
"""

from __future__ import annotations

import functools
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

FAULT = os.environ.get("FAULT", "failonce")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:]
MARKERS = tempfile.mkdtemp(prefix=f"spark-graft-fault-{FAULT}-")
SLEEP_S = float(os.environ.get("FAULT_SLEEP", "2.5"))

if FAULT not in ("failonce", "speculate"):
    raise SystemExit(f"unknown FAULT mode {FAULT!r} (failonce|speculate)")


# ---------------------------------------------------------------- shims
# Defined at module top level of __main__: cloudpickle serializes them
# by value, so executor python workers never import this script.

def _fail_once_gate(markers):
    def gate():
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0:
            import os as _os

            open(
                _os.path.join(
                    markers, f"fail_s{ctx.stageId()}_p{ctx.partitionId()}"
                ),
                "w",
            ).close()
            raise RuntimeError(
                "fault_fuzz: injected transient failure (task attempt 0)"
            )

    return gate


def _slow_gate(markers, sleep_s):
    def gate():
        import os as _os
        import time as _time

        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            if ctx.attemptNumber() > 0:
                # a second attempt WITHOUT a failure = speculation ran
                open(
                    _os.path.join(
                        markers,
                        f"spec_s{ctx.stageId()}_p{ctx.partitionId()}"
                        f"_a{ctx.attemptNumber()}",
                    ),
                    "w",
                ).close()
            elif ctx.partitionId() == 0:
                _time.sleep(sleep_s)

    return gate


def _wrap(fn):
    """Wrap ``fn`` with the fault gate, PRESERVING POSITIONAL ARITY:
    PySpark validates applyInPandas / cogroup UDF arity via
    getfullargspec (which does NOT follow __wrapped__), so a generic
    (*args) shim is rejected with INVALID_PANDAS_UDF — each wrapper
    below declares the exact parameter count of the function it
    shadows, and functools.wraps carries the annotations pandas_udf's
    type-hint eval-type inference reads."""
    import inspect

    gate = (
        _fail_once_gate(MARKERS)
        if FAULT == "failonce"
        else _slow_gate(MARKERS, SLEEP_S)
    )
    try:
        spec = inspect.getfullargspec(fn)
        nargs = len(spec.args) if spec.varargs is None else None
    except TypeError:
        nargs = None

    if nargs == 1:

        @functools.wraps(fn)
        def inner(a):
            gate()
            return fn(a)

    elif nargs == 2:

        @functools.wraps(fn)
        def inner(a, b):
            gate()
            return fn(a, b)

    elif nargs == 3:

        @functools.wraps(fn)
        def inner(a, b, c):
            gate()
            return fn(a, b, c)

    else:

        @functools.wraps(fn)
        def inner(*args):
            gate()
            return fn(*args)

    return inner


# ------------------------------------------------- boundary monkeypatch
# Driver-side counter: how many boundaries each query wrapped (proves
# the leg actually exercised the injection for that query).
WRAPPED = {"n": 0}

import pyspark.sql.functions as Fmod  # noqa: E402
import pyspark.sql.pandas.functions as pf_mod  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql.group import GroupedData  # noqa: E402
from pyspark.sql.pandas.group_ops import PandasCogroupedOps  # noqa: E402

_orig = {
    "mapInPandas": DataFrame.mapInPandas,
    "mapInArrow": DataFrame.mapInArrow,
    "applyInPandas": GroupedData.applyInPandas,
    "applyInPandasWithState": GroupedData.applyInPandasWithState,
    "cogroup_applyInPandas": PandasCogroupedOps.applyInPandas,
    "pandas_udf": pf_mod.pandas_udf,
}


def _patch_method(cls, name, orig):
    def patched(self, func, *a, **k):
        WRAPPED["n"] += 1
        return orig(self, _wrap(func), *a, **k)

    setattr(cls, name, patched)


_patch_method(DataFrame, "mapInPandas", _orig["mapInPandas"])
_patch_method(DataFrame, "mapInArrow", _orig["mapInArrow"])
_patch_method(GroupedData, "applyInPandas", _orig["applyInPandas"])
_patch_method(
    GroupedData, "applyInPandasWithState", _orig["applyInPandasWithState"]
)
_patch_method(
    PandasCogroupedOps, "applyInPandas", _orig["cogroup_applyInPandas"]
)


def _patched_pandas_udf(f=None, returnType=None, functionType=None):
    if f is not None and callable(f):
        WRAPPED["n"] += 1
        return _orig["pandas_udf"](_wrap(f), returnType, functionType)

    # decorator form: @pandas_udf(returnType) — delegate arg juggling
    deco = _orig["pandas_udf"](f, returnType, functionType)

    def wrapper(fn):
        WRAPPED["n"] += 1
        return deco(_wrap(fn))

    return wrapper


pf_mod.pandas_udf = _patched_pandas_udf
Fmod.pandas_udf = _patched_pandas_udf

# engine imports AFTER the patch so call-time F.pandas_udf and the
# boundary methods all resolve to the shimmed versions
import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

# -------------------------------------------------------------- session
# HOSTILE composition (r14): the same session-config cells the replay
# matrix uses, composed ON TOP of fault injection — e.g. noarrow
# drives the pickle-fallback serializer through retried attempts
HOSTILE = os.environ.get("HOSTILE", "")
_HOSTILE_CONF = {
    "": {},
    "tz": {},  # applied via extraJavaOptions below
    "noarrow": {
        "spark.sql.execution.arrow.pyspark.enabled": "false",
        "spark.sql.execution.arrow.pyspark.fallback.enabled": "true",
    },
    "oddparts": {"spark.sql.shuffle.partitions": "7"},
    "nocodegen": {
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    },
}
if HOSTILE not in _HOSTILE_CONF:
    raise SystemExit(f"unknown HOSTILE mode {HOSTILE!r}")

if FAULT == "failonce":
    # local[32, 3]: the SECOND bracket arg is task maxFailures — the
    # spark.task.maxFailures conf is IGNORED under local[] masters
    builder = SparkSession.builder.master("local[32,3]")
else:
    builder = (
        SparkSession.builder.master("local-cluster[2,2,2048]")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.2")
        .config("spark.speculation.quantile", "0.25")
        # single-task stages (AQE coalesces most sf0.001 shuffles to 1
        # partition) never develop a median to speculate against — this
        # threshold speculates ANY task running past it when the stage
        # has <= one executor's slots worth of tasks
        .config("spark.speculation.task.duration.threshold", "1s")
        .config("spark.executorEnv.PYTHONPATH", "/root/repo")
        # separate executor JVMs: ship python deps via env, keep
        # memory modest, and allow retried stages
        .config("spark.task.maxFailures", "3")
    )
builder = builder.config("spark.sql.shuffle.partitions", "8")
for k, v in _HOSTILE_CONF[HOSTILE].items():
    builder = builder.config(k, v)
if HOSTILE == "tz":
    tzopt = "-Duser.timezone=Asia/Kolkata"
    builder = builder.config(
        "spark.driver.extraJavaOptions", tzopt
    ).config("spark.executor.extraJavaOptions", tzopt)
spark = (
    builder.config("spark.ui.enabled", "false")
    .appName(f"fault-fuzz-{FAULT}")
    .getOrCreate()
)
print(
    f"== FAULT={FAULT}  sf={SF}  hostile={HOSTILE or '-'}  "
    f"markers={MARKERS} =="
)

# --------------------------------------------------------- oracle setup
import duckdb  # noqa: E402
from oracle_compare import assert_frames_match  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('{SF}/{t}.parquet')"
    )

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
if ONLY:
    qs = {n: f for n, f in qs.items() if any(s in n for s in ONLY)}

failed, ran, boundary_queries = [], 0, 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    w0 = WRAPPED["n"]
    try:
        spdf = fn(spark, SF).toPandas()
        touched = WRAPPED["n"] - w0
        if name in oracles:
            ddf = con.execute(oracles[name]).fetchdf()
            assert_frames_match(spdf, ddf, name)
            status = f"MATCH  ({len(spdf)} rows)"
        else:
            status = f"rows-only ({len(spdf)} rows)"
        if touched:
            boundary_queries += 1
            status += f"  [wrapped x{touched}]"
    except Exception as e:
        status = f"FAIL: {str(e)[:160]}"
        failed.append(name)
    ran += 1
    print(f"  {name:28s} {status}  [{time.time()-t0:.1f}s]")

# ------------------------------------------- txlog exactly-once cell
# A commit whose WRITE stage carries a wrapped boundary: the retried /
# speculated write tasks must not produce duplicate rows, duplicate
# commits, or orphan live dirs, and a batch_id replay stays a no-op.
print("\n== txlog exactly-once under task faults ==")
try:
    import shutil

    from pyspark.sql import functions as F

    from dask_cudf_spark.sources import txlog

    tdir = tempfile.mkdtemp(prefix="spark-graft-fault-txlog-") + "/t"

    def _passthrough(it):
        for pdf in it:
            yield pdf

    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    # repartition so the wrapped write stage has several tasks
    faulty = base.repartition(4).mapInPandas(_passthrough, "id long, k long")
    v1 = txlog.commit(faulty, tdir, batch_id=100)
    v_replay = txlog.commit(faulty, tdir, batch_id=100)  # must no-op
    snap = txlog.read_snapshot(spark, tdir)
    n, nd = snap.count(), snap.select("id").distinct().count()
    hist = txlog.table_history(spark, tdir)
    assert v1 == v_replay, f"batch_id replay re-committed: {v1} vs {v_replay}"
    assert n == 1000 and nd == 1000, f"rows {n}, distinct {nd} (want 1000)"
    assert len(hist) == 1, f"{len(hist)} commits (want 1)"
    live = txlog.snapshot_dirs(spark, tdir)
    assert len(live) == 1, f"{len(live)} live dirs (want 1)"
    print(
        f"  txlog_exactly_once           MATCH  (1000 rows, 1 commit, "
        f"replay no-op v{v1})"
    )
    shutil.rmtree(os.path.dirname(tdir), ignore_errors=True)
except Exception as e:
    failed.append("txlog_exactly_once")
    print(f"  txlog_exactly_once           FAIL: {str(e)[:200]}")
ran += 1

# ------------------------------------------------------------- verdict
marks = os.listdir(MARKERS)
fails_injected = sum(1 for m in marks if m.startswith("fail_"))
spec_ran = sum(1 for m in marks if m.startswith("spec_"))
print(
    f"\n{ran} cells, {len(failed)} failed, "
    f"{boundary_queries} queries crossed a wrapped boundary, "
    f"{fails_injected} task failures injected, "
    f"{spec_ran} speculative attempts observed"
)
if FAULT == "failonce" and fails_injected == 0:
    print("WARNING: no failures injected — the shim never fired")
    failed.append("__no_injection__")
if FAULT == "speculate" and spec_ran == 0:
    # expected on one host: the scheduler cannot place a speculative
    # copy where an attempt is already running (see module docstring)
    print(
        "note: 0 speculative attempts executed — single-host scheduler "
        "bar (hasAttemptOnHost); copy semantics covered by failonce"
    )
print("ALL OK" if not failed else "FAILED: " + ", ".join(failed))
spark.stop()
sys.exit(1 if failed else 0)
