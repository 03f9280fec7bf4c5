"""Task-fault injection shims shared by scripts/fault_fuzz.py and the
streaming fault cells (r14): monkeypatch every Python-boundary API with
arity-preserving wrappers that raise a transient error on task attempt
0 (``failonce``) or sleep on partition 0 (``slow``).

Must be installed BEFORE the engine imports (call ``install`` first
thing); wrappers live in this importable module so cloudpickle can ship
them by reference or value from either caller.  PySpark validates UDF
arity via getfullargspec (which ignores __wrapped__), so wrappers
declare the exact positional arity of the function they shadow.

The session must allow task retries: ``local[N,3]`` (the second
bracket arg; spark.task.maxFailures is IGNORED under local[] masters).
"""

from __future__ import annotations

import functools
import inspect


def _fail_once_gate(markers: str):
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
                "fault_shims: injected transient failure (task attempt 0)"
            )

    return gate


def _slow_gate(markers: str, sleep_s: float):
    def gate():
        import os as _os
        import time as _time

        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            if ctx.attemptNumber() > 0:
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


def _wrap(fn, gate):
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


def install(mode: str, markers: str, sleep_s: float = 2.5) -> dict:
    """Monkeypatch the six Python-boundary APIs.  Returns a counter
    dict ({'n': wrapped-boundary count}) for coverage assertions."""
    import pyspark.sql.functions as Fmod
    import pyspark.sql.pandas.functions as pf_mod
    from pyspark.sql import DataFrame
    from pyspark.sql.group import GroupedData
    from pyspark.sql.pandas.group_ops import PandasCogroupedOps

    gate = (
        _fail_once_gate(markers)
        if mode == "failonce"
        else _slow_gate(markers, sleep_s)
    )
    counter = {"n": 0}
    orig = {
        "mapInPandas": DataFrame.mapInPandas,
        "mapInArrow": DataFrame.mapInArrow,
        "applyInPandas": GroupedData.applyInPandas,
        "applyInPandasWithState": GroupedData.applyInPandasWithState,
        "cogroup_applyInPandas": PandasCogroupedOps.applyInPandas,
        "pandas_udf": pf_mod.pandas_udf,
    }

    def patch_method(cls, name, o):
        def patched(self, func, *a, **k):
            counter["n"] += 1
            return o(self, _wrap(func, gate), *a, **k)

        setattr(cls, name, patched)

    patch_method(DataFrame, "mapInPandas", orig["mapInPandas"])
    patch_method(DataFrame, "mapInArrow", orig["mapInArrow"])
    patch_method(GroupedData, "applyInPandas", orig["applyInPandas"])
    patch_method(
        GroupedData, "applyInPandasWithState", orig["applyInPandasWithState"]
    )
    patch_method(
        PandasCogroupedOps, "applyInPandas", orig["cogroup_applyInPandas"]
    )

    def patched_pandas_udf(f=None, returnType=None, functionType=None):
        if f is not None and callable(f):
            counter["n"] += 1
            return orig["pandas_udf"](_wrap(f, gate), returnType, functionType)
        deco = orig["pandas_udf"](f, returnType, functionType)

        def wrapper(fn):
            counter["n"] += 1
            return deco(_wrap(fn, gate))

        return wrapper

    pf_mod.pandas_udf = patched_pandas_udf
    Fmod.pandas_udf = patched_pandas_udf
    return counter
