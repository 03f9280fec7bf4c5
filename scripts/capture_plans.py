"""Capture `.explain("formatted")` for the bench set (HEADLINE + EXTRA)
into plans/<round>/<query>_<tag>.txt, plus a one-line structural
summary (Exchange count, join strategies, Python-boundary nodes) on
stdout.

Usage:
    python scripts/capture_plans.py before [--sf-dir DIR] [--round rNN]
                                    [name_substr ...]
    python scripts/capture_plans.py after  [--sf-dir DIR] [--round rNN]
                                    [name_substr ...]

The plan is the ANALYZED+optimized pre-execution physical plan (AQE
initial); the judge checks plan claims against these files, and the
structural counts (Exchange / join strategy / BatchEvalPython) are
stable pre-AQE.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTRA, HEADLINE  # noqa: E402
from dask_cudf_spark.registry import all_queries  # noqa: E402
from dask_cudf_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BHJ": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "SMJ": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "SHJ": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "BNLJ": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "Py": len(
            re.findall(
                r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
                r"FlatMapGroupsInPandas)\b",
                plan,
            )
        ),
        "Sort": len(re.findall(r"^\s*[+:-]*\s*\(?\d*\)?\s*Sort\b", plan, re.M)),
        "Scan": len(re.findall(r"Scan parquet", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    # argparse instead of the old '/'-presence heuristic (r15 ADVICE
    # item 4): a pattern containing '/' was silently misread as sf_dir
    # and a relative sf_dir as a pattern — explicit flags cannot.
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tag", nargs="?", default="before")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--round", default="r16", dest="round_dir")
    ap.add_argument("patterns", nargs="*", help="query-name substrings")
    args = ap.parse_args()
    tag, sf_dir, pats = args.tag, args.sf_dir, args.patterns
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    if pats:
        # patterns select from the WHOLE registry (bench set first)
        bench = [n for n in HEADLINE + EXTRA if any(p in n for p in pats)]
        rest = [
            n for n in sorted(qs)
            if n not in bench and any(p in n for p in pats)
        ]
        names = bench + rest
    else:
        names = list(HEADLINE + EXTRA)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"{name}: ERROR {e}")
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
