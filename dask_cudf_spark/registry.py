"""Query registry: the single source of truth wiring operator-family
queries (SURVEY.md §2 [Qn] tags) to their DuckDB oracle SQL.

`__spark_entry__.py` re-exports this registry as `queries()` /
`oracle_sql()`; `tests/test_oracle.py` replays the driver's comparison
locally at sf0.001 for fast feedback.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    family: str
    doc: str = ""
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    family: str = "",
    tags: list[str] | None = None,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            family=family,
            doc=(fn.__doc__ or "").strip(),
            tags=tags or [],
        )
        return fn

    return deco


def ordered_specs() -> list[QuerySpec]:
    """Registry in driver-facing order: round-robin across families so a
    prefix of ANY length covers the widest possible family spread, with
    oracle-backed queries first within each family and all oracle-less
    (rows-only) queries pushed to the very end.

    Rationale: the verification driver scores only the FIRST 50 entries
    of ``queries()`` in insertion order; depth-first module order left
    whole families (windows, sorts, text, ...) without a correctness
    row, and burned scored slots on rows-only queries.  With 17
    families, positions 1-50 now hold ~3 oracle-backed queries of every
    family.

    Within a family, queries tagged ``'flagship'`` sort ahead of their
    siblings (round-3 VERDICT item 7): the repo's hardest
    differentiators — full-cluster minhash dedup, trained-vocab BPE,
    the six-way TPC-H Q5 join — must sit INSIDE the driver's scored
    window, not be displaced by simpler same-family queries that
    happened to register earlier."""
    _ensure_loaded()
    by_family: dict[str, list[QuerySpec]] = {}
    for spec in REGISTRY.values():
        by_family.setdefault(spec.family, []).append(spec)
    for specs in by_family.values():
        # stable: oracle-backed before rows-only, flagships first
        specs.sort(key=lambda s: (s.oracle is None, "flagship" not in s.tags))
    interleaved: list[QuerySpec] = []
    queues = list(by_family.values())
    while queues:
        remaining: list[list[QuerySpec]] = []
        for queue in queues:
            interleaved.append(queue.pop(0))
            if queue:
                remaining.append(queue)
        queues = remaining
    with_oracle = [s for s in interleaved if s.oracle is not None]
    rows_only = [s for s in interleaved if s.oracle is None]
    return _rotate_window(with_oracle) + rows_only


# Per-round window rotation (r4 VERDICT item 4, continued each round):
# the driver scores only the first 50 entries, so each round we cede
# long-green slots to heavy never-driver-scored queries — growing the
# union of ever-driver-scored names.  Each (rotate_in, rotate_out) pair
# is applied in sequence, so a name promoted in round N naturally drops
# back out in round N+1 once it has its driver-green row.  Lists in a
# pair must stay the same length; the pinned-window test
# (tests/test_oracle.py) locks the resulting first-50.
_ROTATIONS: list[tuple[list[str], list[str]]] = [
    (
        # round 5 (r4 VERDICT item 4)
        [
            "q_bm25_topk",
            "q_nearest_centroid_classify",
            "q_pmi_collocations",
            "q_ngram_span_dedup",
            "q_tpch_q21",
            "q_retention_cohort",
        ],
        # q_project_arith / q_filter_pred stay: they are their families'
        # only window representatives and the every-family invariant
        # (tests/test_oracle.py) outranks rotating two more green slots.
        [
            "q_when_clip",
            "q_sql_query",
            "q_combine_first",
            "q_dropna_fillna",
            "q_scalar_pack_date",
            "q_scalar_pack_math",
        ],
    ),
    (
        # round 6 (r5 VERDICT item 1): the heaviest never-driver-scored
        # queries enter; six long-green r5 residents (incl. the r5
        # promotions, now driver-scored) cede their slots.
        [
            "q_pagerank_items",
            "q_ppjoin_neardup",
            "q_bloom_decontaminate",
            "q_hll_merge",
            "q_mrl_recall",
            "q_als_user_step",
        ],
        # q_scalar_pack_str stays (sole scalar-family window rep —
        # the every-family invariant outranks rotating it); q_explode
        # cedes instead (q_explode_udtf keeps the udtf family green).
        [
            "q_explode",
            "q_json_extract",
            "q_union_all",
            "q_head_sorted",
            "q_intersect",
            "q_groupby_mean",
        ],
    ),
]
_WINDOW = 50


def _rotate_window(specs: list[QuerySpec]) -> list[QuerySpec]:
    """Apply each round's (rotate_in, rotate_out) swap in sequence:
    rotated-out specs land immediately after the window, rotated-in
    specs fill the vacated tail of the window in rotate_in order.
    Every entry is preserved exactly once."""
    for rotate_in, rotate_out in _ROTATIONS:
        inset, outset = set(rotate_in), set(rotate_out)
        by_name = {s.name: s for s in specs}
        head = [s for s in specs[:_WINDOW] if s.name not in outset | inset]
        promoted = [by_name[n] for n in rotate_in if n in by_name]
        demoted = [by_name[n] for n in rotate_out if n in by_name]
        tail = [s for s in specs[_WINDOW:] if s.name not in inset]
        specs = head + promoted + demoted + tail
    return specs


def all_queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in ordered_specs()}


def all_oracles() -> dict[str, str]:
    return {
        spec.name: spec.oracle for spec in ordered_specs() if spec.oracle is not None
    }


_loaded = False


def _ensure_loaded() -> None:
    """Import all query modules exactly once to populate REGISTRY."""
    global _loaded
    if _loaded:
        return
    from . import queries  # noqa: F401  (module import side-effects register)

    _loaded = True
