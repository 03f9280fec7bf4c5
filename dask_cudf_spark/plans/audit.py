"""Physical-plan audit: the 100TB-scale invariants as checkable facts.

The reference exposes its plan as a dask expression tree / task graph;
Spark's equivalent introspection surface is the explain output of the
analyzed + optimized + physical plan. This module parses the formatted
plan into a structured audit so engine code and tests can assert the
properties that matter at scale — pushdown reached the scan, small dims
broadcast, nothing fell out of codegen into Python, no accidental
cartesian — instead of eyeballing explain() text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanAudit:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    n_broadcast_hash_joins: int = 0
    n_sort_merge_joins: int = 0
    n_shuffled_hash_joins: int = 0
    n_nested_loop_joins: int = 0
    n_cartesian: int = 0
    n_hash_aggregates: int = 0
    python_nodes: list[str] = field(default_factory=list)
    has_take_ordered: bool = False
    n_wholestage_codegen: int = 0
    text: str = ""

    @property
    def n_shuffles(self) -> int:
        """Data-moving exchanges (broadcast exchanges excluded).

        ``n_exchanges`` already counts only plain ``(n) Exchange`` nodes
        (the regex cannot match ``(n) BroadcastExchange``), so it IS the
        shuffle count; subtracting broadcasts again went negative on
        broadcast-heavy plans and silently weakened every <= budget
        assertion."""
        return self.n_exchanges


_PYTHON_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "MapInArrow",
    "AggregateInPandas",
)


def audit(df: DataFrame) -> PlanAudit:
    p = explain_str(df, "formatted")
    a = PlanAudit(text=p)
    a.pushed_filters = [
        m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", p) if m.strip()
    ]
    a.read_schemas = re.findall(r"ReadSchema: (\S+)", p)
    a.n_exchanges = len(re.findall(r"\bExchange\b|\b\d+\) Exchange\b", p)) or p.count(
        " Exchange"
    )
    # formatted mode lists node names like "(4) Exchange"
    a.n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    a.n_broadcast_exchanges = len(re.findall(r"\(\d+\) BroadcastExchange", p))
    a.n_broadcast_hash_joins = p.count("BroadcastHashJoin")
    a.n_sort_merge_joins = p.count("SortMergeJoin")
    a.n_shuffled_hash_joins = p.count("ShuffledHashJoin")
    a.n_nested_loop_joins = p.count("BroadcastNestedLoopJoin")
    a.n_cartesian = p.count("CartesianProduct")
    a.n_hash_aggregates = p.count("HashAggregate")
    a.python_nodes = [n for n in _PYTHON_NODES if n in p]
    a.has_take_ordered = "TakeOrderedAndProject" in p
    a.n_wholestage_codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", p)))
    if not a.n_wholestage_codegen:
        a.n_wholestage_codegen = explain_str(df, "simple").count("*(")
    return a


_TREE_LINE = re.compile(
    r"^([ :+\-*]*)([A-Za-z][A-Za-z0-9_ ]*?) \((\d+)\)\s*$"
)
#: physical nodes with more than one child: descending a straight input
#: chain stops here (the window's partitioning then comes from the
#: operator's own distribution, not an exchange above it)
_MULTI_CHILD = (
    "Join", "Union", "CartesianProduct", "CoGroup",
)


def single_partition_window_feeds(df: DataFrame) -> list[str]:
    """Names+ids of ``Window`` nodes whose input chain is repartitioned
    to a SINGLE partition (``Exchange SinglePartition`` directly on the
    window's unary input chain) — the plan shape that serializes ALL
    rows through one task and dies at 100 TB unless the input is
    provably bounded (e.g. an aggregate over a fixed-cardinality key).

    Walks the formatted-plan tree: for each Window node, descend
    through unary nodes (Sort/Project/Filter/...) to the first
    Exchange and report the window if that exchange's detail block
    says ``SinglePartition``.  Descent stops at multi-child nodes
    (joins/unions): there the window's distribution is satisfied by
    the child operator itself, not an inserted exchange."""
    p = explain_str(df, "formatted")
    nodes: list[tuple[int, str, int]] = []  # (depth, name, id)
    for ln in p.splitlines():
        if re.match(r"^\(\d+\) ", ln):
            break  # details section
        m = _TREE_LINE.match(ln)
        if m:
            prefix, name, nid = m.groups()
            nodes.append((len(prefix), name.strip(), int(nid)))
    # detail block per node id: "(n) NodeName" .. blank line
    sp_exchanges: set[int] = set()
    for blk in re.split(r"\n\s*\n", p):
        first = blk.strip().splitlines()[0] if blk.strip() else ""
        m = re.match(r"^\((\d+)\) Exchange\b", first)
        if m and "SinglePartition" in blk:
            sp_exchanges.add(int(m.group(1)))
    flagged: list[str] = []
    for i, (depth, name, nid) in enumerate(nodes):
        if name != "Window":
            continue
        cur_depth = depth
        for d2, n2, id2 in nodes[i + 1 :]:
            if d2 <= cur_depth:
                break  # left the subtree without finding an exchange
            cur_depth = d2
            if n2.startswith("Exchange"):
                if id2 in sp_exchanges:
                    flagged.append(f"Window({nid})<-Exchange({id2})")
                break
            if any(k in n2 for k in _MULTI_CHILD):
                break
    return flagged


def assert_scalable(
    df: DataFrame,
    max_shuffles: int | None = None,
    forbid_python: bool = False,
    forbid_cartesian: bool = True,
    require_pushed_filter: str | None = None,
    require_broadcast_join: bool = False,
) -> PlanAudit:
    """Assert the plan properties that must survive a 100x scale-up;
    returns the audit for further checks. Raises AssertionError with the
    offending plan attached."""
    a = audit(df)
    problems = []
    if max_shuffles is not None and a.n_shuffles > max_shuffles:
        problems.append(f"{a.n_shuffles} shuffles > allowed {max_shuffles}")
    if forbid_python and a.python_nodes:
        problems.append(f"Python boundary in plan: {a.python_nodes}")
    if forbid_cartesian and a.n_cartesian:
        problems.append("CartesianProduct in plan")
    if require_pushed_filter and not any(
        require_pushed_filter in f for f in a.pushed_filters
    ):
        problems.append(
            f"no pushed filter mentioning {require_pushed_filter!r}; "
            f"pushed={a.pushed_filters}"
        )
    if require_broadcast_join and not a.n_broadcast_hash_joins:
        problems.append("expected a BroadcastHashJoin")
    if problems:
        raise AssertionError("; ".join(problems) + "\n--- plan ---\n" + a.text)
    return a
