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


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_loaded = False


def _ensure_loaded() -> None:
    """Import all query modules exactly once to populate REGISTRY."""
    global _loaded
    if _loaded:
        return
    from . import queries  # noqa: F401  (module import side-effects register)

    _loaded = True
