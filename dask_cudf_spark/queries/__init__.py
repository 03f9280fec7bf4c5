"""Query modules — importing this package populates registry.REGISTRY.

One module per operator family from SURVEY.md §2; every query has a
[Qn] tag there and (where SQL-expressible) a DuckDB oracle.
"""

from . import (  # noqa: F401
    aggregates,
    joins,
    multimodal,
    relational,
    semistructured,
    setops,
    similarity,
    sorts,
    streaming,
    text,
    tpch,
    windows,
)
