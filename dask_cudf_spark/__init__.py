"""dask_cudf_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of rapidsai/dask-cudf (SURVEY.md).

Spark-first design: the reference's distributed-DataFrame model
(partitioned cuDF frames + dask task graph) maps onto Spark DataFrames
+ Catalyst; operators the reference lacks as built-ins (as-of join,
minhash LSH dedup, ANN search) are compositions of DataFrame ops in
`operators/`.  See registry.REGISTRY for the full oracle-checked
operator inventory.
"""

from .frame import (
    Col,
    Frame,
    concat,
    from_dict,
    from_pandas,
    from_spark,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
from .registry import REGISTRY, all_oracles, all_queries, register
from .session import get_spark
from .sources import load_table, load_tables

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "register",
    "REGISTRY",
    "all_queries",
    "all_oracles",
    "Frame",
    "Col",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_text",
    "from_pandas",
    "from_dict",
    "from_spark",
    "concat",
]
