"""Debug one registered query vs its oracle: python scripts/debug_query.py q_name [sf_dir]"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from dask_cudf_spark.registry import REGISTRY, _ensure_loaded
from dask_cudf_spark.session import get_spark
from tests.conftest import TABLES
from tests.oracle_compare import assert_frames_match

_ensure_loaded()

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
spec = REGISTRY[name]

spark = get_spark(app_name="debug", master="local[8]", shuffle_partitions=8)
sdf = spec.fn(spark, sf)
spdf = sdf.toPandas()
print("SPARK schema:", sdf.schema.simpleString())
print(spdf.head(5).to_string())

if spec.oracle:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    ddf = con.execute(spec.oracle).fetchdf()
    print("\nDUCK dtypes:", dict(ddf.dtypes.astype(str)))
    print(ddf.head(5).to_string())
    try:
        assert_frames_match(spdf, ddf, name)
        print("\nMATCH OK", len(spdf), "rows")
    except AssertionError as e:
        print("\nMISMATCH:", str(e)[:3000])
else:
    print("rows-only; count =", len(spdf))
