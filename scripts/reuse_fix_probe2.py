import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

spark = get_spark(app_name="reuse_fix2", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
order = [F.asc_nulls_last("l_extendedprice"), F.asc("l_orderkey")]
cols = li.columns
ranged = li.repartitionByRange(*order).withColumn("__pid", F.spark_partition_id())
counts = ranged.groupBy("__pid").agg(F.count(F.struct(*[F.col(c) for c in cols])).alias("__n"))
joined = ranged.join(F.broadcast(counts), "__pid")
# optimized logical plan shows whether the duplicate subtrees survive to physical planning
print(joined._jdf.queryExecution().optimizedPlan().toString()[:4000])
