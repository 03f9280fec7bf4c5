import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

spark = get_spark(app_name="reuse_probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

# old _ranged_parts shape (no checkpoint) over lineitem
li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
order = [F.asc_nulls_last("l_extendedprice"), F.asc("l_orderkey"),
         F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("l_suppkey")]
ranged = li.repartitionByRange(*order).withColumn("__pid", F.spark_partition_id())
counts = ranged.groupBy("__pid").agg(F.count("*").alias("__n"))
w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
offsets = counts.select("__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"))
w_local = Window.partitionBy("__pid").orderBy(*order)
joined = ranged.join(F.broadcast(offsets), "__pid").withColumn(
    "rk", (F.row_number().over(w_local) + F.col("__off")).cast("long"))
joined.agg(F.count(F.lit(1))).collect()
plan = joined._jdf.queryExecution().executedPlan().toString()
final = plan.split("== Initial Plan ==")[0]
print("ReusedExchange in final plan:", "ReusedExchange" in final or "TableCacheQueryStage" in final or "reused" in final.lower())
import re
print("range exchanges:", len(re.findall(r"rangepartitioning", final)))
print([l.strip()[:100] for l in final.splitlines() if "Reused" in l or "rangepartitioning" in l.lower()][:6])
# also with AQE off
spark.conf.set("spark.sql.adaptive.enabled", "false")
joined2 = ranged.join(F.broadcast(offsets), "__pid").withColumn(
    "rk", (F.row_number().over(w_local) + F.col("__off")).cast("long"))
joined2.agg(F.count(F.lit(1))).collect()
plan2 = joined2._jdf.queryExecution().executedPlan().toString()
print("no-AQE ReusedExchange:", "ReusedExchange" in plan2)
spark.conf.set("spark.sql.adaptive.enabled", "true")
