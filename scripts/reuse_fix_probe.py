import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

spark = get_spark(app_name="reuse_fix", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
order = [F.asc_nulls_last("l_extendedprice"), F.asc("l_orderkey"),
         F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("l_suppkey")]
cols = li.columns
ranged = li.repartitionByRange(*order).withColumn("__pid", F.spark_partition_id())
# pruning-defeating count: references every data column
counts = ranged.groupBy("__pid").agg(
    F.count(F.struct(*[F.col(c) for c in cols])).alias("__n"))
w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
offsets = counts.select("__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"))
w_local = Window.partitionBy("__pid").orderBy(*order)
joined = ranged.join(F.broadcast(offsets), "__pid").withColumn(
    "rk", (F.row_number().over(w_local) + F.col("__off")).cast("long"))
t0=time.perf_counter()
joined.agg(F.count(F.lit(1))).collect()
print("sec:", round(time.perf_counter()-t0,3))
plan = joined._jdf.queryExecution().executedPlan().toString()
final = plan.split("== Initial Plan ==")[0]
import re
print("rangepartitioning nodes:", len(re.findall(r"Exchange rangepartitioning", final)))
print("reuse markers:", len(re.findall(r"Reused|reused", final)))
for l in final.splitlines():
    if "Reused" in l or "rangepartitioning" in l: print(l.strip()[:130])
# integrity
r = joined.agg(F.count(F.lit(1)).alias("n"), F.countDistinct("rk").alias("nd"),
               F.min("rk").alias("mn"), F.max("rk").alias("mx")).collect()[0]
print("integrity:", r["n"], r["nd"], r["mn"], r["mx"])
