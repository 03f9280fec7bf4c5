import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window, functions as F
from dask_cudf_spark.session import get_spark
from dask_cudf_spark.sources.tables import load_table

spark = get_spark(app_name="hazard_probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
order = [F.asc_nulls_last("l_extendedprice"), F.asc("l_orderkey"),
         F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("l_suppkey")]
for it in range(6):
    ranged = li.repartitionByRange(*order).withColumn("__pid", F.spark_partition_id())
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select("__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"))
    w_local = Window.partitionBy("__pid").orderBy(*order)
    joined = ranged.join(F.broadcast(offsets), "__pid").withColumn(
        "rk", (F.row_number().over(w_local) + F.col("__off")).cast("long"))
    r = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rk").alias("nd"),
        F.min("rk").alias("mn"),
        F.max("rk").alias("mx"),
    ).collect()[0]
    ok = r["n"] == r["nd"] == r["mx"] and r["mn"] == 1
    print(f"it{it}: n={r['n']} distinct={r['nd']} min={r['mn']} max={r['mx']} {'OK' if ok else '*** CORRUPT ***'}", flush=True)
