import time, os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.driver.memory","48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lance_duckdb_spark.operators.lance_ops import register, load, _fresh_root
from lance_duckdb_spark.catalog import lance_sql
sf_dir = "/root/repo/.data/sf1"
register(spark)
t0=time.time()
root = _fresh_root(sf_dir, "merge_cond_prof")
load(spark, sf_dir, "customer").write.format("lance").mode("overwrite").save(root)
t1=time.time(); print("write target:", round(t1-t0,2), flush=True)
lance_sql(spark, f"""
MERGE INTO '{root}' t USING (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{root}' WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 20000000, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{root}' WHERE c_custkey % 17 = 2
) s ON t.c_custkey = s.c_custkey
WHEN MATCHED AND t.c_acctbal < 0 THEN DELETE
WHEN MATCHED THEN UPDATE SET
  c_acctbal = CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) + 50.00 AS DOUBLE),
  c_mktsegment = lower(t.c_mktsegment)
WHEN NOT MATCHED AND s.c_nationkey < 13 THEN INSERT *
""").collect()
t2=time.time(); print("MERGE stmt:", round(t2-t1,2), flush=True)
merged = spark.read.format("lance").load(root)
print("rows:", merged.count())
t3=time.time(); print("read+count:", round(t3-t2,2), flush=True)
