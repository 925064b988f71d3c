import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lance_duckdb_spark.operators.lance_ops import register, load, _fresh_root
from lance_duckdb_spark.catalog import lance_sql
sf_dir = "/root/testdata/sf0.1"
register(spark)
# warm the session
load(spark, sf_dir, "customer").count()
T=time.time()
def lap(m):
    global T
    t=time.time(); print(f"LAP {m}: {t-T:.2f}", flush=True); T=t
root = _fresh_root(sf_dir, "merge_prof01")
load(spark, sf_dir, "customer").write.format("lance").mode("overwrite").save(root)
lap("fixture write")
lance_sql(spark, f"""
MERGE INTO '{root}' t USING (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 1000.00 AS DOUBLE) AS c_acctbal,
         c_mktsegment
  FROM '{root}' WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{root}' WHERE c_custkey % 13 = 5
) s ON t.c_custkey = s.c_custkey
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
""").collect()
lap("stmt1 upsert")
lance_sql(spark, f"""
MERGE INTO '{root}' t USING (
  SELECT c_custkey FROM '{root}' WHERE c_custkey % 11 = 3
) s ON t.c_custkey = s.c_custkey
WHEN MATCHED THEN DELETE
""").collect()
lap("stmt2 delete")
lance_sql(spark, f"""
MERGE INTO '{root}' t USING (
  SELECT c_custkey FROM '{root}' WHERE c_custkey % 3 <> 1
) s ON t.c_custkey = s.c_custkey
WHEN NOT MATCHED BY SOURCE THEN DELETE
""").collect()
lap("stmt3 sync")
r = spark.read.format("lance").load(root).groupBy("c_mktsegment").count().collect()
lap("final agg")
