import time, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lance_duckdb_spark.operators.lance_ops import lance_merge, lance_sql_delete, lance_sql_update, lance_merge_conditional
sf = "/root/testdata/sf0.1"
for fn in (lance_merge, lance_sql_delete, lance_sql_update, lance_merge_conditional):
    for rep in range(2):
        t0=time.time(); fn(spark, sf).collect()
        print(f"W {fn.__name__} {rep}: {time.time()-t0:.2f}", flush=True)
