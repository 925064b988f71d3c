import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.driver.memory","16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from lance_duckdb_spark.streaming.jobs import _fresh_stream_root, _cuts, load
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.catalog import _native_live_df
register(spark)
import glob, os
# reuse the dst written by the A/B script
cands = sorted(glob.glob("/root/repo/.data/sf1/*ftsab_dst*") + glob.glob("/tmp/*ftsab_dst*"))
print(cands[:3])
dst = cands[0]
n = _native_live_df(spark, dst)
print("native partitions:", n.rdd.getNumPartitions())
p = spark.read.format("lance").load(dst)
print("pythonDS partitions:", p.rdd.getNumPartitions())
import subprocess
print(subprocess.run(["du","-sh",dst],capture_output=True,text=True).stdout)
print("files:", os.listdir(os.path.join(dst,"data"))[:5])
