import time, sys, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.driver.memory","48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/repo/.data/sf1"
from lance_duckdb_spark.streaming.jobs import _fresh_stream_root, _cuts, load
from lance_duckdb_spark.operators.fts import build_fts_index
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.catalog import _native_live_df
register(spark)
dst = _fresh_stream_root(sf_dir, "ftsab_dst")
docs = load(spark, sf_dir, "documents").select("doc_id","source","text")
lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
cuts = _cuts(lo, hi)
docs.where((F.col("doc_id")>=cuts[0])&(F.col("doc_id")<cuts[1])).write.format("lance").mode("overwrite").save(dst)
flt = (F.col("doc_id")>=cuts[0])&(F.col("doc_id")<cuts[1])
# warm both
for label, mk in [("native", lambda: _native_live_df(spark,dst).where(flt)),
                  ("pythonDS", lambda: spark.read.format("lance").load(dst).where(flt))]:
    for rep in range(2):
        t0=time.time()
        shutil.rmtree(dst+f".idx_{label}_{rep}", ignore_errors=True)
        build_fts_index(spark, mk(), dst+f".idx_{label}_{rep}")
        print(label, rep, round(time.time()-t0,2), flush=True)
