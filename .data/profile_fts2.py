import time, os, sys, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.driver.memory","48g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/repo/.data/sf1"
from lance_duckdb_spark.streaming.jobs import _fresh_stream_root, _cuts, _await_or_raise, load
from lance_duckdb_spark.operators.fts import QUERY_TERMS, _read_fts_meta, build_fts_index, extend_fts_index, search_bm25
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.catalog import _native_live_df
register(spark)
T=time.time()
def lap(msg):
    global T
    t=time.time(); print(f"PH {msg}: {t-T:.2f}", flush=True); T=t
src = _fresh_stream_root(sf_dir, "ftsprof2_src")
dst = _fresh_stream_root(sf_dir, "ftsprof2_dst")
index_dir = dst + ".ftsidx"
shutil.rmtree(index_dir, ignore_errors=True)
docs = load(spark, sf_dir, "documents").select("doc_id","source","text")
lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
cuts = _cuts(lo, hi)
lap("setup+bounds")
docs.where((F.col("doc_id")>=cuts[0])&(F.col("doc_id")<cuts[1])).write.format("lance").mode("overwrite").save(dst)
lap("bulk write")
build_fts_index(spark, _native_live_df(spark,dst).where((F.col("doc_id")>=cuts[0])&(F.col("doc_id")<cuts[1])), index_dir)
lap("bulk index build")
part = docs.where((F.col("doc_id")>=cuts[1])&(F.col("doc_id")<cuts[3]))
part.write.format("lance").mode("overwrite").save(src)
lap("part write src")
q = (spark.readStream.format("lance").load(src)
     .writeStream.format("lance")
     .option("checkpointLocation", dst+".ckpt")
     .option("txnappid","fts_ingest").trigger(availableNow=True).start(dst))
_await_or_raise(q)
lap("stream pass")
extend_fts_index(spark, index_dir, _native_live_df(spark,dst).where((F.col("doc_id")>=cuts[1])&(F.col("doc_id")<cuts[3])))
lap("extend index")
r = search_bm25(spark, index_dir, list(QUERY_TERMS)).collect()
lap("search")
print("rows:", len(r))
