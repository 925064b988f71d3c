import importlib.util, sys
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
print("entry rows:", len(mod.entry(spark).collect()), flush=True)
import duckdb, datetime, math
con = duckdb.connect(); sf = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")
def canon(v):
    if isinstance(v, float) and math.isnan(v): return "NaN"
    if isinstance(v, (datetime.date, datetime.datetime)): return str(v)
    return v
qs, osql = mod.queries(), mod.oracle_sql()
names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(qs)
bad = []
for name in names:
    try:
        sdf = qs[name](spark, sf).toPandas()
        if name not in osql:
            print(name, "rows-only:", len(sdf), flush=True); continue
        edf = con.execute(osql[name]).fetch_arrow_table().to_pandas(date_as_object=True)
        cols = sorted(sdf.columns)
        a = sorted([tuple(canon(v) for v in r) for r in sdf[cols].itertuples(index=False, name=None)], key=repr)
        b = sorted([tuple(canon(v) for v in r) for r in edf[sorted(edf.columns)].itertuples(index=False, name=None)], key=repr)
        ok = cols == sorted(edf.columns) and a == b
        print(name, "rows:", len(a), "EXACT:", ok, flush=True)
        if not ok: bad.append(name)
    except Exception as e:
        print(name, "ERROR:", str(e)[:300], flush=True); bad.append(name)
print("BAD:", bad, flush=True)
spark.stop()
