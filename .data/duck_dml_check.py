import duckdb, sys
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["customer","orders"]:
    con.execute(f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')")

SCRIPTS = {
"lance_merge": [
 "CREATE OR REPLACE TABLE m_customer AS SELECT * FROM customer",
 """CREATE OR REPLACE TEMP TABLE m_src1 AS
    SELECT c_custkey, c_name, c_nationkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 1000.00 AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM m_customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM m_customer WHERE c_custkey % 13 = 5""",
 """UPDATE m_customer SET c_name=s.c_name, c_nationkey=s.c_nationkey,
      c_acctbal=s.c_acctbal, c_mktsegment=s.c_mktsegment
    FROM m_src1 s WHERE m_customer.c_custkey = s.c_custkey""",
 """INSERT INTO m_customer SELECT * FROM m_src1 s
    WHERE s.c_custkey NOT IN (SELECT c_custkey FROM m_customer)""",
 "DELETE FROM m_customer WHERE c_custkey % 11 = 3",
 "DELETE FROM m_customer WHERE c_custkey % 3 = 1",
 """SELECT c_mktsegment, COUNT(*) AS n_rows,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      COUNT(DISTINCT c_custkey) AS n_keys
    FROM m_customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
],
"lance_merge_conditional": [
 "CREATE OR REPLACE TABLE mc_customer AS SELECT * FROM customer",
 "DELETE FROM mc_customer WHERE c_custkey % 5 = 0 AND c_acctbal < 0",
 """UPDATE mc_customer SET
      c_acctbal = CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 50.00 AS DOUBLE),
      c_mktsegment = lower(c_mktsegment)
    WHERE c_custkey % 5 = 0""",
 """INSERT INTO mc_customer
    SELECT c_custkey + 20000000, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey % 17 = 2 AND c_nationkey < 13""",
 """SELECT c_mktsegment, COUNT(*) AS n_rows,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      COUNT(DISTINCT c_custkey) AS n_keys
    FROM mc_customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
],
"lance_sql_update": [
 "CREATE OR REPLACE TABLE u_customer AS SELECT * FROM customer",
 """UPDATE u_customer SET
      c_acctbal = CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100.00 AS DOUBLE),
      c_mktsegment = lower(c_mktsegment)
    WHERE c_nationkey % 5 = 2""",
 """SELECT c_mktsegment, COUNT(*) AS n_rows,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      COUNT(DISTINCT c_custkey) AS n_keys
    FROM u_customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
],
"lance_sql_delete": [
 "CREATE OR REPLACE TABLE d_orders AS SELECT * FROM orders",
 "DELETE FROM d_orders WHERE o_totalprice > 150000.0",
 "DELETE FROM d_orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0",
 """SELECT o_orderstatus, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM d_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
],
}

sys.path.insert(0, "/root/repo")
from lance_duckdb_spark.registry import ORACLE_REGISTRY
ok = True
for name, stmts in SCRIPTS.items():
    for s in stmts[:-1]:
        con.execute(s)
    got = con.execute(stmts[-1]).fetchall()
    want = con.execute(ORACLE_REGISTRY[name]).fetchall()
    match = got == want
    ok &= match
    print(name, "rows:", len(got), "EQUAL-TO-ORACLE:", match)
    if not match:
        print(" got:", got[:3]); print(" want:", want[:3])
print("ALL OK" if ok else "MISMATCH")
