"""TPC-H-shaped queries, second wave (SURVEY.md §2.B27-B30):
distinct plan shapes not covered by tpch.py — nation-pair volume
(q7), left-join count distribution (q13), disjunctive bracket
predicates (q19), scalar-subquery + anti-join (q22). Adapted to the
driver schema (no shipmode/commitdate/phone columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .common import SQL_REV, dsum, dsum2, money, rate, revenue_dec


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume between nation pairs: supplier nation → customer
    nation revenue by year."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1999-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum2(revenue_dec(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INTEGER) AS l_year,
    {SQL_REV} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1999-01-01'
    AND n1.n_name != n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (left join keeps the
    zero-order customers)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


TPCH_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive bracket predicates (brand × quantity ranges) —
    the OR-of-ANDs shape that stresses predicate pushdown."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11) & (F.col("p_size") <= 15))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20) & (F.col("p_size") <= 25))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30) & (F.col("p_size") <= 15))
    )
    return j.where(cond).agg(
        dsum2(revenue_dec(), "revenue"), F.count(F.lit(1)).alias("n_items")
    )


TPCH_Q19_SQL = f"""
SELECT CAST(ROUND(SUM({SQL_REV}), 2) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity >= 1 AND l_quantity <= 11 AND p_size <= 15)
   OR (p_brand = 'Brand#2' AND l_quantity >= 10 AND l_quantity <= 20 AND p_size <= 25)
   OR (p_brand = 'Brand#3' AND l_quantity >= 20 AND l_quantity <= 30 AND p_size <= 15)
"""


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers with no recent orders: scalar-subquery
    average + anti-join (the global-aggregate-as-filter shape)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("2001-01-01")
    )
    # decimal-sum / count: bit-identical threshold in both engines
    # (plain double avg is summation-order-dependent; common.py)
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


TPCH_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = {
    "tpch_q7": tpch_q7,
    "tpch_q13": tpch_q13,
    "tpch_q19": tpch_q19,
    "tpch_q22": tpch_q22,
}

ORACLE = {
    "tpch_q7": TPCH_Q7_SQL,
    "tpch_q13": TPCH_Q13_SQL,
    "tpch_q19": TPCH_Q19_SQL,
    "tpch_q22": TPCH_Q22_SQL,
}
