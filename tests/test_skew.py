"""Skew helpers must produce results identical to the unsalted
plans (SURVEY.md §6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_duckdb_spark.operators.skew import replicate_salted_join, salted_agg
from lance_duckdb_spark.tables import load


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.n, round(r.qty, 2))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n, round(r.qty, 2))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            lambda: [
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pqty"),
            ],
            lambda: [
                F.sum("pn").alias("n"),
                F.sum("pqty").cast("double").alias("qty"),
            ],
            salt_col="l_orderkey",
        ).collect()
    }
    assert salted == plain


def test_replicate_salted_join_equals_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = {
        (r.o_orderkey, r.c_name)
        for r in orders.join(cust, "o_custkey").select("o_orderkey", "c_name").collect()
    }
    salted = {
        (r.o_orderkey, r.c_name)
        for r in replicate_salted_join(
            orders, cust, key="o_custkey", big_unique_col="o_orderkey"
        )
        .select("o_orderkey", "c_name")
        .collect()
    }
    assert salted == plain
