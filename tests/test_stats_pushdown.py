"""Manifest-stats aggregate pushdown (sources/stats.py): exactness
vs a real scan, zero fragment IO, and the deletion-vector refusal
that keeps zone-map MIN/MAX honest."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest
from pyspark.sql import functions as F

from lance_duckdb_spark.sources import lance_format as lf
from lance_duckdb_spark.sources import stats as st
from lance_duckdb_spark.sources.datasource import register
from lance_duckdb_spark.tables import load


@pytest.fixture()
def orders_root(spark, sf_dir, tmp_path):
    register(spark)
    root = str(tmp_path / "orders.lance")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).repartition(4).write.format("lance").mode("overwrite").save(root)
    return root


def test_matches_real_scan(spark, sf_dir, orders_root):
    got = st.manifest_aggregates(
        spark, orders_root, ["o_custkey", "o_totalprice"]
    ).first()
    want = (
        load(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("mnc"),
            F.max("o_custkey").alias("mxc"),
            F.min("o_totalprice").alias("mnp"),
            F.max("o_totalprice").alias("mxp"),
        )
        .first()
    )
    assert got.total_rows == want.n
    assert got.min_o_custkey == want.mnc
    assert got.max_o_custkey == want.mxc
    assert got.min_o_totalprice == want.mnp  # exact doubles
    assert got.max_o_totalprice == want.mxp


def test_zero_fragment_io(spark, orders_root):
    """Deleting every data file must not matter — the aggregation
    reads only the manifest."""
    before = st.manifest_aggregates(
        spark, orders_root, ["o_totalprice"]
    ).first()
    data = os.path.join(orders_root, "data")
    for f in os.listdir(data):
        os.remove(os.path.join(data, f))
    after = st.manifest_aggregates(
        spark, orders_root, ["o_totalprice"]
    ).first()
    assert after == before


def test_deletion_vectors_refuse_minmax_but_count_stays_exact(
    spark, orders_root
):
    lf.delete_where(
        orders_root, pc.field("o_orderkey") < 100,
        use_deletion_vectors=True,
    )
    # min/max would be conservative bounds, not aggregates: refuse
    with pytest.raises(lf.LanceDatasetError, match="deletion"):
        st.manifest_aggregates(spark, orders_root, ["o_totalprice"])
    # count alone stays exact (manifest tracks num_deleted)
    got = st.manifest_aggregates(spark, orders_root, []).first()
    n = spark.read.format("lance").load(orders_root).count()
    assert got.total_rows == n


def test_unknown_column_raises(spark, orders_root):
    with pytest.raises(lf.LanceDatasetError, match="no column"):
        st.manifest_aggregates(spark, orders_root, ["nope"])


def test_unsupported_type_refuses_instead_of_null(spark, sf_dir, tmp_path):
    """A timestamp column never gets zone maps; MIN/MAX over it must
    refuse loudly, never return a silently-wrong NULL over populated
    data (review finding r5)."""
    root = str(tmp_path / "ev.lance")
    load(spark, sf_dir, "events").select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts")
    ).limit(200).write.format("lance").mode("overwrite").save(root)
    with pytest.raises(lf.LanceDatasetError, match="zone maps"):
        st.manifest_aggregates(spark, root, ["ts"])
    # the zone-mapped sibling still answers
    assert (
        st.manifest_aggregates(spark, root, ["event_id"]).first().total_rows
        == 200
    )
