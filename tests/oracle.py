"""DuckDB-oracle comparison used by the fast local correctness loop.

Mirrors the driver's check: run the Spark query and the oracle SQL
on the same parquet, compare row count, column names, and values
(column-name-sorted, order-insensitive, exact for non-floats and
tight-tolerance for floats — the production discipline in
operators/common.py makes floats bit-identical; the tolerance here
only guards the comparison itself).
"""

from __future__ import annotations

import math

import duckdb

from lance_duckdb_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (int, str, bool)):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def _rows(df_pdf):
    cols = sorted(df_pdf.columns)
    out = []
    for t in df_pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in t))
    return cols, sorted(out, key=repr)


def _approx_eq(a, b) -> bool:
    # EXACT equality, including floats: the driver hash-compares, so
    # any ulp drift that tolerance would forgive will fail the real
    # gate. operators/common.py's decimal discipline makes exact
    # equality achievable.
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = spark_df.toPandas()
    # Arrow fetch preserves DATE vs TIMESTAMP (fetchdf folds both
    # into datetime64); row dicts then hold datetime.date objects
    # exactly like Spark's toPandas for DateType.
    exp = con.execute(sql).fetch_arrow_table().to_pandas(
        date_as_object=True, types_mapper=None
    )
    gcols, grows = _rows(got)
    ecols, erows = _rows(exp)
    assert gcols == ecols, f"{name}: columns {gcols} != oracle {ecols}"
    assert len(grows) == len(erows), (
        f"{name}: {len(grows)} rows != oracle {len(erows)}"
    )
    assert len(grows) > 0, f"{name}: empty result (weak test)"
    bad = [
        (g, e)
        for g, e in zip(grows, erows)
        if not _approx_eq(g, e)
    ]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first: {bad[0]}"
