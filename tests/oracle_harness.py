"""Local replica of the driver's DuckDB differential harness.

Runs a registered Spark query and its oracle SQL on the same parquet
tables and compares row count, schema shape, and order-insensitive
values — stricter than a hash compare (reports the first differing
cell), so anything passing here should hash-match in the driver.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

from amante_s_supabase_full_cloud_etl_pipeline_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare(spark, sf_dir: str, query_fn, oracle: str) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _canon(spark_rows, spark_cols)
    d = _canon(duck_rows, duck_cols)
    cols_sorted = sorted(spark_cols)
    for i, (sr, dr) in enumerate(zip(s, d)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if sv != dv:
                raise AssertionError(
                    f"value mismatch row {i} col {cols_sorted[c]!r}: "
                    f"spark={sv!r} duck={dv!r}\nspark row: {sr}\nduck row: {dr}"
                )
