"""Local replica of the driver's DuckDB differential harness.

Runs a registered Spark query and its oracle SQL on the same parquet
tables and compares row count, schema shape, and order-insensitive
values — stricter than a hash compare (reports the first differing
cell), so anything passing here should hash-match in the driver.

Two hardening layers exist because the driver hashes the *pandas*
materialization of both sides, which this harness cannot observe
directly:

1. ``audit_hash_hazards`` inspects the Spark output for NULL/NaN in
   numeric columns and DecimalType columns (driver normalization of
   those is outside our control), and — since round 4 — inspects the
   ORACLE result types via ``duckdb.sql(...).types`` for
   HUGEINT/UHUGEINT/DECIMAL columns. DuckDB's ``SUM(...) [OVER]`` over
   BIGINT yields HUGEINT, which ``fetchall()`` returns as plain int
   (so a value-level differential can never see it) but pandas
   materializes as float64 (``1148.0`` vs Spark's ``1148``) — exactly
   the CORRECTNESS_r02/r03 ``pack_sequence_chunks`` red row.

2. ``_canon`` is type-strict for numerics: ints, floats and bools are
   tagged with their type class so ``5.0`` no longer equals ``5`` in
   the local differential (Python's ``5.0 == 5`` is True, which let
   int-vs-float divergence hide in rounds 2-3).
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
    # Type-tag numerics so int-vs-float divergence is a FAILURE here,
    # not something Python's cross-type == silently forgives. Decimal
    # folds into the float class (a DECIMAL oracle column is only
    # legal when allowlisted, and then both sides materialize float).
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", v)
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


# Queries allowed to return NULL / NaN in a numeric column, or a
# DECIMAL column, in their OUTPUT. The driver's hash normalization of
# these values is outside our control (round 2's only red row was a
# NULL-in-BIGINT hash divergence on `pack_sequence_chunks` that no
# local differential could reproduce), so the registry contract is:
# numeric outputs are non-null, non-NaN, and never DECIMAL unless the
# query is listed here with a reason.
NULL_NUMERIC_OK: dict = {
    # Both were hash-green in CORRECTNESS_r02 WITH these NULLs, so the
    # driver's normalization of them is proven; leaving the semantics
    # (a LAG before the first row / an as-of miss IS null, not a
    # sentinel) is lower-risk than perturbing a green row.
    "window_customer_order_seq": "LAG(prev_price) null on first row; r02 hash-green",
    "events_asof_directions": (
        "as-of miss emits null match columns — the r02 hash-green "
        "events_asof_join shape (timestamp/double NULLs), now with a "
        "forward-direction leg of the identical shape"
    ),
}
NAN_OK: dict = {}
DECIMAL_OK: dict = {}
# Oracle result columns allowed to be HUGEINT/UHUGEINT/DECIMAL on the
# DuckDB side. Empty on purpose: pandas materializes these as float64
# while Spark emits int64, which diverges under the driver's value
# hash. CAST the oracle expression instead of allowlisting.
ORACLE_WIDE_OK: dict = {}

_HAZARD_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def audit_oracle_types(con, oracle: str, name: str = "?") -> None:
    """Fail if the oracle SQL's result schema contains a type that
    pandas materializes differently than its fetchall() value —
    HUGEINT/UHUGEINT (→ float64) and DECIMAL (→ object/float). These
    are invisible to a fetchall-based differential but break the
    driver's pandas-side hash."""
    rel = con.sql(oracle)
    for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
        if any(typ.startswith(h) for h in _HAZARD_DUCK_TYPES):
            if name in ORACLE_WIDE_OK:
                continue
            raise AssertionError(
                f"{name}: oracle column {col!r} has DuckDB type {typ} — "
                "pandas materializes this as float64/object while Spark "
                "emits int64, a driver hash hazard (DuckDB SUM [OVER] of "
                "integers yields HUGEINT). CAST the oracle expression to "
                "BIGINT/DOUBLE, or allowlist in ORACLE_WIDE_OK with a reason"
            )


def audit_hash_hazards(sdf, spark_rows, name: str) -> None:
    """Assert the collected Spark output carries no driver-hash
    hazards: no NULL or NaN inside numeric columns, no DecimalType
    columns, unless `name` is explicitly allowlisted above."""
    from pyspark.sql import types as T

    numeric_idx = []
    for i, f in enumerate(sdf.schema.fields):
        if isinstance(f.dataType, T.DecimalType) and name not in DECIMAL_OK:
            raise AssertionError(
                f"{name}: column {f.name!r} is DECIMAL{f.dataType.simpleString()} — "
                "driver hash may normalize decimals differently than DuckDB; "
                "cast to double/long or allowlist with a reason"
            )
        if isinstance(f.dataType, T.NumericType):
            numeric_idx.append((i, f.name))
    for r in spark_rows:
        for i, col in numeric_idx:
            v = r[i]
            if v is None and name not in NULL_NUMERIC_OK:
                raise AssertionError(
                    f"{name}: NULL in numeric column {col!r} — coalesce to a "
                    "sentinel on both query and oracle sides (driver NULL "
                    "normalization is a hash hazard) or allowlist with a reason"
                )
            if isinstance(v, float) and math.isnan(v) and name not in NAN_OK:
                raise AssertionError(
                    f"{name}: NaN in numeric column {col!r} — scrub on both "
                    "sides or allowlist with a reason"
                )


def compare(spark, sf_dir: str, query_fn, oracle: str, name: str = "?") -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    audit_hash_hazards(sdf, spark_rows, name)

    con = duck_connection(sf_dir)
    audit_oracle_types(con, oracle, name)
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
