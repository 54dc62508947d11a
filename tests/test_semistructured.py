"""VARIANT semi-structured operators: DuckDB-differential flattening
(same compare harness as the registry), S4 malformed-row semantics,
schema-drift detection, and typed array explosion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.semistructured import (
    explode_variant_array,
    flatten_variant,
    parse_props,
    schema_drift_report,
)

from .oracle_harness import compare

SF = "/root/testdata/sf0.01"

#: nested JSON synthesized deterministically from orders columns so
#: the VARIANT path and DuckDB's JSON functions chew identical bytes
_MK_JSON_SPARK = """
    SELECT o_orderkey,
           to_json(named_struct(
               'id', o_orderkey,
               'meta', named_struct('status', o_orderstatus,
                                    'priority', o_orderpriority),
               'amounts', array(o_totalprice, o_totalprice * 0.1)
           )) AS js
    FROM orders WHERE o_orderkey % 97 = 0
"""

_ORACLE = """
    WITH src AS (
        SELECT o_orderkey,
               json_object(
                   'id', o_orderkey,
                   'meta', json_object('status', o_orderstatus,
                                       'priority', o_orderpriority),
                   'amounts', json_array(o_totalprice, o_totalprice * 0.1)
               ) AS js
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderkey,
           CAST(json_extract(js, '$.id') AS BIGINT) AS id,
           json_extract_string(js, '$.meta.status') AS status,
           json_extract_string(js, '$.meta.priority') AS priority,
           round(CAST(json_extract(js, '$.amounts[1]') AS DOUBLE), 6) AS amt_tax
    FROM src ORDER BY o_orderkey
"""


def _flatten_query(spark, sf_dir):
    catalog.register_views(spark, sf_dir)
    src = spark.sql(_MK_JSON_SPARK)
    v = parse_props(src, "js")
    flat = flatten_variant(
        v,
        "props_v",
        {
            "id": ("$.id", "bigint"),
            "status": ("$.meta.status", "string"),
            "priority": ("$.meta.priority", "string"),
            "_amt": ("$.amounts[1]", "double"),
        },
    )
    return flat.select(
        "o_orderkey",
        "id",
        "status",
        "priority",
        F.round("_amt", 6).alias("amt_tax"),
    ).orderBy("o_orderkey")


def test_variant_flatten_matches_duckdb_json(spark):
    compare(spark, SF, _flatten_query, _ORACLE, name="variant_flatten")


def test_malformed_rows_are_s4_nulls_not_failures(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "{broken"), (3, None)], "id long, js string"
    )
    v = parse_props(df, "js")
    flat = flatten_variant(v, "props_v", {"k": ("$.k", "bigint")})
    got = {r["id"]: r["k"] for r in flat.collect()}
    assert got == {1: 5, 2: None, 3: None}
    # strict mode surfaces the malformed row as a job failure
    with pytest.raises(Exception):
        parse_props(df, "js", strict=True).select("props_v").collect()


def test_flatten_rejects_name_collisions(spark):
    df = spark.createDataFrame([(1, '{"id": 9}')], "id long, js string")
    with pytest.raises(ValueError, match="already"):
        flatten_variant(parse_props(df, "js"), "props_v", {"id": ("$.id", "bigint")})


def test_type_mismatch_nulls_only_that_path(spark):
    df = spark.createDataFrame([(1, '{"k": "not-a-number", "s": "x"}')], "id long, js string")
    flat = flatten_variant(
        parse_props(df, "js"),
        "props_v",
        {"k": ("$.k", "bigint"), "s": ("$.s", "string")},
    )
    r = flat.collect()[0]
    assert r["k"] is None and r["s"] == "x"


def test_schema_drift_report_detects_payload_change(spark):
    old = [(i, "web", '{"k": %d}' % i) for i in range(5)]
    new = [(i, "app", '{"k": %d, "extra": {"z": true}}' % i) for i in range(3)]
    bad = [(9, "app", "not-json")]
    df = spark.createDataFrame(old + new + bad, "id long, source string, js string")
    rep = schema_drift_report(
        parse_props(df, "js"), "props_v", ["source"], json_col="js"
    )
    rows = {r["source"]: r for r in rep.collect()}
    assert rows["web"]["merged_schema"] == "OBJECT<k: BIGINT>"
    assert rows["app"]["merged_schema"] == "OBJECT<extra: OBJECT<z: BOOLEAN>, k: BIGINT>"
    assert rows["app"]["n_malformed"] == 1 and rows["app"]["n_rows"] == 4

    # a legitimately-ABSENT payload (NULL json) must not alarm the
    # malformed monitor when the source column is passed
    df2 = spark.createDataFrame(
        [(1, "web", None), (2, "web", "{bad")], "id long, source string, js string"
    )
    rep2 = schema_drift_report(
        parse_props(df2, "js"), "props_v", ["source"], json_col="js"
    )
    assert rep2.collect()[0]["n_malformed"] == 1  # only the truly-bad row


def test_events_props_variant_equals_get_json_object(spark, sf_dir):
    """The VARIANT path and the legacy string path agree on the real
    events.props column."""
    ev = catalog.table(spark, sf_dir, "events").limit(2000)
    v = flatten_variant(
        parse_props(ev, "props"), "props_v", {"k_variant": ("$.k", "bigint")}
    ).select(
        "event_id",
        "k_variant",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_string"),
    )
    assert v.filter(~F.col("k_variant").eqNullSafe(F.col("k_string"))).count() == 0


def test_explode_variant_array_typed_elements(spark):
    df = spark.createDataFrame(
        [
            (1, '{"tags": [3, 1, 2]}'),
            (2, '{"tags": []}'),
            (3, '{"tags": "scalar-not-array"}'),
            (4, '{"other": 1}'),
        ],
        "id long, js string",
    )
    out = explode_variant_array(
        parse_props(df, "js"), "props_v", "$.tags", "bigint", ["id"], out_col="tag"
    )
    got = sorted((r["id"], r["pos"], r["tag"]) for r in out.collect())
    assert got == [(1, 0, 3), (1, 1, 1), (1, 2, 2)]


def test_flatten_is_map_only(spark, sf_dir):
    """parse-once + extract-many adds no shuffle: the flatten plan has
    no Exchange besides what the source already needs."""
    ev = catalog.table(spark, sf_dir, "events")
    flat = flatten_variant(
        parse_props(ev, "props"), "props_v", {"k": ("$.k", "bigint")}
    )
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
