"""Sink tests: parquet MERGE write idempotency and the ON CONFLICT
SQL builder (the JDBC execution path is gated — no database here)."""

from __future__ import annotations

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.sinks import (
    parquet_merge_write,
    prepare_for_load,
    upsert_conflict_sql,
)


def test_parquet_merge_write_idempotent(spark, tmp_path):
    target = str(tmp_path / "fact")
    batch1 = spark.createDataFrame(
        [(1, "a", 1.0, "2024-01-01"), (2, "b", 2.0, "2024-01-01")],
        "k int, v string, amt double, d string",
    )
    parquet_merge_write(target, batch1, ["k"], ["d"])
    assert spark.read.parquet(target).count() == 2

    # replay the same batch → no duplicates (upsert semantics)
    parquet_merge_write(target, batch1, ["k"], ["d"])
    assert spark.read.parquet(target).count() == 2

    # a restatement wins; new keys append
    batch2 = spark.createDataFrame(
        [(2, "B", 99.0, "2024-01-02"), (3, "c", 3.0, "2024-01-02")],
        "k int, v string, amt double, d string",
    )
    parquet_merge_write(target, batch2, ["k"], ["d"])
    rows = {r["k"]: r for r in spark.read.parquet(target).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["v"] == "B" and rows[2]["amt"] == 99.0


def test_prepare_for_load_sanitizes_and_scrubs(spark):
    df = spark.createDataFrame(
        [(1.0, float("inf"))], "`Total Order Amount` double, `Received amount` double"
    )
    out = prepare_for_load(df)
    assert out.columns == ["total_order_amount", "received_amount"]
    row = out.collect()[0]
    assert row["total_order_amount"] == 1.0 and row["received_amount"] is None


def test_upsert_conflict_sql_shape():
    sql = upsert_conflict_sql(
        "fact_sales", ["order_id", "items", "quantity"], ["order_id", "items"]
    )
    assert "INSERT INTO fact_sales (order_id, items, quantity)" in sql
    assert "ON CONFLICT (order_id, items)" in sql
    assert "DO UPDATE SET quantity = EXCLUDED.quantity" in sql
    assert "order_id = EXCLUDED" not in sql  # keys not restated
