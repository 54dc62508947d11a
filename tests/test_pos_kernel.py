"""Golden + edge tests for the POS transform kernel.

Expected values are hand-derived from the reference semantics
(/root/reference/main.py:95-407), independently of both the Spark
kernel and the DuckDB oracle — so a shared drift in the differential
pair still fails here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.functions.cleaning import (
    sanitize_name,
    scrub_doubles,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.validate import (
    reprocess_quarantine,
    validation_split,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.plans.pos_fixture import raw_pos_df
from amante_s_supabase_full_cloud_etl_pipeline_spark.plans.pos_kernel import transform_pos


@pytest.fixture(scope="module")
def fact(spark):
    df = transform_pos(raw_pos_df(spark), spark).cache()
    yield df
    df.unpersist()


def rows_for(fact, order_id):
    return {r["items"]: r for r in fact.filter(F.col("order_id") == order_id).collect()}


def test_explode_and_counts(fact):
    # 14 raw rows → footer dropped, O8's unknown-flavor target dropped,
    # multi-item orders exploded → 17 line items.
    assert fact.count() == 17


def test_target_rewrites_and_alternation_order(fact):
    o1 = rows_for(fact, "O1")
    # leading-space token + alternation: 'Chip and Chunk' must not be
    # eaten by 'Chip and Chunk Walnut'
    assert "Cookies - Chip And Chunk" in o1
    o10 = rows_for(fact, "O10")
    assert set(o10) == {"Cookies - Chip And Chunk Walnut", "Croissant - Spam And Egg"}
    # trailing-'Cookie' strip in flavor
    o11 = rows_for(fact, "O11")
    assert set(o11) == {"Croffle - Smores"}
    # Cookie → Cookies singular fix
    o6 = rows_for(fact, "O6")
    assert "Cookies - Dubai" in o6 and "Croffle - Almond Nutella" in o6


def test_attribute_extracts(fact):
    o1 = rows_for(fact, "O1")
    assert o1["Matcha Espresso"]["variation"] == "Hot"
    assert o1["Matcha Espresso"]["size"] is None
    o2 = rows_for(fact, "O2")["Signature Chocolate"]
    assert o2["size"] == "Duo"
    o3 = rows_for(fact, "O3")["French Fries"]
    assert o3["flavor"] == "Cheese" and o3["quantity"] == 2.0
    o4 = rows_for(fact, "O4")["Fruit Lemonade W/ Popping Pearls"]
    assert o4["sugar_level"] == "Sugar 50%" and o4["flavor"] is None
    o5 = rows_for(fact, "O5")["Pad Kra Pao"]
    assert o5["spice_level"] == "Mild (1/4)"
    # missing qty token defaults to 1
    assert rows_for(fact, "O7")["Cappuccino"]["quantity"] == 1.0


def test_corrections_and_dim_maps(fact):
    o4 = rows_for(fact, "O4")["Fruit Lemonade W/ Popping Pearls"]
    assert o4["sub_category"] == "Fruit Based" and o4["category"] == "Beverages"
    # unmapped item → Uncategorized fill
    o8 = rows_for(fact, "O8")
    assert set(o8) == {"Mystery Item"}  # null-flavor target dropped (F10/P4)
    assert o8["Mystery Item"]["sub_category"] == "Uncategorized"
    # dim key matched before title-casing
    o13 = rows_for(fact, "O13")["Biscoff Tiramisu"]
    assert o13["sub_category"] == "Cheesecakes"


def test_numeric_coercion_and_payment(fact):
    o2 = rows_for(fact, "O2")["Signature Chocolate"]
    assert o2["total_order_amount"] == 1192.0  # thousands comma stripped
    assert o2["payment_type"] == "Gcash"
    assert rows_for(fact, "O4")["Fruit Lemonade W/ Popping Pearls"]["payment_type"] == "Credit / Debit"
    assert rows_for(fact, "O5")["Pad Kra Pao"]["payment_type"] == "Free/Voucher/Discounted"
    assert rows_for(fact, "O13")["Biscoff Tiramisu"]["payment_type"] == "Free/Voucher/Discounted"
    assert rows_for(fact, "O1")["Matcha Espresso"]["payment_type"] == "Cash"


def test_validation_split_and_reprocess(fact, spark):
    clean, quarantine = validation_split(fact)
    assert clean.count() == 16
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["order_id"] == "O9"  # negative amounts

    # S8: after a "fix" (amounts made positive), reprocess promotes the row.
    fixed = quarantine.withColumns(
        {
            "total_order_amount": F.abs(F.col("total_order_amount")),
            "received_amount": F.abs(F.col("received_amount")),
        }
    )
    new_fact, remaining = reprocess_quarantine(fixed, clean, ("order_id", "items"))
    assert new_fact.count() == 17
    assert remaining.count() == 0


def test_scrub_nan_inf(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf",),), (float("-inf"),), (None,)],
        "x double",
    )
    vals = [r["x"] for r in scrub_doubles(df).collect()]
    assert vals == [1.0, None, None, None, None]


def test_sanitize_name():
    assert sanitize_name("Type/Channel") == "type_channel"
    assert sanitize_name("Sub-Category") == "sub_category"
    assert sanitize_name("Payment time") == "payment_time"
