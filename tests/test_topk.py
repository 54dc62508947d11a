"""Two-phase grouped top-k: identical to the window form under a
total order, bounded aggregation state, hot-group stress, partition
independence."""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.topk import grouped_topk


def _window_topk(df, group, order, k):
    w = Window.partitionBy(*group).orderBy(*[F.desc(c) for c in order])
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_matches_window_form_exactly(spark, sf_dir):
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    li = catalog.table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]  # total order
    got = {
        tuple(r)
        for r in grouped_topk(li, ["l_suppkey"], order, k=3)
        .select("l_suppkey", *order, "rank")
        .collect()
    }
    want = {
        tuple(r)
        for r in _window_topk(li, ["l_suppkey"], order, 3)
        .select("l_suppkey", *order, "rank")
        .collect()
    }
    assert got == want and got


def test_hot_group_and_partition_independence(spark):
    """90% of rows in one group: the two-phase form must stay correct
    and fast (bounded candidate sets), with identical output at any
    input partitioning."""
    n = 200_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 97).alias("g"),
        (F.col("id") * 2654435761 % 1_000_003).alias("v"),
        F.col("id"),
    )
    t0 = time.monotonic()
    base = {
        tuple(r) for r in grouped_topk(df, ["g"], ["v", "id"], k=5).collect()
    }
    elapsed = time.monotonic() - t0
    assert elapsed < 60
    want = {
        tuple(r)
        for r in _window_topk(df, ["g"], ["v", "id"], 5)
        .select("g", "v", "id", "rank")
        .collect()
    }
    assert base == want
    for parts in (1, 64):
        again = {
            tuple(r)
            for r in grouped_topk(df.repartition(parts), ["g"], ["v", "id"], k=5).collect()
        }
        assert again == base


def test_small_groups_and_k_larger_than_group(spark):
    df = spark.createDataFrame(
        [("a", 3, 1), ("a", 1, 2), ("b", 9, 3)], "g string, v int, id int"
    )
    got = sorted(
        (r["g"], r["v"], r["rank"])
        for r in grouped_topk(df, ["g"], ["v", "id"], k=10).collect()
    )
    assert got == [("a", 1, 2), ("a", 3, 1), ("b", 9, 1)]


def test_ascending_tiebreak_numeric_fast_path_matches_window(spark):
    """ascending=[numeric id] rewrites to negation (struct compare);
    must equal the window form's (v DESC, id ASC) ordering."""
    df = spark.createDataFrame(
        [("g1", 5, 30), ("g1", 5, 10), ("g1", 5, 20), ("g1", 7, 40), ("g2", 1, 2)],
        "g string, v int, id int",
    )
    got = sorted(
        (r["g"], r["v"], r["id"], r["rank"])
        for r in grouped_topk(
            df, ["g"], ["v", "id"], k=2, ascending=["id"]
        ).collect()
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = sorted(
        (r["g"], r["v"], r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(w)
        ).filter(F.col("rank") <= 2).collect()
    )
    assert got == want
    # the fast path must not leak internal negation columns
    cols = grouped_topk(df, ["g"], ["v", "id"], k=2, ascending=["id"]).columns
    assert cols == ["g", "v", "id", "rank"]


def test_ascending_tiebreak_string_ids(spark):
    """A STRING id column takes the comparator-sort path (ADVICE r4:
    negation would fail under ANSI string rules); same window-form
    equivalence, plus null ordering is pinned (nulls last)."""
    df = spark.createDataFrame(
        [
            ("g1", 5, "doc-b"),
            ("g1", 5, "doc-a"),
            ("g1", 5, "doc-c"),
            ("g1", 7, "doc-z"),
            ("g1", 5, None),
            ("g2", 1, "x"),
        ],
        "g string, v int, id string",
    )
    got = sorted(
        (r["g"], r["v"], r["id"], r["rank"])
        for r in grouped_topk(
            df, ["g"], ["v", "id"], k=3, ascending=["id"]
        ).collect()
    )
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc_nulls_last("id"))
    want = sorted(
        (r["g"], r["v"], r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(w)
        ).filter(F.col("rank") <= 3).collect()
    )
    assert got == want


def test_ascending_requires_order_by_membership(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 2)], "g string, v int, id int")
    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], ["v"], k=1, ascending=["id"])


def test_ascending_tiebreak_survives_long_min_value(spark):
    """Self-review r5: arithmetic negation overflows at the integral
    MIN value (ANSI throws, legacy wraps and mis-orders); the fast
    path inverts via bitwise NOT instead, which is total-order-safe.
    Run under ANSI to make any overflow loud."""
    df = spark.createDataFrame(
        [("g", 5, -(2**63)), ("g", 5, 0), ("g", 5, 2**63 - 1)],
        "g string, v int, id long",
    )
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = [
            (r["id"], r["rank"])
            for r in grouped_topk(df, ["g"], ["v", "id"], k=3, ascending=["id"])
            .orderBy("rank")
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert got == [(-(2**63), 1), (0, 2), (2**63 - 1, 3)]
