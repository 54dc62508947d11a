"""Count-Min sketch: one-sided sandwich bound vs exact counts,
bit-identical sketches under any partitioning (exact mergeability),
merge()-equals-union, and null handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.countmin import (
    count_min_sketch,
)


def _skewed(spark, n=20_000):
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .when(F.col("id") % 100 < 70, (F.col("id") % 10) + 1)
        .otherwise(F.col("id") + 1_000)
        .cast("string")
        .alias("k")
    )


def test_one_sided_bound_against_exact_counts(spark):
    df = _skewed(spark)
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    cm = count_min_sketch(df, "k", depth=4, width=2048)
    assert cm.n == df.count()
    bound = cm.error_bound()
    for key, true in exact.items():
        est = cm.estimate(key)
        assert true <= est <= true + bound, (key, true, est, bound)
    # never-seen key: estimate is at most the collision bound
    assert cm.estimate("never-seen-key") <= bound


def test_sketch_is_partition_invariant_and_merge_is_union(spark):
    df = _skewed(spark, 8_000)
    base = count_min_sketch(df, "k")
    for parts in (1, 13, 64):
        again = count_min_sketch(df.repartition(parts), "k")
        assert again.cells == base.cells and again.n == base.n
    # merging two halves' sketches == sketching the union
    a = count_min_sketch(df.filter(F.col("k") != "0"), "k")
    b = count_min_sketch(df.filter(F.col("k") == "0"), "k")
    assert a.merge(b).cells == base.cells


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("x",), (None,), ("x",), (None,)], "k string")
    cm = count_min_sketch(df, "k", depth=3, width=64)
    assert cm.n == 2
    assert cm.estimate("x") >= 2
