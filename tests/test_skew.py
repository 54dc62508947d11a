"""Salted-join / two-phase-agg correctness: identical results to the
unsalted plans on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.skew import (
    salted_join,
    two_phase_agg_sum,
)


def _skewed_df(spark):
    # 90% of rows share key 0 — the hot-key shape salting exists for.
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [(0, "hot"), (19, "cold19"), (29, "cold29")], "k long, label string"
    )
    plain = big.join(dim, "k").groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(big, dim, ["k"]).groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_single_phase(spark):
    df = _skewed_df(spark)
    single = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    double = {
        r["k"]: r["sum_v"] for r in two_phase_agg_sum(df, ["k"], "v").collect()
    }
    assert set(single) == set(double)
    for k in single:
        assert abs(single[k] - double[k]) < 1e-6
