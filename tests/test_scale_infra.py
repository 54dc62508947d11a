"""Scale-infrastructure proofs on local data: bucketed co-located
joins eliminate the shuffle, date-partitioned fact writes prune
partitions — the physical-layout levers the engine is designed
around for 100 TB (SURVEY.md §7 step 8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key join WITHOUT an Exchange —
    the co-located join layout big fact-fact joins need at scale."""
    li = catalog.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = catalog.table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        # sanity: result is right
        assert joined.count() == spark.table("li_b").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_fact_write_prunes(spark, sf_dir, tmp_path):
    """Fact written partitioned by a date column: a slicer predicate
    reads only matching partitions (PartitionFilters in the scan)."""
    o = catalog.table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "fact_by_month")
    o.write.partitionBy("order_month").parquet(path)

    fact = spark.read.parquet(path).filter(F.col("order_month") == "1997-03")
    plan = fact._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "1997-03" in plan  # the filter reached partition pruning
    got = fact.count()
    want = o.filter(F.col("order_month") == "1997-03").count()
    assert got == want > 0
