"""Set operations, distinct aggregates, and the raw-SQL interface
(SURVEY.md §2.7 'available free in Spark' row — made explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import register

# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT
# ---------------------------------------------------------------------------


@register(
    "intersect_customers",
    oracle="""
    SELECT COUNT(*) AS n_both FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (deduplicating set intersection)."""
    o = catalog.table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.intersect(finished).agg(F.count(F.lit(1)).alias("n_both"))


@register(
    "except_customers",
    oracle="""
    SELECT COUNT(*) AS n_only_urgent FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference — ``subtract``, not ``exceptAll``:
    EXCEPT removes every key present on the right; exceptAll is bag
    difference and keeps surplus multiplicity)."""
    o = catalog.table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.subtract(finished).agg(F.count(F.lit(1)).alias("n_only_urgent"))


@register(
    "distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (Catalyst expands to
    partial-distinct + final — still one logical pass)."""
    li = catalog.table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
        .orderBy("l_returnflag")
    )


@register("approx_distinct_counts")  # rows-only: HLL sketches are engine-specific
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the at-scale variant of
    distinct_counts (no exact-distinct shuffle explosion). Sketch
    values are engine-specific → rows-only; accuracy asserted in
    tests/test_setops.py against the exact counts."""
    li = catalog.table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_suppliers_approx"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Raw-SQL interface: the same ANSI text runs on Spark and the oracle.
# ---------------------------------------------------------------------------

_ANSI_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_interface_pricing_summary", oracle=_ANSI_Q1)
def sql_interface_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: register the catalog as views and run
    the ANSI text directly — byte-identical SQL serves as its own
    oracle (dialect-shared subset). TPC-H Q1-shaped pricing summary."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(_ANSI_Q1)
