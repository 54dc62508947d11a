"""Set operations, distinct aggregates, and the raw-SQL interface
(SURVEY.md §2.7 'available free in Spark' row — made explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, GOLDEN_DIR, golden_table, register

# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT
# ---------------------------------------------------------------------------


@register(
    "customer_set_ops",
    oracle="""
    SELECT * FROM (
        SELECT 'intersect' AS op, 'ALL' AS grp_key, COUNT(*) AS n_rows FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        UNION ALL
        SELECT 'except' AS op, 'ALL' AS grp_key, COUNT(*) AS n_rows FROM (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        UNION ALL
        SELECT 'anti_unshipped' AS op, o_orderstatus AS grp_key,
               COUNT(*) AS n_rows
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate >= TIMESTAMP '2000-01-01'
        )
        GROUP BY 2
        UNION ALL
        SELECT 'semi_recent' AS op, c_mktsegment AS grp_key,
               COUNT(*) AS n_rows
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2001-01-01'
        )
        GROUP BY 2
    ) ORDER BY op, grp_key
    """,
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership operators over customer keys in one labeled
    result: INTERSECT / EXCEPT (true set semantics) plus left SEMI /
    left ANTI existence joins (plans/parity_ops.py) — the four
    flavors of "is this key in that set" a pipeline filters with,
    none of which duplicates the probe side."""
    from .parity_ops import semi_anti_join_filters

    sets = setops_customers(spark, sf_dir).select(
        F.col("set_op").alias("op"),
        F.lit("ALL").alias("grp_key"),
        F.col("n_customers").alias("n_rows"),
    )
    joins = semi_anti_join_filters(spark, sf_dir).select(
        F.col("join_type").alias("op"), "grp_key", "n_rows"
    )
    return sets.unionByName(joins).orderBy("op", "grp_key")


def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (deduplicating set intersection) and EXCEPT (set
    difference — ``subtract``, not ``exceptAll``: EXCEPT removes
    every key present on the right; exceptAll is bag difference and
    keeps surplus multiplicity), labeled into one result."""
    o = catalog.table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = urgent.intersect(finished).agg(F.count(F.lit(1)).alias("n_customers"))
    only = urgent.subtract(finished).agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        both.select(F.lit("intersect").alias("set_op"), "n_customers")
        .unionByName(only.select(F.lit("except").alias("set_op"), "n_customers"))
        .orderBy("set_op")
    )


@register(
    "distinct_counts",
    oracle=f"""
    SELECT e.l_returnflag, e.n_parts, e.n_suppliers,
           g.n_parts_approx, g.n_suppliers_approx
    FROM (
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem GROUP BY l_returnflag
    ) e
    JOIN read_parquet('{GOLDEN_DIR}/distinct_counts.parquet') g USING (l_returnflag)
    ORDER BY l_returnflag
    """,
    golden_sf=DRIVER_SF,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AND approximate (HyperLogLog++) distinct aggregation in
    one grouped pass: countDistinct (Catalyst expands to
    partial-distinct + final) next to approx_count_distinct, the
    at-scale variant with no exact-distinct shuffle explosion.

    Split oracle: the exact columns are verified against independent
    DuckDB SQL; the sketch columns are engine-specific but
    deterministic, so they join in from the committed golden pin.
    Sketch accuracy vs exact is asserted in tests/test_setops.py."""
    li = catalog.table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_suppliers_approx"),
        )
        .orderBy("l_returnflag")
    )


# the oracle embeds this query's OWN golden inside a JOIN (not a plain
# golden_oracle pin), so the producer is declared explicitly —
# register() only auto-pins the exact-golden_oracle shape
golden_table("distinct_counts", distinct_counts)


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


# ---------------------------------------------------------------------------
# PIVOT (fixed value list → deterministic schema in both engines).
# ---------------------------------------------------------------------------

_STATUSES = ("F", "O", "P")


@register(
    "pivot_priority_by_status",
    oracle=f"""
    SELECT o_orderpriority AS order_priority,
           {', '.join(
               "COUNT(CASE WHEN o_orderstatus = '" + s + "' THEN 1 END) AS status_" + s
               for s in _STATUSES
           )}
    FROM orders GROUP BY o_orderpriority ORDER BY order_priority
    """,
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (never the implicit-distinct
    form, which at scale needs an extra pass AND yields
    data-dependent schemas)."""
    o = catalog.table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .pivot("o_orderstatus", list(_STATUSES))
        .count()
    )
    # pivot leaves null where a (priority, status) pair is absent and
    # names columns by raw value — align to the oracle's COUNT(CASE)
    # (0-filled, prefixed) shape.
    return pivoted.select(
        "order_priority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s}") for s in _STATUSES],
    ).orderBy("order_priority")


# ---------------------------------------------------------------------------
# Statistical aggregates, order-independent via exact decimal moments.
# ---------------------------------------------------------------------------


@register(
    "stats_order_amounts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_price,
           sqrt(
             (CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
              - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             ) / (COUNT(*) - 1)
           ) AS stddev_price,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def stats_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates in one grouped pass: mean + sample
    stddev from EXACT decimal moments, plus exact continuous
    percentiles (median/p90 — both engines use the same
    linear-interpolation definition over sorted values).

    The built-in ``stddev`` accumulates in double and is
    aggregation-order-dependent, so it can't hash-match a serial
    oracle; the moment form (Σx, Σx² in decimal, combined in one
    final double expression) is order-independent AND one pass.
    (approx_percentile is the at-scale percentile variant; its sketch
    is engine-specific → see distinct_counts' golden-pin pattern.)

    The Σx² decimal exceeds 2^53 scaled units at sf≥0.1, where
    DuckDB's decimal→double cast is not correctly rounded (Spark's
    is) — so that one cast goes through a VARCHAR round-trip: both
    engines then parse the identical exact digit string with
    correctly-rounded strtod. Rule of thumb: string-roundtrip any
    decimal→double cast whose scaled integer can pass 9e15."""
    from ._common import dec

    o = catalog.table(spark, sf_dir, "orders")
    price = dec(F.col("o_totalprice"))
    n = F.count(F.lit(1))
    s1 = F.sum(price).cast("double")
    s2 = F.sum(price * price).cast("string").cast("double")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            n.alias("n"),
            (s1 / n).alias("mean_price"),
            F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("stddev_price"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        )
        .orderBy("o_orderstatus")
    )
