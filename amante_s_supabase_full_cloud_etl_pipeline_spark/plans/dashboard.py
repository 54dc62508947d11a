"""Dashboard analytic query surface (SURVEY.md §2.7 A4-A13 + flagship).

The reference delegates all analytics to Power BI over its star
schema (``assets/New BI SC.jpg``); this module answers the same
query shapes natively in Spark over the driver's TPC-H-ish proxy
tables (FIXTURES.md §B mapping: orders/lineitem ↔ POS orders/line
items, part.p_type ↔ category, o_orderpriority ↔ payment method,
o_orderstatus ↔ order channel, events.ts ↔ payment time-of-day).

Scale notes (100 TB):
- Dim joins (region/nation/part/supplier) are explicit
  ``F.broadcast`` — no shuffle on the fact side.
- Single-pass aggregations over lineitem shuffle once on the group
  keys; Catalyst plants partial (map-side) aggs automatically.
- Two-level "per-transaction then overall" aggs (A5-A7) shuffle on
  l_orderkey; at scale the fact table would be bucketed by order key
  making the first agg shuffle-free.
- Share-of-total queries compute the denominator with a single-row
  broadcast-join cross (constant fold), not a window over the whole
  table, so no single-partition window bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import register
from ._common import SQL_REVENUE_DEC, dec, revenue_dec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: net sales by region through the full star schema (J2 + A4/A11).
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = f"""
SELECT r.r_name AS region_name,
       CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS net_sales,
       COUNT(*) AS line_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY region_name
"""


@register("star_net_sales_by_region", oracle=FLAGSHIP_ORACLE)
def star_net_sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ELT star-schema resolution (SURVEY.md J2, ref README.md:91
    ``update_final_fact_sales``) + Net Sales KPI (A4): true dims
    (nation/region) are explicit broadcasts; orders and customer are
    FACT-scale, so their joins are left to AQE — it broadcasts them at
    toy SFs and picks shuffle/sort-merge once they outgrow the
    threshold (bucket both by key at rest to make that shuffle-free).
    Force-broadcasting a fact would OOM the driver at 100 TB."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region")

    return (
        lineitem.select("l_orderkey", revenue_dec().alias("rev"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.sum("rev").cast("double").alias("net_sales"),
            F.count(F.lit(1)).alias("line_items"),
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# A4-A7 — headline KPI cards (one pass, one shuffle).
# ---------------------------------------------------------------------------


@register(
    "a4_a7_headline_kpis",
    oracle=f"""
    WITH per_order AS (
        SELECT l_orderkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ord_qty,
               SUM({SQL_REVENUE_DEC}) AS ord_rev,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ord_gross,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS ord_disc,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(SUM(ord_rev) AS DOUBLE) AS net_sales,
           CAST(SUM(ord_gross) AS DOUBLE) AS gross_sales,
           CAST(SUM(n_lines) AS BIGINT) AS line_items,
           COUNT(*) AS n_orders,
           CAST(SUM(ord_qty) AS DOUBLE) / COUNT(*) AS avg_order_quantity,
           CAST(SUM(ord_rev) AS DOUBLE) / COUNT(*) AS avg_order_amount,
           CAST(SUM(ord_disc) AS DOUBLE) * 100.0
             / CAST(SUM(ord_gross) AS DOUBLE) AS discount_pct,
           CAST(SUM(ord_disc) AS DOUBLE) AS discount_given
    FROM per_order
    """,
)
def a4_a7_headline_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (Net Sales) + A5 (Avg Order Quantity) + A6 (Avg Order
    Amount) + A7 (Discount Given %) as ONE plan: a single per-order
    partial aggregation (shuffle on l_orderkey — bucket the fact by
    order key at scale to eliminate it) feeds every headline card,
    instead of four separate fact scans. All money math stays EXACT;
    percentages are one final double division — order-independent by
    construction.

    r13 (optimization round; guide §2.3 "narrower types"): the
    fact-scale per-order aggregation accumulates scaled LONGS
    (cents; 1e-4 units for the two decimal-product measures), not
    decimals — Spark's decimal sum at the required precision runs on
    BigDecimal boxes per row, and this one aggregation was 75% of
    the row's wall (measured: 1.93 s decimal vs 1.17 s long-unit for
    the identical agg over sf0.1). EXACTNESS is unchanged: each
    per-row value is cast to decimal first (same rounding as
    before), scaled by a power of ten (exact — precision grows), and
    cast to long (an integer by construction); the per-order long
    sums are bounded by ORDER SIZE, not corpus size, so they cannot
    overflow at any scale; the order-count-scale second level
    reconstructs exact decimals (long/100 and long/10000 are exact
    at scale ≥ the unit's digits) and aggregates them exactly as the
    oracle does. The driver value-hash is bit-identical (verified
    against DuckDB at sf0.01 and sf0.1)."""
    ep = dec(F.col("l_extendedprice"))
    disc_d = dec(F.col("l_discount"))
    per_order = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            # cents / 1e-4-unit LONG partials (exact; see docstring)
            F.sum((dec(F.col("l_quantity")) * 100).cast("long")).alias("qty_c"),
            F.sum((revenue_dec() * 10000).cast("long")).alias("rev_u"),
            F.sum((ep * 100).cast("long")).alias("gross_c"),
            F.sum((ep * disc_d * 10000).cast("long")).alias("disc_u"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "n_lines",
            # exact decimal reconstruction for the small second level
            (F.col("qty_c").cast("decimal(38,2)") / 100).alias("ord_qty"),
            (F.col("rev_u").cast("decimal(38,4)") / 10000).alias("ord_rev"),
            (F.col("gross_c").cast("decimal(38,2)") / 100).alias("ord_gross"),
            (F.col("disc_u").cast("decimal(38,4)") / 10000).alias("ord_disc"),
        )
    )
    n_orders = F.count(F.lit(1))
    gross = F.sum("ord_gross").cast("double")
    disc = F.sum("ord_disc").cast("double")
    return per_order.agg(
        F.sum("ord_rev").cast("double").alias("net_sales"),
        gross.alias("gross_sales"),
        F.sum("n_lines").alias("line_items"),
        n_orders.alias("n_orders"),
        (F.sum("ord_qty").cast("double") / n_orders).alias("avg_order_quantity"),
        (F.sum("ord_rev").cast("double") / n_orders).alias("avg_order_amount"),
        (disc * F.lit(100.0) / gross).alias("discount_pct"),
        disc.alias("discount_given"),
    )


# ---------------------------------------------------------------------------
# A8 + A12 — payment-method and channel mixes in one grouping-sets pass.
# ---------------------------------------------------------------------------


@register(
    "a8_a12_order_mix",
    oracle="""
    SELECT CASE WHEN o_orderpriority IS NOT NULL
                THEN 'payment_method' ELSE 'channel' END AS dimension,
           COALESCE(o_orderpriority, o_orderstatus) AS grp_key,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    UNION ALL
    SELECT 'a13_month_dow' AS dimension,
           month(o_orderdate) || '-' || (dayofweek(o_orderdate) + 1) AS grp_key,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM orders
    WHERE weekofyear(o_orderdate) <= 26 AND month(o_orderdate) IN (1, 2, 3)
    GROUP BY month(o_orderdate), dayofweek(o_orderdate) + 1
    ORDER BY dimension, grp_key
    """,
)
def a8_a12_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 ('Frequently Used Payment Method', o_orderpriority proxy) +
    A12 ('Dine-in/Takeaway channel split', o_orderstatus proxy) as ONE
    GROUPING SETS pass — partial aggregation still applies, so both
    mixes come from a single fact scan instead of two (both source
    columns are non-null, so the null slot identifies the grouping
    set) — PLUS the A13 slicer leg (week/day-of-week/month date-part
    predicates + grouped agg; Spark dayofweek is 1..7 Sun=1 while
    DuckDB's is 0..6 — oracle compensates; at scale these predicates
    prune a date-partitioned fact before any scan)."""
    o = _t(spark, sf_dir, "orders")
    mix = (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec(F.col("o_totalprice"))).cast("double").alias("total_amount"),
        )
        .select(
            F.when(F.col("o_orderpriority").isNotNull(), F.lit("payment_method"))
            .otherwise(F.lit("channel"))
            .alias("dimension"),
            F.coalesce(F.col("o_orderpriority"), F.col("o_orderstatus")).alias("grp_key"),
            "n_orders",
            "total_amount",
        )
    )
    sliced = (
        o.filter(
            (F.weekofyear("o_orderdate") <= 26) & F.month("o_orderdate").isin(1, 2, 3)
        )
        .groupBy(
            F.month("o_orderdate").alias("_m"),
            F.dayofweek("o_orderdate").alias("_d"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec(F.col("o_totalprice"))).cast("double").alias("total_amount"),
        )
        .select(
            F.lit("a13_month_dow").alias("dimension"),
            F.concat(F.col("_m").cast("string"), F.lit("-"), F.col("_d").cast("string"))
            .alias("grp_key"),
            "n_orders",
            "total_amount",
        )
    )
    return mix.unionByName(sliced).orderBy("dimension", "grp_key")


# ---------------------------------------------------------------------------
# A9 + F19 — time-bucket performance via GROUPING SETS (one scan).
# ---------------------------------------------------------------------------


@register(
    "a9_time_bucket_sets",
    oracle="""
    WITH bucketed AS (
        SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
               CAST(dayofweek(ts) + 1 AS INTEGER) AS day_of_week,
               strftime(ts, '%A') AS day_name,
               CAST(weekofyear(ts) AS INTEGER) AS week_of_year,
               CAST(month(ts) AS INTEGER) AS month_number,
               strftime(ts, '%B') AS month_name,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
    )
    SELECT CASE WHEN day_name IS NULL THEN 'by_hour' ELSE 'full' END AS scope,
           hour_of_day,
           COALESCE(day_of_week, -1) AS day_of_week,
           COALESCE(day_name, 'ALL') AS day_name,
           COALESCE(week_of_year, -1) AS week_of_year,
           COALESCE(month_number, -1) AS month_number,
           COALESCE(month_name, 'ALL') AS month_name,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM bucketed
    GROUP BY GROUPING SETS (
        (hour_of_day),
        (hour_of_day, day_of_week, day_name, week_of_year, month_number, month_name)
    )
    ORDER BY scope, week_of_year, day_of_week, hour_of_day
    """,
)
def a9_time_bucket_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 ('Store Performance by Hour') and the full F19 date-bucket
    set (hour/day-of-week/day-name/ISO-week/month slicers) in ONE
    GROUPING SETS pass: a single fact scan feeds an Expand that emits
    both the 24-group hour rollup and the fine-grained bucket grid —
    at 100 TB this halves the scans vs two separate group-bys, and
    every bucket is a Catalyst date function (partition-prunable on a
    date-partitioned fact). day_name is never null in real data, so
    it discriminates the grouping set; nulls from the coarse set are
    coalesced to sentinels for a deterministic differential result."""
    from ..functions import datetime_buckets as dtb

    bucket_cols = [
        "hour_of_day",
        "day_of_week",
        "day_name",
        "week_of_year",
        "month_number",
        "month_name",
    ]
    ev = dtb.with_time_buckets(_t(spark, sf_dir, "events"), "ts")
    grouped = ev.groupingSets([["hour_of_day"], bucket_cols], *bucket_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec(F.col("value"))).cast("double").alias("total_value"),
    )
    return grouped.select(
        F.when(F.col("day_name").isNull(), F.lit("by_hour"))
        .otherwise(F.lit("full"))
        .alias("scope"),
        "hour_of_day",
        F.coalesce(F.col("day_of_week"), F.lit(-1)).alias("day_of_week"),
        F.coalesce(F.col("day_name"), F.lit("ALL")).alias("day_name"),
        F.coalesce(F.col("week_of_year"), F.lit(-1)).alias("week_of_year"),
        F.coalesce(F.col("month_number"), F.lit(-1)).alias("month_number"),
        F.coalesce(F.col("month_name"), F.lit("ALL")).alias("month_name"),
        "n_events",
        "total_value",
    ).orderBy("scope", "week_of_year", "day_of_week", "hour_of_day")


# ---------------------------------------------------------------------------
# A10 + A11 — share-of-total donuts (count share + revenue share, one
# labeled result, no global window).
# ---------------------------------------------------------------------------


@register(
    "a10_a11_share_of_total",
    oracle=f"""
    WITH pref AS (
        SELECT l_returnflag AS grp_key, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    ),
    per_type AS (
        SELECT p.p_type AS grp_key, SUM({SQL_REVENUE_DEC}) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_type
    )
    SELECT 'preference' AS dimension, grp_key, CAST(n AS DOUBLE) AS measure,
           CAST(n AS DOUBLE) * 100.0
             / (SELECT CAST(SUM(n) AS DOUBLE) FROM pref) AS share_pct
    FROM pref
    UNION ALL
    SELECT 'category' AS dimension, grp_key, CAST(rev AS DOUBLE) AS measure,
           CAST(rev AS DOUBLE) * 100.0
             / (SELECT CAST(SUM(rev) AS DOUBLE) FROM per_type) AS share_pct
    FROM per_type
    ORDER BY dimension, grp_key
    """,
)
def a10_a11_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (preference donut: count share) + A11 (category
    performance: revenue share via the M1/J1 part-dim join — AQE
    picks broadcast at small SF; ``part`` scales with SF in TPC-H so
    it carries no explicit broadcast hint) as one labeled union. Each leg aggregates FIRST, then joins its
    single-row total back with a broadcast cross join — both branches
    hang off the same aggregation exchange, so ReuseExchange runs
    each fact scan + partial agg once, and no empty-partitionBy
    window (which would funnel all rows to a single partition at
    unknown cardinality) appears anywhere in the plan. Determinism:
    each denominator is an exact long/decimal sum cast to double ONCE
    at the end — never a partition-order-dependent double sum."""

    def with_share(grouped: DataFrame, raw: str, dimension: str) -> DataFrame:
        total = grouped.agg(F.sum(raw).cast("double").alias("_total"))
        measure = F.col(raw).cast("double")
        return grouped.crossJoin(F.broadcast(total)).select(
            F.lit(dimension).alias("dimension"),
            "grp_key",
            measure.alias("measure"),
            (measure * 100.0 / F.col("_total")).alias("share_pct"),
        )

    li = _t(spark, sf_dir, "lineitem")
    pref = li.groupBy(F.col("l_returnflag").alias("grp_key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    per_type = (
        li.select("l_partkey", revenue_dec().alias("rev"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("grp_key"))
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        with_share(pref, "n", "preference")
        .unionByName(with_share(per_type, "rev", "category"))
        .orderBy("dimension", "grp_key")
    )


# ---------------------------------------------------------------------------
# A13 — slicer-filtered aggregation (date-part predicates, F19).
# ---------------------------------------------------------------------------


def a13_sliced_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 (week/day-of-week/month slicers): date-part predicates +
    grouped agg. Note Spark dayofweek is 1..7 (Sun=1) while DuckDB's
    is 0..6 — oracle compensates. At scale these predicates prune a
    date-partitioned fact table before any scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.weekofyear("o_orderdate") <= 26) & F.month("o_orderdate").isin(1, 2, 3))
        .groupBy(
            F.month("o_orderdate").alias("month_number"),
            F.dayofweek("o_orderdate").alias("day_of_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec(F.col("o_totalprice"))).cast("double").alias("total_amount"),
        )
        .orderBy("month_number", "day_of_week")
    )


# ---------------------------------------------------------------------------
# Top-k per category (SURVEY.md §2.7 "natural v2 dashboard query").
# ---------------------------------------------------------------------------


def topk_parts_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue within each type: agg first (shrinks the
    data to one row per (type, part)), then a per-type window over the
    small aggregate — the window never sees fact-table volume.
    Deterministic tie-break on part_name keeps both engines aligned.
    The lineitem-part join carries no broadcast hint: ``part`` scales
    with SF, so AQE chooses (broadcast at toy SF, shuffle at 100 TB)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", revenue_dec().alias("rev"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type", "p_name")
    per_part = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("category"), F.col("p_name").alias("part_name"))
        .agg(F.sum("rev").cast("double").alias("part_sales"))
    )
    w = Window.partitionBy("category").orderBy(F.desc("part_sales"), F.asc("part_name"))
    return (
        per_part.withColumn("rank_in_type", F.row_number().over(w))
        .filter(F.col("rank_in_type") <= 3)
        .orderBy("category", "rank_in_type")
    )


@register(
    "grouped_topk_methods",
    oracle=f"""
    WITH ranked AS (
        SELECT p.p_type AS group_key, p.p_name AS item,
               CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) AS metric,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p.p_type
                   ORDER BY CAST(SUM({SQL_REVENUE_DEC}) AS DOUBLE) DESC, p.p_name
               ) AS INTEGER) AS rank
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_type, p.p_name
    ),
    ranked_orders AS (
        SELECT o_orderpriority AS group_key, CAST(o_orderkey AS VARCHAR) AS item,
               o_totalprice AS metric,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey DESC
               ) AS INTEGER) AS rank
        FROM orders
    )
    SELECT * FROM (
        SELECT 'parts_window' AS part, group_key, item, metric, rank
        FROM ranked WHERE rank <= 3
        UNION ALL
        SELECT 'orders_two_phase' AS part, group_key, item, metric, rank
        FROM ranked_orders WHERE rank <= 3
    ) ORDER BY part, group_key, rank
    """,
)
def grouped_topk_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both grouped top-k strategies in one labeled result.
    ``parts_window``: agg-then-window top-3 parts by revenue per type
    (the window never sees fact volume — right when the grouped table
    is small). ``orders_two_phase``: bounded-state two-phase top-k
    (operators/topk.py) of orders by price per priority — identical
    output to the window form under the (price, orderkey) total
    order, but the hot group's sort spreads across every partition
    and the shuffle carries k x n_partitions candidates, never the
    group — right when a group outgrows one task."""
    from ..operators.topk import grouped_topk

    parts = topk_parts_per_type(spark, sf_dir).select(
        F.lit("parts_window").alias("part"),
        F.col("category").alias("group_key"),
        F.col("part_name").alias("item"),
        F.col("part_sales").alias("metric"),
        F.col("rank_in_type").alias("rank"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    two_phase = grouped_topk(
        orders, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], k=3
    ).select(
        F.lit("orders_two_phase").alias("part"),
        F.col("o_orderpriority").alias("group_key"),
        F.col("o_orderkey").cast("string").alias("item"),
        F.col("o_totalprice").alias("metric"),
        "rank",
    )
    return parts.unionByName(two_phase).orderBy("part", "group_key", "rank")
