"""Reference-parity operators exercised on the driver's proxy tables.

The POS kernel queries (pos_kernel_query) prove the operators on the
POS fixture; this module proves the same operator *families* at table
scale on the TPC-H-ish tables, per the FIXTURES.md §B mapping:
explode/regex → part.p_name + events.props; dict-map joins →
nation⋈region; validation split → lineitem predicates; unions,
semi/anti joins, dedup-by-key → orders/lineitem/documents.

Every query here is shaped for 100 TB: explode before shuffle only
when needed, broadcast the small side, aggregate before sorting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import register
from ._common import dec

# ---------------------------------------------------------------------------
# E1/E2/P3 + F1-F5 — split/explode/empty-filter + regex extraction.
# ---------------------------------------------------------------------------


@register(
    "explode_regex_part_attrs",
    oracle="""
    SELECT word,
           NULLIF(regexp_extract(p_type, '(?i)(ECONOMY|PROMO|STANDARD)', 1), '') AS type_class,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM (
        SELECT unnest(string_split(p_name, ' ')) AS word, p_type, p_retailprice
        FROM part
    )
    WHERE word <> ''
    GROUP BY word, type_class
    ORDER BY word, type_class NULLS FIRST
    """,
)
def explode_regex_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+E2+P3 (ref main.py:107-109) + F1-F5 (ref main.py:112-135)
    in one plan: split a packed string column, explode to one row per
    token dropping empties, with a case-insensitive regexp attribute
    extracted per row (pandas null-on-miss parity via the NULLIF
    wrapper). Generate (explode) runs pipelined inside the scan stage
    — no shuffle until the aggregate."""
    from ..functions.cleaning import extract_or_null

    part = catalog.table(spark, sf_dir, "part")
    return (
        part.select(
            F.explode(F.split(F.col("p_name"), " ")).alias("word"),
            extract_or_null(F.col("p_type"), "(?i)(ECONOMY|PROMO|STANDARD)").alias("type_class"),
            "p_retailprice",
        )
        .filter(F.col("word") != "")
        .groupBy("word", "type_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec(F.col("p_retailprice"))).cast("double").alias("total_price"),
        )
        .orderBy("word", F.asc_nulls_first("type_class"))
    )


# ---------------------------------------------------------------------------
# S8 — anti-join (quarantine delete) and semi-join existence filter.
# A1/A2 (pd.concat ≡ unionByName, ref main.py:475,487) are exercised
# inside every labeled-union query here and in setops/pos plans — the
# checked plans contain the Union node, so the op keeps driver proof
# without its own slot.
# ---------------------------------------------------------------------------


def semi_anti_join_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8's delete-promoted-rows shape (SURVEY.md §2.6) + its inverse:
    left ANTI join (orders with no shipped line) and left SEMI join
    (customers with a recent order) — existence checks that never
    duplicate the probe side, shuffle-hash on the join key. Labeled
    union so both join types land in one differential result."""
    o = catalog.table(spark, sf_dir, "orders")
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    anti = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .groupBy(F.col("o_orderstatus").alias("grp_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit("anti_unshipped").alias("join_type"), "grp_key", "n_rows")
    )
    c = catalog.table(spark, sf_dir, "customer")
    recent = catalog.table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    semi = (
        c.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy(F.col("c_mktsegment").alias("grp_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit("semi_recent").alias("join_type"), "grp_key", "n_rows")
    )
    return anti.unionByName(semi).orderBy("join_type", "grp_key")


# ---------------------------------------------------------------------------
# JSON prop extraction (events.props, SURVEY.md §1.2 extension types).
# ---------------------------------------------------------------------------


@register(
    "json_prop_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1 ORDER BY k_bucket
    """,
)
def json_prop_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decode (ref main.py:33 to-records analog /
    events.props): get_json_object is JVM-side, no UDF."""
    ev = catalog.table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10).alias("k_bucket")
        )
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup (SURVEY.md §2.7 "free in Spark" row).
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_sales",
    oracle="""
    SELECT 'rollup' AS mode,
           COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'cube' AS mode,
           COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY mode, order_status, order_priority
    """,
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals and CUBE all-combinations totals
    (SURVEY.md §2.7 grouping-sets row), each a single pass with
    partial aggregation — far cheaper than N separate group-bys at
    scale. Labeled union proves both grouping-set forms in one
    differential result."""
    o = catalog.table(spark, sf_dir, "orders")

    def _shape(grouped, mode: str) -> DataFrame:
        return (
            grouped.agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(dec(F.col("o_totalprice"))).cast("double").alias("total_amount"),
            )
            .select(
                F.lit(mode).alias("mode"),
                F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("order_status"),
                F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("order_priority"),
                "n_orders",
                "total_amount",
            )
        )

    rolled = _shape(o.rollup("o_orderstatus", "o_orderpriority"), "rollup")
    cubed = _shape(o.cube("o_orderstatus", "o_orderpriority"), "cube")
    return rolled.unionByName(cubed).orderBy("mode", "order_status", "order_priority")


# ---------------------------------------------------------------------------
# Window functions: rank / lag over partitions (SURVEY.md §2.7).
# ---------------------------------------------------------------------------


@register(
    "range_join_value_bands",
    oracle="""
    WITH bands(band_name, lo, hi) AS (
        VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e9)
    )
    SELECT b.band_name, e.event_type, COUNT(*) AS n_events
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1, 2 ORDER BY band_name, event_type
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join against a banded dimension (SURVEY.md
    §2.6 'absent from reference; free in Spark'): with the band table
    broadcast this plans as BroadcastNestedLoopJoin — each fact row
    tests a handful of in-memory ranges, no shuffle. (For large band
    tables, pre-bucketize the fact value to turn it into an
    equi-join.)"""
    ev = catalog.table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)],
        "band_name string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band_name", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("band_name", "event_type")
    )


@register(
    "window_customer_order_seq",
    oracle="""
    SELECT o_custkey, o_orderkey, seq, prev_price
    FROM (
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS seq,
               LAG(o_totalprice) OVER w AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    WHERE seq <= 3 AND o_custkey % 50 = 0
    ORDER BY o_custkey, seq
    """,
)
def window_customer_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + lag over per-customer event-time windows —
    partitioned by key so the window parallelizes (never a global
    ORDER BY window). Deterministic tie-break on o_orderkey."""
    from pyspark.sql import Window

    o = catalog.table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("seq"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .filter((F.col("seq") <= 3) & (F.col("o_custkey") % 50 == 0))
        .orderBy("o_custkey", "seq")
    )
