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
# E1/E2/P3 — split + explode + empty-filter at scale (part names).
# ---------------------------------------------------------------------------


@register(
    "explode_part_words",
    oracle="""
    SELECT word, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM (
        SELECT unnest(string_split(p_name, ' ')) AS word, p_retailprice
        FROM part
    )
    WHERE word <> ''
    GROUP BY word ORDER BY word
    """,
)
def explode_part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+E2+P3 (ref main.py:107-109): split a packed string column
    and explode to one row per token, dropping empties. Generate
    (explode) runs pipelined inside the scan stage — no shuffle until
    the aggregate."""
    part = catalog.table(spark, sf_dir, "part")
    return (
        part.select(
            F.explode(F.split(F.col("p_name"), " ")).alias("word"),
            "p_retailprice",
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec(F.col("p_retailprice"))).cast("double").alias("total_price"),
        )
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# F1/F2-style regex extraction + null-on-miss semantics at scale.
# ---------------------------------------------------------------------------


@register(
    "regex_extract_part_attrs",
    oracle="""
    SELECT NULLIF(regexp_extract(p_name, '(?i)(small|large|cold|hot)', 1), '') AS size_word,
           NULLIF(regexp_extract(p_type, '(?i)(ECONOMY|PROMO|STANDARD)', 1), '') AS type_class,
           COUNT(*) AS n_parts
    FROM part
    GROUP BY size_word, type_class
    ORDER BY size_word NULLS FIRST, type_class NULLS FIRST
    """,
)
def regex_extract_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5 family (ref main.py:112-135): case-insensitive regexp
    extraction with pandas null-on-miss parity (NULLIF wrapper)."""
    from ..functions.cleaning import extract_or_null

    part = catalog.table(spark, sf_dir, "part")
    return (
        part.select(
            extract_or_null(F.col("p_name"), "(?i)(small|large|cold|hot)").alias("size_word"),
            extract_or_null(F.col("p_type"), "(?i)(ECONOMY|PROMO|STANDARD)").alias("type_class"),
        )
        .groupBy("size_word", "type_class")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.asc_nulls_first("size_word"), F.asc_nulls_first("type_class"))
    )


# ---------------------------------------------------------------------------
# F6/F15 — token parse with default + thousands-strip numeric coercion.
# ---------------------------------------------------------------------------


@register(
    "coerce_formatted_numbers",
    oracle="""
    SELECT qty_bucket,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(parsed AS DECIMAL(18,2))) AS DOUBLE) AS total_parsed
    FROM (
        SELECT CASE WHEN p_partkey % 7 = 0 THEN 'bad' ELSE 'ok' END AS qty_bucket,
               TRY_CAST(replace(
                   CASE WHEN p_partkey % 7 = 0 THEN 'N/A'
                        ELSE CAST(p_partkey AS VARCHAR) || ',' || CAST(p_size AS VARCHAR) || '.50'
                   END, ',', '') AS DOUBLE) AS parsed
        FROM part
    )
    GROUP BY qty_bucket ORDER BY qty_bucket
    """,
)
def coerce_formatted_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 (ref main.py:389-393): thousands-separator strip +
    coerce-to-null on unparseable strings, built deterministically
    from part keys so both engines see identical inputs."""
    from ..functions.cleaning import strip_thousands_and_coerce

    part = catalog.table(spark, sf_dir, "part")
    formatted = F.when(F.col("p_partkey") % 7 == 0, F.lit("N/A")).otherwise(
        F.concat(
            F.col("p_partkey").cast("string"),
            F.lit(","),
            F.col("p_size").cast("string"),
            F.lit(".50"),
        )
    )
    return (
        part.select(
            F.when(F.col("p_partkey") % 7 == 0, F.lit("bad")).otherwise(F.lit("ok")).alias("qty_bucket"),
            strip_thousands_and_coerce(formatted).alias("parsed"),
        )
        .groupBy("qty_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec(F.col("parsed"))).cast("double").alias("total_parsed"),
        )
        .orderBy("qty_bucket")
    )


# ---------------------------------------------------------------------------
# F14 — sentinel CASE chain at scale (events proxy).
# ---------------------------------------------------------------------------


@register(
    "sentinel_case_payment",
    oracle="""
    SELECT CASE WHEN value = 0 THEN 'Free/Voucher/Discounted'
                WHEN event_type = 'purchase' THEN 'Cash'
                WHEN event_type = 'signup' THEN 'Gcash'
                ELSE 'Credit / Debit' END AS payment_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1 ORDER BY payment_type
    """,
)
def sentinel_case_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 (ref main.py:358-371): ordered CASE fallthrough — the
    reference's only Python row-function, as a pure column CASE."""
    ev = catalog.table(spark, sf_dir, "events")
    pt = (
        F.when(F.col("value") == 0, F.lit("Free/Voucher/Discounted"))
        .when(F.col("event_type") == "purchase", F.lit("Cash"))
        .when(F.col("event_type") == "signup", F.lit("Gcash"))
        .otherwise(F.lit("Credit / Debit"))
    )
    return (
        ev.groupBy(pt.alias("payment_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(F.col("value"))).cast("double").alias("total_value"),
        )
        .orderBy("payment_type")
    )


# ---------------------------------------------------------------------------
# M1/M2/J1 — dict-map lookup as broadcast left join, with miss-fill.
# ---------------------------------------------------------------------------


@register(
    "dict_map_broadcast_join",
    oracle="""
    SELECT COALESCE(r.r_name, 'Uncategorized') AS region_name,
           COUNT(*) AS n_nations
    FROM nation n
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_regionkey < 4
    GROUP BY 1 ORDER BY region_name
    """,
)
def dict_map_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2 (ref main.py:353-354 dict .map): lookup table as
    broadcast left join; unmatched keys → 'Uncategorized' (F17).
    The restricted join condition manufactures misses so the fill
    path is actually exercised."""
    nation = catalog.table(spark, sf_dir, "nation")
    region = catalog.table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            (F.col("n_regionkey") == F.col("r_regionkey")) & (F.col("r_regionkey") < 4),
            "left",
        )
        .groupBy(F.coalesce(F.col("r_name"), F.lit("Uncategorized")).alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# P7 — validation split on a fact table (both sides).
# ---------------------------------------------------------------------------

_LINEITEM_VALID = "l_quantity <= 45 AND l_discount <= 0.08"


@register(
    "lineitem_validation_clean",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem WHERE {_LINEITEM_VALID}
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def lineitem_validation_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 clean side at fact scale: predicate filter + agg (single
    scan; filter pushed to parquet)."""
    li = catalog.table(spark, sf_dir, "lineitem")
    ok = (F.col("l_quantity") <= 45) & (F.col("l_discount") <= 0.08)
    return (
        li.filter(ok)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "lineitem_validation_quarantine",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem WHERE NOT ({_LINEITEM_VALID})
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def lineitem_validation_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 quarantine side (complement predicate)."""
    li = catalog.table(spark, sf_dir, "lineitem")
    ok = (F.col("l_quantity") <= 45) & (F.col("l_discount") <= 0.08)
    return (
        li.filter(~ok)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A1/A2 — union of per-source frames.
# ---------------------------------------------------------------------------


@register(
    "union_by_name",
    oracle="""
    SELECT src, COUNT(*) AS n_rows
    FROM (
        SELECT 'high' AS src, o_orderkey FROM orders WHERE o_totalprice > 300000
        UNION ALL
        SELECT 'urgent' AS src, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY src ORDER BY src
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 (ref main.py:475,487 pd.concat): unionByName of
    compatible frames — a no-shuffle narrow op in Spark."""
    o = catalog.table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 300000).select(
        F.lit("high").alias("src"), "o_orderkey"
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_orderkey"
    )
    return (
        high.unionByName(urgent)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# J3 — upsert-key dedup (deterministic canonical row per key).
# ---------------------------------------------------------------------------


@register(
    "dedup_orders_by_key",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_keys
    FROM (
        SELECT o_custkey, o_orderstatus, MIN(o_orderkey) AS first_order
        FROM orders GROUP BY o_custkey, o_orderstatus
    )
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def dedup_orders_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 upsert semantics (ref main.py:50 server-side upsert): one
    canonical row per key. ``dropDuplicates`` keeps an *arbitrary*
    row — non-deterministic under parallelism — so the engine's
    upsert dedup uses an explicit min/max tie-break (same rule a
    MERGE would use)."""
    o = catalog.table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("first_order")
    )
    return (
        per_key.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# S8 — anti-join (quarantine delete) and semi-join.
# ---------------------------------------------------------------------------


@register(
    "anti_join_unshipped",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def anti_join_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8's delete-promoted-rows shape (SURVEY.md §2.6): left anti
    join — shuffle-hash on the join key, no data duplication."""
    o = catalog.table(spark, sf_dir, "orders")
    li = catalog.table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


@register(
    "semi_join_recent_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2001-01-01'
    )
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def semi_join_recent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (existence check without duplication)."""
    c = catalog.table(spark, sf_dir, "customer")
    o = catalog.table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# F19 — full date-bucket set.
# ---------------------------------------------------------------------------


@register(
    "date_bucket_set",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS day_of_week,
           strftime(ts, '%A') AS day_name,
           CAST(weekofyear(ts) AS INTEGER) AS week_of_year,
           CAST(month(ts) AS INTEGER) AS month_number,
           strftime(ts, '%B') AS month_name,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3, 4, 5, 6
    ORDER BY week_of_year, day_of_week, hour_of_day
    """,
)
def date_bucket_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 (dashboard slicers): hour/day-of-week/day-name/ISO-week/
    month buckets — all Catalyst date functions, partition-prunable
    at scale."""
    from ..functions import datetime_buckets as dtb

    ev = catalog.table(spark, sf_dir, "events")
    return (
        dtb.with_time_buckets(ev, "ts")
        .groupBy(
            "hour_of_day", "day_of_week", "day_name", "week_of_year", "month_number", "month_name"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("week_of_year", "day_of_week", "hour_of_day")
    )


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
    "rollup_sales",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY order_status, order_priority
    """,
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals in one pass (partial aggregation still
    applies — far cheaper than N separate group-bys at scale)."""
    o = catalog.table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec(F.col("o_totalprice"))).cast("double").alias("total_amount"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("order_status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("order_priority"),
            "n_orders",
            "total_amount",
        )
        .orderBy("order_status", "order_priority")
    )


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
    "cube_sales",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY order_status, order_priority
    """,
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass (rollup's
    sibling — SURVEY.md §2.7 grouping-sets row)."""
    o = catalog.table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("order_status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("order_priority"),
            "n_orders",
        )
        .orderBy("order_status", "order_priority")
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
