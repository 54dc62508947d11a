"""Driver-checked registry queries for the round-3 analytics and
curation operators (funnel, retention, grouped top-k, expectations,
Misra-Gries heavy hitters, forward as-of join).

Each round-3 operator already has pytest coverage (hand fixtures +
local DuckDB differentials); these registrations put the same
semantics in front of the DRIVER's correctness gate so every claimed
operator has a green CORRECTNESS row, per the registry contract.

Hash-hazard notes (tests/oracle_harness.py audit): funnel step
timestamps are emitted as epoch-microsecond BIGINTs coalesced to -1
(never NULL-in-numeric); the forward as-of query emits NULLs only in
the same timestamp/double shape as `events_asof_join`, which was
hash-green in CORRECTNESS_r02 (allowlisted with that reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, golden_oracle, register

_HH_CAP = 4096  # > distinct l_partkey at every test SF -> MG is exact
_HH_SHARE = 0.0008


@register(
    "funnel_user_depths",
    oracle="""
    WITH t0 AS (
        SELECT user_id AS "user", min(ts) AS t_0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t1 AS (
        SELECT t0."user", t0.t_0,
               min(e.ts) FILTER (
                   WHERE e.ts > t0.t_0
                     AND e.ts <= t0.t_0 + INTERVAL 6 HOUR
               ) AS t_1
        FROM t0 LEFT JOIN events e
          ON e.user_id = t0."user" AND e.event_type = 'click'
        GROUP BY t0."user", t0.t_0
    ),
    t2 AS (
        SELECT t1."user", t1.t_0, t1.t_1,
               min(e.ts) FILTER (
                   WHERE e.ts > t1.t_1
                     AND e.ts <= t1.t_0 + INTERVAL 6 HOUR
               ) AS t_2
        FROM t1 LEFT JOIN events e
          ON e.user_id = t1."user" AND e.event_type = 'purchase'
        GROUP BY t1."user", t1.t_0, t1.t_1
    )
    SELECT "user",
           COALESCE(epoch_us(t_0), -1) AS t0_us,
           COALESCE(epoch_us(t_1), -1) AS t1_us,
           COALESCE(epoch_us(t_2), -1) AS t2_us,
           CAST(1 + CASE WHEN t_1 IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END AS INTEGER) AS depth
    FROM t2 ORDER BY "user"
    """,
)
def funnel_user_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (operators/funnel.py): per user the earliest
    strictly-ordered view -> click -> purchase chain within 6h of the
    FIRST view (single-anchor semantics the oracle mirrors with
    correlated filtered aggregates). Step times are epoch-microsecond
    BIGINTs with -1 for missed steps, so no NULL ever reaches a
    numeric column in the driver hash."""
    from ..operators.funnel import funnel_times

    ev = catalog.table(spark, sf_dir, "events")
    t = funnel_times(ev, ("view", "click", "purchase"), within="6 hours")
    return t.select(
        "user",
        *[
            F.coalesce(F.unix_micros(F.col(f"t_{i}")), F.lit(-1)).alias(f"t{i}_us")
            for i in range(3)
        ],
        "depth",
    ).orderBy("user")


@register(
    "cohort_retention_weekly",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id AS "user",
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS period
        FROM events
    ),
    cohorts AS (
        SELECT "user", min(period) AS cohort FROM active GROUP BY "user"
    ),
    sized AS (
        SELECT cohort, count(DISTINCT "user") AS cohort_size
        FROM cohorts GROUP BY cohort
    ),
    grid AS (
        SELECT c.cohort,
               CAST(date_diff('day', c.cohort, a.period) / 7 AS BIGINT) AS periods_since,
               count(DISTINCT a."user") AS n_active
        FROM active a JOIN cohorts c USING ("user")
        GROUP BY c.cohort, periods_since
    )
    SELECT g.cohort, g.periods_since, g.n_active, s.cohort_size,
           CAST(g.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM grid g JOIN sized s USING (cohort)
    ORDER BY g.cohort, g.periods_since
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/retention.py): first-seen
    week cohorts x distinct active weeks. Exact integer period
    arithmetic (date_trunc + day-diff/7), so both engines agree
    bit-for-bit; the final retention ratio is one double division of
    identical integer operands."""
    from ..operators.retention import cohort_retention

    ev = catalog.table(spark, sf_dir, "events")
    return cohort_retention(ev, granularity="week")


@register(
    "grouped_topk_orders",
    oracle="""
    SELECT o_orderpriority, o_totalprice, o_orderkey, rank FROM (
        SELECT o_orderpriority, o_totalprice, o_orderkey,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey DESC
               ) AS INTEGER) AS rank
        FROM orders
    ) WHERE rank <= 3
    ORDER BY o_orderpriority, rank
    """,
)
def grouped_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase grouped top-k (operators/topk.py): top-3 orders by
    total price per priority class, identical to the ROW_NUMBER
    window form under the (price, orderkey) total order — but the
    partial top-k bounds every aggregation buffer and the shuffle
    carries k x n_partitions candidates per group, never the group."""
    from ..operators.topk import grouped_topk

    orders = catalog.table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    return grouped_topk(
        orders, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], k=3
    ).orderBy("o_orderpriority", "rank")


@register(
    "expectations_violation_rows",
    oracle="""
    SELECT doc_id, lang, source, n_chars,
           array_to_string(list_filter([
               CASE WHEN NOT (lang IN ('en', 'de', 'fr', 'es'))
                    THEN 'accepted_values_lang' END,
               CASE WHEN NOT (n_chars >= 64 AND n_chars <= 520)
                    THEN 'in_range_n_chars' END,
               CASE WHEN NOT regexp_matches(text, '^[A-Z]')
                    THEN 'matches_text' END
           ], x -> x IS NOT NULL), ',') AS failed_expectations
    FROM documents
    WHERE NOT (lang IN ('en', 'de', 'fr', 'es'))
       OR NOT (n_chars >= 64 AND n_chars <= 520)
       OR NOT regexp_matches(text, '^[A-Z]')
    ORDER BY doc_id
    """,
)
def expectations_violation_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (operators/
    expectations.py, the P7 generalization): the violations frame of a
    three-check suite over documents, with the per-row failed-check
    labels flattened to a comma-joined string (suite order) so the
    output carries no array column into the driver hash."""
    from ..operators.expectations import accepted_values, in_range, matches, violations

    docs = catalog.table(spark, sf_dir, "documents")
    suite = [
        accepted_values("lang", ["en", "de", "fr", "es"]),
        in_range("n_chars", lo=64, hi=520),
        matches("text", "^[A-Z]"),
    ]
    return (
        violations(docs.select("doc_id", "lang", "source", "n_chars", "text"), suite)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.concat_ws(",", "failed_expectations").alias("failed_expectations"),
        )
        .orderBy("doc_id")
    )


@register(
    "heavy_hitters_partkeys",
    oracle=f"""
    WITH tot AS (SELECT COUNT(l_partkey) AS n FROM lineitem)
    SELECT CAST(l_partkey AS VARCHAR) AS value,
           COUNT(*) AS est_count,
           CAST(CEIL(CAST(tot.n AS DOUBLE) / {_HH_CAP}) AS BIGINT) AS max_err
    FROM lineitem, tot
    GROUP BY l_partkey, tot.n
    HAVING COUNT(*) + CEIL(CAST(tot.n AS DOUBLE) / {_HH_CAP})
           >= {_HH_SHARE} * tot.n
    ORDER BY est_count DESC, value
    """,
)
def heavy_hitters_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (operators/heavy_hitters.py) over
    lineitem part keys. The capacity (4096) exceeds the distinct part
    count at every test SF, so no counter is ever decremented and the
    mergeable summaries are EXACT — which is precisely what lets a
    plain GROUP BY oracle the sketch (the approximation regime's
    error bound and must-surface guarantee are pinned in
    tests/test_heavy_hitters.py under forced-small capacities)."""
    from ..operators.heavy_hitters import heavy_hitters

    li = catalog.table(spark, sf_dir, "lineitem")
    return heavy_hitters(li, "l_partkey", capacity=_HH_CAP, min_share=_HH_SHARE)


@register(
    "sketch_cube_daily_users",
    oracle="""
    SELECT 'day_type' AS grain,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type, COUNT(DISTINCT user_id) AS estimate
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'type', 'ALL', event_type, COUNT(DISTINCT user_id)
    FROM events GROUP BY 3
    UNION ALL
    SELECT 'total', 'ALL', 'ALL', COUNT(DISTINCT user_id) FROM events
    ORDER BY grain, day, event_type
    """,
)
def sketch_cube_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregated distinct-user cube (operators/sketches.py):
    theta-sketch partials stored per (day, event_type) in ONE corpus
    pass, then the per-type and grand-total grains answered by
    MERGING the tiny partials — no second scan of the facts, the only
    way a distinct-count dashboard stays interactive at 100 TB. At
    the test cardinalities the sketches are in EXACT mode (< 4096
    entries), so every estimate equals the true distinct count and a
    plain COUNT(DISTINCT) oracles the whole merge machinery; the
    estimation-regime error bound is pinned in
    tests/test_sketches.py."""
    from ..operators.sketches import theta_partials, theta_rollup

    ev = catalog.table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    parts = theta_partials(ev, ["day", "event_type"], "user_id")
    daily = parts.select(
        F.lit("day_type").alias("grain"), "day", "event_type",
        F.theta_sketch_estimate(F.col("theta_sketch")).cast("long").alias("estimate"),
    )
    by_type = theta_rollup(parts, ["event_type"]).select(
        F.lit("type").alias("grain"), F.lit("ALL").alias("day"), "event_type",
        F.col("estimate").cast("long").alias("estimate"),
    )
    total = theta_rollup(parts, []).select(
        F.lit("total").alias("grain"), F.lit("ALL").alias("day"),
        F.lit("ALL").alias("event_type"),
        F.col("estimate").cast("long").alias("estimate"),
    )
    return (
        daily.unionByName(by_type).unionByName(total)
        .orderBy("grain", "day", "event_type")
    )


@register(
    "theta_event_overlap",
    oracle="""
    WITH seg AS (SELECT DISTINCT event_type AS s, user_id AS u FROM events),
    sizes AS (SELECT s, COUNT(*) AS n FROM seg GROUP BY s),
    pairs AS (
        SELECT x.s AS segment_a, y.s AS segment_b
        FROM sizes x JOIN sizes y ON x.s < y.s
    ),
    inter AS (
        SELECT a.s AS sa, b.s AS sb, COUNT(*) AS ni
        FROM seg a JOIN seg b ON a.u = b.u AND a.s < b.s
        GROUP BY 1, 2
    )
    SELECT p.segment_a, p.segment_b, sa.n AS est_a, sb.n AS est_b,
           COALESCE(i.ni, 0) AS est_intersection,
           sa.n + sb.n - COALESCE(i.ni, 0) AS est_union
    FROM pairs p
    JOIN sizes sa ON sa.s = p.segment_a
    JOIN sizes sb ON sb.s = p.segment_b
    LEFT JOIN inter i ON i.sa = p.segment_a AND i.sb = p.segment_b
    ORDER BY 1, 2
    """,
)
def theta_event_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via theta-sketch set algebra
    (operators/sketches.py): distinct-user intersection and union
    estimates for every event-type pair, computed ONLY from
    per-segment partials (one scan, then a dimension-sized pair
    join) — the sketch answer to 'users who did A and B' that HLL
    cannot give. Exact-mode regime at test cardinalities, so the
    oracle is the exact relational overlap; estimation-regime
    accuracy is pinned in tests/test_sketches.py."""
    from ..operators.sketches import theta_segment_overlap

    ev = catalog.table(spark, sf_dir, "events")
    return theta_segment_overlap(ev, "event_type", "user_id")


@register(
    "events_asof_forward",
    oracle="""
    WITH pur AS (
        SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'purchase'
    ),
    err AS (
        SELECT user_id, ts, MAX(value) AS evalue
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ),
    m AS (
        SELECT p.user_id, p.ts, p.event_id, p.value,
               min(e.ts) FILTER (
                   WHERE e.ts >= p.ts
                     AND date_diff('second', p.ts, e.ts) <= 1800
               ) AS asof_ts
        FROM pur p LEFT JOIN err e ON e.user_id = p.user_id
        GROUP BY p.user_id, p.ts, p.event_id, p.value
    )
    SELECT m.user_id, m.ts, m.event_id, m.value, m.asof_ts,
           e2.evalue AS asof_evalue
    FROM m LEFT JOIN err e2
      ON e2.user_id = m.user_id AND e2.ts = m.asof_ts
    ORDER BY m.user_id, m.event_id
    """,
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (operators/asof.py, pandas
    merge_asof parity): each purchase picks up the user's EARLIEST
    error within the next 30 minutes. For the forward direction,
    earliest-then-null-if-beyond-tolerance is equivalent to
    earliest-within-tolerance (later matches are only farther), which
    is what the oracle's filtered min computes; the tolerance compares
    whole epoch seconds on both sides (Spark unix_timestamp floors,
    DuckDB date_diff('second') counts boundaries — identical). NULLs
    on misses share the timestamp/double shape of the hash-green
    `events_asof_join` row."""
    from ..operators.asof import asof_join

    ev = catalog.table(spark, sf_dir, "events")
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("evalue"))
    )
    return asof_join(
        pur,
        err,
        key=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "evalue"],
        direction="forward",
        tolerance=1800,
    ).select(
        "user_id", "ts", "event_id", "value", "asof_ts", "asof_evalue"
    ).orderBy("user_id", "event_id")
