"""Driver-checked registry queries for the round-3 analytics
operators (funnel, retention, Misra-Gries + Count-Min sketches,
theta sketch cubes). Related operators share one labeled driver row
(the registry holds the driver's 50-slot budget), with each leg's
full semantics still separately pinned in pytest.

Hash-hazard notes (tests/oracle_harness.py audit): the funnel/
retention panel is long-format with all-double values (funnel step
times as epoch-microsecond doubles — exact: micros < 2^53 — and -1
for missed steps, never NULL-in-numeric)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, register

#: > distinct l_partkey at the DRIVER's correctness SF (sf0.01:
#: 2,000 distinct) -> MG never decrements and is exact there. NOT
#: true at sf0.1 (20,000 distinct), so the row pins its run SF via
#: golden_sf — the same mechanism every SF-specific-regime row uses.
_HH_CAP = 4096
_HH_SHARE = 0.0008


@register(
    "funnel_retention_panel",
    oracle="""
    WITH t0 AS (
        SELECT user_id AS u, min(ts) AS t_0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t1 AS (
        SELECT t0.u, t0.t_0,
               min(e.ts) FILTER (
                   WHERE e.ts > t0.t_0
                     AND e.ts <= t0.t_0 + INTERVAL 6 HOUR
               ) AS t_1
        FROM t0 LEFT JOIN events e
          ON e.user_id = t0.u AND e.event_type = 'click'
        GROUP BY t0.u, t0.t_0
    ),
    t2 AS (
        SELECT t1.u, t1.t_0, t1.t_1,
               min(e.ts) FILTER (
                   WHERE e.ts > t1.t_1
                     AND e.ts <= t1.t_0 + INTERVAL 6 HOUR
               ) AS t_2
        FROM t1 LEFT JOIN events e
          ON e.user_id = t1.u AND e.event_type = 'purchase'
        GROUP BY t1.u, t1.t_0, t1.t_1
    ),
    funnel_wide AS (
        SELECT u,
               CAST(COALESCE(epoch_us(t_0), -1) AS DOUBLE) AS t0_us,
               CAST(COALESCE(epoch_us(t_1), -1) AS DOUBLE) AS t1_us,
               CAST(COALESCE(epoch_us(t_2), -1) AS DOUBLE) AS t2_us,
               CAST(1 + CASE WHEN t_1 IS NULL THEN 0 ELSE 1 END
                      + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END AS DOUBLE) AS depth
        FROM t2
    ),
    active AS (
        SELECT DISTINCT user_id AS u,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS period
        FROM events
    ),
    cohorts AS (SELECT u, min(period) AS cohort FROM active GROUP BY u),
    sized AS (
        SELECT cohort, count(DISTINCT u) AS cohort_size
        FROM cohorts GROUP BY cohort
    ),
    grid AS (
        SELECT c.cohort,
               CAST(date_diff('day', c.cohort, a.period) / 7 AS BIGINT)
                   AS periods_since,
               count(DISTINCT a.u) AS n_active
        FROM active a JOIN cohorts c USING (u)
        GROUP BY c.cohort, periods_since
    ),
    retention_wide AS (
        SELECT g.cohort, g.periods_since, g.n_active, s.cohort_size,
               CAST(g.n_active AS DOUBLE) / s.cohort_size AS retention
        FROM grid g JOIN sized s USING (cohort)
    )
    SELECT * FROM (
        SELECT 'funnel' AS part, CAST(u AS VARCHAR) AS k1, '' AS k2,
               metric, value
        FROM funnel_wide
        UNPIVOT (value FOR metric IN (t0_us, t1_us, t2_us, depth))
        UNION ALL
        SELECT 'retention' AS part, strftime(cohort, '%Y-%m-%d') AS k1,
               CAST(periods_since AS VARCHAR) AS k2, metric, value
        FROM (
            SELECT cohort, periods_since,
                   CAST(n_active AS DOUBLE) AS n_active,
                   CAST(cohort_size AS DOUBLE) AS cohort_size, retention
            FROM retention_wide
        )
        UNPIVOT (value FOR metric IN (n_active, cohort_size, retention))
    ) ORDER BY part, k1, k2, metric
    """,
)
def funnel_retention_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two canonical product-analytics queries as one long-format
    panel. ``funnel`` rows (operators/funnel.py): per user the
    earliest strictly-ordered view -> click -> purchase chain within
    6h of the FIRST view (single-anchor semantics the oracle mirrors
    with correlated filtered aggregates); step times are
    epoch-microsecond doubles (exact below 2^53) with -1 for missed
    steps. ``retention`` rows (operators/retention.py): weekly
    first-seen cohorts x distinct active weeks with exact integer
    period arithmetic. Long format keeps one schema without NULLs —
    the shape a metrics store ingests."""
    from ..operators.funnel import funnel_times
    from ..operators.retention import cohort_retention

    ev = catalog.table(spark, sf_dir, "events")
    # ONE unpivot per family over its single aggregation — a
    # per-metric union would re-execute the funnel/retention plans
    # once per leg
    times = funnel_times(ev, ("view", "click", "purchase"), within="6 hours")
    funnel_wide = times.select(
        F.col("user").cast("string").alias("k1"),
        *[
            F.coalesce(F.unix_micros(F.col(f"t_{i}")), F.lit(-1))
            .cast("double")
            .alias(f"t{i}_us")
            for i in range(3)
        ],
        F.col("depth").cast("double").alias("depth"),
    )
    funnel_long = funnel_wide.unpivot(
        ["k1"], ["t0_us", "t1_us", "t2_us", "depth"], "metric", "value"
    ).select(
        F.lit("funnel").alias("part"), "k1", F.lit("").alias("k2"),
        "metric", "value",
    )
    ret = cohort_retention(ev, granularity="week")
    ret_wide = ret.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("k1"),
        F.col("periods_since").cast("string").alias("k2"),
        F.col("n_active").cast("double").alias("n_active"),
        F.col("cohort_size").cast("double").alias("cohort_size"),
        "retention",
    )
    ret_long = ret_wide.unpivot(
        ["k1", "k2"], ["n_active", "cohort_size", "retention"], "metric", "value"
    ).select(
        F.lit("retention").alias("part"), "k1", "k2", "metric", "value"
    )
    return funnel_long.unionByName(ret_long).orderBy("part", "k1", "k2", "metric")


@register(
    "point_freq_sketches",
    oracle=f"""
    WITH tot AS (SELECT COUNT(l_partkey) AS n FROM lineitem)
    SELECT * FROM (
        SELECT 'misra_gries' AS method, CAST(l_partkey AS VARCHAR) AS key,
               COUNT(*) AS est_count,
               CAST(CEIL(CAST(tot.n AS DOUBLE) / {_HH_CAP}) AS BIGINT) AS max_err
        FROM lineitem, tot
        GROUP BY l_partkey, tot.n
        HAVING COUNT(*) + CEIL(CAST(tot.n AS DOUBLE) / {_HH_CAP})
               >= {_HH_SHARE} * tot.n
        UNION ALL
        SELECT 'count_min' AS method, source AS key,
               COUNT(*) AS est_count,
               CAST(FLOOR(exp(1) / 2048 * (SELECT COUNT(source) FROM documents))
                    AS BIGINT) + 1 AS max_err
        FROM documents GROUP BY source
    ) ORDER BY method, key
    """,
    golden_sf=DRIVER_SF,
)
def point_freq_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both mergeable point-frequency sketches in one labeled result,
    checked at the driver SF (golden_sf pin) where both exactness
    regimes hold. ``misra_gries`` (operators/heavy_hitters.py) over
    lineitem part keys: capacity 4096 exceeds sf0.01's 2,000 distinct
    keys, so no counter decrements and the summaries are EXACT —
    which is what lets a plain GROUP BY oracle the sketch (the
    approximation regime's bounds, which sf0.1's 20,000 keys would
    enter, are pinned in tests/test_heavy_hitters.py).
    ``count_min`` (operators/countmin.py) over document sources:
    cell-wise-summed d×w arrays are bit-identical under any
    partitioning, and at 20 keys x width 2048 collision-free, so
    estimates equal true counts (the >=true one-sided bound under
    forced collisions is pinned in tests/test_countmin.py); max_err
    carries each method's certificate."""
    import math

    from ..operators.countmin import count_min_sketch
    from ..operators.heavy_hitters import heavy_hitters

    li = catalog.table(spark, sf_dir, "lineitem")
    mg = heavy_hitters(li, "l_partkey", capacity=_HH_CAP, min_share=_HH_SHARE).select(
        F.lit("misra_gries").alias("method"),
        F.col("value").alias("key"),
        "est_count",
        "max_err",
    )
    docs = catalog.table(spark, sf_dir, "documents")
    cm = count_min_sketch(docs, "source", depth=4, width=2048)
    # bounded collect: the query list for CM point-estimates must not
    # assume low key cardinality — cap like every other driver-side
    # collect in the repo (the sketch itself is cardinality-safe).
    # orderBy BEFORE limit (r12 advice): distinct().limit(N) keeps an
    # ARBITRARY subset once cardinality exceeds the cap, making the
    # golden-pinned query list partitioning-dependent; ordering first
    # makes the kept set the deterministic N smallest sources.
    _CM_QUERY_CAP = 1024
    sources = [
        r["source"]
        for r in docs.select("source").distinct()
        .orderBy("source").limit(_CM_QUERY_CAP).collect()
    ]
    bound = int(math.e / cm.width * cm.n) + 1
    cm_rows = spark.createDataFrame(
        [("count_min", s, cm.estimate(s), bound) for s in sources],
        "method string, key string, est_count long, max_err long",
    )
    return mg.unionByName(cm_rows).orderBy("method", "key")


@register(
    "sketch_distinct_cube",
    oracle="""
    WITH seg AS (SELECT DISTINCT event_type AS s, user_id AS u FROM events),
    pairs AS (
        SELECT x.s AS sa, y.s AS sb
        FROM (SELECT DISTINCT s FROM seg) x
        JOIN (SELECT DISTINCT s FROM seg) y ON x.s < y.s
    ),
    inter AS (
        SELECT a.s AS sa, b.s AS sb, COUNT(*) AS ni
        FROM seg a JOIN seg b ON a.u = b.u AND a.s < b.s
        GROUP BY 1, 2
    ),
    sizes AS (SELECT s, COUNT(*) AS n FROM seg GROUP BY s)
    SELECT * FROM (
        SELECT 'day_type' AS grain,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS k1,
               event_type AS k2, COUNT(DISTINCT user_id) AS estimate
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'type', 'ALL', event_type, COUNT(DISTINCT user_id)
        FROM events GROUP BY 3
        UNION ALL
        SELECT 'total', 'ALL', 'ALL', COUNT(DISTINCT user_id) FROM events
        UNION ALL
        SELECT 'pair_intersection', p.sa, p.sb, COALESCE(i.ni, 0)
        FROM pairs p LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
        UNION ALL
        SELECT 'pair_union', p.sa, p.sb, x.n + y.n - COALESCE(i.ni, 0)
        FROM pairs p
        JOIN sizes x ON x.s = p.sa JOIN sizes y ON y.s = p.sb
        LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    ) ORDER BY grain, k1, k2
    """,
)
def sketch_distinct_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregated distinct-user analytics from ONE set of theta
    sketch partials (operators/sketches.py): per-(day, type) grains,
    the per-type and grand-total rollups answered by MERGING the tiny
    partials (never rescanning facts — the only way a distinct-count
    dashboard stays interactive at 100 TB), and pairwise audience
    intersection/union via theta set algebra (what HLL cannot do).
    At test cardinalities the sketches are in EXACT mode (< 4096
    entries), so every estimate equals the true count and plain
    COUNT(DISTINCT) + relational overlap SQL oracles the whole merge
    machinery; estimation-regime error is pinned in
    tests/test_sketches.py."""
    from ..operators.sketches import (
        theta_partials,
        theta_rollup,
        theta_segment_overlap,
    )

    ev = catalog.table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    parts = theta_partials(ev, ["day", "event_type"], "user_id")
    daily = parts.select(
        F.lit("day_type").alias("grain"), F.col("day").alias("k1"),
        F.col("event_type").alias("k2"),
        F.theta_sketch_estimate(F.col("theta_sketch")).cast("long").alias("estimate"),
    )
    by_type = theta_rollup(parts, ["event_type"]).select(
        F.lit("type").alias("grain"), F.lit("ALL").alias("k1"),
        F.col("event_type").alias("k2"),
        F.col("estimate").cast("long").alias("estimate"),
    )
    total = theta_rollup(parts, []).select(
        F.lit("total").alias("grain"), F.lit("ALL").alias("k1"),
        F.lit("ALL").alias("k2"),
        F.col("estimate").cast("long").alias("estimate"),
    )
    overlap = theta_segment_overlap(ev, "event_type", "user_id")
    inter = overlap.select(
        F.lit("pair_intersection").alias("grain"),
        F.col("segment_a").alias("k1"), F.col("segment_b").alias("k2"),
        F.col("est_intersection").alias("estimate"),
    )
    union = overlap.select(
        F.lit("pair_union").alias("grain"),
        F.col("segment_a").alias("k1"), F.col("segment_b").alias("k2"),
        F.col("est_union").alias("estimate"),
    )
    return (
        daily.unionByName(by_type).unionByName(total)
        .unionByName(inter).unionByName(union)
        .orderBy("grain", "k1", "k2")
    )
