"""Funnel analysis: hand-fixture semantics (ordering, window anchor,
missed steps), DuckDB differential on the events table via the local
oracle harness, and the summary's monotone step counts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.funnel import (
    funnel_summary,
    funnel_times,
)

from .oracle_harness import compare

STEPS = ("view", "click", "purchase")

FUNNEL_ORACLE = """
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
SELECT "user", t_0, t_1, t_2,
       1 + CASE WHEN t_1 IS NULL THEN 0 ELSE 1 END
         + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END AS depth
FROM t2 ORDER BY "user"
"""


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_funnel_hand_fixture_semantics(spark):
    rows = [
        # user 1: full ordered funnel inside the window
        (1, _t(10), 1, "view"), (2, _t(10, 30), 1, "click"), (3, _t(11), 1, "purchase"),
        # user 2: purchase BEFORE click → depth 2 (order is strict)
        (4, _t(10), 2, "view"), (5, _t(10, 20), 2, "purchase"), (6, _t(10, 40), 2, "click"),
        # user 3: click outside the 1h window anchored at FIRST view
        (7, _t(10), 3, "view"), (8, _t(10, 50), 3, "view"), (9, _t(11, 30), 3, "click"),
        # user 4: never enters (no view)
        (10, _t(10), 4, "click"), (11, _t(10, 5), 4, "purchase"),
        # user 5: simultaneous ts is NOT strictly after → not counted
        (12, _t(10), 5, "view"), (13, _t(10), 5, "click"),
    ]
    got = {
        r["user"]: (r["t_1"], r["t_2"], r["depth"])
        for r in funnel_times(_ev(spark, rows), STEPS, within="1 hour").collect()
    }
    assert set(got) == {1, 2, 3, 5}  # user 4 never entered
    assert got[1] == (_t(10, 30), _t(11), 3)
    assert got[2] == (_t(10, 40), None, 2)  # strict order: early purchase ignored
    assert got[3] == (None, None, 1)  # anchored at the FIRST view
    assert got[5] == (None, None, 1)  # strictly-after comparison

    summary = funnel_summary(_ev(spark, rows), STEPS, within="1 hour").collect()
    assert [(r["step"], r["n_users"]) for r in summary] == [
        ("view", 4), ("click", 2), ("purchase", 1)
    ]
    shares = [r["share_of_entered"] for r in summary]
    assert shares[0] == 1.0 and shares == sorted(shares, reverse=True)


def test_funnel_differential_vs_duckdb(spark, sf_dir):
    """Same anchored semantics computed by DuckDB correlated
    aggregates on the real events table — full-row compare through
    the local oracle harness (stricter than the driver's hash)."""

    def q(spark_, sf):
        ev = catalog.table(spark_, sf, "events")
        return funnel_times(ev, STEPS, within="6 hours").orderBy("user")

    compare(spark, sf_dir, q, FUNNEL_ORACLE, name="funnel_times")


def test_funnel_without_window_is_maximal_depth(spark):
    """No window → greedy earliest chain reaches maximal depth even
    when later anchors would look better."""
    rows = [
        (1, _t(9), 1, "view"), (2, _t(10), 1, "view"),
        (3, _t(12), 1, "click"), (4, _t(15), 1, "purchase"),
    ]
    got = funnel_times(_ev(spark, rows), STEPS).collect()[0]
    assert (got["t_0"], got["t_1"], got["t_2"], got["depth"]) == (
        _t(9), _t(12), _t(15), 3
    )
