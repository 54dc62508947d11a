"""Cohort retention: hand-fixture semantics and a DuckDB differential
on the real events table through the local oracle harness."""

from __future__ import annotations

import datetime as dt

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.retention import (
    cohort_retention,
)

from .oracle_harness import compare

RETENTION_ORACLE = """
WITH active AS (
    SELECT DISTINCT user_id AS "user", CAST(date_trunc('week', ts) AS TIMESTAMP) AS period
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
"""


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _d(day, h=12):
    return dt.datetime(2024, 1, day, h)


def test_retention_hand_fixture(spark):
    # week of Jan 1 2024 is Mon Jan 1; week 2 starts Jan 8; week 3 Jan 15
    rows = [
        # cohort week 1: users 1, 2, 3
        (1, _d(2), 1, "view"), (2, _d(3), 2, "view"), (3, _d(5), 3, "view"),
        # user 1 active weeks 2 and 3; user 2 active week 3; user 3 never again
        (4, _d(9), 1, "click"), (5, _d(16), 1, "view"), (6, _d(17), 2, "view"),
        # cohort week 2: user 4, twice in the same week (distinct periods!)
        (7, _d(10), 4, "view"), (8, _d(11), 4, "view"),
    ]
    got = {
        (r["cohort"].day, r["periods_since"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got[(1, 0)] == (3, 3, 1.0)
    assert got[(1, 1)] == (1, 3, 1 / 3)  # only user 1 in week 2
    assert got[(1, 2)] == (2, 3, 2 / 3)  # users 1 and 2 in week 3
    assert got[(8, 0)] == (1, 1, 1.0)  # user 4's double activity counted once
    assert set(got) == {(1, 0), (1, 1), (1, 2), (8, 0)}


def test_retention_differential_vs_duckdb(spark, sf_dir):
    def q(spark_, sf):
        return cohort_retention(catalog.table(spark_, sf, "events"))

    compare(spark, sf_dir, q, RETENTION_ORACLE, name="cohort_retention")
