"""Ordered funnel analysis over the events stream (charter analytics
extension): for each user, the earliest strictly-ordered completion
of a step sequence (view → click → purchase ...), optionally bounded
to a conversion window after the first step — the Amplitude/PostHog
query shape, absent from the reference's dashboard but the first
thing an events table gets asked.

Relational construction (no Python, no per-user state): step 0 is a
grouped min; each later step i left-joins the step's events back on
the user and takes ``min(ts WHERE ts > t_{i-1} AND ts ≤ t_0 +
window)`` — the earliest valid continuation given the earliest
prefix. SEMANTICS: the funnel is anchored at each user's FIRST
step-0 event. Without ``within`` this greedy chain provably reaches
maximal depth (exchange argument: the greedy step-i time is ≤ any
valid chain's, so it never forecloses a later step). WITH ``within``
the window is anchored at that first occurrence — a user whose only
completion starts from a LATER step-0 event counts as not converted,
the deterministic single-anchor semantics this operator documents
and its oracle mirrors (per-anchor maximal conversion is a different,
k-times-more-expensive query).

Scale shape: k-1 aggregations + k-1 equi-joins on the user key, all
hash-partitioned on ``user_col`` — Spark reuses one partitioning
across the chain (AQE coalesces), nothing is ever per-event
sequential, and ``steps`` is small and fixed (funnels are 3-6 steps).
A 100 TB events table funnels with k shuffles of per-user rows, not
events."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    within: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, t_0 .. t_{k-1}, depth): per user, the timestamps of the
    earliest ordered completion (strictly increasing ts; all steps
    within ``within`` of t_0 when given), nulls from the first missed
    step on; ``depth`` = number of completed steps (≥1 — users who
    never performed step 0 don't appear)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    u = F.col(user_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts_col).alias("t_0"))
    )
    deadline = (
        (F.col("t_0") + F.expr(f"INTERVAL {within}")) if within else F.lit(None)
    )
    for i, step in enumerate(steps[1:], 1):
        nxt = events.filter(F.col(type_col) == step).select(
            u.alias("user"), F.col(ts_col).alias("_ts")
        )
        valid = F.col("_ts") > F.col(f"t_{i - 1}")
        if within:
            valid = valid & (F.col("_ts") <= deadline)
        carried = ["user"] + [f"t_{j}" for j in range(i)]
        cur = (
            cur.join(nxt, "user", "left")
            .groupBy(*[F.col(c) for c in carried])
            .agg(F.min(F.when(valid, F.col("_ts"))).alias(f"t_{i}"))
        )
    depth = F.lit(1)
    for i in range(1, len(steps)):
        depth = depth + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    # a null step makes every later step null by construction (the
    # valid predicate compares against a null bound) — depth is the
    # prefix length
    return cur.withColumn("depth", depth.cast("int"))


def funnel_summary(
    events: DataFrame,
    steps: Sequence[str],
    within: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, n_users, share_of_entered): how many users
    reached each step, sorted by step — the funnel chart."""
    times = funnel_times(events, steps, within, user_col, ts_col, type_col)
    entered = times.count()
    rows = []
    for i, s in enumerate(steps):
        rows.append(
            times.filter(F.col("depth") >= i + 1)
            .agg(F.count(F.lit(1)).alias("n_users"))
            .select(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                "n_users",
                (F.col("n_users").cast("double") / F.lit(float(entered or 1))).alias(
                    "share_of_entered"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step_idx")
