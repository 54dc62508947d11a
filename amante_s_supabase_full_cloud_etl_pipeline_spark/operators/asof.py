"""As-of (point-in-time) join — the time-series join the reference
lacks (SURVEY.md §2.6 "absent from reference; engine gets them
free"): for each left row, the most recent right row at or before the
left timestamp, optionally within a key.

Scale design: the naive formulation is a range join (O(n·m) nested
loop in Spark). This implementation uses the union-and-window trick:
tag both sides, union, ONE window per key ordered by (ts, tag) taking
the last non-null right value — a single shuffle on the key, linear
work, no range join. This is how production tick-data joins run on
Spark; DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row + the latest ``right_cols``
    whose ``right_ts`` ≤ ``left_ts`` within the same ``key`` (nulls
    when no prior right row exists).

    Tie rule: a right row exactly at the left timestamp matches
    (``≤``); among right rows sharing a timestamp the last by the
    union's sort (tag asc) wins — pass pre-deduped right sides for
    full determinism.
    """
    key = list(key)
    lcols = left.columns
    tagged_left = left.select(
        *key,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),  # right rows sort first at equal ts
        *[F.col(c) for c in lcols if c not in key],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    tagged_right = right.select(
        *key,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    return (
        filled.filter(F.col("_tag") == 1)
        .select(
            *key,
            F.col("_ts").alias(left_ts),
            *[F.col(c) for c in lcols if c not in key and c != left_ts],
            *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_cols],
        )
    )
