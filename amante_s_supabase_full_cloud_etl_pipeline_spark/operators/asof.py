"""As-of (point-in-time) join — the time-series join the reference
lacks (SURVEY.md §2.6 "absent from reference; engine gets them
free"): for each left row, the nearest right row per key in the
requested direction, pandas ``merge_asof`` parity:

- ``backward`` (default): latest right row with ``right_ts ≤ left_ts``;
- ``forward``: earliest right row with ``right_ts ≥ left_ts``;
- ``nearest``: whichever of the two is closer (ties → backward);
- ``tolerance``: matches farther than this many seconds (timestamps)
  or units (numerics) are nulled out.

Scale design: the naive formulation is a range join (O(n·m) nested
loop in Spark). All directions here use the union-and-window trick:
tag both sides, union, ONE window per key ordered by (ts, tag) with a
running last/first non-null right value — a single shuffle on the
key, linear work, no range join; ``forward`` is the same frame over
the REVERSED ordering (ts desc), so equal timestamps match in both
directions. This is how production tick-data joins run on Spark;
DuckDB's native ASOF JOIN oracles the backward registry query, and
pandas ``merge_asof`` differentials all three directions in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """Left as-of join; matched columns come back as ``asof_<col>``
    (null when no match in direction/tolerance).

    Tie rules: a right row exactly at the left timestamp matches in
    every direction; among right rows sharing a timestamp the
    window's last-by-union-order wins — pass pre-deduped right sides
    for full determinism; ``nearest`` prefers backward on distance
    ties (pandas convention is the closer row; the tie preference is
    pinned by test)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward, or nearest")
    key = list(key)
    lcols = left.columns
    fill_cols = list(right_cols) + ["__ts"]  # carry the matched ts
    tagged_left = left.select(
        *key,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),  # right rows sort first at equal ts
        *[F.col(c) for c in lcols if c not in key],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r___ts"),
    )
    tagged_right = right.select(
        *key,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in key
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r___ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    def fills(df, descending, prefix):
        order = [F.col("_ts").desc() if descending else F.col("_ts").asc(), "_tag"]
        w = (
            Window.partitionBy(*key)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return df.select(
            "*",
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
                for c in fill_cols
            ],
        )

    filled = fills(unioned, descending=False, prefix="_b_")
    if direction in ("forward", "nearest"):
        filled = fills(filled, descending=True, prefix="_f_")

    rows = filled.filter(F.col("_tag") == 1)

    def dist(matched_ts):
        a, b = F.col("_ts"), matched_ts
        if isinstance(left.schema[left_ts].dataType, TimestampType):
            a, b = F.unix_timestamp(a), F.unix_timestamp(b)
        return F.abs(a - b)

    if direction == "backward":
        pick = {c: F.col(f"_b_{c}") for c in fill_cols}
    elif direction == "forward":
        pick = {c: F.col(f"_f_{c}") for c in fill_cols}
    else:  # nearest: closer match wins, backward on ties
        b_ts, f_ts = F.col("_b___ts"), F.col("_f___ts")
        use_b = f_ts.isNull() | (b_ts.isNotNull() & (dist(b_ts) <= dist(f_ts)))
        pick = {
            c: F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
            for c in fill_cols
        }
    if tolerance is not None:
        within = dist(pick["__ts"]) <= F.lit(tolerance)
        pick = {
            c: F.when(pick["__ts"].isNotNull() & within, v)
            for c, v in pick.items()
        }
    return rows.select(
        *key,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in key and c != left_ts],
        *[pick[c].alias(f"asof_{c}") for c in right_cols],
    )
