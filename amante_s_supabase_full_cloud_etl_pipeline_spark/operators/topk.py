"""Grouped top-k with bounded state — the scalable alternative to
``row_number() OVER (PARTITION BY g ORDER BY v)`` + filter.

The window form shuffles every full row of every group and SORTS
each group in one task; at 100 TB a hot group (one brand with a
billion line items) becomes a single straggler sort partition. The
two-phase form removes both hazards:

1. partial: each (group, input-partition) pair reduces its rows to
   its local top-k — ``slice(sort_array(collect_list(...)), 1, k)``.
   The aggregation buffer holds that partition's SHARE of the group
   (never the whole group: the hot group's work spreads across every
   partition that touches it), and only k survivors leave it;
2. final: the ≤ k × n_partitions candidates per group shuffle (tiny
   — this is where the window form shuffles EVERYTHING) and fold the
   same way;
3. explode back to rows with a dense 1..k rank.

Result is IDENTICAL to the window form under a total order — callers
must include a tiebreaker column in ``order_by`` (the differential
test drives both forms). Ordering is descending by each order column
(struct comparison), matching the "top" in top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[str],
    k: int,
) -> DataFrame:
    """Top ``k`` rows per group, ordered descending by ``order_by``
    (include a unique tiebreaker for determinism). Returns the input
    columns plus ``rank`` (1-based). State bound: each partial buffer
    holds one partition's share of one group; the shuffle carries at
    most k × n_partitions rows per group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    group_by = list(group_by)
    order_by = list(order_by)
    payload = [c for c in df.columns if c not in group_by]
    # sort key first so struct comparison orders by it; negate-free
    # descending via sort_array(..., asc=False)
    row = F.struct(*[F.col(c) for c in order_by], *[F.col(c) for c in payload if c not in order_by])

    def fold(col):
        return F.slice(F.sort_array(col, asc=False), 1, k)

    partial = (
        df.groupBy(*group_by, F.spark_partition_id().alias("_p"))
        .agg(fold(F.collect_list(row)).alias("_top"))
    )
    final = (
        partial.groupBy(*group_by)
        .agg(fold(F.flatten(F.collect_list("_top"))).alias("_top"))
        .select(
            *group_by,
            F.posexplode("_top").alias("_rank0", "_row"),
        )
    )
    ordered_payload = order_by + [c for c in payload if c not in order_by]
    return final.select(
        *group_by,
        *[F.col(f"_row.{c}").alias(c) for c in ordered_payload],
        (F.col("_rank0") + 1).cast("int").alias("rank"),
    )
