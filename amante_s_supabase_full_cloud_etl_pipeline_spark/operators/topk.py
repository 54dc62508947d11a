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
(struct comparison), matching the "top" in top-k; columns named in
``ascending`` sort ascending instead (the usual id tiebreak).

Mixed-direction implementation (ADVICE r4): a numeric ascending key
is rewritten to its negation so the fast binary struct comparison
still applies; any NON-numeric ascending key (string doc ids, ...)
switches the fold to ``array_sort`` with an explicit comparator
lambda — slower per comparison but correct for every orderable type,
where negation would miscompare or fail outright under ANSI rules.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
)
_NUMERIC_TYPES = _INTEGRAL_TYPES + (
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _mixed_comparator(dirs: Sequence[tuple[str, bool]]):
    """array_sort comparator ordering structs by ``dirs`` =
    [(field, is_ascending), ...]; nulls sort LAST in either direction
    (a null score is never "top", a null tiebreak id follows real
    ids). Built right-to-left so earlier fields dominate."""

    def cmp(left: Column, right: Column) -> Column:
        expr: Column = F.lit(0)
        for field, asc in reversed(list(dirs)):
            a, b = left[field], right[field]
            first, second = (F.lit(-1), F.lit(1)) if asc else (F.lit(1), F.lit(-1))
            expr = (
                F.when(a.isNull() & b.isNull(), expr)
                .when(a.isNull(), F.lit(1))
                .when(b.isNull(), F.lit(-1))
                .when(a < b, first)
                .when(a > b, second)
                .otherwise(expr)
            )
        return expr.cast("int")

    return cmp


def grouped_topk(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[str],
    k: int,
    ascending: Sequence[str] = (),
) -> DataFrame:
    """Top ``k`` rows per group, ordered descending by ``order_by``
    except columns listed in ``ascending`` (include a unique
    tiebreaker for determinism). Returns the input columns plus
    ``rank`` (1-based). State bound: each partial buffer holds one
    partition's share of one group; the shuffle carries at most
    k × n_partitions rows per group."""
    if k < 1:
        raise ValueError("k must be >= 1")
    group_by = list(group_by)
    order_by = list(order_by)
    ascending = list(ascending)
    unknown = [c for c in ascending if c not in order_by]
    if unknown:
        raise ValueError(f"ascending columns not in order_by: {unknown}")

    schema = {f.name: f.dataType for f in df.schema.fields}
    numeric_asc = [
        c for c in ascending if isinstance(schema.get(c), _NUMERIC_TYPES)
    ]
    drop_after = []
    if ascending and len(numeric_asc) == len(ascending):
        # fast path: order-invert numeric ascending keys, keep binary
        # struct comparison. Integral keys invert via bitwise NOT
        # (~x = -x-1: strictly order-reversing, and defined at the
        # type's MIN value where arithmetic negation overflows — ANSI
        # throws, legacy silently wraps and mis-orders); fractional/
        # decimal keys negate (their ranges are symmetric).
        for c in ascending:
            neg = f"__neg_{c}"
            if isinstance(schema.get(c), _INTEGRAL_TYPES):
                df = df.withColumn(neg, F.bitwise_not(F.col(c)))
            else:
                df = df.withColumn(neg, -F.col(c))
            order_by[order_by.index(c)] = neg
            drop_after.append(neg)
        ascending = []

    payload = [c for c in df.columns if c not in group_by]
    # sort key first so struct comparison orders by it; negate-free
    # descending via sort_array(..., asc=False)
    row = F.struct(
        *[F.col(c) for c in order_by],
        *[F.col(c) for c in payload if c not in order_by],
    )

    if ascending:
        comparator = _mixed_comparator(
            [(c, c in ascending) for c in order_by]
        )

        def fold(col):
            return F.slice(F.array_sort(col, comparator), 1, k)

    else:

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
    out = final.select(
        *group_by,
        *[F.col(f"_row.{c}").alias(c) for c in ordered_payload],
        (F.col("_rank0") + 1).cast("int").alias("rank"),
    )
    return out.drop(*drop_after) if drop_after else out
