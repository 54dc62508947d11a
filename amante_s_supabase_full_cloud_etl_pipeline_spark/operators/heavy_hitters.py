"""Approximate heavy hitters via mergeable Misra-Gries summaries —
bounded-memory frequent-items over a column of any cardinality.

Exact `groupBy(col).count()` + top-k needs state proportional to the
number of DISTINCT values; at 100 TB a high-cardinality column (URLs,
user ids, shingles) makes that the dominant shuffle. The Misra-Gries
summary keeps only ``capacity`` counters per partition with the
classic guarantee, and MG summaries are MERGEABLE (Agarwal et al.,
"Mergeable Summaries", PODS'12): summing per-key counters across
partition summaries preserves the bound

    true_count − n/capacity  ≤  estimate  ≤  true_count

so every value with true frequency above ``n/capacity`` is guaranteed
to surface, with a per-row error certificate. The Spark shape:

1. one ``mapInPandas`` pass builds a ≤``capacity``-counter summary
   per partition (the only state anywhere — O(capacity), never
   O(distinct));
2. the partition summaries (≤ capacity × n_partitions tiny rows)
   hash-aggregate by value — a shuffle of summaries, not data;
3. the scalar total row count broadcasts back as the error bound.

Estimates depend on partition layout (any MG's do); the GUARANTEE
does not — tests assert the sandwich bound and the
must-surface property under several partitionings, never bitwise
equality."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("value", StringType()),
        StructField("mg_count", LongType()),
    ]
)


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 1000, min_share: float | None = None
) -> DataFrame:
    """(value, est_count, max_err) for candidate frequent values of
    ``col`` (read as string; nulls ignored). For every emitted row the
    true count lies in [est_count, est_count + max_err] with
    ``max_err = ceil(n / capacity)``; every value with true count
    > n/capacity is guaranteed to be emitted. ``min_share`` (e.g.
    0.01) additionally keeps only candidates whose UPPER bound
    reaches that share of n."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    cap = int(capacity)

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for batch in batches:
            for v in batch["_v"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    # decrement-all step (dict rebuild keeps it O(cap))
                    counters = {k: c - 1 for k, c in counters.items() if c > 1}
        if counters:
            yield pd.DataFrame(
                {
                    "value": list(counters.keys()),
                    "mg_count": pd.Series(list(counters.values()), dtype="int64"),
                }
            )

    src = df.select(F.col(col).cast("string").alias("_v"))
    summaries = src.mapInPandas(summarize, _SUMMARY_SCHEMA)
    totals = src.agg(
        F.count("_v").alias("_n")  # count() skips nulls, matching the kernel
    )
    out = (
        summaries.groupBy("value")
        .agg(F.sum("mg_count").alias("est_count"))
        .crossJoin(F.broadcast(totals))
        .select(
            "value",
            "est_count",
            F.ceil(F.col("_n") / F.lit(cap)).cast("long").alias("max_err"),
            F.col("_n").alias("_n"),
        )
    )
    if min_share is not None:
        out = out.filter(
            (F.col("est_count") + F.col("max_err")).cast("double")
            >= F.lit(float(min_share)) * F.col("_n")
        )
    return out.drop("_n").orderBy(F.desc("est_count"), "value")
