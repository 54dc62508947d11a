"""Pre-aggregated distinct-count sketch cubes — the 100 TB pattern
for "distinct users by X over any time range": store mergeable
sketch PARTIALS at the finest grain once (one corpus pass), then
answer every coarser rollup by merging the tiny partials, never
rescanning the facts. Spark ships Apache DataSketches natively
(``hll_sketch_agg``/``hll_union_agg`` for distinct counts,
``theta_*`` for set algebra), so the whole family stays JVM-side.

Why sketches and not exact counts: COUNT(DISTINCT) partials are not
mergeable (distinct sets don't add), so every new rollup needs its
own full shuffle of the raw keys; sketch partials merge associatively
from storage.

Determinism nuance (measured, and why the registry rows are built on
theta): DataSketches HLL estimates depend on the internal merge path
(sparse/dense promotions), so an HLL estimate can shift by ~1% with
partition layout — HLL accuracy is therefore pytest-pinned with
tolerances, never golden-pinned. Theta sketches below their nominal
k (4096) entries are in EXACT mode — the sketch is literally the
hash set, estimates equal exact distinct counts on any layout — so
theta-based registry rows sit behind plain COUNT(DISTINCT) oracles
in that regime, with the estimation-regime error pytest-pinned.

Theta also adds what HLL cannot: intersection/difference, i.e.
audience overlap ("users who did A and B") from per-segment partials
alone.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame, keys: Sequence[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch (binary) + its estimate per ``keys`` group —
    the stored cube base. ``lgk`` trades size (2^lgk registers) for
    accuracy (~1.04/sqrt(2^lgk) rel. std. error)."""
    # aggregate the sketch ONCE and derive the estimate in a follow-up
    # select — two aggregate expressions would sketch the corpus twice
    return (
        df.groupBy(*keys)
        .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll_sketch"))
        .withColumn("estimate", F.hll_sketch_estimate(F.col("hll_sketch")))
    )


def hll_rollup(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge stored partials up to a coarser grain: group by the
    surviving ``keys`` (possibly empty for the grand total) and union
    the sketches — no raw data touched."""
    keys = list(keys)
    merged = F.hll_sketch_estimate(F.hll_union_agg(F.col("hll_sketch"))).alias(
        "estimate"
    )
    if keys:
        return partials.groupBy(*keys).agg(merged)
    return partials.agg(merged)


def theta_rollup(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge stored theta partials (column ``theta_sketch``) up to a
    coarser grain. In exact mode (distincts below the sketch's k =
    4096 nominal entries) the sketch IS the hash set, so estimates
    equal exact distinct counts and are independent of partition
    layout and merge order; above k the estimate keeps ~1/sqrt(k)
    relative error (pytest-pinned)."""
    keys = list(keys)
    merged = F.theta_sketch_estimate(
        F.theta_union_agg(F.col("theta_sketch"))
    ).alias("estimate")
    if keys:
        return partials.groupBy(*keys).agg(merged)
    return partials.agg(merged)


def theta_partials(
    df: DataFrame, keys: Sequence[str] | str, value_col: str
) -> DataFrame:
    """One theta sketch per ``keys`` group — the stored base for both
    rollups and set algebra."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.theta_sketch_agg(F.col(value_col)).alias("theta_sketch")
    )


def theta_segment_overlap(
    df: DataFrame, segment_col: str, value_col: str
) -> DataFrame:
    """Pairwise audience overlap between segments, computed ONLY from
    per-segment theta partials: (segment_a, segment_b, est_a, est_b,
    est_intersection, est_union) for each unordered pair a < b. The
    raw table is scanned once for the partials; the pair join carries
    one sketch per segment — dimension-sized at any corpus scale."""
    parts = theta_partials(df, segment_col, value_col)
    a = parts.select(
        F.col(segment_col).alias("segment_a"), F.col("theta_sketch").alias("_ska")
    )
    b = parts.select(
        F.col(segment_col).alias("segment_b"), F.col("theta_sketch").alias("_skb")
    )
    pairs = a.join(b, F.col("segment_a") < F.col("segment_b"))
    est = F.theta_sketch_estimate
    return pairs.select(
        "segment_a",
        "segment_b",
        est(F.col("_ska")).cast("long").alias("est_a"),
        est(F.col("_skb")).cast("long").alias("est_b"),
        est(F.theta_intersection(F.col("_ska"), F.col("_skb")))
        .cast("long")
        .alias("est_intersection"),
        est(F.theta_union(F.col("_ska"), F.col("_skb")))
        .cast("long")
        .alias("est_union"),
    ).orderBy("segment_a", "segment_b")
