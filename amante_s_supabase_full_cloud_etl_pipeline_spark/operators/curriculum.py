"""Curriculum / quality bucketing: assign each document to a quality
quantile bucket (e.g. deciles) so training can sample or order by
quality band.

Scale shape: the naive formulation is ``NTILE(n) OVER (ORDER BY
quality)`` — a GLOBAL window that funnels the corpus through one
partition. The scalable plan computed here is two steps:

1. one aggregation computes the n-1 boundary values (exact
   ``percentile`` by default; ``approximate=True`` swaps in
   ``approx_percentile`` for 100 TB — same plan shape, bounded-memory
   sketch instead of a full sort-based exact percentile),
2. the boundary row (a handful of doubles) broadcasts and each row's
   bucket is a pure comparison — map-side, no shuffle of the corpus.

Bucket semantics: bucket b (1-based) holds rows with
``quality > boundary[b-1]`` and ``quality <= boundary[b]`` (upper
bound inclusive, matching SQL ``quantile_cont`` cut points); rows
equal to a boundary fall in the lower bucket, so ties are
deterministic regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import quality_score


def quality_buckets(
    docs: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    score_col: str | None = None,
    approximate: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Input plus ``quality`` and 1-based ``bucket`` columns. If
    ``score_col`` is given it is used as the quality signal;
    otherwise the engine's ``quality_score`` expression is computed
    from ``text_col``.

    ``approximate=True`` computes the boundaries with
    ``approx_percentile`` (Greenwald-Khanna sketch, error ≤
    1/``accuracy`` in rank): the exact mode's percentile aggregate
    must buffer every value per aggregation state, which at 100 TB is
    the one non-sketchable piece of this plan — the approximate mode
    is the production path there, and a rank-correlation test pins
    how close the two bucketings stay."""
    score = F.col(score_col) if score_col else quality_score(F.col(text_col))
    scored = docs.withColumn("quality", score)
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    frac_arr = F.array(*[F.lit(f) for f in fracs])
    if approximate:
        bounds_expr = F.percentile_approx("quality", frac_arr, F.lit(accuracy))
    else:
        bounds_expr = F.percentile("quality", frac_arr)
    bounds = scored.agg(bounds_expr.cast("array<double>").alias("_bounds"))
    joined = scored.join(F.broadcast(bounds))
    # bucket = 1 + number of boundaries strictly below the value
    bucket = F.lit(1) + F.aggregate(
        F.col("_bounds"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("quality") > b, 1).otherwise(0),
    )
    return joined.select(*docs.columns, "quality", bucket.cast("int").alias("bucket"))
