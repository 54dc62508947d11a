"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew; explicit salting remains the tool when one join key
dominates so heavily that even split partitions overwhelm an executor
(classic at 100 TB: a null/default key holding 10% of the fact
table).

- :func:`salted_join` — append a random salt 0..S-1 to the skewed
  (big) side; replicate the other side S× with every salt value; join
  on (key, salt). Each hot key fans out over S reducers.
- :func:`two_phase_agg_sum` — pre-aggregate on (key, salt) then
  re-aggregate on key: bounds the biggest reducer at the cost of an
  extra (tiny) shuffle. Spark's map-side partial aggregation already
  does this implicitly for algebraic aggregates; the explicit form is
  for non-algebraic pipelines (e.g. collect_list-style state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and the other side replicated.

    ``rand`` is seed-fixed for reproducibility; correctness does not
    depend on the salt distribution — every (key, salt) pair on the
    skewed side finds its replicated partner."""
    salted = skewed.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Σ value per key via (key, salt) partial sums then a final
    per-key combine — bounds any single reducer to ~1/S of a hot key."""
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value_col).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(f"sum_{value_col}"))
