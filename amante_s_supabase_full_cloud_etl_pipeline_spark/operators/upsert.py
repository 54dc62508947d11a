"""Idempotent keyed upsert (SURVEY.md S5/S6/J3).

The reference relies on Supabase's server-side ``upsert``
(ref main.py:50,85) for idempotent re-loads. The engine's native
equivalent is a keyed MERGE:

- ``dedup_latest`` — collapse a batch to one canonical row per key
  *before* writing (the pre-upload dedup README.md:109 claims but
  main.py never does). Uses a deterministic tie-break, not
  ``dropDuplicates`` (which keeps an arbitrary row under
  parallelism).
- ``merge_upsert`` — MERGE INTO semantics between a target table and
  a source batch: matched keys take the source row, unmatched target
  rows survive, new keys append. On Delta/Iceberg this is the
  built-in MERGE; the parquet-only local fallback is the equivalent
  anti-join + union plan (same shuffle shape: one exchange per side
  on the key).

At scale: the target is partitioned; a real deployment pairs this
with partition pruning on the merge key's date column so only
touched partitions rewrite (classic hive-style upsert compaction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """One deterministic row per key: latest by ``order_by`` columns
    (ties broken by the column list itself being total)."""
    ordering = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """MERGE: source rows win on key conflict; target rows without a
    conflicting key survive; source must already be key-unique
    (apply :func:`dedup_latest` first)."""
    survivors = target.join(source.select(*keys), list(keys), "left_anti")
    return survivors.unionByName(source)
