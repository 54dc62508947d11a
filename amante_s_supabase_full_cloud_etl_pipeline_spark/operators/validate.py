"""Validation split + quarantine reprocess (SURVEY.md P7, S8).

The reference splits transformed rows into a clean fact load and a
quarantine table on a boolean predicate (ref main.py:443-454, intent
README.md:113-119 — the literal code has two latent bugs recorded in
SURVEY.md §2.2 P7; this engine implements the documented intent).

Spark-first shape: ONE pass computes the predicate as a column; both
outputs filter on it. With the fact table cached or written through
``foreachBatch``, the source is scanned once — not twice like a
naive "run the pipeline per sink" translation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: columns whose null-ness quarantines a row (README.md:117 "missing
#: dimension data"), and columns that must be non-negative.
DEFAULT_REQUIRED = ("items",)
DEFAULT_NON_NEGATIVE = ("quantity", "total_order_amount", "received_amount")


def valid_predicate(
    required: tuple[str, ...] = DEFAULT_REQUIRED,
    non_negative: tuple[str, ...] = DEFAULT_NON_NEGATIVE,
) -> Column:
    """Boolean validity column. Matches the reference's comparison
    semantics: a NULL amount is *not* negative (pandas ``NaN < 0`` is
    False), so nullable amounts stay in the clean set."""
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    for c in non_negative:
        # NULL-safe: `~(col < 0)` alone would be NULL for null amounts
        # and silently drop the row from BOTH splits.
        cond = cond & (F.col(c).isNull() | (F.col(c) >= 0))
    return cond


def validation_split(
    df: DataFrame,
    required: tuple[str, ...] = DEFAULT_REQUIRED,
    non_negative: tuple[str, ...] = DEFAULT_NON_NEGATIVE,
) -> tuple[DataFrame, DataFrame]:
    """→ (clean, quarantine). Evaluate ``df`` once (cache upstream or
    use inside foreachBatch) and both frames share the scan."""
    ok = valid_predicate(required, non_negative)
    return df.filter(ok), df.filter(~ok)


def reprocess_quarantine(
    quarantine: DataFrame,
    fact: DataFrame,
    key_cols: tuple[str, ...],
    required: tuple[str, ...] = DEFAULT_REQUIRED,
    non_negative: tuple[str, ...] = DEFAULT_NON_NEGATIVE,
) -> tuple[DataFrame, DataFrame]:
    """S8 (ref README.md:119 ``reprocess_quarantine`` RPC, SQL not in
    repo): re-evaluate quarantined rows after dimension fixes; promote
    now-valid rows into the fact set and anti-join them out of the
    quarantine table.

    Returns ``(new_fact, remaining_quarantine)``.
    """
    ok = valid_predicate(required, non_negative)
    promoted = quarantine.filter(ok)
    remaining = quarantine.join(promoted.select(*key_cols), list(key_cols), "left_anti")
    return fact.unionByName(promoted), remaining


def reprocess_quarantine_tables(
    fact_table,
    quarantine_table,
    key_cols: tuple[str, ...],
    order_by: tuple[str, ...],
    required: tuple[str, ...] = DEFAULT_REQUIRED,
    non_negative: tuple[str, ...] = DEFAULT_NON_NEGATIVE,
) -> int:
    """S8 over snapshot-isolated tables: re-validate the quarantine
    snapshot, MERGE the now-valid rows into the fact table (keyed
    upsert — a re-promoted row replaces any stale fact copy), and
    commit the shrunken quarantine as a new snapshot. Readers never
    observe a half-promoted state on either table; a crash between
    the two commits leaves promoted rows present in BOTH tables,
    which the next reprocess run resolves (promotion is idempotent
    under the fact table's keyed MERGE). Returns the number of
    promoted rows."""
    quarantine = quarantine_table.read()
    ok = valid_predicate(required, non_negative)
    promoted = quarantine.filter(ok)
    n = promoted.count()
    if n == 0:
        return 0
    fact_table.merge(promoted, list(key_cols), list(order_by))
    remaining = quarantine.join(
        promoted.select(*key_cols), list(key_cols), "left_anti"
    )
    quarantine_table.overwrite(remaining)
    return n
