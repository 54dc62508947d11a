"""Shared helpers for registry queries.

Float-determinism contract (verified empirically vs DuckDB at sf0.01
with a forced 32-partition shuffle): cast the RAW clean-decimal
columns (prices, discounts — 2-decimal business values stored as
double) to DECIMAL(18,2) *before* any arithmetic, keep the arithmetic
and aggregation in exact decimal, and cast only the final scalar to
DOUBLE. Exact decimal ops are associative, so Spark's parallel
partial aggregation matches DuckDB's serial evaluation bit-for-bit.

Anti-pattern (measurably wrong): computing a product in double and
then casting the noisy result to decimal — the two engines round
~0.1% of rows differently near half-boundaries.

Ratios/means: produce them as one FINAL double division of two
exact aggregates (identical operands → identical IEEE result); never
re-aggregate a noisy double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: Column) -> Column:
    """Exact-decimal view of a clean 2-decimal business column."""
    return col.cast(DEC)


def dec_sum(col: Column) -> Column:
    """Order-independent exact sum of a clean-decimal column → double."""
    return F.sum(dec(col)).cast("double")


def revenue_dec() -> Column:
    """Per-lineitem revenue in exact decimal arithmetic."""
    return dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount")))


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dec_sum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


SQL_REVENUE_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)
