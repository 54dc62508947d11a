"""Cleaning / coercion column expressions (reference-parity F-ops).

Each helper reproduces a pandas behavior from the reference transform
kernel as a pure Catalyst expression — JVM-side, whole-stage-codegen
friendly, no Python UDFs (SURVEY.md §2.9 target). Reference evidence
cited per function as ``main.py:line``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sanitize_name(name: str) -> str:
    """Sink-side column-name sanitize (ref main.py:30): lower, and
    ``' '``/``'/'``/``'-'`` → ``'_'``."""
    out = name.lower()
    for ch in (" ", "/", "-"):
        out = out.replace(ch, "_")
    return out


def sanitize_columns(df: DataFrame) -> DataFrame:
    """P2: apply :func:`sanitize_name` to every column (ref main.py:30,65)."""
    return df.toDF(*[sanitize_name(c) for c in df.columns])


def strip_columns(df: DataFrame) -> DataFrame:
    """P1: strip whitespace from header names (ref main.py:104)."""
    return df.toDF(*[c.strip() for c in df.columns])


def extract_or_null(col: Column, pattern: str, group: int = 1) -> Column:
    """``str.extract`` parity: Spark's regexp_extract returns ``''`` on
    miss where pandas returns NaN (ref main.py:112-135) — wrap in
    NULLIF so misses are proper nulls."""
    return F.nullif(F.regexp_extract(col, pattern, group), F.lit(""))


def title_case(col: Column) -> Column:
    """F13 (ref main.py:385 ``str.title``): implemented as ``initcap``
    (word-boundary = whitespace). Documented divergence from pandas:
    pandas also re-capitalizes after any non-alphanumeric *inside* a
    token (``"w/popping"`` → ``"W/Popping"`` vs initcap
    ``"W/popping"``); the POS vocabulary never hits that case
    (corrections normalize to ``"w/ Popping"``), pinned by tests."""
    return F.initcap(col)


def strip_thousands_and_coerce(col: Column) -> Column:
    """F15 (ref main.py:389-393): drop thousands separators then
    numeric-coerce; ``try_cast`` yields null on a failed parse exactly
    like ``pd.to_numeric(errors='coerce')`` (plain cast would throw
    under Spark's default ANSI mode)."""
    return F.regexp_replace(col.cast("string"), ",", "").try_cast("double")


def scrub_nan_inf(col: Column) -> Column:
    """F16 (ref main.py:41-45): NaN/±Inf → null for a double column,
    vectorizing the reference's per-record Python loop."""
    bad = F.isnan(col) | (F.abs(col) == F.lit(float("inf")))
    return F.when(bad, F.lit(None)).otherwise(col)


def scrub_doubles(df: DataFrame) -> DataFrame:
    """Apply :func:`scrub_nan_inf` to every double/float column."""
    doubles = {f.name for f in df.schema.fields if f.dataType.typeName() in ("double", "float")}
    if not doubles:
        return df
    return df.withColumns({c: scrub_nan_inf(F.col(c)) for c in doubles})


def coalesce_uncategorized(col: Column) -> Column:
    """F17 (ref main.py:402-403): null category → 'Uncategorized'."""
    return F.coalesce(col, F.lit("Uncategorized"))
