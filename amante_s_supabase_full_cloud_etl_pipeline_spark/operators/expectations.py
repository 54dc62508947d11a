"""Declarative data-quality expectations (the dbt-tests /
Great-Expectations surface): the reference hard-codes ONE validation
predicate (SURVEY.md P7 — null keys / negative amounts → quarantine);
real pipelines accumulate dozens. This module makes them data:

    suite = [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", lo=0.0),
        references("o_custkey", customer_df, "c_custkey"),
    ]
    summary = run_suite(df, suite)        # one row per expectation
    bad = violations(df, suite)           # rows + which checks failed

Every check compiles to a plain Column predicate ("this row is OK"),
so ``violations`` is the same single-pass labeled-routes shape as the
engine's P7 validation split (one scan, boolean columns, no UDFs) and
composes directly with the quarantine sink. ``references`` is the one
non-map check: a broadcast-friendly left anti-join semantics expressed
as a join against the (usually dimension-sized) referenced keys.

Scale notes: ``unique`` needs a count per key — one hash aggregation
on the checked columns joined back as a semi-predicate; everything
else is map-only. The summary runs all map-side checks in ONE
aggregation pass over a single scan.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    kind: str
    ok: Column | None  # row-level predicate; None for non-map checks
    meta: tuple = ()


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", "not_null", F.col(col).isNotNull())


def accepted_values(col: str, values: Sequence) -> Expectation:
    return Expectation(
        f"accepted_values_{col}",
        "accepted_values",
        F.col(col).isNull() | F.col(col).isin(*values),
    )


def in_range(col: str, lo=None, hi=None) -> Expectation:
    ok = F.lit(True)
    if lo is not None:
        ok = ok & (F.col(col) >= F.lit(lo))
    if hi is not None:
        ok = ok & (F.col(col) <= F.lit(hi))
    return Expectation(f"in_range_{col}", "in_range", F.col(col).isNull() | ok)


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches_{col}", "matches", F.col(col).isNull() | F.col(col).rlike(pattern)
    )


def unique(*cols: str) -> Expectation:
    return Expectation("unique_" + "_".join(cols), "unique", None, tuple(cols))


def references(col: str, dim: DataFrame, dim_col: str) -> Expectation:
    return Expectation(
        f"references_{col}", "references", None, (col, dim, dim_col)
    )


def _flags(df: DataFrame, suite: Sequence[Expectation]) -> tuple[DataFrame, list[str]]:
    """df + one boolean ok-column per expectation (all kinds)."""
    out = df
    names = []
    for e in suite:
        flag = f"_ok_{e.name}"
        names.append(e.name)
        if e.ok is not None:
            out = out.withColumn(flag, F.coalesce(e.ok, F.lit(False)))
        elif e.kind == "unique":
            cols = list(e.meta)
            counts = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .select(*cols, F.lit(False).alias(flag))
            )
            out = out.join(counts, cols, "left").withColumn(
                flag, F.coalesce(F.col(flag), F.lit(True))
            )
        elif e.kind == "references":
            col, dim, dim_col = e.meta
            keys = dim.select(F.col(dim_col).alias(col)).distinct().withColumn(
                flag, F.lit(True)
            )
            out = out.join(F.broadcast(keys), col, "left").withColumn(
                flag,
                F.col(col).isNull() | F.coalesce(F.col(flag), F.lit(False)),
            )
        else:  # pragma: no cover - dataclass constructors cover all kinds
            raise ValueError(f"unknown expectation kind {e.kind}")
    return out, names


def run_suite(df: DataFrame, suite: Sequence[Expectation]) -> DataFrame:
    """(expectation, kind, n_violations, n_rows, passed) — one row per
    expectation; map-side checks fold into a single aggregation pass."""
    flagged, names = _flags(df, suite)
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum((~F.col(f"_ok_{n}")).cast("long")).alias(n) for n in names
    ]
    row = flagged.agg(*aggs).collect()[0]
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (e.name, e.kind, int(row[e.name]), int(row["_total"]), row[e.name] == 0)
            for e in suite
        ],
        "expectation string, kind string, n_violations long, n_rows long, passed boolean",
    )


def violations(df: DataFrame, suite: Sequence[Expectation]) -> DataFrame:
    """The failing rows with a ``failed_expectations`` array naming
    every violated check — the quarantine payload (P7 generalized:
    one scan, labeled routes)."""
    flagged, names = _flags(df, suite)
    failed = F.filter(
        F.array(
            *[
                F.when(~F.col(f"_ok_{n}"), F.lit(n)).otherwise(F.lit(None))
                for n in names
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        flagged.withColumn("failed_expectations", failed)
        .filter(F.size("failed_expectations") > 0)
        .drop(*[f"_ok_{n}" for n in names])
    )
