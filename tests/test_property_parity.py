"""Property tests for the pandas-parity risk spots (SURVEY.md §5.3):
qty default (F6), numeric coercion (F15), regex null-on-miss (F1),
title-case divergence contract (F13).

Each property batches all hypothesis examples into ONE Spark job and
compares against the reference's pandas semantics computed inline
(pandas is the reference implementation, ref main.py:112-393).
"""

from __future__ import annotations

import re

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.functions.cleaning import (
    extract_or_null,
    strip_thousands_and_coerce,
    title_case,
)

TOKEN_ALPHABET = st.text(
    alphabet="abcdefgh XYZ()/x0123456789.,%-", min_size=0, max_size=30
)

NUMBERISH = st.one_of(
    st.from_regex(r"-?[0-9]{1,3}(,[0-9]{3})*(\.[0-9]{1,2})?", fullmatch=True),
    st.text(alphabet="0123456789,.-abc", min_size=0, max_size=12),
)


def spark_vals(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["y"] for r in df.select(expr(F.col("x")).alias("y")).collect()]


@settings(max_examples=15, deadline=None)
@given(st.lists(TOKEN_ALPHABET, min_size=1, max_size=20))
def test_qty_parse_default_matches_pandas(spark, tokens):
    """F6: `x\\s*(\\d+)` extract, float, default 1 (ref main.py:138)."""
    got = spark_vals(
        spark,
        tokens,
        lambda c: F.coalesce(
            extract_or_null(c, r"x\s*(\d+)").try_cast("double"), F.lit(1.0)
        ),
    )
    want = (
        pd.Series(tokens, dtype="object").str.extract(r"x\s*(\d+)", expand=False)
        .astype(float)
        .fillna(1)
        .tolist()
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(NUMBERISH, min_size=1, max_size=20))
def test_thousands_coercion_matches_pandas(spark, values):
    """F15: comma strip + to_numeric(errors='coerce') (ref main.py:389-393)."""
    got = spark_vals(spark, values, strip_thousands_and_coerce)
    ser = pd.Series(values, dtype="object").str.replace(",", "")
    want = pd.to_numeric(ser, errors="coerce")
    for g, w in zip(got, want.tolist()):
        if pd.isna(w):
            # pandas coerces '', '-', '.' etc. to NaN; Spark try_cast → null
            assert g is None or g != g
        else:
            assert g == pytest.approx(w)


@settings(max_examples=15, deadline=None)
@given(st.lists(TOKEN_ALPHABET, min_size=1, max_size=20))
def test_regex_miss_is_null_like_pandas_nan(spark, tokens):
    """F1: str.extract miss → NaN; engine contract: null (not '')."""
    pattern = r"(?i)(Solo|Duo|Medio|Familia)"
    got = spark_vals(spark, tokens, lambda c: extract_or_null(c, pattern))
    want = (
        pd.Series(tokens, dtype="object")
        .str.extract(r"(Solo|Duo|Medio|Familia)", flags=re.I, expand=False)
        .tolist()
    )
    for g, w in zip(got, want):
        if isinstance(w, float):  # NaN
            assert g is None
        else:
            assert g == w


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abc def/GHI-j ", min_size=0, max_size=25), min_size=1, max_size=20))
def test_title_case_contract(spark, values):
    """F13 documented divergence contract (SURVEY.md §7 risk register):
    initcap == pandas str.title on whitespace-separated words; they
    may differ ONLY at non-alpha boundaries *inside* a token (e.g.
    'w/p' → pandas 'W/P', initcap 'W/p'). Assert equality everywhere
    the divergence clause doesn't apply."""
    got = spark_vals(spark, values, title_case)
    want = pd.Series(values, dtype="object").str.title().tolist()
    for src, g, w in zip(values, got, want):
        intra_token_boundary = any(
            re.search(r"[^a-zA-Z\s][a-zA-Z]", tok) for tok in src.split(" ")
        )
        if not intra_token_boundary:
            assert g == w, f"{src!r}: initcap={g!r} pandas={w!r}"
