"""Gopher-rule quality signals: differential vs a sequential Python
reference plus corpus band-filter invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# -- Gopher quality rules --------------------------------------------------


def _py_gopher(text):
    toks = [t for t in text.split() if t]
    lines = [ln for ln in text.split("\n") if ln.strip()]
    n = len(toks)
    import re

    safe = lambda a, b: a / b if b else 0.0
    return {
        "n_tok": n,
        "mean_word_len": safe(sum(len(t) for t in toks), n),
        "symbol_word_ratio": safe(
            len(re.findall(r"#|\.\.\.|…", text)), n
        ),
        "frac_bullet_lines": safe(
            sum(ln.strip()[:1] in ("-", "*", "•") for ln in lines), len(lines)
        ),
        "frac_ellipsis_lines": safe(
            sum(bool(re.search(r"(\.\.\.|…)$", ln.strip())) for ln in lines),
            len(lines),
        ),
        "frac_alpha_words": safe(
            sum(bool(re.search("[A-Za-z]", t)) for t in toks), n
        ),
        "n_stop_hits": sum(
            t in ("the", "and", "of", "to", "a", "in", "is", "it") for t in toks
        ),
    }


def test_gopher_signals_match_reference(spark):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.text import (
        gopher_signals,
    )

    texts = [
        "the cat sat on the mat and it is a fine day in spring",
        "- item one\n- item two\n- item three",
        "to be continued...\nand more…\nplain line",
        "#### 1234 5678 !!!",
        "",
        "a " * 60,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: r["s"].asDict()
        for r in df.select("i", gopher_signals(F.col("text")).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        exp = _py_gopher(t)
        for k, v in exp.items():
            assert got[i][k] == pytest.approx(v), (i, k, got[i][k], v)


def test_gopher_filter_bands_on_corpus(spark, sf_dir):
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.text import (
        gopher_filter,
        gopher_signals,
    )

    docs = catalog.table(spark, sf_dir, "documents")
    kept = docs.filter(gopher_filter(F.col("text"), min_tokens=10))
    n_kept, n_all = kept.count(), docs.count()
    assert 0 < n_kept < n_all
    # every survivor satisfies every threshold
    s = kept.select(gopher_signals(F.col("text")).alias("s"))
    bad = s.filter(
        (F.col("s.n_tok") < 10)
        | (F.col("s.mean_word_len") < 3.0)
        | (F.col("s.mean_word_len") > 10.0)
        | (F.col("s.symbol_word_ratio") > 0.1)
        | (F.col("s.frac_alpha_words") < 0.8)
        | (F.col("s.n_stop_hits") < 2)
    )
    assert bad.count() == 0
