"""Bigram-LM perplexity operator: hand-computed model on a tiny
corpus, cross-corpus scoring with OOV fallback, and the quality
signal's direction (model-like text scores lower perplexity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.lm import (
    bigram_lm_perplexity,
    doc_bigrams,
    fit_bigram_lm,
    score_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_bigram_model(spark):
    # Corpus: "a b a b" + "a b" → bigram counts: (a b)→3, (b a)→1.
    # Context counts (occurrences as first word): a→3, b→1. V=2.
    docs = _docs(spark, [(1, "a b a b"), (2, "a b")])
    got = {r["doc_id"]: r for r in bigram_lm_perplexity(docs).collect()}

    def logp(n2, n1):
        return round(math.log2((n2 + 0.5) / (n1 + 0.5 * 2)), 6)

    # doc 1: grams (a b), (b a), (a b) → 2*logp(3,3) + logp(1,1)
    avg1 = (2 * logp(3, 3) + logp(1, 1)) / 3
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["avg_logp"] - avg1) < 1e-9
    assert abs(got[1]["ppl"] - round(2 ** (-avg1), 4)) < 1e-9
    # doc 2: one gram (a b)
    assert got[2]["n_bigrams"] == 1
    assert abs(got[2]["avg_logp"] - logp(3, 3)) < 1e-9


def test_cross_corpus_scoring_with_oov(spark):
    """Fit on a trusted corpus, score unseen text: OOV grams take the
    smoothing floor via left joins (no crash, no null scores)."""
    trusted = _docs(spark, [(1, "the cat sat"), (2, "the cat ran")])
    model = fit_bigram_lm(doc_bigrams(trusted), vocab_source=trusted)
    crawl = _docs(spark, [(10, "the cat sat"), (11, "zq xv qqq zz")])
    got = {r["doc_id"]: r for r in score_bigram_lm(doc_bigrams(crawl), model).collect()}
    assert got[10]["ppl"] < got[11]["ppl"]  # model-like text ⇒ lower ppl
    assert got[11]["avg_logp"] is not None
    # fully-OOV doc: every gram and context unseen → logp = log2(0.5/(0.5*V))
    v = model["vocab"].first()["v"]
    floor = round(math.log2(0.5 / (0.5 * v)), 6)
    assert abs(got[11]["avg_logp"] - floor) < 1e-9


def test_short_docs_have_no_bigrams(spark):
    docs = _docs(spark, [(1, "word"), (2, ""), (3, "two tokens")])
    out = {r["doc_id"] for r in bigram_lm_perplexity(docs).collect()}
    assert out == {3}
