"""Corpus bigram language model + perplexity quality scoring
(charter extension, SURVEY.md §2.10).

The CCNet/KenLM-style quality gate for LLM training data: fit a
cheap n-gram LM, score every document's per-token log-probability,
and filter (or stratify) on the resulting perplexity. Here the model
is a word-bigram LM with additive (add-alpha) smoothing, fit and
applied entirely as DataFrame aggregations and joins:

- **Fit** = two hash aggregations over the exploded bigram table
  (gram counts, then context counts as a re-aggregation of the
  gram-count table — model-sized, not corpus-sized) plus one
  distinct-count for the vocabulary size. At 100 TB the model tables
  are themselves large; they stay distributed (no driver collect, no
  broadcast of the model).
- **Score** = two equi-joins of the document bigram table against
  the model (on gram, then on context word) followed by one grouped
  aggregation per document. Join keys are single well-distributed
  string columns; the model side is post-aggregation (one row per
  gram), so frequent grams skew only the probe side — AQE skew-join
  splits handle that.
- **Float determinism** (the registry's cross-engine hash contract):
  each bigram's log-prob is rounded to 6 decimals and cast to
  DECIMAL(18,6) BEFORE the per-document sum, so the sum is exact and
  aggregation-order-independent; only the final per-document average
  and perplexity are computed in double, from identical operands in
  any engine.

Reference use (ref has nothing comparable — this is the extension
family): fit on a trusted corpus via ``fit_bigram_lm``, score a
crawl via ``score_bigram_lm`` (out-of-vocabulary grams fall back to
the smoothing floor through left joins + coalesce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import tracked_persist
from .text import shingles_from_tokens, tokens

#: additive-smoothing pseudo-count
DEFAULT_ALPHA = 0.5


def doc_bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, w1, gram) — one row per bigram OCCURRENCE. Tokens are
    materialized once per row before shingling (see
    shingles_from_tokens); docs with < 2 tokens contribute nothing."""
    return (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(shingles_from_tokens(F.col("_toks"), 2)).alias("gram"))
        .withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
    )


def fit_bigram_lm(bi: DataFrame, vocab_source: DataFrame | None = None,
                  text_col: str = "text") -> dict[str, DataFrame]:
    """Fit the model from a bigram-occurrence table (doc_bigrams).

    Returns distributed model tables:
      grams    — (gram, n2): bigram occurrence counts
      contexts — (w1, n1):   context occurrence counts, derived by
                 re-aggregating the gram counts (model-sized input)
      vocab    — 1-row (v):  vocabulary size, for the smoothing
                 denominator; joined in as a broadcast scalar

    ``vocab_source`` (the docs table) must be given to count the
    vocabulary; it is scanned once, map-side, for a distinct count.
    """
    if vocab_source is None:
        raise ValueError("fit_bigram_lm needs vocab_source=docs for the vocabulary size")
    grams = bi.groupBy("gram").agg(F.count(F.lit(1)).alias("n2"))
    contexts = (
        grams.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .groupBy("w1")
        .agg(F.sum("n2").alias("n1"))
    )
    vocab = (
        vocab_source.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    return {"grams": grams, "contexts": contexts, "vocab": vocab}


def score_bigram_lm(
    bi: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Per-document LM quality: (id, n_bigrams, avg_logp, ppl).

    avg_logp = mean over the doc's bigrams of
        log2((n2 + alpha) / (n1 + alpha * V))
    with n2/n1 = 0 for out-of-model grams/contexts (left joins), and
    ppl = 2^(-avg_logp). Low perplexity ⇒ the document looks like the
    model's corpus — the CCNet head/middle/tail filter signal."""
    a = F.lit(float(alpha))
    scored = (
        bi.join(model["grams"], "gram", "left")
        .join(model["contexts"], "w1", "left")
        .crossJoin(F.broadcast(model["vocab"]))
        .select(
            F.col(id_col),
            F.round(
                F.log2(
                    (F.coalesce(F.col("n2"), F.lit(0)) + a)
                    / (F.coalesce(F.col("n1"), F.lit(0)) + a * F.col("v"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    n = F.count(F.lit(1))
    avg = F.sum("logp").cast("double") / n
    return (
        scored.groupBy(id_col)
        .agg(
            n.alias("n_bigrams"),
            avg.alias("avg_logp"),
            F.round(F.pow(F.lit(2.0), -avg), 4).alias("ppl"),
        )
    )


def bigram_lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Self-scored corpus perplexity: fit on ``docs``, score ``docs``.
    The bigram table feeds both the model aggregation and the scoring
    joins, so it is persisted once (at 100 TB: written durable)."""
    bi = tracked_persist(doc_bigrams(docs, text_col, id_col))
    model = fit_bigram_lm(bi, vocab_source=docs, text_col=text_col)
    return score_bigram_lm(bi, model, id_col, alpha)
