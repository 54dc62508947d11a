"""Model-based document scoring — the fastText/DCLM-style classifier
filter family: learn token log-odds weights from a labeled subset
(Bernoulli Naive Bayes with +1 smoothing) and score every document
as the sum of its distinct tokens' weights plus the class prior.
This is the "quality classifier" shape of modern curation pipelines
(FineWeb-Edu, DCLM) reduced to its relational core: training is two
hash aggregations over (token, class) document frequencies, the
model is a dimension-sized weights table, and scoring is an
explode + broadcast join + sum — no gradient loop, no UDF, and every
step is SQL-expressible, so the whole train-then-score pipeline sits
behind a DuckDB oracle.

Determinism contract: document frequencies and class sizes are exact
integers; each token weight is ``round(ln(smoothed odds ratio), 6)``
cast to DECIMAL(18,6) — rounding BEFORE the per-document sum makes
the (otherwise order-sensitive) float additions exact and
order-independent; the final score is one double cast of an exact
decimal sum.

Scale shape: training shuffles (token, class) count rows (map-side
combined); the learned vocabulary is ``min_df``-pruned and
broadcast for scoring, so the corpus-side scan never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

_W = "decimal(18,6)"


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) — DISTINCT tokens per document (Bernoulli NB uses
    presence, not counts)."""
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )


def train_token_weights(
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Learn per-token log-odds weights from ``positive`` (a boolean
    Column over ``docs``). Returns (token, weight DECIMAL(18,6)):

        weight = round(ln( ((pos_df+1)/(P+2)) / ((neg_df+1)/(N+2)) ), 6)

    where pos_df/neg_df are the token's document frequencies per
    class and P/N the class sizes. Tokens seen in fewer than
    ``min_df`` documents are dropped (vocabulary pruning)."""
    labeled = docs.select(F.col(id_col), positive.alias("_pos"))
    sizes = labeled.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("_P"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("_N"),
    )
    df_counts = (
        _doc_tokens(docs, text_col, id_col)
        .join(labeled, id_col)
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("_pos_df"),
            F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("_neg_df"),
        )
        .filter(F.col("_pos_df") + F.col("_neg_df") >= min_df)
    )
    odds = (
        (F.col("_pos_df") + F.lit(1.0)) * (F.col("_N") + F.lit(2.0))
    ) / ((F.col("_neg_df") + F.lit(1.0)) * (F.col("_P") + F.lit(2.0)))
    return df_counts.crossJoin(F.broadcast(sizes)).select(
        "token", F.round(F.log(odds), 6).cast(_W).alias("weight")
    )


def class_prior(docs: DataFrame, positive: Column, id_col: str = "doc_id") -> DataFrame:
    """One-row (prior DECIMAL(18,6)) = round(ln((P+1)/(N+1)), 6)."""
    labeled = docs.select(F.col(id_col), positive.alias("_pos"))
    return labeled.agg(
        F.round(
            F.log(
                (F.sum(F.when(F.col("_pos"), 1).otherwise(0)) + F.lit(1.0))
                / (F.sum(F.when(F.col("_pos"), 0).otherwise(1)) + F.lit(1.0))
            ),
            6,
        )
        .cast(_W)
        .alias("prior")
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id cols of docs) + ``score`` (double) + ``predicted``
    (score > 0): prior plus the exact-decimal sum of the document's
    distinct in-vocabulary token weights. The weights table
    broadcasts; documents with no vocabulary token score the prior
    alone."""
    sums = (
        _doc_tokens(docs, text_col, id_col)
        .join(F.broadcast(weights), "token")
        .groupBy(id_col)
        .agg(F.sum("weight").alias("_wsum"))
    )
    return (
        docs.join(sums, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .withColumn(
            "score",
            (
                F.coalesce(F.col("_wsum"), F.lit(0).cast(_W)) + F.col("prior")
            ).cast("double"),
        )
        .withColumn("predicted", F.col("score") > 0)
        .drop("_wsum", "prior")
    )
