"""NB token classifier: weight signs, vocabulary pruning, prior-only
scoring for out-of-vocabulary documents, and separability on a
planted corpus. The full train-then-score DuckDB differential runs
through the registry sweep (the classifier rides the
``document_quality_report`` row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.classifier import (
    class_prior,
    score_documents,
    train_token_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_weight_signs_and_min_df(spark):
    docs = _docs(
        spark,
        [
            (1, "good good signal shared", True),
            (2, "good signal shared", True),
            (3, "bad noise shared", False),
            (4, "bad noise shared rare", False),
        ],
    )
    w = {
        r["token"]: float(r["weight"])
        for r in train_token_weights(docs, F.col("label"), min_df=2).collect()
    }
    assert w["good"] > 0 and w["signal"] > 0      # positive-exclusive
    assert w["bad"] < 0 and w["noise"] < 0        # negative-exclusive
    assert abs(w["shared"]) < 1e-9                # balanced token is neutral
    assert "rare" not in w                        # min_df pruned
    # duplicate token inside one doc counts once (Bernoulli presence)
    assert w["good"] == w["signal"]


def test_scoring_separates_planted_classes_and_prior_fallback(spark):
    docs = _docs(
        spark,
        [(i, "alpha beta gamma", True) for i in range(5)]
        + [(10 + i, "delta epsilon zeta", False) for i in range(5)]
        + [(99, "unseen tokens only", True)],
    )
    pos = F.col("label")
    weights = train_token_weights(docs, pos, min_df=2)
    prior = class_prior(docs, pos)
    scored = {r["doc_id"]: r for r in score_documents(docs, weights, prior).collect()}
    assert all(scored[i]["predicted"] for i in range(5))
    assert not any(scored[10 + i]["predicted"] for i in range(5))
    # doc 99's tokens are all min_df-pruned -> scores the prior alone
    prior_val = float(prior.collect()[0]["prior"])
    assert abs(scored[99]["score"] - prior_val) < 1e-9
