"""IVF-PQ ANN: recall against the exact baseline, exact-score
re-ranking contract, planted-duplicate retrieval, determinism under
repartitioning, and code compactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pq import ivfpq_topk
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine,
)

K = 5


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return catalog.table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") % 100 == 0).limit(5)


def test_recall_and_exact_scores_vs_brute_force(spark, emb, queries):
    """The driver's synthetic embeddings are near-isotropic — PQ's
    worst case (residual subspaces carry no cluster structure, so ADC
    ordering is noisy; real embedding corpora cluster and quantize
    far better). The contract under test: a modest refine multiplier
    recovers decent recall even here, and a larger one strictly
    improves it — shortlist size is the recall knob, as documented."""
    exact = brute_force_topk(emb, queries, k=K)
    approx = ivfpq_topk(emb, queries, k=K, n_lists=8, n_probe=4, m=8, n_codes=32, refine=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.55, f"recall@{K} = {recall:.2f}"

    wide = ivfpq_topk(
        emb, queries, k=K, n_lists=8, n_probe=8, m=8, n_codes=32, refine=16
    )
    w = {(r["query_id"], r["neighbor_id"]) for r in wide.collect()}
    wide_recall = len(e & w) / len(e)
    assert wide_recall >= 0.7, f"full-probe wide-refine recall = {wide_recall:.2f}"
    assert wide_recall >= recall

    # re-rank contract: every emitted score is the EXACT cosine
    scores = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in emb.alias("q")
        .join(emb.alias("c"), F.lit(True))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q.embedding"), F.col("c.embedding")), 6).alias("score"),
        )
        .join(
            spark.createDataFrame(
                [(q, n) for q, n in a], "query_id long, neighbor_id long"
            ),
            ["query_id", "neighbor_id"],
        )
        .collect()
    }
    for r in a_rows:
        assert r["score"] == scores[(r["query_id"], r["neighbor_id"])]


def test_planted_duplicate_found_at_rank_one(spark, emb):
    """A near-copy of a query vector lands in the same coarse list and
    must come back as its top neighbor."""
    q = emb.filter(F.col("vec_id") == 0).limit(1)
    dup = q.select(
        F.lit(999_999).cast("long").alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x.cast("double") * 0.999).cast("float")
        ).alias("embedding"),
        F.col("label"),
    )
    corpus = emb.unionByName(dup)
    got = ivfpq_topk(corpus, q, k=3, n_lists=8, n_probe=2, m=8, n_codes=16).collect()
    assert got[0]["neighbor_id"] == 999_999 and got[0]["rank"] == 1
    assert got[0]["score"] >= 0.999


def test_partition_independent_and_deterministic(spark, emb, queries):
    base = [tuple(r) for r in ivfpq_topk(emb, queries, k=K, n_lists=8).collect()]
    for n_parts in (1, 13):
        again = [
            tuple(r)
            for r in ivfpq_topk(emb.repartition(n_parts), queries, k=K, n_lists=8).collect()
        ]
        assert again == base


def test_codes_are_m_small_ints(spark, emb):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pq import (
        _train_ivfpq,
    )

    coarse, books = _train_ivfpq(
        emb, 8, 8, 16, "vec_id", "embedding", 42, 0.25, 50_000
    )
    assert coarse.shape[0] == 8 and books.shape == (8, 16, coarse.shape[1] // 8)
    # the index stores m=8 ints per vector instead of dim floats
    assert coarse.shape[1] >= 32


def test_quantizer_train_collect_is_o_cap(spark):
    """r12 advice: fraction-based training samples grow linearly with
    the corpus; the absolute cap must bound the collect BY
    CONSTRUCTION. Corpus 10× the cap → exactly cap rows kept,
    identically on any partitioning; cap-not-biting keeps the plain
    fraction-filter set (so existing pins are untouched)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.similarity import (  # noqa: E501
        quantizer_train_sample,
    )

    cap = 32
    df = spark.range(cap * 10).select(
        F.col("id").alias("_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("double")
                  for i in range(4)]).alias("_v"),
    )
    kept = quantizer_train_sample(df, "_id", 42, 1.0, cap)
    assert kept.count() == cap
    a = sorted(r["_id"] for r in kept.collect())
    b = sorted(
        r["_id"]
        for r in quantizer_train_sample(
            df.repartition(13), "_id", 42, 1.0, cap
        ).collect()
    )
    assert a == b  # partitioning-independent keep set
    # cap not biting → identical to the plain fraction filter
    loose = quantizer_train_sample(df, "_id", 42, 0.1, cap * 100)
    plain = df.filter(
        F.pmod(F.xxhash64(F.col("_id"), F.lit(42)), F.lit(10_000))
        < F.lit(1_000)
    )
    assert sorted(r["_id"] for r in loose.collect()) == sorted(
        r["_id"] for r in plain.collect()
    )


def test_ivfpq_respects_train_cap(spark, emb, queries):
    # a biting cap still yields a working index with exact re-ranked
    # scores (quality may differ; the contract — exact cosine on the
    # winners, k rows per query — must not)
    got = ivfpq_topk(emb, queries, k=3, n_lists=4, m=8, n_codes=8,
                     max_train_rows=40)
    per_q = {}
    for r in got.collect():
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rows in per_q.items():
        assert len(rows) == 3
