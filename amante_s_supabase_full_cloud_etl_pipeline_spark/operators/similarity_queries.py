"""Registry queries for similarity search (embeddings table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, golden_oracle, register
from .similarity import brute_force_topk, ivf_topk, lsh_topk
from .similarity_sql import sql_cosine, sql_lsh_bucket

_N_QUERIES = 5  # vec_id < 5 are the probe vectors


@register(
    "knn_bruteforce_cosine",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({sql_cosine('q.embedding', 'c.embedding')}, 6) AS score
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id
        ) AS INTEGER) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 5 probe vectors: broadcast the
    probes, one corpus scan, per-query window over the tiny candidate
    set. Recall-1.0 baseline for the ANN variants."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return brute_force_topk(emb, probes, k=5)


@register(
    "knn_lsh_bucketed",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {sql_lsh_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({sql_cosine('q.embedding', 'c.embedding')}, 6) AS score
        FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id
        ) AS INTEGER) AS rank
        FROM scored
    )
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH: probe only the query's
    sign-bit bucket (equi-join replaces the cross join — the
    shuffle-free plan when the corpus is stored bucketed by this
    id). Hyperplanes are deterministic → both engines bucket
    identically."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_topk(emb, probes, k=5)


@register(
    "knn_ivf_probed",
    oracle=golden_oracle("knn_ivf_probed"),
    golden_sf=DRIVER_SF,
)
def knn_ivf_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means inverted lists (seeded, hash-sampled training
    set → deterministic centroids), 2-probe search. Golden-pinned;
    recall vs the brute-force baseline asserted in tests/test_dedup.py."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, probes, k=5)
