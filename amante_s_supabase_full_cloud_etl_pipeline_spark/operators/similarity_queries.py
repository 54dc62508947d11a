"""Registry query for similarity search (embeddings table).

All four ANN strategies share one output contract (query_id,
neighbor_id, score, rank) with exact cosine scores, so the driver
row checks them TOGETHER as one labeled union — brute force (the
recall-1.0 baseline), hyperplane-LSH bucketing, IVF, and IVF-PQ.
The brute-force and LSH legs are live SQL (deterministic hyperplanes
shared with the oracle generator); the IVF and IVF-PQ legs pin
committed goldens (k-means codebooks are not DuckDB-expressible) and
carry independent pytest recall anchors (tests/test_dedup.py,
tests/test_pq.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, GOLDEN_DIR, golden_oracle, register  # noqa: F401
from .similarity import brute_force_topk, ivf_topk, lsh_topk
from .similarity_sql import sql_cosine, sql_lsh_bucket

_N_QUERIES = 5  # vec_id < 5 are the probe vectors

_CTES = f"""
    bf_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({sql_cosine('q.embedding', 'c.embedding')}, 6) AS score
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    ),
    bucketed AS (
        SELECT vec_id, embedding, {sql_lsh_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    lsh_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({sql_cosine('q.embedding', 'c.embedding')}, 6) AS score
        FROM bucketed q JOIN bucketed c
          ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    )
"""

_BF_SQL = """
    SELECT 'brute_force' AS method, query_id, neighbor_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id
        ) AS INTEGER) AS rank
        FROM bf_scored
    )
    WHERE rank <= 5
"""

_LSH_SQL = """
    SELECT 'lsh' AS method, query_id, neighbor_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id
        ) AS INTEGER) AS rank
        FROM lsh_scored
    )
    WHERE rank <= 5
"""


def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 5 probe vectors: broadcast the
    probes, one corpus scan, per-query window over the tiny candidate
    set. Recall-1.0 baseline for the ANN variants."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return brute_force_topk(emb, probes, k=5)


def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH: probe only the query's
    sign-bit bucket (equi-join replaces the cross join — the
    shuffle-free plan when the corpus is stored bucketed by this
    id). Hyperplanes are deterministic → both engines bucket
    identically."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_topk(emb, probes, k=5)


def knn_ivf_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means inverted lists (seeded, hash-sampled training
    set → deterministic centroids), 2-probe search. Golden-pinned;
    recall vs the brute-force baseline asserted in tests/test_dedup.py."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, probes, k=5)


def ivfpq_topk_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN with exact re-ranking (operators/pq.py): coarse
    k-means lists + per-subspace residual codebooks fit on a bounded
    deterministic sample, ADC candidate scoring from one-byte codes,
    exact-cosine re-rank of the refine*k shortlist. Golden-pinned;
    recall vs brute force and the exact-score contract are pinned in
    tests/test_pq.py."""
    from .pq import ivfpq_topk

    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivfpq_topk(emb, probes, k=5).orderBy("query_id", "rank")


@register(
    "knn_methods_topk",
    oracle=f"""
    WITH {_CTES}
    SELECT * FROM (
        {_BF_SQL}
        UNION ALL
        {_LSH_SQL}
        UNION ALL
        SELECT 'ivf' AS method, query_id, neighbor_id, score, rank
        FROM read_parquet('{GOLDEN_DIR}/knn_ivf_probed.parquet')
        UNION ALL
        SELECT 'ivf_pq' AS method, query_id, neighbor_id, score, rank
        FROM read_parquet('{GOLDEN_DIR}/ivfpq_topk_probed.parquet')
    ) ORDER BY method, query_id, rank
    """,
    golden_sf=DRIVER_SF,
)
def knn_methods_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four ANN strategies over the same probes in one labeled
    result — exact scores everywhere, so the methods differ only in
    WHICH neighbors reach the top-5 (the recall/efficiency tradeoff
    the labels expose). Checked at the driver SF where the IVF/IVF-PQ
    goldens are generated; the SQL legs hold at any SF."""
    legs = [
        ("brute_force", knn_bruteforce_cosine),
        ("lsh", knn_lsh_bucketed),
        ("ivf", knn_ivf_probed),
        ("ivf_pq", ivfpq_topk_probed),
    ]
    out = None
    for method, fn in legs:
        leg = fn(spark, sf_dir).select(
            F.lit(method).alias("method"), "query_id", "neighbor_id", "score", "rank"
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("method", "query_id", "rank")
