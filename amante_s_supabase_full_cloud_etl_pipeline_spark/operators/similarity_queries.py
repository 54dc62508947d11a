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
from ..registry import (  # noqa: F401
    DRIVER_SF,
    GOLDEN_DIR,
    golden_oracle,
    golden_table,
    register,
)
from .similarity import brute_force_topk, ivf_topk, lsh_topk
from .similarity_sql import sql_cosine, sql_lsh_bucket

_N_QUERIES = 5  # vec_id < 5 are the probe vectors

#: lexical probe set for the BM25 leg (documents table): common +
#: repeated (qtf=2) + multi-term queries; ids offset so the labeled
#: union never aliases a vector query_id
_BM25_QUERIES = [
    (100, ["join", "hash"]),
    (101, ["customer", "customer"]),
    (102, ["spark", "vector", "scan"]),
]

_BM25_QUERY_VALUES = ", ".join(
    f"({qid}, '{t}', {terms.count(t)})"
    for qid, terms in _BM25_QUERIES
    for t in sorted(set(terms))
)

#: DuckDB Okapi BM25 over the same whitespace tokenization as
#: operators.text.tokens — k1=1.2, b=0.75, qtf-weighted, +1-floored
#: idf; mirrors operators/bm25.py expression for expression
_BM25_CTES = f"""
    bm_toks AS (
        SELECT doc_id, lower(w) AS term
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
              FROM documents)
        WHERE w <> ''
    ),
    bm_postings AS (
        SELECT term, doc_id, COUNT(*) AS tf FROM bm_toks GROUP BY term, doc_id
    ),
    bm_doc_stats AS (SELECT doc_id, COUNT(*) AS dl FROM bm_toks GROUP BY doc_id),
    bm_scalars AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM bm_doc_stats
    ),
    bm_queries(query_id, term, qtf) AS (VALUES {_BM25_QUERY_VALUES}),
    bm_tdf AS (
        SELECT term, COUNT(*) AS df FROM bm_postings
        WHERE term IN (SELECT term FROM bm_queries) GROUP BY term
    ),
    bm_scored AS (
        SELECT q.query_id, p.doc_id AS neighbor_id,
               round(SUM(
                   q.qtf
                   * ln(1 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
                   * p.tf * 2.2
                   / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))
               ), 6) AS score
        FROM bm_postings p
        JOIN bm_queries q USING (term)
        JOIN bm_tdf t USING (term)
        JOIN bm_doc_stats d USING (doc_id)
        CROSS JOIN bm_scalars s
        GROUP BY q.query_id, p.doc_id
    )
"""

_BM25_SQL = """
    SELECT 'bm25' AS method, query_id, neighbor_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id
        ) AS INTEGER) AS rank
        FROM bm_scored
    )
    WHERE rank <= 5
"""

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


# leg goldens of the consolidated row below — regenerated by
# tests/golden/generate.py via these producing functions
golden_table("knn_ivf_probed", knn_ivf_probed)
golden_table("ivfpq_topk_probed", ivfpq_topk_probed)


def knn_bm25_okapi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval (operators/bm25.py) in the shared
    (query_id, neighbor_id, score, rank) contract — the lexical half
    of hybrid search riding the same driver row as the dense methods
    (VERDICT r4 "Next round" #5). Live-SQL-checked: the oracle
    recomputes the full Okapi formula in DuckDB."""
    from .bm25 import bm25_score, build_index

    docs = catalog.table(spark, sf_dir, "documents")
    postings, stats = build_index(docs)
    q = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, terms array<string>"
    )
    return bm25_score(postings, stats, q, k=5).select(
        "query_id", F.col("doc_id").alias("neighbor_id"), "score", "rank"
    )


@register(
    "knn_methods_topk",
    oracle=f"""
    WITH {_CTES},
    {_BM25_CTES}
    SELECT * FROM (
        {_BF_SQL}
        UNION ALL
        {_LSH_SQL}
        UNION ALL
        {_BM25_SQL}
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
    """All five retrieval strategies over shared probe sets in one
    labeled result — dense (brute force = recall-1.0 baseline,
    hyperplane-LSH, IVF, IVF-PQ over embeddings) plus lexical Okapi
    BM25 over documents; exact scores everywhere, so the methods
    differ only in WHICH neighbors reach the top-5 (the
    recall/efficiency tradeoff the labels expose). Checked at the
    driver SF where the IVF/IVF-PQ goldens are generated; the SQL
    legs (brute force, LSH, BM25) hold at any SF."""
    legs = [
        ("bm25", knn_bm25_okapi),
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
