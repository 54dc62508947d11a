"""Driver-checked registry queries for the round-3 curation kernels
(exact-substring dedup, text hygiene, BPE, Count-Min, IVF-PQ, mixture
resampling).

Most of these are deterministic Arrow/driver kernels DuckDB cannot
recompute (xxhash64 token hashing, zlib, learned BPE merges, k-means
codebooks), so they pin committed golden tables exactly like the
MinHash/IVF rows (registry.golden_oracle — regenerate with
``python tests/golden/generate.py``). Each has an INDEPENDENT
correctness anchor in pytest (sequential-reference differentials,
recall bounds, hand fixtures); the golden pins the exact values so
any regression or environment drift turns into a driver-level hash
mismatch instead of passing silently.

`count_min_source_counts` is the exception: the sketch is exactly
mergeable (bit-identical under any partitioning) and at the test
corpus's cardinality (20 sources, width 2048) it is collision-free,
so a plain GROUP BY oracles it — the approximation regime's one-sided
bound is pinned separately in tests/test_countmin.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, golden_oracle, register


@register(
    "substring_dedup_trimmed",
    oracle=golden_oracle("substring_dedup_trimmed"),
    golden_sf=DRIVER_SF,
)
def substring_dedup_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (k-gram span) dedup, Lee et al. 2022 style
    (operators/substring_dedup.py): every >=8-token passage occurring
    more than once corpus-wide keeps only its global first occurrence;
    documents come back trimmed with a removed-token count. Golden-
    pinned (xxhash64 rolling hashes are not DuckDB-expressible); the
    semantics are differential-tested against a hash-free sequential
    reference in tests/test_substring_dedup.py."""
    from .substring_dedup import trim_duplicate_spans

    docs = catalog.table(spark, sf_dir, "documents")
    return trim_duplicate_spans(docs, k=8).orderBy("doc_id")


@register(
    "text_hygiene_signals",
    oracle=golden_oracle("text_hygiene_signals"),
    golden_sf=DRIVER_SF,
)
def text_hygiene_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-lite repair flag + DEFLATE information-density signal per
    document (operators/hygiene.py) — the two stage-0 curation signals
    joined on doc_id. Golden-pinned (zlib byte counts); kernel
    semantics are pinned by mojibake/idempotence/density-ordering
    tests in tests/test_hygiene.py."""
    from .hygiene import compression_signals, fixed_text

    docs = catalog.table(spark, sf_dir, "documents")
    fixed = fixed_text(docs).select("doc_id", "changed")
    comp = compression_signals(docs)
    return fixed.join(comp, "doc_id").select(
        "doc_id", "changed", "n_bytes", "zlib_bytes", "compression_ratio"
    ).orderBy("doc_id")


@register(
    "bpe_tokenize_stats",
    oracle=golden_oracle("bpe_tokenize_stats"),
    golden_sf=DRIVER_SF,
)
def bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-BPE tokenization (operators/bpe.py): train 100 merges
    on the corpus word-frequency table (driver-side on the bounded
    table, the production trainer shape), then encode every document
    with the broadcast merge ranks. Emits per-doc BPE token counts
    plus the first five tokens as a joined string (no array column in
    the driver hash). Golden-pinned; lossless-reconstruction and
    kernel==reference tests anchor the semantics."""
    from .bpe import bpe_tokenize, train_bpe

    docs = catalog.table(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=100, min_count=2)
    return (
        bpe_tokenize(docs, merges)
        .select(
            "doc_id",
            "n_bpe_tokens",
            F.concat_ws(" ", F.slice("bpe_tokens", 1, 5)).alias("head_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "count_min_source_counts",
    oracle="""
    SELECT source, COUNT(*) AS est_count
    FROM documents GROUP BY source ORDER BY source
    """,
)
def count_min_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates (operators/countmin.py)
    for every document source. The sketch merges by cell-wise sum, so
    it is bit-identical under any partitioning; at 20 keys x width
    2048 every row of the sketch is collision-free, so the estimates
    EQUAL the true counts and a plain GROUP BY oracles the whole
    pipeline (the >=true one-sided bound under forced collisions is
    pinned in tests/test_countmin.py)."""
    from .countmin import count_min_sketch

    docs = catalog.table(spark, sf_dir, "documents")
    cm = count_min_sketch(docs, "source", depth=4, width=2048)
    sources = sorted(
        r["source"] for r in docs.select("source").distinct().collect()
    )
    return spark.createDataFrame(
        [(s, cm.estimate(s)) for s in sources], "source string, est_count long"
    ).orderBy("source")


@register(
    "ivfpq_topk_probed",
    oracle=golden_oracle("ivfpq_topk_probed"),
    golden_sf=DRIVER_SF,
)
def ivfpq_topk_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN with exact re-ranking (operators/pq.py): coarse
    k-means lists + per-subspace residual codebooks fit on a bounded
    deterministic sample, ADC candidate scoring from one-byte codes,
    exact-cosine re-rank of the refine*k shortlist. Golden-pinned
    (k-means codebooks are not DuckDB-expressible); recall vs brute
    force and the exact-score contract are pinned in tests/test_pq.py."""
    from .pq import ivfpq_topk

    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return ivfpq_topk(emb, probes, k=5).orderBy("query_id", "rank")


@register(
    "kmeans_embedding_clusters",
    oracle=golden_oracle("kmeans_embedding_clusters"),
    golden_sf=DRIVER_SF,
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus distributed k-means (operators/clustering.py):
    5 Lloyd's rounds at k=8 over the embeddings table, summarized as
    per-cluster sizes, exact-decimal inertia, and centroid norms.
    Golden-pinned (iterative centroids are not DuckDB-expressible);
    planted-cluster recovery, partitioning independence, and
    inertia monotonicity are pinned in tests/test_clustering.py."""
    from .clustering import kmeans_fit, kmeans_summary

    emb = catalog.table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=8, n_iter=5)
    return kmeans_summary(emb, centroids)


_SQL_TOKENS = (
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
)


@register(
    "nb_token_classifier",
    oracle=f"""
    WITH doc_tokens AS (
        SELECT doc_id, unnest(list_distinct({_SQL_TOKENS})) AS token
        FROM documents
    ),
    labeled AS (SELECT doc_id, lang = 'en' AS pos FROM documents),
    sizes AS (
        SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS P,
               SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS N
        FROM labeled
    ),
    dfreq AS (
        SELECT token,
               SUM(CASE WHEN l.pos THEN 1 ELSE 0 END) AS pos_df,
               SUM(CASE WHEN l.pos THEN 0 ELSE 1 END) AS neg_df
        FROM doc_tokens t JOIN labeled l USING (doc_id)
        GROUP BY token
        HAVING SUM(CASE WHEN l.pos THEN 1 ELSE 0 END)
             + SUM(CASE WHEN l.pos THEN 0 ELSE 1 END) >= 2
    ),
    weights AS (
        SELECT token,
               CAST(round(ln(((pos_df + 1.0) * (N + 2.0))
                            / ((neg_df + 1.0) * (P + 2.0))), 6)
                    AS DECIMAL(18,6)) AS weight
        FROM dfreq, sizes
    ),
    prior AS (
        SELECT CAST(round(ln((P + 1.0) / (N + 1.0)), 6) AS DECIMAL(18,6)) AS prior
        FROM sizes
    ),
    sums AS (
        SELECT t.doc_id, SUM(w.weight) AS wsum
        FROM doc_tokens t JOIN weights w USING (token)
        GROUP BY t.doc_id
    )
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(s.wsum, CAST(0 AS DECIMAL(18,6))) + p.prior AS DOUBLE)
               AS score,
           (CAST(COALESCE(s.wsum, CAST(0 AS DECIMAL(18,6))) + p.prior AS DOUBLE)
               > 0) AS predicted
    FROM documents d LEFT JOIN sums s USING (doc_id), prior p
    ORDER BY d.doc_id
    """,
)
def nb_token_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based document scoring (operators/classifier.py, the
    fastText/DCLM quality-classifier shape): train Bernoulli-NB token
    log-odds on the lang='en' label, then score every document with
    the broadcast weights table. Weights round to DECIMAL(18,6)
    BEFORE the per-document sum, so the whole train-then-score
    pipeline is exact and fully SQL-oracled — both the learned model
    and the scores are differentially checked."""
    from .classifier import class_prior, score_documents, train_token_weights

    docs = catalog.table(spark, sf_dir, "documents")
    positive = F.col("lang") == "en"
    weights = train_token_weights(docs, positive, min_df=2)
    prior = class_prior(docs, positive)
    return (
        score_documents(docs, weights, prior)
        .select("doc_id", "lang", "score", "predicted")
        .orderBy("doc_id")
    )


@register(
    "mixture_resample_kept",
    oracle=golden_oracle("mixture_resample_kept"),
    golden_sf=DRIVER_SF,
)
def mixture_resample_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixture resampling (operators/sampling.py
    resample_to_mixture): materialize `source_mixture_weights`'
    alpha=0.5 weights as an actual kept-document set via
    stratum-coupled content hashing (downsample-only, map-side
    membership). Golden-pinned (xxhash64 bucketing); the realized-
    share convergence and partition independence are pinned in
    tests/test_sampling.py."""
    from ..operators.text_queries import source_mixture_weights
    from .sampling import resample_to_mixture

    docs = catalog.table(spark, sf_dir, "documents")
    weights = source_mixture_weights(spark, sf_dir)
    return (
        resample_to_mixture(docs, weights)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )
