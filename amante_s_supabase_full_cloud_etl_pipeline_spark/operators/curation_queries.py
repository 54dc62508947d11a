"""Driver-checked registry queries for the round-3 curation kernels.

``curation_doc_signals`` folds the per-document deterministic Arrow
kernels (exact-substring dedup, ftfy-lite repair, DEFLATE density,
learned BPE, mixture resampling membership) into ONE per-doc table
pinned as a committed golden (registry.golden_oracle — regenerate
with ``python tests/golden/generate.py``): the kernels use
xxhash64/zlib/learned merges DuckDB cannot recompute, and each has
an INDEPENDENT correctness anchor in pytest (sequential-reference
differentials, idempotence, recall/compression-ordering tests). The
golden pins exact values so any regression or environment drift
turns into a driver-level hash mismatch instead of passing silently.

``document_quality_report`` (declarative expectations + NB
classifier scores) is fully SQL-expressible and rides a live DuckDB
oracle. ``kmeans_embedding_clusters`` golden-pins the full-corpus
clustering (iterative centroids are not SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, golden_oracle, register


@register(
    "curation_doc_signals",
    oracle=golden_oracle("curation_doc_signals"),
    golden_sf=DRIVER_SF,
)
def curation_doc_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document carrying the deterministic curation
    kernel outputs side by side:

    - ``text``/``n_tokens_removed`` — exact-substring (k=8 token
      span) dedup, Lee et al. 2022 style (operators/
      substring_dedup.py): duplicated passages keep only their
      corpus-wide first occurrence;
    - ``changed`` — ftfy-lite repair touched the text
      (operators/hygiene.py);
    - ``n_bytes``/``zlib_bytes``/``compression_ratio`` — DEFLATE
      information-density signal;
    - ``n_bpe_tokens``/``head_tokens`` — learned-BPE tokenization
      (100 merges trained on the corpus word table, operators/
      bpe.py), first five tokens joined as a string;
    - ``mixture_kept`` — membership in the temperature-0.5 mixture
      resample (operators/sampling.py resample_to_mixture,
      stratum-coupled content hashing, downsample-only).
    """
    from .bpe import bpe_tokenize, train_bpe
    from .hygiene import compression_signals, fixed_text
    from .sampling import resample_to_mixture
    from .substring_dedup import trim_duplicate_spans
    from .text_queries import source_mixture_weights

    docs = catalog.table(spark, sf_dir, "documents")
    trimmed = trim_duplicate_spans(docs, k=8)
    fixed = fixed_text(docs).select("doc_id", "changed")
    comp = compression_signals(docs)
    merges = train_bpe(docs, n_merges=100, min_count=2)
    bpe = bpe_tokenize(docs, merges).select(
        "doc_id",
        "n_bpe_tokens",
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 5)).alias("head_tokens"),
    )
    weights = source_mixture_weights(spark, sf_dir)
    kept = resample_to_mixture(docs, weights).select(
        "doc_id", F.lit(True).alias("mixture_kept")
    )
    return (
        trimmed.join(fixed, "doc_id")
        .join(comp, "doc_id")
        .join(bpe, "doc_id")
        .join(kept, "doc_id", "left")
        .withColumn("mixture_kept", F.coalesce(F.col("mixture_kept"), F.lit(False)))
        .orderBy("doc_id")
    )


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


# the one whitespace-tokenizer SQL, shared with every text oracle so
# a tokenizer change cannot desynchronize them
from .text_queries import _TOKENS as _SQL_TOKENS  # noqa: E402


@register(
    "document_quality_report",
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
           array_to_string(list_filter([
               CASE WHEN NOT (d.lang IN ('en', 'de', 'fr', 'es'))
                    THEN 'accepted_values_lang' END,
               CASE WHEN NOT (d.n_chars >= 64 AND d.n_chars <= 520)
                    THEN 'in_range_n_chars' END,
               CASE WHEN NOT regexp_matches(d.text, '^[A-Z]')
                    THEN 'matches_text' END
           ], x -> x IS NOT NULL), ',') AS failed_expectations,
           CAST(COALESCE(s.wsum, CAST(0 AS DECIMAL(18,6))) + p.prior AS DOUBLE)
               AS en_score,
           (CAST(COALESCE(s.wsum, CAST(0 AS DECIMAL(18,6))) + p.prior AS DOUBLE)
               > 0) AS predicted_en
    FROM documents d LEFT JOIN sums s USING (doc_id), prior p
    ORDER BY d.doc_id
    """,
)
def document_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality report joining the two model/rule scoring
    families. ``failed_expectations`` — the declarative data-quality
    suite (operators/expectations.py, the reference's P7 predicate
    generalized to dbt-tests-style checks), flattened to a
    comma-joined label string ('' when every check passes, so the
    whole corpus is reported, not just violations).
    ``en_score``/``predicted_en`` — the fastText/DCLM-style
    model-based scorer (operators/classifier.py): Bernoulli-NB token
    log-odds trained on the lang='en' label, weights rounded to
    DECIMAL(18,6) BEFORE the per-document sum so scoring is exact and
    order-independent; the corpus scan never shuffles (broadcast
    vocabulary join). Both the learned model and the scores are
    differentially checked against DuckDB."""
    from .classifier import class_prior, score_documents, train_token_weights
    from .expectations import accepted_values, in_range, matches, violations

    docs = catalog.table(spark, sf_dir, "documents")
    suite = [
        accepted_values("lang", ["en", "de", "fr", "es"]),
        in_range("n_chars", lo=64, hi=520),
        matches("text", "^[A-Z]"),
    ]
    failed = (
        violations(docs.select("doc_id", "lang", "n_chars", "text"), suite)
        .select(
            "doc_id",
            F.concat_ws(",", "failed_expectations").alias("failed_expectations"),
        )
    )
    positive = F.col("lang") == "en"
    weights = train_token_weights(docs, positive, min_df=2)
    prior = class_prior(docs, positive)
    scored = score_documents(docs, weights, prior).select(
        "doc_id",
        "lang",
        F.col("score").alias("en_score"),
        F.col("predicted").alias("predicted_en"),
    )
    return (
        scored.join(failed, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("failed_expectations"), F.lit("")).alias(
                "failed_expectations"
            ),
            "en_score",
            "predicted_en",
        )
        .orderBy("doc_id")
    )
