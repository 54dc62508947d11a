"""Registry queries for the text-analysis operators (documents table).

Oracle SQL for lang-id and quality is *generated* from the same
constants (LANG_MARKERS, PUNCT_CLASS) the Spark expressions use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import register
from .redact import count_sql, redaction_sql
from .text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)

# SQL building blocks mirroring text.py expressions.
_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"
_NTOK = f"len({_TOKENS})"
_PUNCT_SQL = "[.,!?;:''\"()\\-]"  # PUNCT_CLASS with '' escaping for SQL


def _hits(words: tuple[str, ...]) -> str:
    inlist = ", ".join("'" + w + "'" for w in words)
    return f"len(list_filter({_TOKENS}, t -> t IN ({inlist})))"


@register(
    "text_token_stats",
    oracle=f"""
    WITH per_row AS (
        SELECT lang, n_chars, text, {_TOKENS} AS w FROM documents
    ), sized AS (
        SELECT lang, n_chars, text, w,
               [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS g
        FROM per_row
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(w) - len(list_distinct(w))) AS BIGINT) AS total_dup_words,
           CASE WHEN SUM(len(w)) > 0
                THEN CAST(SUM(len(w) - len(list_distinct(w))) AS DOUBLE)
                     / CAST(SUM(len(w)) AS DOUBLE) END AS dup_word_frac,
           CAST(SUM(len(g) - len(list_distinct(g))) AS BIGINT) AS total_dup_bigrams,
           CASE WHEN SUM(len(g)) > 0
                THEN CAST(SUM(len(g) - len(list_distinct(g))) AS DOUBLE)
                     / CAST(SUM(len(g)) AS DOUBLE) END AS dup_bigram_frac
    FROM sized GROUP BY lang ORDER BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token profile per language: whitespace + BPE-ish token
    counts PLUS Gopher-style repetition signals (duplicate-word and
    duplicate-bigram fractions — the standard looping-text filter
    inputs). Map-only pass; every aggregate is an exact integer sum,
    and the fractions are single final divisions of those sums, so
    results are aggregation-order-independent (never sum per-doc
    double ratios). The token array is materialized ONCE in its own
    projection — CollapseProject keeps non-cheap multi-referenced
    aliases un-inlined, so the split/filter isn't re-evaluated per
    reference."""
    from .text import dup_bigram_count, dup_token_count, tokens

    docs = catalog.table(spark, sf_dir, "documents")
    toks = F.col("_toks")
    per_row = (
        docs.select("lang", "n_chars", "text")
        .withColumn("_toks", tokens(F.col("text")))
        .select(
            "lang",
            "n_chars",
            F.size(toks).alias("n_tok"),
            bpe_ish_token_count(F.col("text")).alias("n_bpe"),
            dup_token_count(toks).alias("n_dup_words"),
            F.greatest(F.size(toks) - 1, F.lit(0)).alias("n_bigrams"),
            dup_bigram_count(toks).alias("n_dup_bigrams"),
        )
    )
    tok_sum = F.sum("n_tok")
    dupw_sum = F.sum("n_dup_words")
    big_sum = F.sum("n_bigrams")
    dupb_sum = F.sum("n_dup_bigrams")
    return (
        per_row.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            tok_sum.alias("total_tokens"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum("n_chars").alias("total_chars"),
            dupw_sum.alias("total_dup_words"),
            F.when(tok_sum > 0, dupw_sum.cast("double") / tok_sum.cast("double")).alias(
                "dup_word_frac"
            ),
            dupb_sum.alias("total_dup_bigrams"),
            F.when(big_sum > 0, dupb_sum.cast("double") / big_sum.cast("double")).alias(
                "dup_bigram_frac"
            ),
        )
        .orderBy("lang")
    )


_QUALITY_SQL = f"""(
    least({_NTOK} / 100.0, 1.0)
    + (1.0 - least(
        CASE WHEN length(text) > 0
             THEN (length(text) - length(regexp_replace(text, '{_PUNCT_SQL}', '', 'g'))) * 1.0
                  / length(text)
             ELSE 0.0 END * 5.0, 1.0))
    + least(
        CASE WHEN {_NTOK} > 0
             THEN {_hits(LANG_MARKERS[0][1])} * 1.0 / {_NTOK}
             ELSE 0.0 END * 4.0, 1.0)
) / 3.0"""


@register(
    "text_quality_band",
    oracle=f"""
    SELECT doc_id, lang, {_QUALITY_SQL} AS quality
    FROM documents
    WHERE {_QUALITY_SQL} >= 0.5 AND {_NTOK} >= 20
    ORDER BY doc_id
    """,
)
def text_quality_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristic (length band + punctuation +
    stopword presence — deterministic double arithmetic, identical
    per-row in both engines) COMPOSED with the standard training-data
    filter shape: quality threshold + minimum length as a pushed-down
    predicate. The surviving rows carry their scores, so both the
    scoring values and the band membership are differentially
    checked."""
    docs = catalog.table(spark, sf_dir, "documents")
    return (
        docs.filter(
            (quality_score(F.col("text")) >= 0.5) & (token_count(F.col("text")) >= 20)
        )
        .select("doc_id", "lang", quality_score(F.col("text")).alias("quality"))
        .orderBy("doc_id")
    )


def _lang_case_sql() -> str:
    best = "greatest(" + ", ".join(_hits(w) for _, w in LANG_MARKERS) + ")"
    expr = "'und'"
    for lang, words in reversed(LANG_MARKERS):
        expr = (
            f"CASE WHEN {_hits(words)} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


@register(
    "text_lang_id",
    oracle=f"""
    SELECT lang AS labeled_lang, {_lang_case_sql()} AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1, 2 ORDER BY labeled_lang, predicted_lang
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (per-language marker-token hit scoring,
    deterministic argmax) crossed against the labeled lang column."""
    docs = catalog.table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.col("lang").alias("labeled_lang"),
            lang_id(F.col("text")).alias("predicted_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("labeled_lang", "predicted_lang")
    )


def text_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (md5 of normalized text) + exact-dedup
    grouping — the scalable exact-dedup key (one shuffle on a
    well-distributed hash). Registered via the consolidated
    ``exact_dedup_panel`` row (dedup_queries.py) since round 7 —
    the labeled-union move that freed a driver slot for
    ``crawl_front_half``."""
    docs = catalog.table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("canonical_id"))
        .orderBy("fp")
    )


def _contact_sql() -> str:
    """DuckDB expression manufacturing the deterministic contact
    string (same construction as the Spark side)."""
    return (
        "'Reach ' || c_name || ' at ' || lower(replace(c_name, '#', '.')) "
        "|| '@example.com or +1-' || CAST(100 + c_custkey % 900 AS VARCHAR) "
        "|| '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') "
        "|| ' from 10.' || CAST(c_custkey % 256 AS VARCHAR) "
        "|| '.' || CAST((c_custkey * 7) % 256 AS VARCHAR) "
        "|| '.' || CAST((c_custkey * 13) % 256 AS VARCHAR)"
    )


@register(
    "text_pii_redaction",
    oracle=f"""
    SELECT c_custkey,
           {redaction_sql(_contact_sql())} AS redacted,
           CAST({count_sql(_contact_sql(), "email")} AS INTEGER) AS n_emails,
           CAST({count_sql(_contact_sql(), "phone")} AS INTEGER) AS n_phones,
           CAST({count_sql(_contact_sql(), "ipv4")} AS INTEGER) AS n_ips
    FROM customer ORDER BY c_custkey
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails / phone numbers / IPv4) — the standard
    pre-training redaction pass, pure regexp column expressions
    (map-only at any scale). The corpus is manufactured
    deterministically from customer keys so both engines see
    identical inputs with every pattern class present; per-row
    redacted text AND per-class match counts are value-checked."""
    from .redact import pii_count, redact_pii

    c = catalog.table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    contact = F.concat(
        F.lit("Reach "), F.col("c_name"),
        F.lit(" at "), F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com or +1-"), (k % 900 + 100).cast("string"),
        F.lit("-555-"), F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (k % 256).cast("string"),
        F.lit("."), ((k * 7) % 256).cast("string"),
        F.lit("."), ((k * 13) % 256).cast("string"),
    )
    return (
        c.select(
            "c_custkey",
            redact_pii(contact).alias("redacted"),
            pii_count(contact, "email").cast("int").alias("n_emails"),
            pii_count(contact, "phone").cast("int").alias("n_phones"),
            pii_count(contact, "ipv4").cast("int").alias("n_ips"),
        )
        .orderBy("c_custkey")
    )


@register(
    "text_bigram_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKENS} AS w FROM documents),
    bigrams AS (
        SELECT w[i] || ' ' || w[i+1] AS bigram
        FROM toks, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    counted AS (SELECT bigram, COUNT(*) AS freq FROM bigrams GROUP BY bigram)
    SELECT bigram, freq FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, bigram) AS INTEGER) AS rk
        FROM counted
    ) WHERE rk <= 20
    ORDER BY freq DESC, bigram
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram frequency profile: top-20 word bigrams.
    Aggregate then ``orderBy(...).limit(k)`` → TakeOrderedAndProject:
    each partition keeps its local top-20 and only those heaps reach
    the driver — no single-partition global window, so the plan holds
    even when distinct bigrams number in the billions (100 TB corpus).
    """
    from .text import shingles_from_tokens, tokens

    docs = catalog.table(spark, sf_dir, "documents")
    counted = (
        docs.select(tokens(F.col("text")).alias("_toks"))
        .select(F.explode(shingles_from_tokens(F.col("_toks"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        counted.orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(20)
        .select("bigram", "freq")
    )


@register(
    "text_lm_perplexity",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKENS} AS w FROM documents),
    bi AS (
        SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS gram
        FROM toks, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    c2 AS (SELECT gram, COUNT(*) AS n2 FROM bi GROUP BY gram),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bi GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT t) AS v FROM toks, unnest(w) AS u(t)),
    scored AS (
        SELECT b.doc_id,
               CAST(round(log2((c2.n2 + 0.5) / (c1.n1 + 0.5 * vocab.v)), 6)
                    AS DECIMAL(18,6)) AS logp
        FROM bi b JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN vocab
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(logp) AS DOUBLE) / COUNT(*) AS avg_logp,
           round(pow(2.0, -(CAST(SUM(logp) AS DOUBLE) / COUNT(*))), 4) AS ppl
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: fit an add-0.5-smoothed word-
    bigram LM on the corpus (hash aggregations; the model stays
    distributed) and score every document's average bigram log2-prob
    and perplexity via two model joins + one grouped agg
    (operators/lm.py). Cross-engine hash determinism comes from
    rounding each bigram's log-prob to DECIMAL(18,6) before the
    per-document sum — exact, order-independent — with only the final
    average/perplexity computed in double from identical operands.
    Docs with < 2 tokens have no bigrams and are absent by
    definition."""
    from .lm import bigram_lm_perplexity

    docs = catalog.table(spark, sf_dir, "documents")
    return bigram_lm_perplexity(docs).orderBy("doc_id")


@register(
    "source_mixture_weights",
    oracle=f"""
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM({_NTOK}) AS BIGINT) AS total_tokens
        FROM documents GROUP BY source
    ),
    powed AS (
        SELECT *, CAST(round(sqrt(total_tokens), 6) AS DECIMAL(28,6)) AS pw
        FROM per_src
    )
    SELECT source, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE)
             / (SELECT CAST(SUM(total_tokens) AS DOUBLE) FROM per_src) AS token_share,
           round(CAST(pw AS DOUBLE)
             / (SELECT CAST(SUM(pw) AS DOUBLE) FROM powed), 6) AS sample_weight_t05
    FROM powed ORDER BY source
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture weighting per source domain: token counts,
    raw token share, and a temperature-scaled sampling weight
    w_i ∝ tokens_i^0.5 (the standard alpha=0.5 temperature flattening
    for multi-source/multilingual mixtures). One grouped agg over the
    corpus, then a broadcast single-row total joined back — the
    source list is dimension-sized at any corpus scale. Determinism:
    token sums are exact integers; each sqrt is rounded to
    DECIMAL(28,6) BEFORE the normalizer sum (exact, order-independent
    across partitions/engines), and the final ratios are single
    double divisions of identical operands."""
    docs = catalog.table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("total_tokens"),
    )
    powed = per_src.withColumn(
        "pw", F.round(F.sqrt(F.col("total_tokens")), 6).cast("decimal(28,6)")
    )
    totals = powed.agg(
        F.sum("total_tokens").cast("double").alias("_tt"),
        F.sum("pw").cast("double").alias("_pt"),
    )
    return (
        powed.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("total_tokens").cast("double") / F.col("_tt")).alias("token_share"),
            F.round(F.col("pw").cast("double") / F.col("_pt"), 6).alias("sample_weight_t05"),
        )
        .orderBy("source")
    )


@register(
    "pack_sequence_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(doc_id % 16 AS INTEGER) AS shard,
               md5('pack:' || CAST(doc_id AS VARCHAR)) AS key,
               CAST({_NTOK} AS BIGINT) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT *, SUM(n_tokens) OVER (
            PARTITION BY shard ORDER BY key, doc_id ROWS UNBOUNDED PRECEDING
        ) AS end_local
        FROM toks
    ),
    totals AS (SELECT shard, SUM(n_tokens) AS total FROM toks GROUP BY shard),
    bases AS (
        SELECT a.shard, COALESCE(SUM(b.total), 0) AS base
        FROM totals a LEFT JOIN totals b ON b.shard < a.shard
        GROUP BY a.shard
    )
    -- CAST each output to BIGINT: DuckDB's SUM OVER (end_local) is
    -- HUGEINT, which pandas materializes as float64 (1148.0 vs 1148)
    -- and breaks the driver's value hash (CORRECTNESS_r02/r03 red row).
    SELECT o.doc_id, o.shard, o.n_tokens,
           CAST(b.base + o.end_local - o.n_tokens AS BIGINT) AS tok_offset,
           CAST(CASE WHEN o.n_tokens > 0
                THEN (b.base + o.end_local - o.n_tokens) // 2048
                ELSE -1 END AS BIGINT) AS first_chunk,
           CAST(CASE WHEN o.n_tokens > 0
                THEN (b.base + o.end_local - 1) // 2048
                ELSE -1 END AS BIGINT) AS last_chunk,
           CAST(CASE WHEN o.n_tokens > 0
                THEN (b.base + o.end_local - 1) // 2048
                     - (b.base + o.end_local - o.n_tokens) // 2048 + 1
                ELSE 0 END AS BIGINT) AS chunks_spanned
    FROM offs o JOIN bases b USING (shard)
    ORDER BY o.doc_id
    """,
)
def pack_sequence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (operators/packing.py
    pack_chunk_spans): documents concatenated in a deterministic
    md5-shuffled order, the global token stream cut into 2048-token
    context chunks, each document mapped to the chunks it spans.
    Global offsets come from per-shard running sums + an
    n_shards-row base-offset dimension join — a scalable global
    ordering with NO single-partition window, identical across
    engines because every step is exact integer math.

    Empty documents have no chunk span; the operator returns NULL
    chunk ids for them, which this registry surface maps to the -1
    sentinel on BOTH sides so the driver's hash never depends on how
    NULLs inside a BIGINT column are normalized (the round-2 red row:
    rows/schema matched, hash did not, and the only NULL-bearing
    numeric column in the registry was here)."""
    from .packing import pack_chunk_spans

    docs = catalog.table(spark, sf_dir, "documents")
    spans = pack_chunk_spans(docs, context_len=2048, n_shards=16)
    return spans.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_offset",
        F.coalesce(F.col("first_chunk"), F.lit(-1)).alias("first_chunk"),
        F.coalesce(F.col("last_chunk"), F.lit(-1)).alias("last_chunk"),
        "chunks_spanned",
    ).orderBy("doc_id")
