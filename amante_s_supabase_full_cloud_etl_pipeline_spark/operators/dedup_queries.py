"""Registry queries for the dedup operator family (documents +
embeddings tables).

Oracle coverage: exact-fingerprint and n-gram-Jaccard and
embedding-cosine near-dup are fully SQL-expressible (the LSH plane
SQL is generated from the same deterministic hyperplanes).
MinHash/SimHash signatures use xxhash64 (no DuckDB equivalent) →
rows-only in the driver, with accuracy pinned against exact Jaccard
in tests/test_dedup.py.
"""

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
from .cdc import chunk_dedup_stats, chunk_documents
from .components import connected_components, dup_group_stats, keep_group_canonical
from .dedup import drop_exact_dups, jaccard_pairs, minhash_candidates, simhash_near_pairs
from .similarity import embedding_near_dup_pairs
from .similarity_sql import sql_cosine, sql_lsh_bucket

#: shared CTE bodies (no leading WITH so callers can prepend
#: WITH or WITH RECURSIVE)
_SHINGLES_BODY = """
toks AS (
    SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
    FROM documents
),
shingles AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
    WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id)
"""

_SHINGLES = "WITH " + _SHINGLES_BODY

#: exact 3-gram Jaccard pairs at threshold 0.2 — ends in a `pairs` CTE
_JACCARD_BODY = _SHINGLES_BODY + """
, inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS intersection
    FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT id_a, id_b, intersection,
           x.set_size AS size_a, y.set_size AS size_b,
           intersection * 1.0 / (x.set_size + y.set_size - intersection) AS jaccard
    FROM inter
    JOIN sizes x ON id_a = x.doc_id
    JOIN sizes y ON id_b = y.doc_id
    WHERE intersection * 1.0 / (x.set_size + y.set_size - intersection) >= 0.2
)
"""


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the canonical (min-id) copy per normalized
    fingerprint: hash-groupBy + semi join, never a text comparison.
    The operator keeps whole rows (its contract); this query only
    consumes lang, so it projects BEFORE the dedup and the scan reads
    three columns, not the full table width."""
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return (
        drop_exact_dups(docs)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


def cdc_chunk_stats_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cdc leg of ``exact_dedup_panel`` (VERDICT r9 #2): the
    FastCDC duplication profile (``operators/cdc.py
    chunk_dedup_stats`` over ``chunk_documents``) reshaped onto the
    panel's labeled-union columns — ``key`` packs the hex chunk hash
    with the distinct-document count and chunk byte size
    (``hash:n_docs:chunk_bytes``), ``n`` is the occurrence count and
    ``canonical_id`` carries ``duplicate_bytes`` (column reuse, the
    ``dedup_pair_methods`` precedent — int counts + hex hashes,
    exactly hashable). Golden leg: DuckDB cannot run the gear
    chunker."""
    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    stats = chunk_dedup_stats(chunk_documents(docs))
    return stats.select(
        F.concat_ws(
            ":",
            "chunk_hash",
            F.col("n_docs").cast("string"),
            F.col("chunk_bytes").cast("string"),
        ).alias("key"),
        F.col("n_occurrences").alias("n"),
        F.col("duplicate_bytes").alias("canonical_id"),
    ).orderBy("key")


golden_table("cdc_chunk_stats_leg", cdc_chunk_stats_leg)


#: the panel's LIVE arms, shared between the registered (golden-
#: pinned, sf0.01-checked) oracle and the any-SF live-leg compare in
#: tests/test_consolidated_live_legs.py — golden_sf pins the WHOLE
#: row's check to the driver SF, so the live legs keep their own
#: any-SF differential there (review catch)
PANEL_FP_CTE = """fp AS (
        SELECT doc_id, lang,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
        FROM documents
    )"""
PANEL_LIVE_ARMS = """
        SELECT 'fingerprint' AS leg, f AS key,
               COUNT(*) AS n, MIN(doc_id) AS canonical_id
        FROM fp GROUP BY f
        UNION ALL
        SELECT 'survivors' AS leg, lang AS key,
               COUNT(*) AS n, CAST(-1 AS BIGINT) AS canonical_id
        FROM fp JOIN (SELECT f, MIN(doc_id) AS m FROM fp GROUP BY f) canon
          ON fp.f = canon.f AND fp.doc_id = canon.m
        GROUP BY lang
"""


def panel_live_legs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fingerprint + survivors legs (live-SQL-oracled at ANY sf —
    the pre-r10 coverage, kept via
    tests/test_consolidated_live_legs.py)."""
    from .text_queries import text_fingerprint_dedup

    fp = text_fingerprint_dedup(spark, sf_dir).select(
        F.lit("fingerprint").alias("leg"),
        F.col("fp").alias("key"),
        F.col("n_copies").alias("n"),
        "canonical_id",
    )
    surv = dedup_exact_survivors(spark, sf_dir).select(
        F.lit("survivors").alias("leg"),
        F.col("lang").alias("key"),
        F.col("n_docs").alias("n"),
        F.lit(-1).cast("long").alias("canonical_id"),
    )
    return fp.unionByName(surv)


@register(
    "exact_dedup_panel",
    oracle=f"""
    WITH {PANEL_FP_CTE}
    SELECT * FROM (
        {PANEL_LIVE_ARMS}
        UNION ALL
        SELECT 'cdc' AS leg, key, n, canonical_id
        FROM read_parquet('{GOLDEN_DIR}/cdc_chunk_stats_leg.parquet')
    ) ORDER BY leg, key
    """,
    golden_sf=DRIVER_SF,
)
def exact_dedup_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact/sub-document dedup family as one labeled union (round-7
    slot consolidation + r10 cdc leg, precedent dedup_pair_methods):
    the 'fingerprint' leg is the md5-of-normalized-text grouping
    (formerly the text_fingerprint_dedup row), the 'survivors' leg
    the per-lang count after keep-min-id dedup (formerly
    dedup_exact_survivors; canonical_id is a -1 sentinel there — doc
    ids are non-negative, and a NULL numeric is a driver hash hazard
    the oracle harness rejects), and the 'cdc' leg the FastCDC
    sub-document duplication profile (golden —
    :func:`cdc_chunk_stats_leg` documents its column mapping). The
    first two legs keep their own any-SF live-SQL differential
    (tests/test_consolidated_live_legs.py — golden_sf pins THIS
    row's check to the driver SF); the cdc golden pins the gear
    chunker's exact values there."""
    cdc = cdc_chunk_stats_leg(spark, sf_dir).select(
        F.lit("cdc").alias("leg"), "key", "n", "canonical_id"
    )
    return (
        panel_live_legs(spark, sf_dir)
        .unionByName(cdc)
        .orderBy("leg", "key")
    )


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via the inverted-index
    join — the sub-quadratic relational formulation (candidates only
    from shared shingles; all-pairs never materializes)."""
    docs = catalog.table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=0.2, k=3).orderBy("id_a", "id_b")


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {sql_lsh_bucket('embedding')} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({sql_cosine('a.embedding', 'b.embedding')}, 6) AS score
    FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({sql_cosine('a.embedding', 'b.embedding')}, 6) >= 0.3
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: LSH sign-bit bucketing (identical
    deterministic hyperplanes in both engines) then in-bucket cosine
    verification."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.3).orderBy("id_a", "id_b")


def dedup_minhash_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (banded signatures). xxhash64 has
    no DuckDB equivalent, but the signatures are fully deterministic,
    so the expected candidate set is pinned as a committed golden
    table; accuracy vs exact Jaccard is asserted in
    tests/test_dedup.py."""
    docs = catalog.table(spark, sf_dir, "documents")
    return minhash_candidates(docs).orderBy("id_a", "id_b")


def dedup_simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with 1-bit multi-probe banding
    (recall-1.0 radius = 2*bands-1 = 7, matching the hamming<=8
    verification threshold), golden-pinned like MinHash
    (deterministic xxhash64 signatures)."""
    docs = catalog.table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, probe_bits=1).orderBy("id_a", "id_b")


@register(
    "dedup_group_components",
    oracle="WITH RECURSIVE "
    + _JACCARD_BODY
    + """
    , edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    comp AS (
        SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    )
    SELECT node, component,
           COUNT(*) OVER (PARTITION BY component) AS group_size
    FROM comp ORDER BY node
    """,
)
def dedup_group_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP resolution: the transitive closure of the exact
    Jaccard pair table as connected components (alternating
    large-star/small-star contraction, operators/components.py), with
    the deterministic min-id component label and per-group size.
    Oracle is the same closure via DuckDB's recursive CTE — a formu-
    lation that is exponential-state at scale but exact at sf0.01."""
    docs = catalog.table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.2, k=3)
    return dup_group_stats(connected_components(pairs)).orderBy("node")


@register(
    "decontaminate_eval_overlap",
    oracle="WITH "
    + _SHINGLES_BODY
    + """
    , eval_sh AS (
        SELECT DISTINCT shingle FROM shingles WHERE doc_id % 37 = 0
    ),
    hits AS (
        SELECT s.doc_id, COUNT(*) AS n_hit
        FROM shingles s JOIN eval_sh e USING (shingle)
        WHERE s.doc_id % 37 <> 0
        GROUP BY s.doc_id
    )
    SELECT h.doc_id, z.set_size AS n_shingles, h.n_hit,
           h.n_hit * 1.0 / z.set_size AS overlap_frac,
           h.n_hit * 1.0 / z.set_size >= 0.5 AS contaminated
    FROM hits h JOIN sizes z USING (doc_id)
    ORDER BY doc_id
    """,
)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): 3-gram
    containment of each corpus doc's shingle set in a held-out eval
    split (here the deterministic doc_id % 37 == 0 slice stands in
    for the benchmark). The tiny distinct eval-shingle set is
    broadcast, so the 100 TB corpus probe is a map-side semi-join —
    no corpus shuffle before the per-doc hit aggregation."""
    from .decontam import contamination_overlap

    docs = catalog.table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 37 == 0
    return contamination_overlap(
        docs.filter(~is_eval), docs.filter(is_eval), k=3, threshold=0.5
    ).orderBy("doc_id")


@register(
    "semantic_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE bucketed AS (
        SELECT vec_id, embedding, {sql_lsh_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round({sql_cosine('a.embedding', 'b.embedding')}, 6) >= 0.3
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    comp AS (
        SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    ),
    dropped AS (SELECT node FROM comp WHERE node <> component)
    SELECT label,
           COUNT(*) AS n_vectors,
           COUNT(*) FILTER (WHERE vec_id NOT IN (SELECT node FROM dropped)) AS n_kept,
           COUNT(*) FILTER (WHERE vec_id IN (SELECT node FROM dropped)) AS n_dropped
    FROM embeddings
    GROUP BY label ORDER BY label
    """,
)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup, end to end: embedding-cosine
    near-dup pairs (LSH-bucketed self-join, the pair set
    value-checked by dedup_embedding_cosine) → connected components →
    keep each component's canonical min-id member, count survivors
    per class label. The component/labels table is pair-graph-sized
    (≪ corpus), so the survivor anti-join is the only corpus-width
    step."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.3)
    kept = keep_group_canonical(emb, connected_components(pairs), id_col="vec_id")
    totals = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    kept_counts = kept.groupBy("label").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        totals.join(kept_counts, "label", "left")
        .select(
            "label",
            "n_vectors",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            (F.col("n_vectors") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_dropped"),
        )
        .orderBy("label")
    )


golden_table("dedup_minhash_candidates", dedup_minhash_candidates_q)
golden_table("dedup_simhash_pairs", dedup_simhash_pairs_q)


@register(
    "dedup_pair_methods",
    oracle="WITH "
    + _JACCARD_BODY
    + f"""
    SELECT * FROM (
        SELECT 'jaccard' AS method, id_a, id_b, jaccard AS score
        FROM pairs
        UNION ALL
        SELECT 'minhash' AS method, id_a, id_b, est_jaccard AS score
        FROM read_parquet('{GOLDEN_DIR}/dedup_minhash_candidates.parquet')
        UNION ALL
        SELECT 'simhash' AS method, id_a, id_b, CAST(hamming AS DOUBLE) AS score
        FROM read_parquet('{GOLDEN_DIR}/dedup_simhash_pairs.parquet')
    ) ORDER BY method, id_a, id_b
    """,
    golden_sf=DRIVER_SF,
)
def dedup_pair_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three near-dup PAIR generators in one labeled result —
    exact 3-gram Jaccard (inverted-index join, live SQL oracle),
    MinHash-LSH candidates (banded xxhash64 signatures, golden leg),
    and SimHash multi-probe pairs (golden leg). ``score`` is each
    method's native similarity figure: true Jaccard, estimated
    Jaccard, and Hamming distance respectively (the labels keep them
    apart). Accuracy anchors vs exact Jaccard live in
    tests/test_dedup.py; checked at the driver SF where the goldens
    are generated (the Jaccard leg holds at any SF)."""
    jac = dedup_jaccard_pairs(spark, sf_dir).select(
        F.lit("jaccard").alias("method"), "id_a", "id_b",
        F.col("jaccard").alias("score"),
    )
    mh = dedup_minhash_candidates_q(spark, sf_dir).select(
        F.lit("minhash").alias("method"), "id_a", "id_b",
        F.col("est_jaccard").alias("score"),
    )
    sh = dedup_simhash_pairs_q(spark, sf_dir).select(
        F.lit("simhash").alias("method"), "id_a", "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    return jac.unionByName(mh).unionByName(sh).orderBy("method", "id_a", "id_b")
