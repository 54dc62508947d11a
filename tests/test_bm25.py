"""BM25 / TF-IDF retrieval + RRF hybrid fusion (operators/bm25.py):
full DuckDB differential (same compare harness the registry uses —
the registry itself stays at the driver's 50 consolidated slots),
hand-computed fixtures, and plan-shape locks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.bm25 import (
    bm25_score,
    build_index,
    rrf_fuse,
    tfidf_vectors,
)

from .oracle_harness import compare

SF = "/root/testdata/sf0.01"

#: (query_id, terms) probe set — common + rare + absent terms
QUERIES = [
    (0, ["join", "hash"]),
    (1, ["spark", "vector"]),
    (2, ["customer"]),
    (3, ["join", "join", "nosuchterm"]),  # dup terms WEIGHT (qtf=2); miss matches 0 docs
]


def _qtf(terms):
    out = {}
    for t in terms:
        out[t] = out.get(t, 0) + 1
    return sorted(out.items())


_QUERY_VALUES = ", ".join(
    f"({qid}, '{t}', {n})" for qid, terms in QUERIES for t, n in _qtf(terms)
)

_TOKS = r"""
    toks AS (
        SELECT doc_id, lower(w) AS term
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents)
        WHERE w <> ''
    ),
    postings AS (
        SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY term, doc_id
    ),
    doc_stats AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id)
"""

BM25_ORACLE = f"""
    WITH {_TOKS},
    scalars AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM doc_stats
    ),
    queries(query_id, term, qtf) AS (VALUES {_QUERY_VALUES}),
    tdf AS (
        SELECT term, COUNT(*) AS df FROM postings
        WHERE term IN (SELECT term FROM queries) GROUP BY term
    ),
    scored AS (
        SELECT q.query_id, p.doc_id,
               round(SUM(
                   q.qtf
                   * ln(1 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
                   * p.tf * 2.2
                   / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))
               ), 6) AS score
        FROM postings p
        JOIN queries q USING (term)
        JOIN tdf t USING (term)
        JOIN doc_stats d USING (doc_id)
        CROSS JOIN scalars s
        GROUP BY q.query_id, p.doc_id
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id
        ) AS INT) AS rank FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, rank
    FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

TFIDF_ORACLE = f"""
    WITH {_TOKS},
    n AS (SELECT COUNT(*) AS n_docs FROM doc_stats),
    tdf AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term)
    SELECT p.doc_id, p.term,
           round(p.tf * (ln((1.0 + n.n_docs) / (1.0 + t.df)) + 1.0), 6)
               AS tfidf
    FROM postings p JOIN tdf t USING (term) CROSS JOIN n
    WHERE p.term IN ('join', 'spark', 'customer', 'vector')
    ORDER BY p.doc_id, p.term
"""


def _spark_queries(spark):
    return spark.createDataFrame(
        [(qid, terms) for qid, terms in QUERIES],
        "query_id long, terms array<string>",
    )


def _bm25_query(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    postings, stats = build_index(docs)
    return bm25_score(postings, stats, _spark_queries(spark), k=5)


def test_bm25_matches_duckdb(spark):
    compare(spark, SF, _bm25_query, BM25_ORACLE, name="bm25_topk")


def test_tfidf_matches_duckdb(spark):
    def q(spark_, sf_dir):
        docs = catalog.table(spark_, sf_dir, "documents")
        postings, stats = build_index(docs)
        return (
            tfidf_vectors(postings, stats)
            .filter(F.col("term").isin("join", "spark", "customer", "vector"))
            .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"))
            .orderBy("doc_id", "term")
        )

    compare(spark, SF, q, TFIDF_ORACLE, name="tfidf_vectors")


def test_bm25_hand_computed_tiny_corpus(spark):
    """3-doc corpus small enough to verify the Okapi formula by hand."""
    docs = spark.createDataFrame(
        [(0, "cat dog"), (1, "cat cat fish"), (2, "bird")],
        "doc_id long, text string",
    )
    postings, stats = build_index(docs)
    q = spark.createDataFrame([(0, ["cat"])], "query_id long, terms array<string>")
    got = {r["doc_id"]: r for r in bm25_score(postings, stats, q, k=3).collect()}
    # N=3, df(cat)=2 → idf = ln(1 + 1.5/2.5); avgdl = (2+3+1)/3 = 2
    idf = math.log(1 + 1.5 / 2.5)
    def s(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0)), 6)
    assert set(got) == {0, 1}  # bird-doc has no match
    assert got[0]["score"] == pytest.approx(s(1, 2), abs=1e-9)
    assert got[1]["score"] == pytest.approx(s(2, 3), abs=1e-9)
    # doc 1 has tf=2 but is longer; formula decides the order
    want_order = sorted(
        [(0, s(1, 2)), (1, s(2, 3))], key=lambda kv: (-kv[1], kv[0])
    )
    assert [got[d]["rank"] for d, _ in want_order] == [1, 2]


def test_rrf_fusion_hand_computed(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id long, doc_id long, rank int"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=4, c=60).collect()}
    assert got[11]["rrf_score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    assert got[11]["rank"] == 1  # appears in both lists → wins
    assert got[10]["rrf_score"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    # 10 (rank1 in a) beats 13 (rank2 in b) beats 12 (rank3 in a)
    assert [got[d]["rank"] for d in (11, 10, 13, 12)] == [1, 2, 3, 4]


def test_bm25_plan_two_phase_topk_and_broadcast_probe(spark, sf_dir):
    """Scale locks: ranking is the bounded two-phase fold (no Window),
    and the query side broadcasts into the postings probe."""
    plan = (
        _bm25_query(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan[:3000]
    assert plan.count("collect_list") >= 2
    assert "BroadcastHashJoin" in plan
    # the one-row corpus-scalar join is the pinned broadcast-scalar shape
    assert "BroadcastNestedLoopJoin" in plan


def test_partition_layout_independence(spark):
    docs = catalog.table(spark, SF, "documents")
    q = _spark_queries(spark)

    def run(d):
        postings, stats = build_index(d)
        return sorted(
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in bm25_score(postings, stats, q, k=5).collect()
        )

    assert run(docs.repartition(17)) == run(docs.coalesce(1))


def test_hot_term_probe_stays_bounded(spark):
    """A stop-word-grade query term (present in EVERY document) makes
    the probe read the full postings list for that term — the two-
    phase top-k must still rank without a per-query global sort, and
    idf must floor at ln(1+ ~0.5/N) > 0 (never negative under the
    +1-inside-the-log Okapi form)."""
    docs = catalog.table(spark, SF, "documents")
    # 'the' appears in essentially every doc — the worst-case term
    q = spark.createDataFrame([(0, ["the"])], "query_id long, terms array<string>")
    postings, stats = build_index(docs)
    out = bm25_score(postings, stats, q, k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["score"] > 0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # bounded two-phase even for hot terms
