"""Accuracy tests for the sketch-based dedup operators (MinHash,
SimHash) against exact Jaccard ground truth, plus ANN recall vs the
brute-force baseline — the checks the DuckDB oracle can't express
(xxhash64 has no DuckDB equivalent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
    jaccard_pairs,
    minhash_candidates,
    simhash_near_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return catalog.table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    """Ground truth: exact Jaccard ≥ 0.5 pairs (strong near-dups)."""
    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }


def test_minhash_recall_on_strong_pairs(docs, exact_pairs):
    cands = {
        (r["id_a"], r["id_b"]) for r in minhash_candidates(docs).collect()
    }
    if not exact_pairs:
        pytest.skip("no strong near-dup pairs at this SF")
    hits = sum(1 for p in exact_pairs if p in cands)
    recall = hits / len(exact_pairs)
    # 4 bands × 4 rows: P(candidate) = 1-(1-j^4)^4 ≈ 0.9 at j=0.7;
    # demand most strong pairs are recovered.
    assert recall >= 0.6, f"minhash recall {recall} over {len(exact_pairs)} pairs"


def test_minhash_estimate_correlates(docs, exact_pairs):
    if not exact_pairs:
        pytest.skip("no strong near-dup pairs at this SF")
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_candidates(docs).collect()
    }
    errs = [abs(est[p] - j) for p, j in exact_pairs.items() if p in est]
    assert errs, "no overlap between candidates and ground truth"
    assert sum(errs) / len(errs) <= 0.25  # 16 hashes → σ ≈ 0.12


def test_simhash_finds_strong_pairs(docs, exact_pairs):
    if not exact_pairs:
        pytest.skip("no strong near-dup pairs at this SF")
    sim = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs(docs, max_hamming=8).collect()}
    very_strong = {p for p, j in exact_pairs.items() if j >= 0.95}
    if not very_strong:
        pytest.skip("no very strong pairs")
    hits = sum(1 for p in very_strong if p in sim)
    # banded blocking: hamming ≤ bands-1 guaranteed, ≤8 probabilistic;
    # calibrated: j ≥ 0.95 pairs sit at hamming ≤ 7 on this corpus.
    assert hits / len(very_strong) >= 0.6, f"{hits}/{len(very_strong)}"


def test_lsh_topk_finds_planted_duplicates(spark, sf_dir):
    """Random embeddings give LSH nothing to find, so plant exact
    clones of the probes under new ids: a clone shares every sign bit
    with its probe (same bucket, recall guaranteed) and has cosine
    1.0 — it MUST come back at rank 1 from both the brute-force and
    the LSH path."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    clones = probes.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(clones)

    for fn in (brute_force_topk, lsh_topk, ivf_topk):
        top = fn(corpus, probes, k=5)
        rank1 = {r["query_id"]: r for r in top.collect() if r["rank"] == 1}
        assert set(rank1) == set(range(5)), fn.__name__
        for q, r in rank1.items():
            assert r["neighbor_id"] == q + 1_000_000, (fn.__name__, q)
            assert r["score"] == 1.0


def test_lsh_topk_shapes(spark, sf_dir):
    emb = catalog.table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    approx = lsh_topk(emb, probes, k=5).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, s in by_q.items():
        assert len(s) <= 5
        assert q not in s  # self excluded


def test_simhash_multiprobe_pigeonhole_recall(docs):
    """1-bit multi-probe guarantee: EVERY pair at hamming <= 2*bands-1
    (= 7 at 4 bands) collides on some probed band — exhaustive
    ground-truth over the corpus signatures must be fully recovered.
    (Exact banding only guarantees hamming <= 3; the 4..7 range is
    where probing earns its fan-out.)"""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
        shingle_set,
        simhash_from_hashes,
    )
    from pyspark.sql import functions as F

    sigs = {
        r["doc_id"]: r["sig"]
        for r in shingle_set(docs, 3, "text", "doc_id")
        .select(
            "doc_id",
            simhash_from_hashes(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
            ).alias("sig"),
        )
        .collect()
        if r["sig"] is not None
    }
    ids = sorted(sigs)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 7
    }
    if not truth:
        pytest.skip("no pairs at hamming <= 7 in this corpus")
    probed = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(docs, max_hamming=8, probe_bits=1).collect()
    }
    missed = truth - probed
    assert not missed, f"pigeonhole violated: {sorted(missed)[:5]}"


# -- line-level dedup (CCNet/C4-style boilerplate removal) -----------------


def _py_line_dedup(rows):
    """Sequential reference: first (doc_id, pos) occurrence of every
    trimmed non-blank line survives; blanks always survive."""
    seen = {}
    for doc_id, text in sorted(rows):
        for pos, line in enumerate(text.split("\n")):
            key = line.strip()
            if key and key not in seen:
                seen[key] = (doc_id, pos)
    out = {}
    for doc_id, text in rows:
        kept, removed = [], 0
        for pos, line in enumerate(text.split("\n")):
            key = line.strip()
            if not key or seen[key] == (doc_id, pos):
                kept.append(line)
            else:
                removed += 1
        out[doc_id] = ("\n".join(kept), removed)
    return out


def test_dedup_lines_matches_sequential_reference(spark):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
        dedup_lines,
    )

    rows = [
        (1, "unique one\nSHARED FOOTER\n\nalpha"),
        (2, "SHARED FOOTER\nunique two\n  shared footer ws  \nalpha"),
        (3, "beta\n\n\nSHARED FOOTER"),
        (4, "SHARED FOOTER"),  # becomes empty text
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines(docs).collect()
    }
    assert got == _py_line_dedup(rows)
    # doc 4 lost its only line but must still be present
    assert got[4][0] == ""


def test_dedup_lines_idempotent_and_stats_on_corpus(spark, docs):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
        dedup_lines,
        line_stats,
    )

    once = dedup_lines(docs).cache()
    twice = dedup_lines(once)
    assert once.count() == docs.count()
    assert twice.filter(F.col("n_lines_removed") > 0).count() == 0
    again = {r["doc_id"]: r["text"] for r in twice.collect()}
    first = {r["doc_id"]: r["text"] for r in once.collect()}
    assert again == first  # idempotent
    once.unpersist()

    # stats view agrees with a direct count of surviving duplicates
    stats = line_stats(docs)
    dup_lines = stats.filter(F.col("n_total") > 1)
    # every duplicated fingerprint loses n_total - 1 occurrences
    expected_removed = (
        dup_lines.agg(F.sum(F.col("n_total") - 1)).collect()[0][0] or 0
    )
    got_removed = dedup_lines(docs).agg(F.sum("n_lines_removed")).collect()[0][0]
    assert got_removed == expected_removed


def test_drop_boilerplate_lines_frequency_rule(spark):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
        drop_boilerplate_lines,
    )

    rows = [
        (1, "COOKIE BANNER\nreal content one\n\nfooter"),
        (2, "COOKIE BANNER\nreal content two\nfooter"),
        (3, "COOKIE BANNER\nunique text"),
        (4, "just a doc\nfooter"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    def ref(min_docs):
        from collections import Counter

        counts = Counter()
        for _, text in rows:
            for ln in {l.strip() for l in text.split("\n") if l.strip()}:
                counts[ln] += 1
        out = {}
        for doc_id, text in rows:
            kept, removed = [], 0
            for ln in text.split("\n"):
                if ln.strip() and counts[ln.strip()] >= min_docs:
                    removed += 1
                else:
                    kept.append(ln)
            out[doc_id] = ("\n".join(kept), removed)
        return out

    for min_docs in (2, 3, 4):
        got = {
            r["doc_id"]: (r["text"], r["n_lines_removed"])
            for r in drop_boilerplate_lines(docs, min_docs=min_docs).collect()
        }
        assert got == ref(min_docs), min_docs
    # idempotent: surviving lines are all below threshold
    once = drop_boilerplate_lines(docs, min_docs=2)
    twice = drop_boilerplate_lines(once, min_docs=2)
    assert twice.filter(F.col("n_lines_removed") > 0).count() == 0
