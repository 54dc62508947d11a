"""Exact-substring (k-gram span) dedup: rolling-hash window table,
keep-first duplicate flagging, span merging, and trimming — checked
against a sequential reference that matches token tuples EXACTLY (no
hashing), so the 2^-64 collision assumption is itself under test on
every corpus here."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.substring_dedup import (
    _B,
    duplicated_spans,
    trim_duplicate_spans,
    window_hashes,
)


def _docs_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in sorted(docs.items())], "doc_id long, text string"
    )


def reference_trim(docs: dict[int, str], k: int) -> dict[int, tuple[str, int]]:
    """Sequential exact-match reference: every length-k token window,
    keyed by its actual token tuple; all occurrences after the global
    first (min (doc_id, pos)) mark their k positions for removal."""
    toks = {d: t.split() for d, t in docs.items()}
    occ: dict[tuple, list] = defaultdict(list)
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - k + 1):
            occ[tuple(ts[i : i + k])].append((d, i))
    drop: dict[int, set] = defaultdict(set)
    for lst in occ.values():
        for d, i in sorted(lst)[1:]:
            drop[d].update(range(i, i + k))
    out = {}
    for d, ts in toks.items():
        if drop[d]:
            kept = [t for i, t in enumerate(ts) if i not in drop[d]]
            out[d] = (" ".join(kept), len(drop[d]))
        else:
            out[d] = (docs[d], 0)
    return out


def _spark_trim(spark, docs, k):
    rows = trim_duplicate_spans(_docs_df(spark, docs), k=k).collect()
    return {r["doc_id"]: (r["text"], r["n_tokens_removed"]) for r in rows}


def test_window_hashes_match_direct_polynomial(spark):
    """The vectorized uint64 rolling hash equals the directly-computed
    polynomial hash of each window (exact integer reference)."""
    text = "a b c a b c d e f a b"
    k = 3
    got = {
        r["pos"]: r["whash"] % (1 << 64)
        for r in window_hashes(_docs_df(spark, {1: text}), k=k).collect()
    }
    toks = text.split()
    import pyspark.sql.functions as F2

    th = [
        r[0] % (1 << 64)
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select(F2.xxhash64("t"))
        .collect()
    ]
    mask = (1 << 64) - 1
    for i in range(len(toks) - k + 1):
        direct = 0
        for j in range(k):
            direct = (direct + th[i + j] * pow(_B, j, 1 << 64)) & mask
        assert got[i] == direct, i
    # identical windows (pos 0 and 3 and 9: 'a b c' / 'a b') collide
    assert got[0] == got[3]
    # doc shorter than k emits nothing
    assert window_hashes(_docs_df(spark, {1: "one two"}), k=3).count() == 0


def test_planted_passage_trimmed_keep_first(spark):
    """A 7-token passage pasted into three otherwise-unrelated docs:
    the lowest doc_id keeps it, the others lose exactly that span,
    untouched docs pass through byte-identical."""
    passage = "the quick brown fox jumps over dogs"
    docs = {
        0: f"alpha beta {passage} gamma delta",
        1: "totally unrelated content with  odd   spacing",
        2: f"{passage} trailing words here",
        3: f"leading words {passage}",
    }
    k = 7
    got = _spark_trim(spark, docs, k)
    assert got == reference_trim(docs, k)
    assert got[0] == (docs[0], 0)  # first occurrence survives
    assert got[1] == (docs[1], 0)  # untouched → byte-identical spacing
    assert got[2] == ("trailing words here", 7)
    assert got[3] == ("leading words", 7)
    # spans reported as merged ranges
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicated_spans(_docs_df(spark, docs), k=k).collect()
    }
    assert spans == {(2, 0, 7), (3, 2, 9)}


def test_differential_vs_reference_on_overlapping_repeats(spark):
    """Random-ish corpus with shared passages at varying overlaps,
    within-doc repeats, and a fully-duplicated document — Spark must
    equal the exact-match reference everywhere."""
    base = "w%d"
    passage_a = " ".join(base % i for i in range(100, 108))
    passage_b = " ".join(base % i for i in range(200, 206))
    docs = {
        1: f"{passage_a} filler1 filler2 {passage_b}",
        2: f"pre {passage_a} mid {passage_a} post",  # within-doc repeat too
        3: passage_b,  # fully duplicated doc
        4: " ".join(base % i for i in range(300, 340)),  # unique long doc
        5: f"{passage_b} tail tail2",
        6: "short",
    }
    for k in (4, 6):
        got = _spark_trim(spark, docs, k)
        assert got == reference_trim(docs, k), f"k={k}"
    # the fully-duplicated doc stays present, emptied
    got = _spark_trim(spark, docs, 6)
    assert got[3] == ("", 6)


def test_trim_is_idempotent_and_partition_independent(spark):
    docs = {
        1: "a b c d e f g h i j",
        2: "x a b c d e f g h y",  # shares an 8-token run
        3: "noise only here",
    }
    k = 5
    df = _docs_df(spark, docs)
    once = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
            for r in trim_duplicate_spans(df, k=k).collect()}
    assert once == reference_trim(docs, k)
    # idempotent: survivors are global first occurrences
    again_df = spark.createDataFrame(
        [(d, t) for d, (t, _) in sorted(once.items())], "doc_id long, text string"
    )
    again = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
             for r in trim_duplicate_spans(again_df, k=k).collect()}
    assert {d: t for d, (t, _) in again.items()} == {d: t for d, (t, _) in once.items()}
    assert all(n == 0 for _, n in again.values())
    # partition independence
    for n_parts in (1, 7):
        rep = {r["doc_id"]: (r["text"], r["n_tokens_removed"])
               for r in trim_duplicate_spans(df.repartition(n_parts), k=k).collect()}
        assert rep == once


def test_plan_shape_no_global_window(spark):
    """The whash window partitions by the hash and the island window
    by doc_id — no empty-partitionBy window anywhere (the scan stays
    corpus-scalable)."""
    df = _docs_df(spark, {1: "a b c d e", 2: "a b c d e"})
    plan = (
        trim_duplicate_spans(df, k=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(doc_id" in plan.replace(" ", "") or "doc_id" in plan
    assert "windowspecdefinition()" not in plan.replace(" ", "")


def test_hypothesis_differential_small_alphabet(spark):
    """Random corpora over a 3-token alphabet at k=3: windows collide
    constantly, exercising keep-first ordering, overlapping-span
    merging, and within-doc repeats far beyond the hand fixtures."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    doc_st = st.lists(st.sampled_from("abc"), min_size=0, max_size=24).map(" ".join)

    @settings(
        max_examples=10,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=st.lists(doc_st, min_size=1, max_size=6))
    def run(texts):
        docs = {i: t for i, t in enumerate(texts)}
        got = _spark_trim(spark, docs, 3)
        assert got == reference_trim(docs, 3)

    run()
