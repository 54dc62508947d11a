"""BPE vocabulary induction + tokenization: lossless reconstruction,
monotone compression in merge count, kernel/driver agreement,
determinism, and behavior on the real documents corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.bpe import (
    EOW,
    bpe_tokenize,
    encode_word,
    train_bpe,
    word_frequencies,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


SENNRICH = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]


def test_word_frequencies_exact(spark):
    wf = {r["word"]: r["n"] for r in word_frequencies(_docs(spark, SENNRICH)).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_reconstruction_is_lossless_and_compression_monotone(spark):
    docs = _docs(spark, SENNRICH)
    base = None
    for n_merges in (0, 4, 12, 40):
        merges = train_bpe(docs, n_merges=n_merges, min_count=1)
        out = bpe_tokenize(docs, merges).collect()[0]
        # lossless: stripping EOW and rejoining yields the original words
        rebuilt = "".join(out["bpe_tokens"]).replace(EOW, " ").strip()
        assert rebuilt == SENNRICH[0].strip()
        if base is not None:
            assert out["n_bpe_tokens"] <= base, "more merges must not grow tokens"
        base = out["n_bpe_tokens"]
    # with enough merges every frequent word is one token (word+EOW)
    merges = train_bpe(docs, n_merges=60, min_count=1)
    toks = bpe_tokenize(docs, merges).collect()[0]["bpe_tokens"]
    assert toks.count("newest" + EOW) == 6
    assert toks.count("low" + EOW) == 5


def test_kernel_matches_driver_reference_and_determinism(spark):
    docs = _docs(spark, SENNRICH + ["an unseen singleton zebra"])
    merges = train_bpe(docs, n_merges=20, min_count=2)
    assert merges == train_bpe(docs, n_merges=20, min_count=2)  # deterministic
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    rows = {r["doc_id"]: r for r in bpe_tokenize(docs, merges).collect()}
    for d, text in ((0, SENNRICH[0]), (1, "an unseen singleton zebra")):
        expect = [t for w in text.split() for t in encode_word(w, ranks)]
        assert rows[d]["bpe_tokens"] == expect
        assert rows[d]["n_bpe_tokens"] == len(expect)
    # words below min_count never trained, still encode (char fallback)
    assert "".join(rows[1]["bpe_tokens"]).replace(EOW, " ").strip() == (
        "an unseen singleton zebra"
    )
    # partition independence
    again = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(docs.repartition(7), merges).collect()
    }
    assert again == {d: r["bpe_tokens"] for d, r in rows.items()}


def test_bpe_on_documents_corpus(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents").limit(200)
    merges = train_bpe(docs, n_merges=80)
    assert len(merges) > 0
    out = bpe_tokenize(docs, merges)
    joined = out.join(docs, "doc_id").select(
        "doc_id", "text", "bpe_tokens", "n_bpe_tokens",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
    )
    for r in joined.collect():
        # at least one bpe token per word, at most one per character
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["n_bpe_tokens"] <= len(r["text"]) + r["n_words"]
        rebuilt = "".join(r["bpe_tokens"]).replace(EOW, " ").strip()
        assert rebuilt == " ".join(r["text"].split())
