"""End-to-end training-data curation over the documents corpus —
the charter's LLM-pipeline operators (SURVEY.md §2.10) composed the
way a pre-training data run composes them:

    python examples/curate_corpus.py [sf_dir] [workdir]

0. Text hygiene (NFC + mojibake repair + control strip — ftfy-lite)
   and DEFLATE compression-ratio signal (information density).
1. Language ID + quality/repetition band filter (map-only signals).
2. PII redaction (email/phone/IPv4 scrub) + corpus-wide line dedup
   (CCNet/C4-style boilerplate removal) + exact-substring span dedup
   (Lee et al. k-gram rolling-hash pass — duplicated passages
   longer than k tokens keep one copy corpus-wide).
3. Exact dedup (fingerprint) then MinHash-LSH near-dup pruning.
4. Benchmark decontamination (broadcast eval-shingle containment).
5. Deterministic train/val/test split (content-keyed — reproducible
   at any partitioning, incremental across corpus versions).
6. Source-mixture report + sequence packing of the train split into
   fixed-length context chunks (concat-and-chunk spans).
7. Snapshot-isolated commit into a ParquetTable per split.

Every stage is a lazy DataFrame transform; Spark runs the whole
curation as a handful of jobs. At 100 TB the same code holds: the
signals are map-only, dedup is inverted-index/banded (never
all-pairs), the split is a pure filter, and the table commit is an
atomic manifest swap.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import sampling
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
    dedup_lines,
    drop_boilerplate_lines,
    drop_exact_dups,
    minhash_candidates,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.decontam import (
    drop_contaminated,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.packing import (
    pack_chunk_spans,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
    extraction,
    hygiene,
    substring_dedup,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.redact import redact_pii
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.text import (
    dup_token_count,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)


def main(sf_dir: str, workdir: str) -> None:
    spark = get_spark("curate-corpus")
    plain = catalog.table(spark, sf_dir, "documents")
    n0 = plain.count()

    # -1. crawl shape: a real run starts from MARKUP, not text. The
    # testdata is plain text, so synthesize the page each doc would
    # have arrived as (entity-escaped body + chrome with a link-heavy
    # footer), then run the two-tier extractor; the structural
    # link-density signal would drop nav/footer-only pages here.
    esc = F.col("text")
    for pat, rep in ((r"&", "&amp;"), (r"<", "&lt;"), (r">", "&gt;")):
        esc = F.regexp_replace(esc, pat, rep)
    crawl = plain.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("<html><head><title>doc</title></head><body><p>"),
            esc,
            F.lit(
                "</p><footer><a href='/s'>share</a>"
                "<a href='/t'>tweet</a></footer></body></html>"
            ),
        ).alias("html"),
    )
    extracted = extraction.extract_text(crawl)
    raw = (
        extracted.filter(
            F.col("text").isNotNull() & (F.col("link_density") < 0.5)
        )
        .select("doc_id", "text")
        .join(plain.select("doc_id", "source"), "doc_id")
    )
    n_extracted = raw.count()

    # 0. hygiene: mojibake/NFC/control repair, then the compression-
    # ratio information-density signal (both Arrow kernels, map-only)
    docs = hygiene.fixed_text(raw).drop("changed")
    density = hygiene.compression_signals(docs).select("doc_id", "compression_ratio")

    # 1. signals + band filter (single map stage; all JVM expressions)
    toks = tokens(F.col("text"))
    scored = docs.join(density, "doc_id").select(
        "doc_id",
        "text",
        "compression_ratio",
        lang_id(F.col("text")).alias("pred_lang"),
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tok"),
        (dup_token_count(toks) / F.greatest(F.size(toks), F.lit(1))).alias("rep_frac"),
    )
    kept = scored.filter(
        (F.col("pred_lang") == "en")
        & (F.col("quality") >= 0.4)
        & (F.col("n_tok") >= 20)
        & (F.col("rep_frac") <= 0.6)
        # drop both template sludge (over-compressible) and noise
        # (incompressible); generous bounds — it's a guard rail here
        & F.col("compression_ratio").between(0.05, 0.95)
    ).drop("compression_ratio")

    # 2. PII scrub + 3a. exact dedup on the normalized fingerprint,
    # then corpus-wide line dedup (exact-dup docs must drop BEFORE
    # line dedup, or each clone survives as an empty shell)
    redacted = kept.select(
        "doc_id", "pred_lang", "quality", redact_pii(F.col("text")).alias("text")
    )
    whole_unique = drop_exact_dups(redacted)
    # boilerplate first (frequency rule drops every copy of common
    # lines), then keep-first dedup of what remains
    no_boiler = drop_boilerplate_lines(whole_unique, min_docs=5).drop(
        "n_lines_removed"
    )
    line_unique = dedup_lines(no_boiler)
    # exact-substring pass: duplicated ≥16-token passages keep their
    # first occurrence only (catches licence blocks/templates pasted
    # mid-document that neither line nor doc dedup sees)
    span_unique = substring_dedup.trim_duplicate_spans(line_unique, k=16).drop(
        "n_tokens_removed"
    )
    exact_unique = span_unique.join(
        whole_unique.select("doc_id", "pred_lang", "quality"), "doc_id"
    )

    # 3b. near-dup pruning: MinHash-LSH candidates, keep the lower id
    near = minhash_candidates(exact_unique.select("doc_id", "text"))
    losers = near.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = exact_unique.join(losers, "doc_id", "left_anti")

    # 4. benchmark decontamination: the held-out slice stands in for
    # an eval benchmark; its shingle set broadcasts, so the corpus
    # probe is map-side
    is_eval = F.col("doc_id") % 37 == 0
    cleaned = drop_contaminated(
        deduped.filter(~is_eval), docs.filter(is_eval), k=3, threshold=0.5
    )

    # 5. deterministic split + 7. committed tables
    final = sampling.train_val_test_split(cleaned, "doc_id")
    tables = {}
    for split in ("train", "val", "test"):
        t = ParquetTable(spark, os.path.join(workdir, split))
        t.append(final.filter(F.col("split") == split).drop("split"))
        tables[split] = t

    # 6. mixture report + pack the train split into context chunks
    # source lives on the cheap catalog table — joining `raw` here
    # would re-run the whole extraction kernel per action
    train = tables["train"].read().join(plain.select("doc_id", "source"), "doc_id")
    mix = (
        train.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(token_count(F.col("text"))).alias("n_tok"))
        .orderBy(F.desc("n_tok"))
    )
    packed = pack_chunk_spans(tables["train"].read(), context_len=2048, n_shards=16)
    n_chunks = packed.agg(
        F.coalesce(F.max(F.col("last_chunk")) + 1, F.lit(0)).alias("n")
    ).collect()[0]["n"]

    n_kept, n_unique, n_final = kept.count(), exact_unique.count(), deduped.count()
    n_clean = cleaned.count()
    print(f"corpus:        {n0} docs (as crawled markup)")
    print(f"extraction:    {n_extracted} kept ({n0 - n_extracted} dropped: "
          "parse failure or link-density chrome)")
    print(f"band filter:   {n_kept} kept ({n_extracted - n_kept} dropped)")
    print(f"exact dedup:   {n_unique} unique")
    print(f"near-dup:      {n_final} after LSH pruning")
    print(f"decontam:      {n_clean} after eval-overlap drop")
    for split, t in tables.items():
        print(f"  {split}: {t.read().count()} docs (table v{t.current_version()})")
    print(f"train mixture: {[(r.source, r.n_docs, r.n_tok) for r in mix.collect()[:5]]} ...")
    print(f"train packing: {n_chunks} chunks of 2048 tokens")
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curate_")
    main(sf, wd)
