"""Corpus → learned tokenizer → token ids → packed training shards.

The last mile of the LLM-data pipeline, composed end-to-end from the
engine's own operators (everything before this — curation, dedup,
decontamination, splits — is `examples/curate_corpus.py`):

    python examples/tokenize_shards.py [sf_dir] [workdir]

1. TRAIN the tokenizer on the corpus (`operators/bpe.py train_bpe`:
   one corpus-scale word-frequency aggregation, driver-side merge
   induction on that bounded table — how production trainers work).
2. Derive the VOCABULARY (token → id) from the merge list + corpus:
   every symbol the merges can produce, ranked deterministically —
   the id table is data, stored alongside the shards.
3. TOKENIZE every document (`bpe_tokenize` Arrow kernel, per-batch
   word cache) and map tokens → ids with one broadcast join of the
   exploded tokens (JVM-side; the vocab is broadcast-sized).
4. PACK the id sequences into fixed-length context chunks
   (`pack_chunk_spans` assigns every document its span in the
   concatenated global token stream — shard-parallel running sums,
   no global window) and write one table: (doc_id, shard, ids,
   tok_offset, first_chunk, last_chunk) — exactly what a training
   dataloader needs to assemble context windows.
5. COMMIT shards + vocab as snapshot-isolated tables
   (`sources/table_format.py`) so a training run reads a pinned
   version while the next corpus build commits the following one.

At 100 TB: step 1 is one hash aggregation; step 3 is map-only with a
broadcast vocab; step 4's only shuffle is the shard-keyed window;
step 5 is an atomic manifest swap per shard table.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.bpe import (
    bpe_tokenize,
    train_bpe,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.packing import (
    assemble_context_chunks,
    pack_chunk_spans,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)


def main(sf_dir: str, workdir: str) -> None:
    spark = get_spark("tokenize-shards")
    # fresh-workdir guard: vocab/shards commits are APPENDS — a rerun
    # into the same workdir would double the vocab and the broadcast
    # id join would then silently duplicate every token in input_ids
    for sub in ("vocab", "shards"):
        if os.path.exists(os.path.join(workdir, sub)):
            raise SystemExit(
                f"workdir {workdir!r} already holds a {sub!r} table — "
                "use a fresh workdir per build (tables are append-only)"
            )
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # 1. learn the tokenizer
    merges = train_bpe(docs, n_merges=120, min_count=2)
    print(f"tokenizer: {len(merges)} merges learned from {n_docs} docs")

    # 2. vocabulary = distinct tokens the kernel actually emits,
    # id-ranked by (frequency desc, token) — deterministic.
    # persist: the Python BPE kernel is the dominant cost and three
    # consumers read it (vocab frequencies, the id join, the packer's
    # BPE-stream input) — without the persist each re-runs the encode
    tokenized = bpe_tokenize(docs, merges).persist()
    tok_freq = (
        tokenized.select(F.explode("bpe_tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = tok_freq.select(
        "token",
        "n",
        (F.row_number().over(Window.orderBy(F.desc("n"), "token")) - 1).alias(
            "token_id"
        ),
    )
    # the single-partition ranking window is fine HERE because the
    # vocab is bounded (≤ base chars + n_merges symbols), not corpus-
    # sized — the same bounded-driver-table argument as train_bpe.
    vocab_table = ParquetTable(spark, os.path.join(workdir, "vocab"))
    vocab_table.append(vocab)
    v = vocab_table.read()
    print(f"vocab: {v.count()} tokens (table v{vocab_table.current_version()})")

    # 3. tokens → ids: explode, one broadcast join, re-collect in order
    ids = (
        tokenized.select(
            "doc_id", F.posexplode("bpe_tokens").alias("pos", "token")
        )
        .join(F.broadcast(v.select("token", "token_id")), "token")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "token_id"))
                ),
                lambda s: s.getField("token_id"),
            ).alias("input_ids")
        )
    )

    # 4. pack into 512-token context chunks — pack by the BPE token
    # stream, not raw words: re-render each doc as its space-joined
    # BPE tokens so the packer's whitespace token count IS the BPE
    # count (EOW markers are non-space), and spans line up with
    # input_ids exactly
    bpe_docs = tokenized.select(
        "doc_id", F.concat_ws(" ", "bpe_tokens").alias("text")
    )
    spans = pack_chunk_spans(bpe_docs, context_len=512, n_shards=8)
    shard_rows = spans.join(ids, "doc_id", "left").select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_offset",
        "first_chunk",
        "last_chunk",
        F.coalesce("input_ids", F.array().cast("array<int>")).alias("input_ids"),
    )

    # 5. commit one table per shard grouping (here: one table,
    # list-sorted so a dataloader's shard read prunes files)
    shards = ParquetTable(spark, os.path.join(workdir, "shards"))
    shards.append(shard_rows)
    shards.compact(sort_by=["shard"])
    got = shards.read()
    n_chunks = got.agg(F.max("last_chunk")).first()[0]
    total_toks = got.agg(F.sum("n_tokens")).first()[0]
    print(
        f"shards: {got.count()} docs, {total_toks} BPE tokens packed into "
        f"{(n_chunks or 0) + 1} chunks of 512 (table v{shards.current_version()})"
    )
    # integrity: token counts agree between tokenizer and packer inputs
    mismatch = got.filter(F.size("input_ids") != F.col("n_tokens")).count()
    print(f"id/count mismatches: {mismatch}")
    assert mismatch == 0, "input_ids/n_tokens disagreement — corrupt shards"

    # 6. the dataloader side: materialize the first training batches
    # from the committed shard table (each exactly 512 ids except the
    # final partial chunk)
    batches = assemble_context_chunks(got, context_len=512)
    sample = batches.limit(3).collect()
    for r in sample:
        print(
            f"batch chunk {r['chunk_id']}: {r['n_chunk_tokens']} ids, "
            f"head {r['token_ids'][:5]}"
        )
    tokenized.unpersist()
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")
    main(sf, wd)
