"""RAG indexing pipeline over the documents corpus — the retrieval
side of the charter's similarity-search surface, composed end-to-end:

    python examples/rag_index.py [sf_dir]

1. Hygiene-fix the corpus, split every document into overlapping
   token-window chunks (``chunk_documents`` — map-only, RAG's
   standard indexing unit).
2. Embed each chunk. The container has no embedding model, so the
   embedder is a DETERMINISTIC STUB with the real kernel shape: an
   Arrow ``mapInPandas`` batch kernel hashing token features into a
   fixed-dimension vector (a hashing-trick bag-of-words — honest
   about being a stand-in, but the schema, batching, normalization,
   and partitioning are exactly what a sentence-transformer kernel
   would use; swap the closure body for the model call and nothing
   else changes).
3. Build the compressed ANN index and serve queries: IVF-PQ
   (``operators/pq.py``) over the chunk embeddings — coarse lists +
   product-quantization codes, ADC candidate scoring, exact cosine
   re-rank — next to the brute-force exact baseline for a live
   recall readout.
4. HYBRID retrieval: BM25 over the chunk texts (``operators/bm25.py``
   inverted-index postings) fused with the dense ranking via
   reciprocal-rank fusion — the standard lexical+dense production
   stack, here entirely as DataFrame plans. The lexical leg is then
   re-served from the INCREMENTALLY-FOLDED index
   (``streaming/bm25_index.py``, three micro-batches) with a live
   equality check against the batch scores.

At 100 TB the same composition holds: chunking is a scan stage, the
embed kernel is the GPU-bound map stage, the PQ index is the only
thing that must stay memory-resident, and queries probe a handful of
inverted lists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.hygiene import fixed_text
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.packing import (
    chunk_documents,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.bm25 import (
    bm25_score,
    build_index,
    rrf_fuse,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pq import ivfpq_topk
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark

DIM = 64

EMBED_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_chunks(chunks):
    """(vec_id, embedding) via the stub embedder: hashing-trick
    bag-of-words, L2-normalized — deterministic everywhere."""

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for batch in batches:
            vecs = []
            for text in batch["chunk_text"]:
                v = np.zeros(DIM, dtype=np.float64)
                for tok in (text or "").split():
                    h = int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big"
                    )
                    v[h % DIM] += 1.0 if (h >> 32) % 2 else -1.0
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"vec_id": batch["vec_id"].astype("int64"), "embedding": vecs}
            )

    return chunks.mapInPandas(kernel, EMBED_SCHEMA)


def main(sf_dir: str) -> None:
    spark = get_spark("rag-index")
    docs = fixed_text(catalog.table(spark, sf_dir, "documents")).drop("changed")

    chunks = chunk_documents(docs, chunk_tokens=64, overlap_tokens=8).withColumn(
        # chunk key: doc_id * 1024 + chunk_idx (docs here have ≪1024 chunks)
        "vec_id",
        (F.col("doc_id") * 1024 + F.col("chunk_idx")).cast("long"),
    )
    n_docs, n_chunks = docs.count(), chunks.count()

    embedded = embed_chunks(chunks.select("vec_id", "chunk_text")).withColumn(
        "label", F.lit("chunk")
    )
    embedded = embedded.persist()

    # first chunk of every ~100th document
    queries = embedded.filter(F.col("vec_id") % (1024 * 100) == 0).limit(4)
    exact = brute_force_topk(embedded, queries, k=5)
    approx = ivfpq_topk(
        embedded, queries, k=5, n_lists=16, n_probe=4, m=8, n_codes=32, refine=8
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e) if e else float("nan")

    # hybrid: BM25 over the same chunks, fused with the dense ranking
    postings, stats = build_index(
        chunks.select(F.col("vec_id").alias("doc_id"), "chunk_text"),
        text_col="chunk_text",
    )
    bm25_queries = chunks.join(
        queries.select("vec_id"), "vec_id"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.slice(F.split(F.lower(F.col("chunk_text")), r"\s+"), 1, 6).alias("terms"),
    )
    lexical = bm25_score(postings, stats, bm25_queries, k=5).withColumnRenamed(
        "score", "bm25"
    )
    dense = approx.select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    hybrid = rrf_fuse([lexical.select("query_id", "doc_id", "rank"), dense], k=5)

    print(f"corpus:   {n_docs} docs → {n_chunks} chunks (64-token windows, 8 overlap)")
    print(f"index:    IVF-PQ 16 lists × 8 subspaces × 32 codes (8 bytes/vector vs {DIM * 4})")
    print(f"queries:  {queries.count()} probes, top-5")
    print(f"recall@5: {recall:.2f} vs exact brute force")
    for r in approx.collect()[:5]:
        print(f"  q={r['query_id']} -> chunk {r['neighbor_id']} (cos {r['score']:.4f})")
    print("hybrid (RRF of BM25 + IVF-PQ):")
    for r in hybrid.collect()[:5]:
        print(
            f"  q={r['query_id']} -> chunk {r['doc_id']} "
            f"(rrf {r['rrf_score']:.4f}, rank {r['rank']})"
        )

    # ---- the lexical leg served from the STREAMED index -------------------
    # Under continuous ingest the postings live in the incrementally-
    # folded index (streaming/bm25_index.py). Fold the same chunks in
    # three micro-batches and serve the identical queries: the scores
    # must equal the batch build's exactly (shared expression tree;
    # probe-side df over the full stored postings IS the global df).
    import tempfile

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
        ParquetTable,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.bm25_index import (
        bm25_index_topk,
        fold_bm25_index,
    )

    with tempfile.TemporaryDirectory() as d:
        p_tab = ParquetTable(spark, os.path.join(d, "postings"))
        s_tab = ParquetTable(spark, os.path.join(d, "doc_stats"))
        corpus = chunks.select(F.col("vec_id").alias("doc_id"), "chunk_text")
        for i in range(3):
            fold_bm25_index(
                p_tab,
                s_tab,
                corpus.filter(F.col("doc_id") % 3 == i),
                text_col="chunk_text",
                batch_id=i,
            )
        streamed = bm25_index_topk(p_tab, s_tab, bm25_queries, k=5)
        batch_rows = {tuple(r) for r in lexical.select("query_id", "doc_id", "bm25").collect()}
        stream_rows = {tuple(r) for r in streamed.select("query_id", "doc_id", "score").collect()}
        print(
            "streamed lexical index: "
            + (
                "serves the batch scores exactly (3 folds)"
                if batch_rows == stream_rows
                else "DIVERGED FROM BATCH"
            )
        )

    # ---- drift monitoring + rebuild on the STREAMED index ----------------
    # Production serving uses the incrementally-folded index
    # (streaming/ann_index.py). The histogram is the drift alarm: when
    # the frozen quantizer stops fitting the distribution, one list
    # soaks up the corpus and probes degrade toward a full scan — the
    # response is re-fit + rebuild_ann_index, one batch job.
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.ann_index import (
        fit_coarse_centroids,
        fold_ann_index,
        list_histogram,
        rebuild_ann_index,
    )

    def skew(table):
        counts = [r["n_vectors"] for r in list_histogram(table).collect()]
        return max(counts) / (sum(counts) / len(counts))

    with tempfile.TemporaryDirectory() as ivf_dir:
        index = ParquetTable(spark, ivf_dir)
        # deliberately-stale quantizer: fit on a tiny unrepresentative
        # slice, then ingest the whole corpus — the drifted steady state
        stale = fit_coarse_centroids(embedded.limit(32), n_lists=8)
        fold_ann_index(index, embedded, stale, batch_id=0)
        before = skew(index)
        if before > 2.0:  # the standard max/mean re-train trigger
            refit = fit_coarse_centroids(embedded, n_lists=8)
            rebuild_ann_index(index, refit)
        after = skew(index)
        print(
            f"drift:    list max/mean skew {before:.2f} -> {after:.2f} "
            f"(histogram-triggered re-fit + rebuild)"
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
