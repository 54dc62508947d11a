"""sf1 stress for the streaming chunk-hash index (r10): fold the
full sf1 documents table in interleaved micro-batches through the
real writer body (inline compaction included), then time the two
stored reads and pin streamed==batch at scale.

    python tools/chunk_index_stress.py [sf_dir] [n_batches]

Prints ONE JSON line: per-fold wall times (flat-ness is the
log-structured design's claim — each fold's cost tracks its batch,
not the accumulated index), read times over the accumulated store,
and count/sum equality against the batch operators over the whole
corpus (the full multiset equality is pytest's job at small sf;
at sf1 the count+sum pin is the cheap full-coverage proxy).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog  # noqa: E402
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (  # noqa: E402
    chunk_dedup_stats,
    chunk_documents,
    shared_chunk_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark  # noqa: E402
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (  # noqa: E402
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.chunk_index import (  # noqa: E402
    chunk_index_writer,
    stored_chunk_dedup_stats,
    stored_shared_chunk_pairs,
)


def main(sf_dir: str = "/tmp/sf1", n_batches: int = 5) -> dict:
    spark = get_spark("chunk-index-stress")
    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    workdir = tempfile.mkdtemp(prefix="chunk_stress_")
    counts = ParquetTable(spark, os.path.join(workdir, "counts"))
    postings = ParquetTable(spark, os.path.join(workdir, "postings"))
    handle = chunk_index_writer(counts, postings, compact_at_files=3)

    fold_s = []
    for i in range(n_batches):
        batch = docs.filter(
            F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)) == i
        )
        t0 = time.perf_counter()
        handle(batch, i)
        fold_s.append(round(time.perf_counter() - t0, 2))

    t0 = time.perf_counter()
    stats = stored_chunk_dedup_stats(counts)
    s_agg = stats.agg(
        F.count(F.lit(1)), F.sum("n_occurrences"), F.sum("duplicate_bytes")
    ).collect()[0]
    stats_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pairs = stored_shared_chunk_pairs(counts, postings)
    p_agg = pairs.agg(
        F.count(F.lit(1)), F.sum("shared_chunks")
    ).collect()[0]
    pairs_s = round(time.perf_counter() - t0, 2)

    # batch ground truth over the whole corpus
    chunks = chunk_documents(docs)
    chunks.persist()
    try:
        b_s = chunk_dedup_stats(chunks).agg(
            F.count(F.lit(1)), F.sum("n_occurrences"),
            F.sum("duplicate_bytes"),
        ).collect()[0]
        b_p = shared_chunk_pairs(chunks).agg(
            F.count(F.lit(1)), F.sum("shared_chunks")
        ).collect()[0]
    finally:
        chunks.unpersist()

    ok = tuple(s_agg) == tuple(b_s) and tuple(p_agg) == tuple(b_p)
    out = {
        "docs": n_docs,
        "batches": n_batches,
        "fold_s": fold_s,
        "stats_read_s": stats_s,
        "pairs_read_s": pairs_s,
        "dup_hashes": s_agg[0],
        "pairs": p_agg[0],
        "counts_files": len(counts.files()),
        "postings_files": len(postings.files()),
        "streamed_equals_batch": bool(ok),
    }
    assert ok, f"streamed != batch at {sf_dir}: {out}"
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 5,
    )
