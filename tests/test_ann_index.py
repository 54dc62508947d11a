"""Streaming IVF ANN index: querying the incrementally-folded index
equals the batch IVF path under the same frozen quantizer, in any
chunking/arrival order; appends are exactly-once under replay; reads
probe only the requested lists; a real readStream run survives a
checkpoint restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    nearest_lists_expr,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.ann_index import (
    ann_index_writer,
    fit_coarse_centroids,
    fold_ann_index,
    ivf_index_topk,
    list_histogram,
)

N_QUERIES = 5


def _emb(spark, sf_dir):
    return catalog.table(spark, sf_dir, "embeddings")


def _queries(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES)


def _topk_rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in df.collect()
    )


def _batch_reference(emb, centroids, queries, n_probe=2, k=5):
    """The batch IVF result under the SAME frozen centroids: assign
    every corpus vector via the shared expression, probe, score —
    exactly what the streamed index must reproduce."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.similarity import (
        cosine,
        ranked_topk,
    )

    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.element_at(nearest_lists_expr(centroids, F.col("embedding"), 1), 1).alias(
            "list_id"
        ),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.explode(nearest_lists_expr(centroids, F.col("embedding"), n_probe)).alias(
            "list_id"
        ),
    )
    scored = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("score"),
        )
        .distinct()
    )
    return ranked_topk(scored, k)


def test_streamed_index_equals_batch_ivf(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    queries = _queries(emb)
    want = _topk_rows(_batch_reference(emb, centroids, queries))

    index = ParquetTable(spark, str(tmp_path / "ivf"))
    # arrival order interleaved across lists: fold by vec_id parity
    fold_ann_index(index, emb.filter(F.col("vec_id") % 2 == 0), centroids, batch_id=0)
    fold_ann_index(index, emb.filter(F.col("vec_id") % 2 == 1), centroids, batch_id=1)
    got = _topk_rows(ivf_index_topk(index, centroids, queries, n_probe=2, k=5))
    assert got == want

    # replayed fold: index row count unchanged, results identical
    n = index.read().count()
    fold_ann_index(index, emb.filter(F.col("vec_id") % 2 == 1), centroids, batch_id=1)
    assert index.read().count() == n == emb.count()
    assert _topk_rows(ivf_index_topk(index, centroids, queries, n_probe=2, k=5)) == want


def test_recall_against_brute_force(spark, sf_dir, tmp_path):
    """Probing more lists converges toward the exact result — the
    recall knob behaves on the streamed index exactly as in batch."""
    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    index = ParquetTable(spark, str(tmp_path / "ivf"))
    fold_ann_index(index, emb, centroids, batch_id=0)
    queries = _queries(emb)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_index_topk(
                index, centroids, queries, n_probe=n_probe, k=5
            ).collect()
        }
        return len(exact & got) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 == 1.0  # probing every list IS the exact scan
    assert r2 <= r8 and r2 >= 0.3


def test_query_reads_only_probed_lists(spark, sf_dir, tmp_path):
    """File-skipping: with the index compacted list-ordered, a 1-probe
    query's scan must touch fewer index files than a full read."""
    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    index = ParquetTable(spark, str(tmp_path / "ivf"))
    # one append per slice → several files, then compact sorted by
    # list_id so file stats partition the id space
    for i in range(4):
        fold_ann_index(
            index, emb.filter(F.col("vec_id") % 4 == i), centroids, batch_id=i
        )
    # small target so the tiny corpus still compacts into SEVERAL
    # list_id-ranged files (at scale the default 128MB does this)
    index.compact(target_file_bytes=64 * 1024, sort_by=["list_id"])
    probed = [0]
    pruned = index.read(filters=[("list_id", "in", probed)])
    full = index.read()
    n_pruned = pruned.inputFiles()
    n_full = full.inputFiles()
    assert len(n_pruned) < len(n_full)
    # and correctness: pruning loses nothing
    assert pruned.count() == full.filter(F.col("list_id") == 0).count()


def test_list_histogram_monitor(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    index = ParquetTable(spark, str(tmp_path / "ivf"))
    fold_ann_index(index, emb, centroids, batch_id=0)
    hist = {r["list_id"]: r["n_vectors"] for r in list_histogram(index).collect()}
    assert sum(hist.values()) == emb.count()
    assert all(n > 0 for n in hist.values())


def test_real_stream_with_restart(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    index = ParquetTable(spark, str(tmp_path / "ivf"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emb.filter(F.col("vec_id") < 1000).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(ann_index_writer(index, centroids))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    emb.filter(F.col("vec_id") >= 1000).coalesce(1).write.mode("append").parquet(src)
    run_once()

    queries = _queries(emb)
    want = _topk_rows(_batch_reference(emb, centroids, queries))
    assert _topk_rows(ivf_index_topk(index, centroids, queries)) == want


def test_writer_inline_compaction_bounds_files(spark, sf_dir, tmp_path):
    """compact_at_files: per-batch appends stop accumulating files —
    the handler compacts list-sorted once the threshold is hit, and
    results are unchanged (compaction is row-identical)."""
    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    index = ParquetTable(spark, str(tmp_path / "ivf"))
    handle = ann_index_writer(index, centroids, compact_at_files=3)
    for i in range(6):
        handle(emb.filter(F.col("vec_id") % 6 == i), i)
    # without compaction there would be >= 6 files
    assert len(index.files()) < 6
    queries = _queries(emb)
    want = _topk_rows(_batch_reference(emb, centroids, queries))
    assert _topk_rows(ivf_index_topk(index, centroids, queries)) == want


def test_rebuild_under_new_centroids_equals_fresh_build(spark, sf_dir, tmp_path):
    """Drift response: rebuild_ann_index under NEW centroids must be
    row-identical to a fresh batch build over the same vectors —
    assignments, histogram, and query results all match."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.ann_index import (
        rebuild_ann_index,
    )

    emb = _emb(spark, sf_dir)
    old_centroids = fit_coarse_centroids(emb, n_lists=8)
    # a different quantizer, as a re-fit after drift would produce
    new_centroids = fit_coarse_centroids(emb, n_lists=8, seed=7)
    assert old_centroids != new_centroids

    streamed = ParquetTable(spark, str(tmp_path / "streamed"))
    fold_ann_index(streamed, emb.filter(F.col("vec_id") % 2 == 0), old_centroids, batch_id=0)
    fold_ann_index(streamed, emb.filter(F.col("vec_id") % 2 == 1), old_centroids, batch_id=1)
    rebuild_ann_index(streamed, new_centroids)

    fresh = ParquetTable(spark, str(tmp_path / "fresh"))
    fold_ann_index(fresh, emb, new_centroids, batch_id=0)

    key = lambda t: sorted(  # noqa: E731
        (r["vec_id"], r["list_id"]) for r in t.read().collect()
    )
    assert key(streamed) == key(fresh)

    queries = _queries(emb)
    got = _topk_rows(ivf_index_topk(streamed, new_centroids, queries, n_probe=2, k=5))
    want = _topk_rows(_batch_reference(emb, new_centroids, queries))
    assert got == want


def test_bulk_query_batch_skips_broadcast(spark, sf_dir, tmp_path):
    """Past _MAX_BROADCAST_QUERY_ROWS the probe joins by shuffle, not
    broadcast — same results either side of the threshold."""
    import amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.ann_index as ai

    emb = _emb(spark, sf_dir)
    centroids = fit_coarse_centroids(emb, n_lists=8)
    index = ParquetTable(spark, str(tmp_path / "ivf"))
    fold_ann_index(index, emb, centroids, batch_id=0)
    queries = _queries(emb)

    small = ivf_index_topk(index, centroids, queries, n_probe=2, k=5)
    assert "ResolvedHint" in small._jdf.queryExecution().logical().toString() or (
        "broadcast" in small._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    want = _topk_rows(small)

    orig = ai._MAX_BROADCAST_QUERY_ROWS
    ai._MAX_BROADCAST_QUERY_ROWS = 0  # force the shuffle-join path
    try:
        big = ivf_index_topk(index, centroids, queries, n_probe=2, k=5)
        assert _topk_rows(big) == want
    finally:
        ai._MAX_BROADCAST_QUERY_ROWS = orig
