"""Streaming link-graph edge index (VERDICT r8 #3): per-page edge
rows folded as a derived table of the canonical-URL seen-index must
converge — under any shard chunking, through replays, and across a
real checkpoint restart — to exactly the batch ``extract_links``
edge multiset over the batch winner page set, with stale edges of
replaced fetches cleared, and centrality runnable over the store."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
    extract_link_lists,
    extract_links,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.warc import (
    WARC_SCHEMA,
    crawl_pages,
    synthetic_warc_corpus,
    warc_kernel,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.crawl_index import (
    crawl_batch_winners,
    crawl_index_writer,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.edge_index import (
    fold_crawl_with_edges,
    link_graph_transform,
    stored_link_edges,
)

N_DOCS = 200


def _corpus_pages(spark, sf_dir, n_docs=N_DOCS):
    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n_docs)
        .select("doc_id", "text")
    )
    shards = synthetic_warc_corpus(docs)
    return crawl_pages(shards.mapInPandas(warc_kernel, WARC_SCHEMA))


def _edge_multiset(df):
    """(src, dst) multiset — intra-page duplicate links count."""
    out: dict = {}
    for r in df.collect():
        k = (r["src"], r["dst"])
        out[k] = out.get(k, 0) + 1
    return out


def _batch_edges(winners):
    """The batch truth: extract_links over the winner page set,
    keyed by the canonical URL exactly like the streamed path."""
    return extract_links(winners, html_col="html", url_col="curl")


def test_link_lists_reshape_extract_links(spark, sf_dir):
    """explode(extract_link_lists) == extract_links row-for-row
    (multiset), and unparseable html emits an EMPTY list instead of
    dropping the page row."""
    pages = _corpus_pages(spark, sf_dir, n_docs=60).persist()
    try:
        want = _edge_multiset(
            extract_links(pages, html_col="html", url_col="url")
        )
        lists = extract_link_lists(pages, html_col="html", url_col="url")
        got = _edge_multiset(
            lists.select("src", F.explode("dsts").alias("dst"))
        )
        assert got == want and len(want) > 0

        # one row per input page even when html is garbage
        bad = spark.createDataFrame(
            [(1, "http://a.example/p", None),
             (2, "http://a.example/q", "<<<%% not html")],
            "doc_id long, url string, html string",
        )
        rows = extract_link_lists(bad).collect()
        assert {(r["doc_id"], tuple(r["dsts"])) for r in rows} == {
            (1, ()), (2, ()),
        }
    finally:
        pages.unpersist()


@pytest.mark.parametrize("chunks", [1, 3])
def test_folded_edges_equal_batch_under_chunkings(
    spark, sf_dir, tmp_path, chunks
):
    """Folding shards in ANY chunking (here: interleaved doc ids, so
    winners arrive out of order and tracking-variant refetches cross
    batch boundaries) converges the stored edge set to the batch
    extract_links multiset over the batch winners — including a
    replayed fold, which must change nothing."""
    pages = _corpus_pages(spark, sf_dir).persist()
    try:
        winners = crawl_batch_winners(pages).persist()
        want = _edge_multiset(_batch_edges(winners))
        winners.unpersist()

        seen = ParquetTable(spark, str(tmp_path / f"seen{chunks}"))
        edges = ParquetTable(spark, str(tmp_path / f"edges{chunks}"))
        for i in range(chunks):
            chunk = pages.filter(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(chunks)) == i
            )
            fold_crawl_with_edges(seen, edges, chunk, batch_id=i)
        v = edges.current_version()
        assert _edge_multiset(stored_link_edges(edges)) == want

        # replay of the last fold: ledgers skip, nothing changes
        chunk = pages.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(chunks))
            == chunks - 1
        )
        fold_crawl_with_edges(seen, edges, chunk, batch_id=chunks - 1)
        assert edges.current_version() == v
        assert _edge_multiset(stored_link_edges(edges)) == want

        # crash-window replay: edge ledger already holds a batch the
        # seen-index never committed (the crash the commit order
        # exists for) — refolding converges both tables, losslessly
        late = ParquetTable(spark, str(tmp_path / f"late{chunks}"))
        seen2 = ParquetTable(spark, str(tmp_path / f"seen2_{chunks}"))
        first = pages.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(chunks)) == 0
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.crawl_index import (  # noqa: E501
            _compute_changed,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.edge_index import (  # noqa: E501
            fold_edge_index,
        )

        # simulate: edges committed, seen-index commit crashed

        changed, _ = _compute_changed(seen2, first, "url")
        fold_edge_index(late, changed, batch_id=0)
        # retry of the whole fold: edge merge skipped by ledger,
        # seen-index commits — no loss, no duplication
        fold_crawl_with_edges(seen2, late, first, batch_id=0)
        winners0 = crawl_batch_winners(first).persist()
        try:
            assert _edge_multiset(stored_link_edges(late)) == _edge_multiset(
                _batch_edges(winners0)
            )
        finally:
            winners0.unpersist()
    finally:
        pages.unpersist()


def _page_rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, fetched_at string, html string"
    )


def test_fold_edge_index_all_filtered_batch_burns_no_batch_id(
    spark, tmp_path
):
    """A direct fold whose rows are ALL dropped by the transform's
    null filter (doc_id/curl) must commit NOTHING — an empty merge
    would both rewrite the whole table for a no-op and record the
    batch_id, making the ledger skip a later REAL fold reusing it
    (lost edges)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.edge_index import (  # noqa: E501
        fold_edge_index,
    )

    table = ParquetTable(spark, str(tmp_path / "edges_nf"))
    junk = spark.createDataFrame(
        [
            (None, "http://a.example/x", "<a href='/y'>y</a>"),
            (2, None, "<a href='/y'>y</a>"),
        ],
        "doc_id long, curl string, html string",
    )
    fold_edge_index(table, junk, batch_id=7)
    # the SAME batch_id must still be live for a real fold
    real = spark.createDataFrame(
        [(3, "http://a.example/p", "<a href='/q'>q</a>")],
        "doc_id long, curl string, html string",
    )
    fold_edge_index(table, real, batch_id=7)
    assert _edge_multiset(stored_link_edges(table)) == {
        ("http://a.example/p", "http://a.example/q"): 1
    }


def test_replacement_clears_stale_edges(spark, tmp_path):
    """A strictly-better refetch REPLACES the page's whole stored
    edge list atomically (curl-keyed row, not pair-keyed rows): links
    only the loser fetch had must disappear; a winner whose html no
    longer parses clears its edges entirely."""
    seen = ParquetTable(spark, str(tmp_path / "seen_r"))
    edges = ParquetTable(spark, str(tmp_path / "edges_r"))

    def fold(rows, bid):
        fold_crawl_with_edges(seen, edges, _page_rows(spark, rows), batch_id=bid)

    fold([(10, "http://a.example/p", "t0",
           "<html><body><a href='/old1'>x</a><a href='/old2'>y</a>"
           "</body></html>")], 0)
    assert set(_edge_multiset(stored_link_edges(edges))) == {
        ("http://a.example/p", "http://a.example/old1"),
        ("http://a.example/p", "http://a.example/old2"),
    }

    # better fetch, different links: old1/old2 must vanish
    fold([(5, "http://a.example/p?utm_source=x", "t1",
           "<html><body><a href='/new'>z</a></body></html>")], 1)
    assert set(_edge_multiset(stored_link_edges(edges))) == {
        ("http://a.example/p", "http://a.example/new"),
    }

    # an even better fetch whose html is unparseable: edges clear,
    # the page row itself stays (empty list)
    fold([(2, "http://a.example/p", "t2", None)], 2)
    assert _edge_multiset(stored_link_edges(edges)) == {}
    assert edges.read().count() == 1

    # a WORSE refetch emits no changed rows → edge table untouched
    v = edges.current_version()
    fold([(9, "http://a.example/p", "t3",
           "<html><body><a href='/stale'>w</a></body></html>")], 3)
    assert edges.current_version() == v


def test_writer_derived_edge_table_with_checkpoint_restart(
    spark, sf_dir, tmp_path
):
    """End-to-end: WARC shards as FILES via binaryFile readStream →
    crawl_index_writer maintaining seen-index + derived edge table —
    across a real checkpoint restart with late shards. The stored
    edges must equal batch extract_links over the batch winners, and
    pagerank must run over the store."""
    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
    )
    shard_rows = synthetic_warc_corpus(docs).collect()
    src = tmp_path / "warc"
    src.mkdir()
    seen = ParquetTable(spark, str(tmp_path / "seen_s"))
    edges = ParquetTable(spark, str(tmp_path / "edges_s"))
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
            .select("path", "content")
            .mapInPandas(warc_kernel, WARC_SCHEMA)
        )
        q = (
            crawl_pages(stream)
            .writeStream.foreachBatch(
                crawl_index_writer(
                    seen,
                    derived_tables=((edges, link_graph_transform),),
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish in time"

    for r in shard_rows[:4]:
        (src / os.path.basename(r["path"])).write_bytes(bytes(r["content"]))
    run_once()
    assert 0 < edges.read().count() < N_DOCS

    for r in shard_rows[4:]:
        (src / os.path.basename(r["path"])).write_bytes(bytes(r["content"]))
    run_once()

    pages = crawl_pages(
        synthetic_warc_corpus(docs).mapInPandas(warc_kernel, WARC_SCHEMA)
    )
    winners = crawl_batch_winners(pages).persist()
    try:
        assert _edge_multiset(stored_link_edges(edges)) == _edge_multiset(
            _batch_edges(winners)
        )
    finally:
        winners.unpersist()

    # centrality over the store: the composition the index exists for
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pagerank import (
        pagerank,
    )

    ranks = pagerank(stored_link_edges(edges), max_iters=5, tol=0.0)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_writer_derived_path_skips_all_filtered_merge(spark, tmp_path):
    """The GENERIC derived-tables path (fold_crawl_batch) must skip
    a merge the transform filtered to nothing — an empty merge has
    null key bounds (full-table rewrite) and burns the batch_id so a
    replayed REAL fold would skip (review catch: fold_edge_index
    guarded this but the writer path bypassed the guard)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.crawl_index import (  # noqa: E501
        fold_crawl_batch,
    )

    seen = ParquetTable(spark, str(tmp_path / "seen_g"))
    derived = ParquetTable(spark, str(tmp_path / "derived_g"))

    def drop_all(changed):
        return changed.filter("doc_id < 0").select(
            "curl", "doc_id", F.lit("x").alias("payload")
        )

    pages = spark.createDataFrame(
        [(1, "http://a.example/p", "2026-01-01")],
        "doc_id long, url string, fetched_at string",
    )
    fold_crawl_batch(
        seen, pages, batch_id=5, derived=((derived, drop_all),)
    )
    assert seen.read().count() == 1  # the index committed
    assert derived.files() == []  # nothing committed, no table yet
    # batch_id 5 must STILL be live for a real derived fold
    def keep_all(changed):
        return changed.select(
            "curl", "doc_id", F.lit("y").alias("payload")
        )

    pages2 = spark.createDataFrame(
        [(2, "http://b.example/q", "2026-01-02")],
        "doc_id long, url string, fetched_at string",
    )
    fold_crawl_batch(
        seen, pages2, batch_id=5, derived=((derived, keep_all),)
    )
    assert derived.read().count() == 1


def test_survival_predicate_skips_transform(spark, tmp_path):
    """ADVICE r9: a derived triple's survival predicate is probed on
    the checkpointed changed rows — the transform kernel must NOT
    execute when every row fails the predicate, and the batch_id
    must stay live for a later real fold (the empty-merge guard),
    exactly like the transform-output probe it replaces."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.crawl_index import (  # noqa: E501
        fold_crawl_batch,
    )

    seen = ParquetTable(spark, str(tmp_path / "seen_s"))
    derived = ParquetTable(spark, str(tmp_path / "derived_s"))
    calls = []

    def tf(changed):
        calls.append(1)
        return changed.select(
            "curl", "doc_id", F.lit("z").alias("payload")
        )

    pages = spark.createDataFrame(
        [(1, "http://a.example/p", "2026-01-01")],
        "doc_id long, url string, fetched_at string",
    )
    # every changed row fails the predicate → transform never runs,
    # nothing commits, the index itself still folds
    fold_crawl_batch(
        seen, pages, batch_id=7,
        derived=((derived, tf, F.col("doc_id") < 0),),
    )
    assert seen.read().count() == 1
    assert derived.files() == []
    assert calls == []  # the kernel was never invoked
    # a later REAL fold reusing the id commits — the ledger did not
    # record the skipped batch
    pages2 = spark.createDataFrame(
        [(2, "http://b.example/q", "2026-01-02")],
        "doc_id long, url string, fetched_at string",
    )
    fold_crawl_batch(
        seen, pages2, batch_id=7,
        derived=((derived, tf, F.col("doc_id") > 0),),
    )
    assert derived.read().count() == 1
    assert calls == [1]  # invoked exactly once, on the surviving fold
    # and the transform received ONLY survivors: the stored row is
    # the surviving page
    assert derived.read().collect()[0]["doc_id"] == 2
