"""Streaming crawl ingest with the persistent canonical-URL index
(VERDICT r7 #1): folding WARC-page batches in ANY chunking converges
the index to EXACTLY the batch keep-set — including the driver-row
``crawl_front_half``'s (url, doc_id) winners — with exactly-once
replays, winner replacement for strictly-better refetches, and a real
binaryFile readStream across a checkpoint restart."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
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
    fold_crawl_url_index,
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


def _winner_set(df, curl_col="curl"):
    return {(r[curl_col], r["doc_id"]) for r in df.collect()}


@pytest.mark.parametrize("chunks", [1, 3])
def test_folded_index_equals_batch_winners(spark, sf_dir, tmp_path, chunks):
    pages = _corpus_pages(spark, sf_dir).persist()
    try:
        want = _winner_set(crawl_batch_winners(pages))
        assert len(want) == N_DOCS  # refetch variants collapsed

        index = ParquetTable(spark, str(tmp_path / f"idx{chunks}"))
        emitted: dict = {}
        for i in range(chunks):
            chunk = pages.filter(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(chunks)) == i
            )
            for r in fold_crawl_url_index(index, chunk, batch_id=i).collect():
                # later emissions for a curl are strictly better
                prev = emitted.get(r["curl"])
                assert prev is None or r["doc_id"] < prev
                emitted[r["curl"]] = r["doc_id"]
        assert set(emitted.items()) == want
        assert _winner_set(index.read()) == want
    finally:
        pages.unpersist()


def test_matches_driver_row_keep_set(spark, sf_dir, tmp_path):
    """The VERDICT done-criterion: streamed folds == the batch
    ``crawl_front_half`` keep-set (its url column IS the canonical
    URL; its doc_id the keep-min winner), under a chunking that
    interleaves doc ids across batches."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_queries import (
        crawl_front_half,
    )

    want = {
        (r["url"], r["doc_id"])
        for r in crawl_front_half(spark, sf_dir).collect()
    }
    pages = _corpus_pages(spark, sf_dir, n_docs=400).persist()
    try:
        index = ParquetTable(spark, str(tmp_path / "idx_front"))
        for i in range(3):
            chunk = pages.filter(
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit(11)), F.lit(3)) == i
            )
            fold_crawl_url_index(index, chunk, batch_id=i)
        assert _winner_set(index.read()) == want
    finally:
        pages.unpersist()


def _page_rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, fetched_at string, html string"
    )


def test_winner_replacement_and_worse_refetch(spark, tmp_path):
    """A later batch carrying a strictly-better (smaller doc_id) fetch
    of a seen URL REPLACES the stored winner and re-emits the row; a
    worse refetch emits nothing and leaves the index untouched."""
    index = ParquetTable(spark, str(tmp_path / "idx_repl"))
    b0 = _page_rows(spark, [(10, "http://a.example/p", "t0", "<html>v10</html>")])
    out0 = fold_crawl_url_index(index, b0, batch_id=0).collect()
    assert [(r["doc_id"], r["html"]) for r in out0] == [(10, "<html>v10</html>")]

    # better refetch (tracking-variant URL → same canonical key)
    b1 = _page_rows(
        spark, [(5, "http://a.example/p?utm_source=x", "t1", "<html>v5</html>")]
    )
    out1 = fold_crawl_url_index(index, b1, batch_id=1).collect()
    assert [(r["doc_id"], r["html"]) for r in out1] == [(5, "<html>v5</html>")]

    # worse refetch with a NEWER stamp: emits nothing downstream, but
    # the index's fetched_at is a MAX fold (refresh scheduling needs
    # the latest fetch time) — winner identity stays, stamp advances
    b2 = _page_rows(spark, [(20, "http://a.example/p", "t2", "<html>v20</html>")])
    assert fold_crawl_url_index(index, b2, batch_id=2).count() == 0
    stored = index.read().collect()
    assert [(r["curl"], r["doc_id"], r["fetched_at"]) for r in stored] == [
        ("http://a.example/p", 5, "t2")
    ]
    # worse refetch with an OLDER stamp: silent AND no commit at all
    # (an empty merge-set must not trigger a boundless full-table
    # merge rewrite)
    v = index.current_version()
    b3 = _page_rows(spark, [(30, "http://a.example/p", "t0", "<html>v30</html>")])
    assert fold_crawl_url_index(index, b3, batch_id=3).count() == 0
    assert index.current_version() == v
    # html never enters the index (slim row)
    assert "html" not in index.read().columns


def test_replay_is_exactly_once(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "idx_replay"))
    b0 = _page_rows(
        spark,
        [
            (3, "http://a.example/x", "t", "<p>x</p>"),
            (7, "http://b.example/y", "t", "<p>y</p>"),
        ],
    )
    assert fold_crawl_url_index(index, b0, batch_id=0).count() == 2
    v = index.current_version()
    # replayed fold: index already holds the winners → empty emission,
    # ledger skips the merge (no new version)
    assert fold_crawl_url_index(index, b0, batch_id=0).count() == 0
    assert index.current_version() == v
    assert index.read().count() == 2


def test_writer_maintains_derived_pages_table(spark, tmp_path):
    """The foreachBatch writer keeps a derived table in lockstep:
    transform output merges on curl, so a later better refetch
    REPLACES the derived row instead of duplicating it — and a
    replayed batch converges."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
        extract_text,
    )

    index = ParquetTable(spark, str(tmp_path / "idx_w"))
    derived = ParquetTable(spark, str(tmp_path / "pages_w"))

    def transform(changed):
        feats = extract_text(changed, html_col="html")
        return changed.select("curl", "doc_id").join(
            feats.select("doc_id", "title", "text"), "doc_id"
        )

    handle = crawl_index_writer(index, derived, transform=transform)
    handle(
        _page_rows(
            spark,
            [(10, "http://a.example/p", "t0",
              "<html><head><title>old</title></head><body>old body</body></html>"),
             (4, "http://b.example/q", "t0",
              "<html><head><title>q</title></head><body>q body</body></html>")],
        ),
        0,
    )
    handle(
        _page_rows(
            spark,
            [(5, "http://a.example/p?utm_source=x", "t1",
              "<html><head><title>new</title></head><body>new body</body></html>")],
        ),
        1,
    )
    # replay batch 1: both tables must converge, not duplicate
    handle(
        _page_rows(
            spark,
            [(5, "http://a.example/p?utm_source=x", "t1",
              "<html><head><title>new</title></head><body>new body</body></html>")],
        ),
        1,
    )
    got = {
        (r["curl"], r["doc_id"], r["title"]) for r in derived.read().collect()
    }
    assert got == {
        ("http://a.example/p", 5, "new"),
        ("http://b.example/q", 4, "q"),
    }
    assert _winner_set(index.read()) == {
        ("http://a.example/p", 5),
        ("http://b.example/q", 4),
    }


def test_real_binaryfile_stream_with_checkpoint_restart(
    spark, sf_dir, tmp_path
):
    """End-to-end: WARC shards arrive as FILES via a binaryFile
    readStream → warc_kernel → crawl_pages → foreachBatch writer —
    across a real checkpoint restart with late-arriving shards. The
    index must equal the batch winners over ALL shards; re-arrived
    shards (batch re-run scenario) must not re-admit kept URLs."""
    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
    )
    shard_rows = synthetic_warc_corpus(docs).collect()
    src = tmp_path / "warc"
    src.mkdir()
    index = ParquetTable(spark, str(tmp_path / "idx_s"))
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
            .writeStream.foreachBatch(crawl_index_writer(index))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not finish in time"

    for r in shard_rows[:4]:
        (src / os.path.basename(r["path"])).write_bytes(bytes(r["content"]))
    run_once()
    n_first = index.read().count()
    assert 0 < n_first < N_DOCS

    for r in shard_rows[4:]:
        (src / os.path.basename(r["path"])).write_bytes(bytes(r["content"]))
    run_once()

    pages = crawl_pages(
        synthetic_warc_corpus(docs).mapInPandas(warc_kernel, WARC_SCHEMA)
    )
    assert _winner_set(index.read()) == _winner_set(crawl_batch_winners(pages))

    # a batch re-run over an already-seen shard admits NOTHING new —
    # the exact re-admission VERDICT r7 #1 calls out (use the fold
    # directly: the file source itself also dedups seen paths)
    seen = crawl_pages(
        spark.createDataFrame([shard_rows[0]])
        .select("path", "content")
        .mapInPandas(warc_kernel, WARC_SCHEMA)
    )
    assert fold_crawl_url_index(index, seen, batch_id=999).count() == 0


def test_writer_inline_compaction_bounds_files(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "idx_c"))
    handle = crawl_index_writer(index, compact_at_files=2)
    for i in range(4):
        handle(
            _page_rows(
                spark,
                [(i, f"http://h{i}.example/p", "t", f"<p>{i}</p>")],
            ),
            i,
        )
    assert len(index.files()) < 4
    assert index.read().count() == 4


def test_tie_break_is_total_and_null_urls_drop(spark, tmp_path):
    """Self-review r8: two fetches colliding on (curl, doc_id) with
    DIFFERENT payloads must pick the same winner in every chunking
    (the winner is min over the whole row struct, not an arbitrary
    dropDuplicates survivor), and a NULL url row is dropped — it has
    no canonical identity to dedup on."""
    rows = [
        (7, "http://a.example/p", "t1", "<p>BBB</p>"),
        (7, "http://a.example/p", "t1", "<p>AAA</p>"),  # same key, diff html
        (9, None, "t1", "<p>lost uri</p>"),
    ]
    # chunking 1: both collision rows in one batch
    i1 = ParquetTable(spark, str(tmp_path / "t1"))
    out1 = fold_crawl_url_index(index=i1, pages=_page_rows(spark, rows), batch_id=0)
    # chunking 2: collision rows arrive in separate batches
    i2 = ParquetTable(spark, str(tmp_path / "t2"))
    fold_crawl_url_index(i2, _page_rows(spark, rows[:1]), batch_id=0)
    fold_crawl_url_index(i2, _page_rows(spark, rows[1:]), batch_id=1)

    w1 = {(r["curl"], r["doc_id"], r["html"]) for r in out1.collect()}
    assert w1 == {("http://a.example/p", 7, "<p>AAA</p>")}  # min struct
    assert _winner_set(i1.read()) == _winner_set(i2.read()) == {
        ("http://a.example/p", 7)
    }


def test_probe_range_fallback_beyond_in_list(spark, tmp_path, monkeypatch):
    """Batches with more distinct curls than the IN-list bound degrade
    to a key-RANGE file prune — answers must be identical."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming import (
        crawl_index as ci,
    )

    monkeypatch.setattr(ci, "_MAX_IN_LIST", 3)
    index = ParquetTable(spark, str(tmp_path / "idx_rng"))
    b0 = _page_rows(
        spark,
        [(i, f"http://h{i}.example/p", "t", f"<p>{i}</p>") for i in range(8)],
    )
    assert fold_crawl_url_index(index, b0, batch_id=0).count() == 8
    # second batch: 5 seen URLs (2 better, 3 worse) + 2 fresh — well
    # past the patched IN bound, so the probe takes the range path
    b1 = _page_rows(
        spark,
        [(-1, "http://h1.example/p", "t", "<p>better1</p>"),
         (-2, "http://h2.example/p", "t", "<p>better2</p>"),
         (99, "http://h3.example/p", "t", "<p>worse</p>"),
         (98, "http://h4.example/p", "t", "<p>worse</p>"),
         (97, "http://h5.example/p", "t", "<p>worse</p>"),
         (50, "http://new1.example/p", "t", "<p>new</p>"),
         (51, "http://new2.example/p", "t", "<p>new</p>")],
    )
    out = {(r["curl"], r["doc_id"]) for r in fold_crawl_url_index(index, b1, batch_id=1).collect()}
    assert out == {
        ("http://h1.example/p", -1),
        ("http://h2.example/p", -2),
        ("http://new1.example/p", 50),
        ("http://new2.example/p", 51),
    }
    want = {(f"http://h{i}.example/p", i) for i in range(8)} - {
        ("http://h1.example/p", 1), ("http://h2.example/p", 2)
    } | out
    assert _winner_set(index.read()) == want


def test_empty_batch_is_safe(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "idx_e"))
    empty = spark.createDataFrame(
        [], "doc_id long, url string, fetched_at string, html string"
    )
    assert fold_crawl_url_index(index, empty, batch_id=0).count() == 0
    assert index.current_version() >= 0


def test_stamp_max_fold_is_chunking_invariant(spark, tmp_path):
    """fetched_at is a MAX fold independent of the winner contest:
    any arrival order of (better-content, newer-stamp) fetches
    converges to (min doc_id, max stamp)."""
    rows = [
        (10, "http://c.example/p", "2026-01-01", "<p>a</p>"),
        (5, "http://c.example/p?utm_source=x", "2026-02-01", "<p>b</p>"),
        (20, "http://c.example/p", "2026-03-01", "<p>c</p>"),
    ]
    import itertools

    for pi, perm in enumerate(itertools.permutations(range(3))):
        index = ParquetTable(spark, str(tmp_path / f"idx_perm{pi}"))
        for b, i in enumerate(perm):
            fold_crawl_url_index(
                index, _page_rows(spark, [rows[i]]), batch_id=b
            )
        got = index.read().collect()
        assert [
            (r["curl"], r["doc_id"], r["fetched_at"]) for r in got
        ] == [("http://c.example/p", 5, "2026-03-01")], perm


def test_refresh_candidates_round_trip_converges(spark, tmp_path):
    """The refresh loop CLOSES (review r8): a 'modified' URL, once
    refetched and folded — even when the refetch loses the content
    contest — stops being flagged; a seen row with a NULL stamp is
    NOT 'never_fetched' (the marker, not the payload, decides); and
    W3C offsets compare as instants, not strings."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sitemaps import (
        refresh_candidates,
    )

    index = ParquetTable(spark, str(tmp_path / "idx_rt"))
    fold_crawl_url_index(
        index,
        _page_rows(
            spark,
            [
                (1, "http://r.example/a", "2026-03-01T00:00:00Z", "<p>a</p>"),
                (2, "http://r.example/nullstamp", None, "<p>n</p>"),
                # fetched 08:00Z; the sitemap claims 09:00+09:00 =
                # 00:00Z — LEXICALLY newer, actually OLDER
                (3, "http://r.example/tz", "2026-05-01T08:00:00Z", "<p>t</p>"),
            ],
        ),
        batch_id=0,
    )
    frontier = spark.createDataFrame(
        [
            ("http://r.example/a", "http://r.example/a", "r.example",
             "2026-04-01T00:00:00Z"),
            ("http://r.example/nullstamp", "http://r.example/nullstamp",
             "r.example", None),
            ("http://r.example/tz", "http://r.example/tz", "r.example",
             "2026-05-01T09:00:00+09:00"),
        ],
        "url string, curl string, host string, lastmod string",
    )
    got = {
        r["curl"]: r["reason"]
        for r in refresh_candidates(frontier, index.read()).collect()
    }
    # null-stamp row is SEEN (no claim → drop); tz row is NOT newer
    assert got == {"http://r.example/a": "modified"}

    # refetch /a with a WORSE doc_id but a newer stamp, fold it —
    # the flag must clear on the next cycle
    fold_crawl_url_index(
        index,
        _page_rows(
            spark,
            [(9, "http://r.example/a", "2026-04-02T00:00:00Z", "<p>a2</p>")],
        ),
        batch_id=1,
    )
    assert refresh_candidates(frontier, index.read()).count() == 0


def test_null_doc_id_pages_never_enter_the_index(spark, tmp_path):
    """Review r8: the batch dedup stage's F.min ignores NULL doc_ids
    and its semi-join can't match them — the streaming winners must
    drop them too, or min-struct (nulls first) would elect them and
    the row would re-emit as 'changed' forever."""
    index = ParquetTable(spark, str(tmp_path / "idx_null"))
    b0 = _page_rows(
        spark,
        [
            (None, "http://n.example/p", "t0", "<p>ghost</p>"),
            (7, "http://n.example/p", "t0", "<p>real</p>"),
            (None, "http://n.example/only-null", "t0", "<p>x</p>"),
        ],
    )
    out = fold_crawl_url_index(index, b0, batch_id=0).collect()
    assert [(r["curl"], r["doc_id"]) for r in out] == [
        ("http://n.example/p", 7)
    ]
    # replay-to-empty holds (the old bug re-emitted forever)
    assert fold_crawl_url_index(index, b0, batch_id=1).count() == 0
    assert [(r["curl"], r["doc_id"]) for r in index.read().collect()] == [
        ("http://n.example/p", 7)
    ]
