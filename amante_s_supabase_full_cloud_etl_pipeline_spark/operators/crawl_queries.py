"""Driver-checked registry row for the crawl front half: WARC bytes
→ record split / HTTP envelope undo → HTML→text extraction →
canonical-URL dedup → robots compliance (RFC 9309 mode) — the whole
ingest path of `examples/crawl_ingest.py` as ONE query under the
DuckDB oracle (VERDICT r6 #1: this subsystem previously had no
CORRECTNESS row).

The input is a deterministic synthetic crawl built worker-side from
the documents table (`sources/warc.py synthetic_warc_corpus`): per-
record-member .warc.gz and plain .warc shards; identity / gzip /
deflate / chunked / chunked+gzip transfer variants; latin-1 and
quoted-charset pages; interleaved warcinfo / 404 / request / JSON
records the filter stage must drop; tracking-variant refetches the
canonical-URL stage must collapse; five URL spellings per residue
class that all normalize to one canonical form. Every stage is
deterministic (gzip mtime=0, xxhash64 ids, stdlib html parser), so
the expected output is a committed golden table (the same full-value
pin multimodal_image_decode uses) — DuckDB cannot parse WARC, but it
CAN verify every byte of the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, golden_oracle, register
from ..sources.warc import WARC_SCHEMA, crawl_pages, synthetic_warc_corpus, warc_kernel
from .extraction import extract_text
from .robots import robots_allowed
from .urls import canonical_url, url_host

#: synthetic-crawl robots rules, keyed by host residue class
#: (site{h}.example; h % 4 == 3 hosts have NO robots row → REP
#: default allow). The rfc9309 evaluator is the one under test:
#: the h%4==1 Allow carve-out only works under longest-match.
_ROBOTS_BY_RESIDUE = {
    0: "User-agent: *\nDisallow: /Doc/1\n",
    1: "User-agent: *\nDisallow: /Doc/\nAllow: /Doc/2\n",
    2: "User-agent: *\nDisallow: /*5$\n",
}


def _robots_frame(spark: SparkSession) -> DataFrame:
    rows = [
        (f"site{h}.example", _ROBOTS_BY_RESIDUE[h % 4])
        for h in range(23)
        if h % 4 != 3
    ]
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _pipeline(spark: SparkSession, sf_dir: str):
    """(unique canonical pages with html, 9-column page frame) — the
    shared front-half body. ``front_half_pages`` is the narrow shape
    the bench times for cross-round comparability; the registered
    ``crawl_front_half`` row adds the link-graph centrality column
    on top (VERDICT r8 #2)."""
    from .cache import tracked_persist

    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text")
    )
    shards = synthetic_warc_corpus(docs)
    pages = crawl_pages(shards.mapInPandas(warc_kernel, WARC_SCHEMA))

    # crawl-side URL dedup: one fetch per canonical URL, keep-min id
    # via agg + semi-join (shuffle-once; no per-URL window sort).
    # The corpus-build + WARC-parse subtree feeds the agg, the
    # semi-join probe, and the extraction — persist
    # it once (released by the registry wrapper before the next query)
    # instead of re-running the Python kernels per consumer. A
    # doc_id hash collision inside one canonical group would surface
    # as a loud duplicate-row oracle failure — no dropDuplicates
    # masking it nondeterministically.
    canon = tracked_persist(
        pages.withColumn("curl", canonical_url(F.col("url")))
    )
    keep = canon.groupBy("curl").agg(F.min("doc_id").alias("doc_id"))
    unique = canon.join(keep, ["curl", "doc_id"], "left_semi")

    # curl rides THROUGH the extraction kernel (passthrough) — the
    # former doc_id re-join back to `unique` was a whole shuffle join
    # to recover a column the kernel already had in hand
    enriched = extract_text(unique, html_col="html", passthrough=("curl",))
    flagged = robots_allowed(
        enriched, _robots_frame(spark), url_col="curl", rep="rfc9309"
    )
    pages = flagged.select(
        F.col("doc_id"),
        F.col("curl").alias("url"),
        url_host(F.col("curl")).alias("host"),
        F.col("allowed"),
        F.col("title"),
        F.col("n_links"),
        F.col("link_density"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    return unique, pages


def front_half_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-free front half — the shape benched as
    ``crawl_front_half`` since r8 (kept narrow so per-round bench
    numbers stay comparable; the iterative centrality fold is timed
    separately as ``pagerank_crawl_graph``)."""
    _, pages = _pipeline(spark, sf_dir)
    return pages.orderBy("doc_id")


@register(
    "crawl_front_half",
    oracle=golden_oracle("crawl_front_half"),
    golden_sf=DRIVER_SF,
)
def crawl_front_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per surviving page: (doc_id, url, host, allowed,
    title, n_links, link_density, n_chars, n_tokens, rank), ordered
    by doc_id. doc_id < 400 keeps the corpus identical across scale
    factors (same convention as multimodal_image_decode).

    ``rank`` is the page's PageRank in the corpus's own link graph
    (``extract_links`` over the canonical pages — nav/footer links
    fan out to per-host hub targets), the frontier-prioritization
    signal `examples/crawl_ingest.py` consumes — anchored here under
    the driver's value-hash gate (VERDICT r8 #2: the link-graph
    family had pytest differentials but no driver row).

    Determinism ADR: the fold runs a FIXED 12 iterations (tol=0),
    not to convergence — a tolerance stop would make the iteration
    COUNT the fragile quantity (delta crossing tol is itself subject
    to the ~1e-12 partial-sum variance the module doc documents),
    while a fixed count pins the exact arithmetic; the values then
    reproduce to ~1e-12 across partitionings and are rounded to 1e-6
    (six orders above the variance) so the golden value-hash is
    stable. Pages absent from the graph (unparseable html) carry
    rank 0.0 rather than dropping the page row."""
    unique, pages = _pipeline(spark, sf_dir)
    from .extraction import extract_links
    from .pagerank import pagerank

    edges = extract_links(unique, html_col="html", url_col="curl")
    ranks = pagerank(edges, max_iters=12, tol=0.0).select(
        F.col("node").alias("url"), F.col("rank")
    )
    return (
        pages.join(ranks, "url", "left")
        .select(
            *[c for c in pages.columns],
            F.round(F.coalesce(F.col("rank"), F.lit(0.0)), 6).alias("rank"),
        )
        .orderBy("doc_id")
    )
