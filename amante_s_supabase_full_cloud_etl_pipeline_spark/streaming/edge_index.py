"""Streaming link-graph edge index — the incremental twin of batch
``extract_links`` → ``pagerank`` (VERDICT r8 #3: every other
incremental surface has a persistent-index fold; edges from
newly-fetched pages had none, so centrality over a growing crawl
recomputed extraction from scratch).

Storage shape: ONE ROW PER PAGE — ``(curl, doc_id, dsts
array<string>)`` where ``dsts`` is the winner fetch's out-links in
document order (:func:`..operators.extraction.extract_link_lists`).
Keying the table by ``curl`` instead of by (src, dst) pair is what
makes REPLACEMENT free: when the seen-index admits a strictly-better
refetch of a page, its single merged row atomically replaces the
loser fetch's whole edge list — a pair-keyed table would need a
delete of the stale pairs in a second commit, and a crash between
the two would strand ghost edges. A page whose html no longer
parses merges an EMPTY list (same contract), clearing its edges.

The fold is NOT its own index machinery: the edge table is a derived
table of the canonical-URL seen-index
(:func:`.crawl_index.crawl_index_writer` ``derived_tables``), so it
inherits the seen-index's whole correctness story — winner
determinism under any shard chunking, exactly-once batch_id folds,
derived-before-index commit order across crashes and replays. This
module contributes only the transform (pages → per-page edge rows)
and the read path (stored rows → the (src, dst) edge list the
centrality folds consume).

Differential contract (pinned in tests/test_edge_index.py):
``stored_link_edges(table)`` after folding shards in ANY chunking,
with a replay and across a real checkpoint restart, equals batch
``extract_links`` over the batch winner page set row-for-row
(multiset: intra-page duplicate links kept).

Scale shape: the transform is the same map-only html kernel the
batch path uses, over only the batch's CHANGED winners; the merge
prunes by curl range like every other index here; the read path is
a scan + explode (no shuffle) feeding pagerank's one-equi-join-per-
iteration loop. Nothing is per-edge keyed, so a hub page with 10^5
out-links is one row, not 10^5 merge keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extraction import extract_link_lists
from ..sources.table_format import ParquetTable

#: the edge table's row — everything the centrality folds need
EDGE_INDEX_COLS = ["curl", "doc_id", "dsts"]


def link_graph_transform(changed: DataFrame) -> DataFrame:
    """``derived_tables`` transform for
    :func:`.crawl_index.crawl_index_writer`: one edge row per changed
    winner page, satisfying the writer's contract (exactly one row
    per ``curl``; keeps ``curl`` + ``doc_id`` for the keyed merge).
    ``changed`` is the seen-index's emitted winner shape — canonical
    ``curl`` plus the fetch payload (``html``)."""
    lists = extract_link_lists(changed, html_col="html", url_col="curl")
    # extract_link_lists re-canonicalizes the url into `src`;
    # canonical_url is idempotent, so src == curl — name it back to
    # the merge key
    return lists.select(
        F.col("src").alias("curl"), "doc_id", "dsts"
    )


def fold_edge_index(
    table: ParquetTable,
    changed: DataFrame,
    batch_id: int | None = None,
) -> None:
    """Fold one batch of CHANGED winner pages (the return value of
    ``fold_crawl_url_index`` or the writer's transform input) into
    the edge table — the non-streaming composition hook. Exactly-once
    under replay via ``batch_id``; an empty batch merges nothing (a
    boundless merge would rewrite the whole table for a no-op)."""
    rows = link_graph_transform(changed)
    if rows.limit(1).count() > 0:
        table.merge_with_retry(
            rows.select(*EDGE_INDEX_COLS),
            keys=["curl"],
            order_by=["doc_id"],
            batch_id=batch_id,
        )


def stored_link_edges(table: ParquetTable) -> DataFrame:
    """(src, dst) edge list over the stored table — the input shape
    :mod:`..operators.pagerank` consumes. ``explode`` (not
    ``explode_outer``): a page with no out-links contributes no
    edges, exactly like batch ``extract_links`` — it still ranks as
    a dangling node when some other page links to it."""
    return table.read().select(
        F.col("curl").alias("src"), F.explode("dsts").alias("dst")
    )
