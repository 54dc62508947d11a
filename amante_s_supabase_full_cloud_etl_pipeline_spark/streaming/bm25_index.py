"""Incrementally-maintained BM25 inverted index — streaming lexical
retrieval (charter §2.10 similarity/retrieval family × §2.8 streaming
surface).

``operators/bm25.py`` builds the (postings, doc_stats) index pair in
one batch pass. A continuous-ingest corpus can't afford a full
rebuild per micro-batch, and it doesn't need one: an inverted index
is APPEND-DECOMPOSABLE — a document's postings rows (term, doc_id,
tf) and its length row (doc_id, dl) depend on that document alone.
So the streaming form folds each micro-batch's rows into two
persistent ParquetTables (snapshot-isolated, exactly-once per
batch_id), completing the streaming-index trilogy next to the
near-dup band index (``dedup_index.py``) and the IVF ANN index
(``ann_index.py``): the lexical half of hybrid RAG retrieval stays
queryable while the corpus grows.

What is deliberately NOT stored: per-term document frequency. df is
a GLOBAL aggregate — denormalizing it onto postings (as the batch
builder does) would mean rewriting every stored posting of every
term a batch touches, turning O(batch) appends into O(term-corpus)
rewrites. The probe recomputes df from the probed terms' postings
only — and because the table holds ALL postings for a term, that
probe-local count IS the global df, so streamed scores equal the
batch path's exactly (the differential the tests pin).

Scale design:
- fold = two hash-agg passes over the batch + two appends. Nothing
  reads the stored corpus.
- probe = equi-join on term against the postings table; stored
  bucketed/compacted by term, the read prunes to the probed terms'
  files (IN-list file skipping locally, capped like the near-dup
  index's probe; the join is correct without the prune).
- df per probed term is a groupBy over postings already restricted
  to those terms — the same rows the scoring join reads anyway.
- scoring delegates to ``operators.bm25.bm25_score`` — ONE
  expression tree for batch and streaming, so the two paths cannot
  drift.
- ``compact_at_files`` bounds the file count as micro-batches
  accumulate (term-sorted rewrite keeps the probe's file skipping
  effective), same knob as the other streaming indexes.

Assumption (documented like the ANN index's frozen quantizer): doc
ids are unique across batches — re-ingesting a changed document is
an upsert problem for the table format's MERGE, not this fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bm25 import bm25_score
from ..operators.text import tokens
from ..sources.table_format import ParquetTable

#: above this many distinct probed terms, skip the IN-list file
#: pruning and scan-join instead (driver IN lists must stay bounded;
#: the equi-join is correct either way) — mirrors dedup_index
_MAX_IN_LIST = 50_000


def batch_posting_rows(
    batch: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """((term, doc_id, tf), (doc_id, dl)) for one micro-batch — the
    same tokenization and shapes as the batch ``build_index``, minus
    the denormalized df (recomputed probe-side; see module doc).
    Zero-token documents appear in neither frame, matching the batch
    builder."""
    tokenized = batch.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = tokenized.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    dl = tokenized.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf, dl


def fold_bm25_index(
    postings: ParquetTable,
    doc_stats: ParquetTable,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: int | None = None,
) -> None:
    """Fold one micro-batch into the stored index pair. Exactly-once
    under foreachBatch replay: each table's batch_id ledger skips the
    leg it already committed, so a retry that died between the two
    appends converges instead of double-counting."""
    tf, dl = batch_posting_rows(batch, text_col, id_col)
    postings.append(tf.select("term", "doc_id", "tf"), batch_id=batch_id)
    doc_stats.append(dl.select("doc_id", "dl"), batch_id=batch_id)


def bm25_index_topk(
    postings: ParquetTable,
    doc_stats: ParquetTable,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-k BM25 over the STORED index: (query_id, doc_id, score,
    rank), identical to running the batch ``bm25_score`` over a
    ``build_index`` of the same corpus (tests pin row-for-row
    equality).

    One driver job on the query batch yields the probed-term list
    (for IN-list file pruning of the postings read, capped at
    :data:`_MAX_IN_LIST`); df per term is counted from the probed
    postings — the full posting set for those terms, hence the global
    value. Scoring delegates to ``bm25_score`` so batch and streaming
    share one expression tree."""
    probed = [
        r["term"]
        for r in queries.select(F.explode("terms").alias("term"))
        .distinct()
        .limit(_MAX_IN_LIST + 1)
        .collect()
    ]
    filters = None
    if len(probed) <= _MAX_IN_LIST:
        filters = [("term", "in", probed)]
    stored = postings.read(filters=filters)
    term_df = stored.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    with_df = stored.join(term_df, "term").select("term", "doc_id", "tf", "df")
    return bm25_score(
        with_df,
        doc_stats.read(),
        queries,
        k=k,
        k1=k1,
        b=b,
        round_to=round_to,
    )


def bm25_index_writer(
    postings: ParquetTable,
    doc_stats: ParquetTable,
    text_col: str = "text",
    id_col: str = "doc_id",
    compact_at_files: int = 0,
):
    """foreachBatch handler maintaining the index pair exactly-once:

        (stream.writeStream
              .foreachBatch(bm25_index_writer(postings, doc_stats))
              .option("checkpointLocation", ...).start())

    ``compact_at_files`` > 0 compacts the postings table sorted by
    term whenever its live file count reaches the threshold, keeping
    the probe's per-term file skipping effective as appends
    accumulate. Compaction runs BEFORE the fold, never after: the
    ledger's replay guard checks the table's LAST commit, so the fold
    must be the final commit of a successful handle — a retry then
    hits the ledger instead of re-appending past the compaction."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        if compact_at_files and len(postings.files()) >= compact_at_files:
            postings.compact(sort_by=["term"])
        fold_bm25_index(
            postings,
            doc_stats,
            batch,
            text_col=text_col,
            id_col=id_col,
            batch_id=batch_id,
        )

    return handle
