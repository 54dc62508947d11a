"""Exact-substring (k-gram span) deduplication — the Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") curation
pass: find token spans of length ≥ k that occur more than once
ACROSS the corpus and remove every occurrence but the first, even
when the surrounding documents are otherwise unrelated. Complements
the other dedup families here (operators/dedup.py): exact dedup
catches identical documents, MinHash/SimHash/Jaccard catch mostly-
similar documents, line dedup catches single repeated lines — none
of them catch a 200-token licence block pasted into the middle of a
million distinct pages. This one does.

The reference implementation builds a corpus-wide suffix array —
inherently sequential and memory-resident. The Spark-shaped
equivalent used here (and by the large open curation pipelines) is
k-gram window hashing:

1. tokenize + hash tokens JVM-side (``xxhash64`` per token — no
   Python in the wide map stage);
2. one Arrow kernel turns each doc's token-hash array into ROLLING
   window hashes: with ``S_i = Σ_{j<i} t_j·B^j`` and odd ``B`` (all
   mod 2^64 via natural uint64 wraparound), window i hashes to
   ``(S_{i+k} − S_i)·B^{-i}`` — invertible because odd B is a unit
   mod 2^64, so equal windows ⇔ equal hashes up to 2^-64 collisions.
   O(n) per document, fully vectorized numpy, emitted as one
   (doc_id, pos, whash) row per window;
3. duplicate windows = a hash-groupBy window on ``whash`` (count>1),
   with the corpus-wide FIRST occurrence (min (doc_id, pos)) kept —
   deterministic and partitioning-independent;
4. flagged windows merge into maximal spans per document
   (gaps-and-islands over a doc-partitioned window — never a global
   sort);
5. trimming drops exactly the tokens covered by flagged spans and
   reassembles the text (whitespace-token contract, same family as
   every token operator in this engine).

Scale shape: the wide stages are one map pass (windows), one shuffle
on the 64-bit window hash (uniform — hot hashes ARE the duplicates,
bounded by their occurrence count), one shuffle on doc_id to merge
spans and one to trim. Nothing materializes all-pairs, no suffix
array, no driver-side state. At 100 TB the window table is ~n_tokens
rows of 24 bytes — big but linear, and the first groupBy's map-side
partial collapse removes the unique-hash majority before the
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from .text import tokens

#: odd multiplier (golden-ratio constant) — a unit mod 2^64, so the
#: rolling normalization B^{-i} exists and window hashes are position-
#: independent.
_B = 0x9E3779B97F4A7C15 | 1

WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
        StructField("whash", LongType()),
    ]
)


def _token_hashes(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, thashes array<long>) — tokenization and per-token
    hashing stay JVM-side; only the O(n) rolling pass is Python."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("thashes"),
    )


def window_hashes(
    docs: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per length-``k`` token window: (doc_id, pos, whash).
    Documents shorter than ``k`` tokens emit nothing (they are fully
    covered by the document-level dedup families instead)."""
    kk = int(k)
    if kk < 2:
        raise ValueError("k must be >= 2")

    def kernel(batches):
        import numpy as np
        import pandas as pd

        b = np.uint64(_B)
        binv = np.uint64(pow(_B, -1, 1 << 64))
        for batch in batches:
            out_doc: list[int] = []
            out_pos: list[int] = []
            out_hash: list[int] = []
            for doc_id, th in zip(batch["doc_id"], batch["thashes"]):
                t = np.asarray(th, dtype=np.int64).astype(np.uint64)
                n = t.size
                if n < kk:
                    continue
                with np.errstate(over="ignore"):
                    pow_b = np.ones(n + 1, dtype=np.uint64)
                    pow_b[1:] = b
                    pow_b = np.cumprod(pow_b)  # B^i mod 2^64
                    pow_binv = np.ones(n - kk + 1, dtype=np.uint64)
                    pow_binv[1:] = binv
                    pow_binv = np.cumprod(pow_binv)  # B^-i mod 2^64
                    prefix = np.zeros(n + 1, dtype=np.uint64)
                    np.cumsum(t * pow_b[:n], out=prefix[1:])
                    wh = (prefix[kk:] - prefix[:-kk]) * pow_binv
                m = n - kk + 1
                out_doc.extend([int(doc_id)] * m)
                out_pos.extend(range(m))
                out_hash.extend(wh.astype(np.int64).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "pos": pd.Series(out_pos, dtype="int64"),
                    "whash": pd.Series(out_hash, dtype="int64"),
                }
            )

    return _token_hashes(docs, text_col, id_col).mapInPandas(kernel, WINDOW_SCHEMA)


def duplicated_spans(
    docs: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Maximal token spans to remove: (doc_id, start_tok, end_tok)
    half-open ranges covering every window whose content occurs
    elsewhere in the corpus, EXCEPT each window-content's global
    first occurrence (min (doc_id, pos)) — so one copy of every
    duplicated passage survives, deterministically.

    The per-hash window partitions are occurrence-count-sized (a
    passage duplicated a million times is a million-row group — that
    IS the work), and span merging is gaps-and-islands inside each
    document: island starts where a flagged window's pos exceeds the
    running max end of its predecessors."""
    wins = window_hashes(docs, k, text_col, id_col)
    by_hash = Window.partitionBy("whash").orderBy("doc_id", "pos")
    flagged = (
        wins.withColumn("_rank", F.row_number().over(by_hash))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("whash")))
        .filter((F.col("_n") > 1) & (F.col("_rank") > 1))
        .select("doc_id", "pos")
    )
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    # running max of predecessors' end (pos + k); a gap starts a new island
    prev_end = F.max(F.col("pos") + k).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = flagged.withColumn(
        "_new", F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(by_doc))
    return islands.groupBy("doc_id", "_island").agg(
        F.min("pos").alias("start_tok"),
        (F.max("pos") + k).alias("end_tok"),
    ).select("doc_id", "start_tok", "end_tok")


def trim_duplicate_spans(
    docs: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Remove every duplicated-span token and reassemble: returns
    (doc_id, text, n_tokens_removed). Idempotent: survivors are
    global first occurrences, which survive a second pass; documents
    with no flagged span pass through byte-identical (whitespace-
    token reconstruction applies only to trimmed documents)."""
    spans = duplicated_spans(docs, k, text_col, id_col)
    drop_pos = spans.select(
        "doc_id",
        F.explode(F.sequence("start_tok", F.col("end_tok") - 1)).alias("pos"),
    ).distinct()
    n_dropped = drop_pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n_drop"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    kept = (
        toks.join(drop_pos, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("_joined"),
        )
    )
    # Drive the output from the input table: untouched documents pass
    # through byte-identical, and a FULLY duplicated document stays in
    # the output as an empty string rather than disappearing.
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_orig"))
    return (
        base.join(kept, "doc_id", "left")
        .join(n_dropped, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_n_drop").isNull(), F.col("_orig"))
            .otherwise(F.coalesce(F.col("_joined"), F.lit("")))
            .alias(text_col),
            F.coalesce(F.col("_n_drop"), F.lit(0)).cast("long").alias("n_tokens_removed"),
        )
    )
