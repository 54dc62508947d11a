"""Sequence packing for LLM pre-training: assign documents to
fixed-length context windows.

Two standard semantics, both deterministic and shard-parallel:

- ``pack_chunk_spans`` — GPT-style concat-then-chunk (documents are
  concatenated in a deterministic pseudo-random order and the token
  stream is cut every ``context_len`` tokens; documents may span
  chunk boundaries). Fully relational: per-shard running token
  offsets (one window shuffle per shard key) plus shard base offsets
  from a shard-count dimension join — a **scalable global ordering
  with no single-partition window**. The shard-totals table is
  dimension-sized (``n_shards`` rows) at any corpus scale.

- ``pack_greedy_no_split`` — next-fit bin packing without document
  splitting (each pack holds whole documents up to the capacity;
  an oversized document gets its own pack). Sequential within a
  shard by nature, so it runs as an Arrow ``applyInPandas`` kernel
  per shard — the sanctioned shape for per-partition stateful logic.

Shard assignment is ``doc_id % n_shards`` and the within-shard order
is ``md5(seed:doc_id)`` — engine-portable (md5 is identical
everywhere), reproducible, and independent of input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def _sharded_tokens(
    docs: DataFrame, n_shards: int, seed: str, text_col: str, id_col: str
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))).alias("_key"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )


def shard_base_offsets(totals: DataFrame) -> DataFrame:
    """(shard, base) where base = sum of token totals of all lower
    shards — a theta-join + group-by over the n_shards-row dimension
    table instead of an empty-partitionBy cumulative window."""
    a = totals.select(F.col("shard"), F.col("total"))
    b = totals.select(F.col("shard").alias("_s"), F.col("total").alias("_t"))
    return (
        a.join(F.broadcast(b), F.col("_s") < F.col("shard"), "left")
        .groupBy("shard")
        .agg(F.coalesce(F.sum("_t"), F.lit(0)).alias("base"))
    )


def pack_chunk_spans(
    docs: DataFrame,
    context_len: int = 2048,
    n_shards: int = 16,
    seed: str = "pack",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: its span in the concatenated global token stream
    and the context chunks it lands in. Returns
    ``(doc_id, shard, n_tokens, tok_offset, first_chunk, last_chunk,
    chunks_spanned)`` — empty documents occupy no span
    (``chunks_spanned = 0``, null chunk ids). All arithmetic is
    exact integer math on longs (floor division of non-negative
    offsets), so results are identical across engines and
    partitionings."""
    toks = _sharded_tokens(docs, n_shards, seed, text_col, id_col)
    w = (
        Window.partitionBy("shard")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = toks.withColumn("_end_local", F.sum("n_tokens").over(w))
    totals = toks.groupBy("shard").agg(F.sum("n_tokens").alias("total"))
    joined = offs.join(F.broadcast(shard_base_offsets(totals)), "shard").select(
        id_col,
        "shard",
        "n_tokens",
        (F.col("base") + F.col("_end_local") - F.col("n_tokens")).alias("tok_offset"),
        (F.col("base") + F.col("_end_local") - 1).alias("_last_tok"),
    )
    nonempty = F.col("n_tokens") > 0
    first_chunk = F.floor(F.col("tok_offset") / context_len)
    last_chunk = F.floor(F.col("_last_tok") / context_len)
    return joined.select(
        id_col,
        "shard",
        "n_tokens",
        "tok_offset",
        F.when(nonempty, first_chunk).alias("first_chunk"),
        F.when(nonempty, last_chunk).alias("last_chunk"),
        F.when(nonempty, last_chunk - first_chunk + 1).otherwise(F.lit(0)).alias(
            "chunks_spanned"
        ),
    )


def assemble_context_chunks(
    spans_with_ids: DataFrame,
    context_len: int = 2048,
    id_col: str = "doc_id",
    ids_col: str = "input_ids",
) -> DataFrame:
    """Materialize the training batches the spans describe: one row
    per context chunk, ``token_ids`` being exactly that chunk's slice
    of the concatenated global token stream — the dataloader-side
    twin of :func:`pack_chunk_spans`.

    Input: the span columns (``n_tokens, tok_offset, first_chunk,
    last_chunk``) joined with each document's token-id array
    (``ids_col``; its size MUST equal ``n_tokens`` — pack by the same
    token stream you id-mapped, see examples/tokenize_shards.py).
    Returns ``(chunk_id, n_chunk_tokens, token_ids)``; every chunk is
    exactly ``context_len`` tokens except the final partial one.

    Scale: a document explodes into only the chunks it overlaps
    (``chunks_spanned`` rows); the group-by shuffles at most
    ``context_len`` tokens per chunk — chunk groups are fixed-size by
    construction, so there is no hot-key hazard, and the per-group
    ``collect_list`` buffer is bounded by context_len ids."""
    L = int(context_len)
    nonempty = spans_with_ids.filter(F.col("n_tokens") > 0)
    pieces = nonempty.select(
        F.col("tok_offset"),
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
        F.col(ids_col).alias("_ids"),
        F.col("n_tokens"),
    ).select(
        "chunk_id",
        "tok_offset",
        F.slice(
            "_ids",
            (F.greatest(F.col("chunk_id") * L - F.col("tok_offset"), F.lit(0)) + 1).cast("int"),
            (
                F.least((F.col("chunk_id") + 1) * L - F.col("tok_offset"), F.col("n_tokens"))
                - F.greatest(F.col("chunk_id") * L - F.col("tok_offset"), F.lit(0))
            ).cast("int"),
        ).alias("_piece"),
    )
    return (
        pieces.groupBy("chunk_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tok_offset", "_piece"))
                    ),
                    lambda s: s.getField("_piece"),
                )
            ).alias("token_ids")
        )
        .select(
            "chunk_id",
            F.size("token_ids").cast("long").alias("n_chunk_tokens"),
            "token_ids",
        )
        .orderBy("chunk_id")
    )


def pack_greedy_no_split(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 16,
    seed: str = "pack",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Next-fit whole-document packing: walk each shard in its
    deterministic order, open a new pack whenever the next document
    would overflow ``capacity`` (an oversized document occupies its
    own pack). Returns ``(doc_id, shard, n_tokens, pack_seq)`` where
    ``pack_seq`` numbers packs within the shard from 0 — the global
    pack key is (shard, pack_seq). Runs as one Arrow kernel per
    shard: state never crosses shard boundaries, so shards pack in
    parallel."""
    import pandas as pd

    toks = _sharded_tokens(docs, n_shards, seed, text_col, id_col)
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_key", id_col]).reset_index(drop=True)
        seqs = []
        acc, seq = 0, 0
        for tok in pdf["n_tokens"]:
            if acc > 0 and acc + tok > cap:
                seq += 1
                acc = 0
            seqs.append(seq)
            acc += tok
        out = pdf[[id_col, "shard", "n_tokens"]].copy()
        out["pack_seq"] = pd.Series(seqs, dtype="int64")
        return out

    schema = f"{id_col} long, shard int, n_tokens long, pack_seq long"
    return toks.groupBy("shard").applyInPandas(pack, schema=schema)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token-window chunks
    (RAG indexing / long-doc training prep). Returns
    ``(doc_id, chunk_idx, n_chunks, tok_start, chunk_text)`` — one
    row per chunk, ``chunk_idx`` 0-based, windows advance by
    ``chunk_tokens - overlap_tokens`` and the last window is the
    remainder. Every document yields at least one chunk and no window
    is duplicated: a doc that fits in one window yields exactly one
    chunk, and a token-less (empty or whitespace-only) document
    yields a single chunk with empty ``chunk_text`` — so no document
    silently disappears from the chunk stream
    (``test_chunk_documents_edges`` pins this).

    Map-only: tokenization, window starts (``F.sequence``), and slice
    reassembly are all column expressions — no shuffle, no Python, no
    state; at 100 TB this is a pure scan stage that parallelizes per
    row. Whitespace re-joining is the documented tokenizer contract
    (the same whitespace family every token-count operator here
    uses).
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    # last window start: the largest multiple of stride still leaving
    # >overlap tokens (ceil((n - chunk)/stride) bounded below by 0)
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)) + 1).cast("int"),
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("_n"),
        n_chunks.alias("n_chunks"),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "tok_start"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "n_chunks",
        "tok_start",
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("tok_start") + 1, chunk_tokens)
        ).alias("chunk_text"),
    )
