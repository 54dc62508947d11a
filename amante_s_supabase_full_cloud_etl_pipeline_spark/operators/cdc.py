"""Content-defined chunking (FastCDC-style) — sub-document dedup
granularity for an LLM training corpus (charter extension, SURVEY.md
§2.10; reference analog: none).

Why a crawl corpus needs it: exact dedup (:mod:`.dedup`) hashes the
WHOLE document, so a boilerplate re-render with one changed byte
survives; MinHash catches it probabilistically at document scope.
Content-defined chunking cuts each document at positions chosen by
the CONTENT (a rolling gear hash crossing a threshold), so an edit
only perturbs the chunks that overlap it — every other chunk keeps
its boundary AND its hash (the shift-robustness fixed-size blocking
lacks, and the property the tests pin). Chunk-hash grouping then
exposes shared boilerplate, near-identical mirrors, and partial
plagiarism at O(corpus bytes) cost with no pairwise comparison.

Algorithm (FastCDC, Xia et al., USENIX ATC 2016 — published):
gear rolling hash ``fp = ((fp << 1) + gear[byte]) mod 2^64`` over a
256-entry table, normalized chunking with TWO masks — a harder mask
(more bits) before the average target makes early cuts rare, an
easier mask after it makes late cuts likely — bounded by hard
min/max sizes. The gear table here is derived deterministically
from SHA-256 of the byte index (clean-room, reproducible across
workers and rounds; the paper leaves the table's randomness source
open).

Scale shape: chunking is a map-only Arrow kernel (one pass per
document, no shuffle); chunk-level grouping is ONE hash aggregation
on ``chunk_hash`` with map-side partials; the pair view caps each
posting list like :mod:`.dedup`'s banded joins — never all-pairs,
no driver collects.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: deterministic 256-entry gear table: first 8 bytes of
#: SHA-256(index) — reproducible everywhere, no magic constants
_GEAR = [
    int.from_bytes(hashlib.sha256(bytes([i])).digest()[:8], "big")
    for i in range(256)
]
_MASK64 = (1 << 64) - 1


def _masks(avg_size: int) -> tuple[int, int]:
    """FastCDC's normalized-chunking masks (NC2): ``bits+2`` leading
    mask bits before the average point (cuts rare), ``bits-2`` after
    it (cuts likely), where ``bits = log2(avg_size)``."""
    bits = max(avg_size.bit_length() - 1, 3)
    hard = (1 << (bits + 2)) - 1
    easy = (1 << (bits - 2)) - 1
    # spread the mask bits across the word like the paper's padded
    # masks: a left shift keeps the compared bits away from the
    # low-entropy end of the gear sum
    return hard << 16 & _MASK64, easy << 16 & _MASK64


def cdc_chunks(
    data: bytes,
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
) -> list[dict]:
    """Chunk one byte string: ``[{offset, length, chunk_hash}, ...]``
    covering ``data`` exactly (offsets contiguous, lengths in
    ``[min_size, max_size]`` except a possibly-short final chunk).
    ``chunk_hash`` is a 16-byte BLAKE2b hex of the chunk's bytes —
    the dedup key. Deterministic: same bytes ⇒ same chunks anywhere.
    """
    if not 0 < min_size <= avg_size <= max_size:
        raise ValueError(
            f"need 0 < min_size <= avg_size <= max_size, got "
            f"{min_size}/{avg_size}/{max_size}"
        )
    out: list[dict] = []
    for start, end in _chunk_spans(data, min_size, avg_size, max_size):
        chunk = data[start:end]
        out.append(
            {
                "offset": start,
                "length": end - start,
                "chunk_hash": hashlib.blake2b(
                    chunk, digest_size=16
                ).hexdigest(),
            }
        )
    return out


def _chunk_spans(
    data: bytes,
    min_size: int,
    avg_size: int,
    max_size: int,
    use_numpy: bool | None = None,
) -> list[tuple[int, int]]:
    """Cut ``data`` into contiguous (start, end) spans. Two
    bit-identical implementations (differential-tested against each
    other in tests/test_cdc.py):

    - scalar: the reference per-byte gear loop (always available);
    - vectorized (default when numpy imports): precompute, in
      ``T = mask_hard.bit_length()`` numpy shift-add passes over the
      whole document, the POSITION-ONLY fingerprint ``FP[p] =
      Σ_{k<T} gear[data[p-k]] << k  (mod 2^64)`` and the positions
      where each mask clears. Why only T terms and no per-chunk
      state: a term shifted by ``k`` touches only bits ≥ k, and both
      masks live below bit T — so once a chunk's accumulation window
      reaches T bytes, the scalar fingerprint's MASKED bits equal
      ``FP[p]`` no matter where the chunk started. Each chunk then
      costs a ≤T-byte scalar startup walk (the partial-window
      prefix, where the scalar fp genuinely depends on the cut
      history) plus two binary searches into the precomputed hit
      arrays — per-document work drops from O(bytes) Python-level
      iterations to O(T·bytes) SIMD ops + O(chunks · T) Python ones
      (measured ~15× on 8 KiB-average chunking; SURVEY §2.10).

    ``use_numpy``: None = auto (import-gated, and only for inputs
    ≥ ``_VECTOR_MIN_BYTES`` — measured crossover: below ~2-4 KiB the
    per-call numpy setup costs more than the scalar loop saves, and
    auto must never REGRESS the short-document corpora the sf tables
    model), True/False pin a path (tests). The vector path always
    falls back to scalar for data shorter than one steady window."""
    mask_hard, mask_easy = _masks(avg_size)
    n = len(data)
    steady = min_size + mask_hard.bit_length() - 1
    np = None
    if (
        use_numpy is True
        or (use_numpy is None and n >= _VECTOR_MIN_BYTES)
    ) and n > steady:
        try:
            import numpy as _np

            np = _np
        except ImportError:
            if use_numpy:
                raise
    hard_hits = easy_hits = None
    if np is not None:
        T = mask_hard.bit_length()
        buf = np.frombuffer(data, dtype=np.uint8)
        # BLOCKWISE precompute (cross-cutting review catch): the
        # fingerprint array costs ~16-24 bytes of transients per
        # input byte, so a single full-length pass would spend GBs
        # on a giant blob; processing in _VECTOR_BLOCK windows with
        # a (T-1)-byte lookback bounds the peak at a constant. Each
        # block's positions carry a FULL T-term window (the lookback
        # supplies the history), so masked bits — hence hit
        # positions — are identical to the monolithic pass.
        hard_parts, easy_parts = [], []
        mh, me = np.uint64(mask_hard), np.uint64(mask_easy)
        b0 = 0
        while b0 < n:
            b1 = min(n, b0 + _VECTOR_BLOCK)
            lo = max(0, b0 - (T - 1))
            # prefix-doubling: S_{2h}[p] = S_h[p] + (S_h[p-h] << h)
            # gives Σ_{k<H} gear[data[p-k]] << k in ⌈log2 T⌉ passes
            # instead of T — the extra terms k ∈ [T, H) only touch
            # bits ≥ T, above both masks, so masked bits stay exact.
            # (The RHS expression materializes before +=, so the
            # overlapping views are safe.)
            fp_arr = _gear_np(np)[buf[lo:b1]]
            m = b1 - lo
            h = 1
            while h < T:
                fp_arr[h:] += fp_arr[: m - h] << np.uint64(h)
                h *= 2
            seg = fp_arr[b0 - lo:]
            hard_parts.append(np.flatnonzero((seg & mh) == 0) + b0)
            easy_parts.append(np.flatnonzero((seg & me) == 0) + b0)
            b0 = b1
        hard_hits = np.concatenate(hard_parts) if hard_parts else None
        easy_hits = np.concatenate(easy_parts) if easy_parts else None
        if hard_hits is None:
            np = None  # zero-length guard: scalar loop handles it
    spans: list[tuple[int, int]] = []
    gear = _GEAR
    start = 0
    while start < n:
        remaining = n - start
        if remaining <= min_size:
            end = n
        else:
            limit = min(remaining, max_size)
            normal = min(avg_size, limit)
            fp = 0
            i = min_size
            end = None
            # scalar startup: the partial-window prefix (and, with no
            # numpy, the whole chunk — bound = limit)
            hard_stop = min(normal, steady) if np is not None else normal
            while i < hard_stop:
                fp = ((fp << 1) + gear[data[start + i]]) & _MASK64
                if not fp & mask_hard:
                    end = start + i + 1
                    break
                i += 1
            if end is None and np is not None and i < normal:
                # steady hard region: first precomputed hard hit
                j = int(np.searchsorted(hard_hits, start + i))
                if j < len(hard_hits) and hard_hits[j] < start + normal:
                    end = int(hard_hits[j]) + 1
                else:
                    i = normal
            if end is None:
                easy_stop = min(limit, steady) if np is not None else limit
                while i < easy_stop:
                    fp = ((fp << 1) + gear[data[start + i]]) & _MASK64
                    if not fp & mask_easy:
                        end = start + i + 1
                        break
                    i += 1
            if end is None and np is not None and i < limit:
                j = int(np.searchsorted(easy_hits, start + i))
                if j < len(easy_hits) and easy_hits[j] < start + limit:
                    end = int(easy_hits[j]) + 1
            if end is None:
                end = start + limit
        spans.append((start, end))
        start = end
    return spans


#: auto-mode size floor for the vectorized scan (see _chunk_spans)
_VECTOR_MIN_BYTES = 4096

#: blockwise precompute window: bounds the scan's transient memory
#: at ~24 bytes × this, independent of blob size (a monolithic pass
#: on a 256 MB text cell would spend ~5 GB of uint64 transients)
_VECTOR_BLOCK = 8 << 20

_GEAR_NP = None


def _gear_np(np):
    """The gear table as a cached uint64 numpy array (vector path)."""
    global _GEAR_NP
    if _GEAR_NP is None:
        _GEAR_NP = np.array(_GEAR, dtype=np.uint64)
    return _GEAR_NP


CDC_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("chunk_hash", StringType()),
    ]
)

_CHUNK_COLS = [f.name for f in CDC_CHUNK_SCHEMA.fields]


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 2048,
) -> DataFrame:
    """Map-only Arrow kernel: one row per content-defined chunk of
    each document's UTF-8 bytes. The small defaults suit the test
    tables' short documents; a real corpus uses the byte-scale
    defaults of :func:`cdc_chunks`. Null text emits nothing (S4)."""

    def kernel(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                if text is None:
                    continue
                for idx, ch in enumerate(
                    cdc_chunks(
                        text.encode("utf-8", "surrogatepass"),
                        min_size,
                        avg_size,
                        max_size,
                    )
                ):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "chunk_idx": idx,
                            "offset": ch["offset"],
                            "length": ch["length"],
                            "chunk_hash": ch["chunk_hash"],
                        }
                    )
            yield pd.DataFrame(rows, columns=_CHUNK_COLS)

    return (
        docs.select(F.col(id_col).alias(id_col), text_col)
        .filter(
            F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .mapInPandas(kernel, CDC_CHUNK_SCHEMA)
    )


def shared_chunk_pairs(
    chunks: DataFrame,
    max_posting: int = 64,
    min_chunk_bytes: int = 64,
) -> DataFrame:
    """Document pairs ranked by how many chunk hashes they share —
    the sub-document near-dup signal. Chunk hashes carried by MORE
    than ``max_posting`` documents are dropped before any list
    builds (a boilerplate chunk shared by thousands of pages would
    otherwise explode quadratically AND bloat its aggregation
    buffer — same discipline as :mod:`.dedup`'s banded joins;
    ubiquity is boilerplate, not a dedup signal), then the surviving
    posting lists explode to pairs and re-aggregate:
    (doc_a, doc_b, shared_chunks) with doc_a < doc_b.
    ``min_chunk_bytes`` drops the sub-``min_size`` final-chunk tails
    the chunker's bound exempts — two documents sharing only a tiny
    tail are not a near-dup signal."""
    sized = chunks.filter(
        F.col("length") >= min_chunk_bytes
    ).select("chunk_hash", "doc_id")
    return pairs_from_posting(
        capped_posting_lists(sized, eligible_hashes(sized, max_posting))
    )


def eligible_hashes(rows: DataFrame, max_posting: int) -> DataFrame:
    """The ubiquity-cap eligibility set: hashes carried by more than
    one and at most ``max_posting`` distinct documents. Frequency
    pre-filter FIRST (one count agg — cheap, bounded buffers), so a
    boilerplate hash shared by a million pages never materializes a
    million-element collect_set buffer; such hashes are dropped
    outright — ubiquity is boilerplate, not a dedup signal (review
    catch: the old slice-after-collect capped the OUTPUT but not the
    aggregation buffer). ONE definition shared by every posting-
    based dedup tier (chunks, the streaming index's batch twin,
    audio probes — review catch: a re-spelled copy could silently
    desynchronize the cap semantics). ``rows`` carries
    (chunk_hash, doc_id)."""
    return (
        rows.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("__n"))
        .filter((F.col("__n") > 1) & (F.col("__n") <= max_posting))
        .select("chunk_hash")
    )


def capped_posting_lists(
    rows: DataFrame, eligible: DataFrame
) -> DataFrame:
    """Sorted distinct-document posting lists ``(chunk_hash, docs
    array<long>)`` for the eligible hashes only — the semi-join +
    bounded ``collect_set`` shared by batch
    :func:`shared_chunk_pairs` and the streaming index's read path
    (review catch: the two used to spell it separately, so a change
    to the list semantics could silently desynchronize them).
    ``rows`` carries (chunk_hash, doc_id); ``eligible`` is the
    already-ubiquity-capped hash set, so every aggregation buffer is
    bounded by the cap."""
    return (
        rows.join(eligible, "chunk_hash", "left_semi")
        .groupBy("chunk_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
    )


def pairs_from_posting(posting: DataFrame) -> DataFrame:
    """(doc_a, doc_b, shared_chunks) from capped per-hash posting
    lists ``(chunk_hash, docs array<long>)`` — the pair-explode tail
    shared by batch :func:`shared_chunk_pairs` and the streaming
    chunk-hash index's read path
    (:func:`..streaming.chunk_index.stored_shared_chunk_pairs`), so
    online and offline agree on the pair semantics by construction.
    Caller guarantees the lists are already ubiquity-capped (the
    explode is quadratic in list length)."""
    pairs = posting.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "docs",
                        lambda a: F.transform(
                            "docs",
                            lambda b: F.when(
                                a < b, F.struct(
                                    a.alias("doc_a"), b.alias("doc_b")
                                )
                            ),
                        ),
                    )
                ),
                lambda p: p.isNotNull(),
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )


def chunk_dedup_stats(
    chunks: DataFrame, min_chunk_bytes: int = 64
) -> DataFrame:
    """Corpus-level duplication profile in ONE aggregation pass:
    per chunk hash, how many documents carry it and how many bytes
    the duplicates cost — the table a curation pass sorts to find
    boilerplate worth stripping. ``min_chunk_bytes`` keeps trivial
    sub-``min_size`` tail chunks out of the profile (observed live:
    7-byte tails reported as "duplicates" before the filter)."""
    return (
        chunks.filter(F.col("length") >= min_chunk_bytes)
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.first("length").alias("chunk_bytes"),
            (
                (F.count(F.lit(1)) - F.lit(1)) * F.first("length")
            ).alias("duplicate_bytes"),
        )
        .filter(F.col("n_occurrences") > 1)
    )
