"""Byte-pair-encoding vocabulary induction and tokenization — the
charter's "BPE-ish" token counting upgraded to a real learned BPE
(Sennrich et al. 2016), in the shape that actually scales:

- the ONLY corpus-scale operation is the word-frequency table (one
  hash aggregation; ``min_count``/``max_words`` bound it — standard
  practice, rare words can't win merges anyway);
- merge training runs driver-side ON THAT TABLE (vocabulary
  induction is small-data after word counting — this is how every
  production tokenizer trainer works: corpora are TBs, word-freq
  tables are MBs);
- encoding broadcasts the learned merge ranks into an Arrow kernel
  that applies the standard lowest-rank-first merge loop per word,
  with an in-batch word cache (Zipf: most tokens repeat).

Determinism: merge ties (equal pair counts) break lexicographically,
so the learned vocabulary is a pure function of the corpus — no RNG,
no partition sensitivity anywhere (the word-freq table is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from .text import tokens

#: end-of-word marker (kept out of the corpus by construction: it is
#: appended AFTER whitespace tokenization, which strips whitespace).
EOW = "▁"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, n) over whitespace tokens — the one corpus-scale pass."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    min_count: int = 2,
    max_words: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position). ``min_count`` drops
    singleton words; ``max_words`` caps the driver-side table by
    frequency (ties by word) — both bound driver memory at any corpus
    size."""
    wf = (
        word_frequencies(docs, text_col, id_col)
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    # word → (symbol tuple, count); EOW marks word end so merges can't
    # cross word boundaries and final tokens know word-final position
    vocab: dict[tuple[str, ...], int] = {}
    for r in wf:
        vocab[tuple(r["word"]) + (EOW,)] = r["n"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        # deterministic: count desc, then LEXICOGRAPHICALLY GREATEST
        # pair (max on the tuple) — any total order works, pin one
        pair, count = best
        if count < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first to one word (reference + kernel
    share this exact function)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bpe_tokens", ArrayType(StringType())),
        StructField("n_bpe_tokens", LongType()),
    ]
)


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bpe_tokens, n_bpe_tokens) using the learned merges —
    Arrow kernel with a per-batch word cache (Zipf makes the cache
    hit rate high); merge ranks ship by closure (broadcast-sized:
    n_merges entries)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def kernel(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for batch in batches:
            toks_out, counts = [], []
            for text in batch[text_col]:
                out: list[str] = []
                for w in (text or "").split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    out.extend(enc)
                toks_out.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "bpe_tokens": toks_out,
                    "n_bpe_tokens": pd.Series(counts, dtype="int64"),
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(kernel, BPE_SCHEMA)
