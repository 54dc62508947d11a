"""Text hygiene and information-density signals — the two standard
curation steps between raw ingestion and quality filtering:

- :func:`compression_signals` — per-document DEFLATE compression
  ratio (RedPajama-v2 / DataComp-LM quality signal family): highly
  repetitive or templated text compresses far below natural prose,
  and near-random noise doesn't compress at all, so the ratio is a
  cheap single-pass proxy for information density that regex
  repetition counters (Gopher signals) miss.
- :func:`fix_text_kernel` / :func:`fixed_text` — ftfy-lite repair:
  Unicode NFC normalization, control-character stripping (keeping
  \\n and \\t), newline canonicalization, and single-pass mojibake
  repair (UTF-8 bytes mis-decoded as Latin-1/cp1252 — the classic
  "cafÃ©" artifact) applied only when it strictly reduces the
  mojibake marker count, so clean text is never touched.

Both are Arrow ``mapInPandas`` kernels (zlib / unicodedata are
CPython stdlib with no JVM equivalent) — the sanctioned Python shape:
batched, vectorized where possible, no per-row UDF calls through
py4j. Map-only at any scale; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COMPRESSION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("zlib_bytes", LongType()),
        StructField("compression_ratio", DoubleType()),
    ]
)

#: mojibake tell-tales: UTF-8 lead bytes 0xC2-0xC3 decoded as Latin-1
#: ('Â', 'Ã') and the cp1252 artifacts of the 0x80-0x9F range.
_MOJIBAKE_MARKERS = ("Ã", "Â", "â€", "ï»¿", "Ë†")


def compression_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """(doc_id, n_bytes, zlib_bytes, compression_ratio) per document,
    ratio = compressed/raw in [~0, ~1+] (empty docs report 0.0 raw
    bytes and ratio 1.0 — no evidence either way). Fixed DEFLATE
    level for run-to-run determinism."""

    def kernel(batches):
        import zlib

        import pandas as pd

        for batch in batches:
            raw_n, comp_n, ratio = [], [], []
            for text in batch[text_col]:
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                raw_n.append(len(raw))
                comp_n.append(len(comp))
                ratio.append(len(comp) / len(raw) if raw else 1.0)
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "n_bytes": pd.Series(raw_n, dtype="int64"),
                    "zlib_bytes": pd.Series(comp_n, dtype="int64"),
                    "compression_ratio": pd.Series(ratio, dtype="float64"),
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, COMPRESSION_SCHEMA
    )


def _fix_one(text: str) -> str:
    import re
    import unicodedata

    if text is None:
        return None
    # 1. mojibake: if re-encoding latin-1/cp1252 → utf-8 strictly
    # reduces marker count, the text was double-decoded — undo it.
    # One pass only (ftfy iterates; one round fixes the ubiquitous
    # single-mis-decode case and can never oscillate).
    markers = sum(text.count(m) for m in _MOJIBAKE_MARKERS)
    if markers:
        for enc in ("cp1252", "latin-1"):
            try:
                candidate = text.encode(enc).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if sum(candidate.count(m) for m in _MOJIBAKE_MARKERS) < markers:
                text = candidate
                break
    # 2. canonical composition (é as one codepoint, not e+combining)
    text = unicodedata.normalize("NFC", text)
    # 3. newline canonicalization + control stripping (keep \n, \t)
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    return re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", text)


def fix_text_kernel(batches):
    """mapInPandas kernel: (doc_id, text) → (doc_id, text, changed)."""
    import pandas as pd

    for batch in batches:
        fixed = [_fix_one(t) for t in batch["text"]]
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "text": fixed,
                "changed": pd.Series(
                    [f != t for f, t in zip(fixed, batch["text"])], dtype="bool"
                ),
            }
        )


FIXED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("changed", BooleanType()),
    ]
)


def fixed_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, text, changed) with repaired text — idempotent (a
    fixed document passes through unchanged on a second pass; pinned
    by test)."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(fix_text_kernel, FIXED_SCHEMA)
