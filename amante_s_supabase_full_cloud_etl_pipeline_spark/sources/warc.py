"""WARC (Web ARChive, ISO 28500) reading — the wire format crawl
corpora actually arrive in (Common Crawl publishes ~100k `.warc.gz`
files per snapshot), feeding :mod:`..operators.extraction` so the
crawl → HTML → text → curation pipeline is end-to-end real.

Charter extension (SURVEY.md §2.10; reference analog: none — the
public spec is ISO 28500 / the IIPC WARC 1.1 standard).

Format essentials implemented here:
- a WARC file is a sequence of records: a header block
  (``WARC/1.1`` version line + RFC-822-style named fields, CRLF
  line endings) then exactly ``Content-Length`` payload bytes, then
  two blank lines (CRLF CRLF);
- ``response`` records wrap the full HTTP response — status line +
  headers + body — so the DOCUMENT payload requires stripping the
  HTTP envelope (and capturing its status/Content-Type);
- ``.warc.gz`` files are MULTI-MEMBER gzip streams (one member per
  record, per the spec's recommendation) — stdlib ``gzip``
  transparently reads concatenated members.

Spark integration and the 100 TB story: files load through the
``binaryFile`` source and split into records by an Arrow-batched
``mapInPandas`` kernel — one task per WARC file. That per-FILE
parallelism is not a local shortcut, it is how production crawl
processing shards: gzip members make records seekable only forward,
so every real system (including Common Crawl's own tooling) assigns
whole .warc.gz files to workers; a snapshot's ~100k files saturate
any cluster. A malformed record degrades to a row with
``parse_error`` set (S4 per-record skip), never a task failure.
``spark.sql.files.maxPartitionBytes`` does not split binaryFile
rows, so executor memory is bounded by the largest single WARC file
— size shards accordingly (Common Crawl uses ~1 GiB).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, payload binary, parse_error string"
)

_CRLF = b"\r\n"


def _read_headers(buf: io.BufferedIOBase) -> dict[str, str] | None:
    """One CRLF-terminated header block → {lower-name: value}, or
    None at end-of-stream. The first line must be a WARC/x.y version
    line; leading blank lines (inter-record separators) are
    skipped."""
    line = buf.readline()
    while line in (_CRLF, b"\n"):
        line = buf.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"expected WARC version line, got {line[:40]!r}")
    headers: dict[str, str] = {}
    while True:
        line = buf.readline()
        if line in (_CRLF, b"\n", b""):
            return headers
        if line[:1] in (b" ", b"\t") and headers:
            # RFC-822 continuation folds onto the previous field
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, _, value = line.partition(b":")
        last = name.strip().lower().decode("ascii", "replace")
        headers[last] = value.strip().decode("utf-8", "replace")


def _split_http(block: bytes):
    """(status, content_type, body) from an HTTP message block, or
    (None, None, block) when no HTTP envelope is present."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = block.partition(b"\n\n")
        if not sep:
            return None, None, block
    lines = head.split(b"\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        if name.strip().lower() == b"content-type":
            ctype = value.strip().decode("utf-8", "replace")
    return status, ctype, body


def iter_warc_records(raw: bytes, path: str = ""):
    """Parse one WARC file's bytes (gzip'd or plain; multi-member
    gzip per the spec) into WARC_SCHEMA-shaped dicts. A record whose
    framing breaks yields ONE row with ``parse_error`` set and ends
    the file's iteration (framing loss is not recoverable —
    Content-Length is the only record delimiter)."""
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except (OSError, EOFError) as e:  # BadGzipFile OR truncated stream
            yield {"path": path, "parse_error": f"gzip: {e}"}
            return
    buf = io.BytesIO(raw)
    while True:
        try:
            headers = _read_headers(buf)
            if headers is None:
                return
            length = int(headers.get("content-length", ""))
            block = buf.read(length)
            if len(block) != length:
                raise ValueError("truncated record payload")
        except Exception as e:  # framing is unrecoverable mid-file
            yield {"path": path, "parse_error": str(e)}
            return
        wtype = headers.get("warc-type", "")
        ctype = headers.get("content-type", "")
        status = http_ctype = None
        payload = block
        if wtype == "response" and ctype.startswith("application/http"):
            status, http_ctype, payload = _split_http(block)
        yield {
            "path": path,
            "record_id": headers.get("warc-record-id"),
            "warc_type": wtype,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": ctype,
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": payload,
            "parse_error": None,
        }


def warc_kernel(batches: "Iterator") -> "Iterator":
    """mapInPandas kernel over binaryFile rows: (path, content) →
    WARC_SCHEMA records."""
    import pandas as pd

    cols = [
        "path", "record_id", "warc_type", "target_uri", "warc_date",
        "content_type", "http_status", "http_content_type", "payload",
        "parse_error",
    ]
    for batch in batches:
        rows = []
        for path, content in zip(batch["path"], batch["content"]):
            for rec in iter_warc_records(bytes(content), path):
                rows.append([rec.get(c) for c in cols])
        df = pd.DataFrame(rows, columns=cols)
        df["http_status"] = pd.array(df["http_status"], dtype="Int32")
        yield df


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (glob ok; .warc and .warc.gz) → one
    row per record, WARC_SCHEMA. One task per file (see module doc
    for why that is the correct sharding for this format)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(warc_kernel, WARC_SCHEMA)


def crawl_documents(spark: SparkSession, path: str) -> DataFrame:
    """The curation-facing view: successful HTML responses only,
    decoded to text — (doc_id, url, fetched_at, html). doc_id is the
    64-bit hash of the record id (stable, content-independent).

    Charset: the HTTP Content-Type's ``charset=`` is honored across
    the charsets Spark's ``decode`` supports (UTF-8/16 variants,
    ISO-8859-1, US-ASCII); windows-1252 maps to its ISO-8859-1
    superset-in-the-printable-range (the 0x80-0x9F punctuation
    differs — documented approximation), everything else falls back
    to UTF-8. ``decode`` cannot take a per-row charset column, hence
    the branch chain — still one codegen'd projection, zero UDF."""
    recs = read_warc(spark, path)
    html = recs.filter(
        F.col("parse_error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").rlike("(?i)text/html")
    )
    cs = F.lower(
        F.regexp_extract(F.col("http_content_type"), r"(?i)charset=([\w-]+)", 1)
    )
    decoded = (
        F.when(
            cs.isin("iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252"),
            F.decode("payload", "ISO-8859-1"),
        )
        .when(cs.isin("us-ascii", "ascii"), F.decode("payload", "US-ASCII"))
        .when(cs.isin("utf-16", "utf16"), F.decode("payload", "UTF-16"))
        .otherwise(F.decode("payload", "UTF-8"))
    )
    return html.select(
        F.xxhash64("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        decoded.alias("html"),
    )
