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
  headers + body. The DOCUMENT text therefore needs the HTTP
  envelope stripped AND the transfer undone: ``Transfer-Encoding:
  chunked`` framing is removed, ``Content-Encoding: gzip/deflate``
  bodies are decompressed (brotli has no stdlib codec — such rows
  keep the raw payload and no text), and the body is decoded using
  the Content-Type's ``charset=`` (quoted or bare; any Python codec;
  UTF-8 fallback) with ``errors="replace"`` — a mislabeled or
  corrupt page yields replacement characters, NEVER a task failure.
  That decode happens INSIDE the record-splitter kernel on purpose:
  Spark's ``decode`` expression hard-fails the whole job on the
  first malformed byte (MALFORMED_CHARACTER_CODING), which no crawl
  survives;
- ``.warc.gz`` files are MULTI-MEMBER gzip streams (one member per
  record, per the spec's recommendation) — read STREAMING through
  ``gzip.GzipFile``, so a truncated final member still yields every
  record before it (matching the plain-file behavior), and the full
  decompressed file is never materialized next to the raw bytes.

Spark integration and the 100 TB story: files load through the
``binaryFile`` source and split into records by an Arrow-batched
``mapInPandas`` kernel — one task per WARC file, yielding bounded
row chunks. That per-FILE parallelism is not a local shortcut, it is
how production crawl processing shards: gzip members are only
forward-seekable, so every real system assigns whole .warc.gz files
to workers; a snapshot's ~100k files saturate any cluster. A
malformed record degrades to a row with ``parse_error`` set (S4
per-record skip); broken framing ends that FILE's iteration (the
Content-Length chain is the only record delimiter) after yielding
everything before the break. ``binaryFile`` rows are not split, so
executor memory is bounded by the largest single raw file + one row
chunk — size shards accordingly (Common Crawl uses ~1 GiB).
"""

from __future__ import annotations

import gzip
import io
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, payload binary, text string, "
    "parse_error string"
)

_CRLF = b"\r\n"

#: rows per pandas chunk the kernel yields (bounds executor memory to
#: raw-file bytes + one chunk, instead of every payload at once)
_KERNEL_CHUNK_ROWS = 1000

_CHARSET_RE = re.compile(r"(?i)charset=[\"']?([\w.:+-]+)")


def _read_headers(buf) -> dict[str, str] | None:
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


def _dechunk(body: bytes) -> bytes | None:
    """Undo Transfer-Encoding: chunked framing, or None when the
    framing is broken (caller keeps the raw bytes then)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\n", pos)
        if nl < 0:
            return None
        size_tok = body[pos:nl].strip().split(b";", 1)[0]
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = nl + 1
        if size == 0:
            return bytes(out)
        chunk = body[pos : pos + size]
        if len(chunk) != size:
            return None
        out += chunk
        pos += size
        # chunk data is followed by CRLF (tolerate LF)
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
        else:
            return None


def _split_http(block: bytes):
    """(status, content_type, body, text) from an HTTP message block
    — transfer undone (chunked, gzip/deflate) and the body decoded
    per the declared charset with replacement; (None, None, block,
    None) when no HTTP envelope is present, and text=None when the
    body is not decodable text (non-text type, brotli, broken
    framing)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block, None
    # earliest head/body separator wins: trying CRLFCRLF first would
    # mis-split an LF-only-header message whose BODY contains CRLFs
    i_crlf = block.find(b"\r\n\r\n")
    i_lf = block.find(b"\n\n")
    if i_crlf < 0 and i_lf < 0:
        return None, None, block, None
    if i_crlf >= 0 and (i_lf < 0 or i_crlf <= i_lf):
        head, body = block[:i_crlf], block[i_crlf + 4 :]
    else:
        head, body = block[:i_lf], block[i_lf + 2 :]
    lines = head.split(b"\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, block, None
    ctype = cenc = tenc = None
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        key = name.strip().lower()
        if key == b"content-type":
            ctype = value.strip().decode("utf-8", "replace")
        elif key == b"content-encoding":
            cenc = value.strip().lower()
        elif key == b"transfer-encoding":
            tenc = value.strip().lower()

    if tenc and b"chunked" in tenc:
        dechunked = _dechunk(body)
        if dechunked is None:
            return status, ctype, body, None
        body = dechunked
    if cenc in (b"gzip", b"x-gzip"):
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError):
            return status, ctype, body, None
    elif cenc == b"deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -15)  # raw-deflate servers
            except zlib.error:
                return status, ctype, body, None
    elif cenc not in (None, b"", b"identity"):
        return status, ctype, body, None  # brotli etc.: no stdlib codec

    text = None
    if ctype and ctype.split(";")[0].strip().lower().startswith("text/"):
        m = _CHARSET_RE.search(ctype)
        charset = m.group(1) if m else "utf-8"
        try:
            text = body.decode(charset, errors="replace")
        except LookupError:  # unknown label → the crawl-wide default
            text = body.decode("utf-8", errors="replace")
    return status, ctype, body, text


def iter_warc_records(raw: bytes, path: str = ""):
    """Parse one WARC file's bytes (gzip'd or plain; multi-member
    gzip per the spec, read streaming) into WARC_SCHEMA-shaped dicts.
    Broken framing yields ONE row with ``parse_error`` set and ends
    the file's iteration — records BEFORE the break are yielded
    normally (a truncated final gzip member costs that member, not
    the file)."""
    if raw[:2] == b"\x1f\x8b":
        buf = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
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
        status = http_ctype = text = None
        payload = block
        if wtype == "response" and ctype.startswith("application/http"):
            status, http_ctype, payload, text = _split_http(block)
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
            "text": text,
            "parse_error": None,
        }


_COLS = [
    "path", "record_id", "warc_type", "target_uri", "warc_date",
    "content_type", "http_status", "http_content_type", "payload",
    "text", "parse_error",
]


def warc_kernel(batches: "Iterator") -> "Iterator":
    """mapInPandas kernel over binaryFile rows: (path, content) →
    WARC_SCHEMA records, yielded in bounded chunks so executor memory
    holds the raw file plus ONE chunk of rows, not every payload at
    once."""
    import pandas as pd

    def frame(rows):
        df = pd.DataFrame(rows, columns=_COLS)
        df["http_status"] = pd.array(df["http_status"], dtype="Int32")
        return df

    for batch in batches:
        rows = []
        for path, content in zip(batch["path"], batch["content"]):
            for rec in iter_warc_records(bytes(content), path):
                rows.append([rec.get(c) for c in _COLS])
                if len(rows) >= _KERNEL_CHUNK_ROWS:
                    yield frame(rows)
                    rows = []
        if rows:
            yield frame(rows)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (glob ok; .warc and .warc.gz) → one
    row per record, WARC_SCHEMA. One task per file (see module doc
    for why that is the correct sharding for this format)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(warc_kernel, WARC_SCHEMA)


def crawl_documents(spark: SparkSession, path: str) -> DataFrame:
    """The curation-facing view: successful decodable HTML responses
    only — (doc_id, url, fetched_at, html). The html column is the
    kernel's charset-aware replacement-decoded text (see module doc
    for why the decode cannot be a Spark expression). doc_id is the
    64-bit hash of the record id, falling back to
    path|target_uri|warc_date when a sloppy writer omitted
    WARC-Record-ID (hashing a constant null would collide every such
    record onto one id)."""
    recs = read_warc(spark, path)
    html = recs.filter(
        F.col("parse_error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").rlike("(?i)text/html")
        & F.col("text").isNotNull()
    )
    return html.select(
        F.xxhash64(
            F.coalesce(
                F.col("record_id"),
                F.concat_ws("|", "path", "target_uri", "warc_date"),
            )
        ).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        F.col("text").alias("html"),
    )
