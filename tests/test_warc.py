"""WARC source: spec-conformant framing (version line, CRLF headers,
Content-Length delimiting, two-blank-line separators, multi-member
gzip), HTTP envelope stripping, S4 parse-error rows, and the
end-to-end crawl → extract_text pipeline."""

from __future__ import annotations

import gzip

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.warc import (
    crawl_documents,
    iter_warc_records,
    read_warc,
)


def _record(
    wtype: str,
    payload: bytes,
    uri: str | None = None,
    rec_id: str = "<urn:uuid:1>",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    h = [
        b"WARC/1.1",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: " + rec_id.encode(),
        b"WARC-Date: 2026-08-14T00:00:00Z",
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        h.append(b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


_HTML = b"<html><head><title>T1</title></head><body><p>hello warc</p></body></html>"


def _sample_warc() -> bytes:
    return (
        _record("warcinfo", b"software: test\r\n", content_type="application/warc-fields")
        + _record("request", _http(b"", 0, "x"), uri="http://a.example/",
                  rec_id="<urn:uuid:req>",
                  content_type="application/http; msgtype=request")
        + _record("response", _http(_HTML), uri="http://a.example/",
                  rec_id="<urn:uuid:2>")
        + _record("response", _http(b"gone", 404, "text/html"),
                  uri="http://a.example/404", rec_id="<urn:uuid:3>")
        + _record("response", _http(b"\x89PNG...", 200, "image/png"),
                  uri="http://a.example/logo", rec_id="<urn:uuid:4>")
    )


def test_iter_records_plain_and_multimember_gzip():
    plain = _sample_warc()
    recs = list(iter_warc_records(plain, "f.warc"))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response",
    ]
    ok = recs[2]
    assert ok["http_status"] == 200
    assert ok["http_content_type"] == "text/html"
    assert ok["payload"] == _HTML
    assert ok["target_uri"] == "http://a.example/"
    assert all(r["parse_error"] is None for r in recs)

    # spec shape: one gzip member per record, concatenated
    members = b"".join(
        gzip.compress(m)
        for m in (
            _record("response", _http(_HTML), uri="http://b.example/", rec_id="<urn:uuid:5>"),
            _record("response", _http(b"two"), uri="http://b.example/2", rec_id="<urn:uuid:6>"),
        )
    )
    grecs = list(iter_warc_records(members, "f.warc.gz"))
    assert len(grecs) == 2 and grecs[1]["payload"] == b"two"


def test_malformed_framing_degrades_to_error_row():
    # truncated payload: Content-Length larger than remaining bytes
    bad = _record("response", _http(_HTML))[:-20]
    recs = list(iter_warc_records(bad, "t.warc"))
    assert recs[-1]["parse_error"] is not None
    # garbage prefix: not a WARC version line
    recs2 = list(iter_warc_records(b"NOT A WARC\r\n\r\n", "g.warc"))
    assert len(recs2) == 1 and "WARC version" in recs2[0]["parse_error"]
    # bad gzip magic with corrupt stream: one error row
    recs3 = list(iter_warc_records(b"\x1f\x8bgarbage", "b.warc.gz"))
    assert len(recs3) == 1 and recs3[0]["parse_error"] is not None


def test_read_warc_and_crawl_documents(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(_sample_warc())
    (d / "b.warc.gz").write_bytes(
        gzip.compress(
            _record(
                "response",
                _http("<p>latin \xe9</p>".encode("latin-1"), 200,
                      "text/html; charset=ISO-8859-1"),
                uri="http://c.example/",
                rec_id="<urn:uuid:7>",
            )
        )
    )
    recs = read_warc(spark, str(d))
    assert recs.count() == 6
    by_type = {
        (r["warc_type"], r["http_status"]) for r in recs.collect()
    }
    assert ("response", 200) in by_type and ("warcinfo", None) in by_type

    docs = crawl_documents(spark, str(d)).collect()
    # only 200 text/html responses survive: uuid:2 and uuid:7
    assert len(docs) == 2
    by_url = {r["url"]: r for r in docs}
    assert "hello warc" in by_url["http://a.example/"]["html"]
    # charset= in the HTTP Content-Type is honored
    assert "latin é" in by_url["http://c.example/"]["html"]
    ids = [r["doc_id"] for r in docs]
    assert len(set(ids)) == 2 and all(isinstance(i, int) for i in ids)


def test_warc_to_extraction_pipeline(spark, tmp_path):
    """The full crawl front half: WARC bytes → HTML documents →
    extract_text — titles and text land, chrome formats are already
    filtered by status/content-type."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
        extract_text,
    )

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "c.warc").write_bytes(_sample_warc())
    docs = crawl_documents(spark, str(d))
    feats = extract_text(docs, html_col="html").collect()
    assert len(feats) == 1
    assert feats[0]["title"] == "T1"
    assert feats[0]["text"] == "hello warc"


def test_truncated_gzip_member_keeps_prior_records():
    """Self-review r5: the gzip stream is read STREAMING, so a
    truncated final member costs that member, not the whole file
    (gzip.decompress-up-front returned zero records for a 50k-record
    file with one bad tail)."""
    good = gzip.compress(
        _record("response", _http(_HTML), uri="http://k.example/", rec_id="<urn:uuid:g>")
    )
    bad = gzip.compress(
        _record("response", _http(b"lost"), uri="http://k.example/2", rec_id="<urn:uuid:h>")
    )[:-8]
    recs = list(iter_warc_records(good + bad, "t.warc.gz"))
    assert recs[0]["parse_error"] is None
    assert recs[0]["target_uri"] == "http://k.example/"
    assert recs[-1]["parse_error"] is not None


def test_malformed_bytes_decode_with_replacement_never_fail(spark, tmp_path):
    """Self-review r5 (live-repro'd): Spark's decode expression
    aborts the JOB on the first malformed byte — the kernel decodes
    instead, with errors='replace', so a mislabeled page yields
    replacement characters and the crawl continues."""
    bad_utf8 = b"<p>ok \xff\xfe broken</p>"
    d = tmp_path / "c"
    d.mkdir()
    (d / "x.warc").write_bytes(
        _record("response", _http(bad_utf8), uri="http://m.example/", rec_id="<urn:uuid:m>")
    )
    docs = crawl_documents(spark, str(d)).collect()
    assert len(docs) == 1
    assert "ok \ufffd\ufffd broken" in docs[0]["html"]


def test_charset_labels_quoted_utf16_and_unknown():
    """Quoted charset= values (RFC 7231), UTF-16LE labels, and
    unknown labels (fall back to UTF-8+replace) all decode in the
    kernel."""
    quoted = _record(
        "response",
        _http("<p>caf\xe9</p>".encode("latin-1"), 200, 'text/html; charset="iso-8859-1"'),
        uri="u://q", rec_id="<urn:uuid:q>",
    )
    rec = next(iter_warc_records(quoted))
    assert "café" in rec["text"]
    u16 = "<p>wide</p>".encode("utf-16-le")
    rec2 = next(
        iter_warc_records(
            _record("response", _http(u16, 200, "text/html; charset=utf-16le"),
                    uri="u://w", rec_id="<urn:uuid:w>")
        )
    )
    assert "wide" in rec2["text"]
    rec3 = next(
        iter_warc_records(
            _record("response", _http(b"<p>x</p>", 200, "text/html; charset=bogus-enc"),
                    uri="u://b", rec_id="<urn:uuid:b>")
        )
    )
    assert rec3["text"] == "<p>x</p>"


def test_http_transfer_and_content_encodings():
    """chunked framing is removed, gzip/deflate bodies decompress,
    brotli (no stdlib codec) yields no text but keeps the payload."""
    body = b"<p>chunked gz</p>"
    gz = gzip.compress(body)
    chunked = (
        hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    )
    msg = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n" + chunked
    )
    rec = next(
        iter_warc_records(_record("response", msg, uri="u://c", rec_id="<urn:uuid:c>"))
    )
    assert rec["text"] == "<p>chunked gz</p>"
    assert rec["payload"] == body

    import zlib

    defl = zlib.compress(b"<p>deflated</p>")
    msg2 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: deflate\r\n\r\n" + defl
    )
    rec2 = next(
        iter_warc_records(_record("response", msg2, uri="u://d", rec_id="<urn:uuid:d>"))
    )
    assert rec2["text"] == "<p>deflated</p>"

    msg3 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: br\r\n\r\n" + b"\x8b\x02\x80brotli-bytes"
    )
    rec3 = next(
        iter_warc_records(_record("response", msg3, uri="u://e", rec_id="<urn:uuid:e>"))
    )
    assert rec3["text"] is None and rec3["payload"] == b"\x8b\x02\x80brotli-bytes"


def test_lf_only_head_with_crlf_in_body():
    """Self-review r5: the head/body split takes the EARLIEST
    separator — an LF-only-header message whose body contains
    CRLFCRLF previously split inside the body."""
    msg = (
        b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n"
        b"<p>first</p>\r\n\r\n<p>second</p>"
    )
    rec = next(
        iter_warc_records(_record("response", msg, uri="u://lf", rec_id="<urn:uuid:lf>"))
    )
    assert rec["http_status"] == 200
    assert rec["text"] == "<p>first</p>\r\n\r\n<p>second</p>"


def test_missing_record_ids_do_not_collide(spark, tmp_path):
    """Self-review r5: xxhash64(NULL) is a constant, so records from
    writers that omit WARC-Record-ID would all share one doc_id; the
    fallback hashes path|uri|date instead."""
    def no_id(uri):
        h = (
            b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
        )
        payload = _http(b"<p>" + uri.encode() + b"</p>")
        h += b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        return h + b"\r\n" + payload + b"\r\n\r\n"

    d = tmp_path / "nid"
    d.mkdir()
    (d / "n.warc").write_bytes(no_id("http://n.example/1") + no_id("http://n.example/2"))
    docs = crawl_documents(spark, str(d)).collect()
    assert len(docs) == 2
    assert len({r["doc_id"] for r in docs}) == 2


def test_warc_roundtrip_property_fuzz():
    """Hypothesis: any set of records (arbitrary binary payloads,
    arbitrary URIs, plain or per-member-gzip'd) survives write →
    parse with payloads byte-identical and order preserved."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8)

    @settings(max_examples=30, deadline=None)
    @given(ps=payloads, gz=st.booleans())
    def check(ps, gz):
        raw = b""
        for i, p in enumerate(ps):
            rec = _record(
                "resource", p, uri=f"http://f.example/{i}",
                rec_id=f"<urn:uuid:fz{i}>", content_type="application/octet-stream",
            )
            raw += gzip.compress(rec) if gz else rec
        recs = list(iter_warc_records(raw, "fz.warc"))
        assert [r["parse_error"] for r in recs] == [None] * len(ps)
        assert [r["payload"] for r in recs] == ps
        assert [r["target_uri"] for r in recs] == [
            f"http://f.example/{i}" for i in range(len(ps))
        ]

    check()


def test_warc_arbitrary_garbage_never_raises():
    """Any byte soup fed to the parser yields rows (possibly one
    error row) — never an exception escaping to the task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=400))
    def check(junk):
        for prefix in (b"", b"WARC/1.1\r\n", b"\x1f\x8b"):
            list(iter_warc_records(prefix + junk, "junk.warc"))

    check()
