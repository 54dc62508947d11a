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
    # bad gzip magic with corrupt stream
    recs3 = list(iter_warc_records(b"\x1f\x8bgarbage", "b.warc.gz"))
    assert recs3[0]["parse_error"].startswith("gzip")


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
