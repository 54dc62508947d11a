"""Email ingestion (eml / mbox on the stdlib email package):
header decoding, body selection (plain-over-html, html through the
crawl extractor), attachment counting, mboxrd splitting and
unescaping, hostile shapes, and the Spark kernel."""

from __future__ import annotations

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.email_text import (
    email_text,
    extract_email,
    split_mbox,
)


def _simple_eml(subject=b"s", body=b"plain body", extra=b"") -> bytes:
    return (
        b"From: Alice <alice@example.org>\r\n"
        b"To: list@example.org\r\n"
        b"Subject: " + subject + b"\r\n"
        b"Date: Mon, 10 Mar 2025 12:30:00 +0000\r\n"
        b"Message-ID: <m1@example.org>\r\n" + extra +
        b"\r\n" + body + b"\r\n"
    )


def test_simple_message_headers_and_body():
    rec = extract_email(_simple_eml())
    assert rec["subject"] == "s"
    assert rec["sender"] == "Alice <alice@example.org>"
    assert rec["message_id"] == "<m1@example.org>"
    assert rec["date_ms"] == 1741609800000
    assert rec["text"].strip() == "plain body"
    assert rec["n_attachments"] == 0


def test_rfc2047_encoded_subject_decodes():
    rec = extract_email(
        _simple_eml(subject=b"=?utf-8?q?encoded_subj=C3=A9ct?=")
    )
    assert rec["subject"] == "encoded subjéct"


def test_multipart_prefers_plain_counts_attachments():
    eml = (
        b"From: a@b\r\nSubject: mp\r\nMIME-Version: 1.0\r\n"
        b'Content-Type: multipart/mixed; boundary="B1"\r\n\r\n'
        b"--B1\r\n"
        b'Content-Type: multipart/alternative; boundary="B2"\r\n\r\n'
        b"--B2\r\nContent-Type: text/plain\r\n\r\n"
        b"the plain part\r\n"
        b"--B2\r\nContent-Type: text/html\r\n\r\n"
        b"<p>the html part</p>\r\n"
        b"--B2--\r\n"
        b"--B1\r\nContent-Type: application/pdf\r\n"
        b'Content-Disposition: attachment; filename="r.pdf"\r\n'
        b"Content-Transfer-Encoding: base64\r\n\r\n"
        b"SGVsbG8=\r\n"
        b"--B1--\r\n"
    )
    rec = extract_email(eml)
    assert rec["text"].strip() == "the plain part"
    assert rec["n_attachments"] == 1
    assert rec["attachment_bytes"] == 5  # b"Hello"


def test_html_only_goes_through_crawl_extractor():
    eml = (
        b"From: x@y\r\nSubject: h\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body><p>only html text</p>"
        b"<script>ignored()</script></body></html>\r\n"
    )
    rec = extract_email(eml)
    assert "only html text" in rec["text"]
    assert "ignored" not in rec["text"]


def test_base64_plain_part_decodes():
    eml = (
        b"From: x@y\r\nSubject: b64\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n"
        b"Content-Transfer-Encoding: base64\r\n\r\n"
        b"ZGVjb2RlZCBib2R5IHRleHQ=\r\n"
    )
    rec = extract_email(eml)
    assert rec["text"].strip() == "decoded body text"


def test_mbox_split_and_mboxrd_unescape():
    mbox = (
        b"From alice Mon Mar 10 12:30:00 2025\n"
        b"From: a@b\nSubject: first\n\nbody1\n"
        b"\nFrom bob Tue Mar 11 08:00:00 2025\n"
        b"From: bob@example.org\nSubject: second\n\n"
        b"body with\n>From munged line\n>>From double munged\n"
    )
    msgs = split_mbox(mbox)
    assert len(msgs) == 2
    r1 = extract_email(msgs[0])
    r2 = extract_email(msgs[1])
    assert (r1["subject"], r2["subject"]) == ("first", "second")
    assert "\nFrom munged line" in r2["text"]
    assert "\n>From double munged" in r2["text"]
    assert ">>From" not in r2["text"]


def test_non_mbox_and_garbage():
    assert split_mbox(b"not an mbox") == []
    assert extract_email(b"") is None
    assert extract_email(None) is None
    # headerless bytes with no text → S4
    assert extract_email(b"\x00\x01\x02\x03\x04\x05\x06\x07") is None


def test_defective_message_surfaces_what_parsed():
    # broken MIME boundary: stdlib records defects; headers survive
    eml = (
        b"From: a@b\r\nSubject: broken\r\n"
        b'Content-Type: multipart/mixed; boundary="NOPE"\r\n\r\n'
        b"no boundary markers here at all\r\n"
    )
    rec = extract_email(eml)
    assert rec is not None and rec["subject"] == "broken"


def test_deeply_nested_multipart_capped_not_crashed():
    inner = b"Content-Type: text/plain\r\n\r\ndeep body\r\n"
    for depth in range(40):
        inner = (
            b'Content-Type: multipart/mixed; boundary="B%d"\r\n\r\n'
            b"--B%d\r\n" % (depth, depth)
            + inner
            + b"\r\n--B%d--\r\n" % depth
        )
    eml = b"From: a@b\r\nSubject: deep\r\n" + inner
    rec = extract_email(eml)  # must not raise; text may be absent
    assert rec is not None and rec["subject"] == "deep"


def test_bad_date_yields_null_not_error():
    rec = extract_email(_simple_eml().replace(
        b"Mon, 10 Mar 2025 12:30:00 +0000", b"not a date"
    ))
    assert rec is not None and rec["date_ms"] is None


@pytest.mark.usefixtures("spark")
class TestKernel:
    def test_kernel_eml_and_mbox(self, spark):
        mbox = (
            b"From a Mon Jan 1 00:00:00 2025\n"
            b"From: one@x\nSubject: m0\n\nmbox body zero\n"
            b"\nFrom b Mon Jan 1 00:00:01 2025\n"
            b"From: two@x\nSubject: m1\n\nmbox body one\n"
        )
        df = spark.createDataFrame(
            [
                (1, bytearray(_simple_eml(subject=b"single"))),
                (2, bytearray(mbox)),
                (3, bytearray(b"junk not an email \x00\x01")),
            ],
            "doc_id long, blob binary",
        )
        rows = email_text(df).collect()
        got = {(r["doc_id"], r["msg_idx"]): r for r in rows}
        assert got[(1, 0)]["subject"] == "single"
        assert got[(2, 0)]["subject"] == "m0"
        assert got[(2, 1)]["subject"] == "m1"
        assert got[(2, 1)]["text"].strip() == "mbox body one"
        assert 3 not in {d for d, _ in got}


# ── review-pass regressions ─────────────────────────────────────


def test_deep_subtree_does_not_starve_shallow_sibling():
    # finding 1: an over-deep first child must not break the walk
    # before its shallow text/plain sibling
    inner = b"Content-Type: text/plain\r\n\r\ntoo deep\r\n"
    for depth in range(20):
        inner = (
            b'Content-Type: multipart/mixed; boundary="D%d"\r\n\r\n'
            b"--D%d\r\n" % (depth, depth)
            + inner + b"\r\n--D%d--\r\n" % depth
        )
    eml = (
        b"From: a@b\r\nSubject: sib\r\n"
        b'Content-Type: multipart/mixed; boundary="TOP"\r\n\r\n'
        b"--TOP\r\n" + inner +
        b"\r\n--TOP\r\nContent-Type: text/plain\r\n\r\n"
        b"the real body\r\n--TOP--\r\n"
    )
    rec = extract_email(eml)
    assert rec["text"] is not None
    assert "the real body" in rec["text"]


def test_naive_date_pinned_to_utc(monkeypatch):
    # finding 2: '-0000' parses naive; the result must not depend
    # on the executor's timezone
    import os
    import time

    eml = _simple_eml().replace(b"+0000", b"-0000")
    monkeypatch.setenv("TZ", "America/New_York")
    time.tzset()
    try:
        rec = extract_email(eml)
    finally:
        monkeypatch.setenv("TZ", "UTC")
        time.tzset()
    assert rec["date_ms"] == 1741609800000
    del os


def test_forwarded_attachment_counted_not_leaked():
    # finding 3: message/rfc822 with attachment disposition must be
    # counted, never decoded into the body
    eml = (
        b"From: a@b\r\nSubject: fwd\r\n"
        b'Content-Type: multipart/mixed; boundary="M"\r\n\r\n'
        b"--M\r\nContent-Type: text/html\r\n\r\n"
        b"<p>outer html body</p>\r\n"
        b"--M\r\nContent-Type: message/rfc822\r\n"
        b"Content-Disposition: attachment\r\n\r\n"
        b"From: secret@x\r\nSubject: inner\r\n"
        b"Content-Type: text/plain\r\n\r\nFORWARDED SECRET\r\n"
        b"--M--\r\n"
    )
    rec = extract_email(eml)
    assert "FORWARDED SECRET" not in (rec["text"] or "")
    assert "outer html body" in rec["text"]
    assert rec["n_attachments"] == 1
    # an INLINE forwarded message still contributes its body
    eml2 = eml.replace(b"Content-Disposition: attachment\r\n", b"")
    rec2 = extract_email(eml2)
    assert "FORWARDED SECRET" in rec2["text"]


def test_empty_plain_leg_falls_back_to_html():
    # finding 4
    eml = (
        b"From: a@b\r\nSubject: alt\r\n"
        b'Content-Type: multipart/alternative; boundary="A"\r\n\r\n'
        b"--A\r\nContent-Type: text/plain\r\n\r\n\r\n"
        b"--A\r\nContent-Type: text/html\r\n\r\n"
        b"<p>html body here</p>\r\n--A--\r\n"
    )
    rec = extract_email(eml)
    assert "html body here" in rec["text"]


def test_text_cap_is_bytes_not_chars():
    # finding 7: 2M CJK chars = 6 MB utf-8 — must cap at 4 MiB BYTES
    body = ("汉" * (2 << 20)).encode("utf-8")
    eml = (b"From: a@b\r\nSubject: cjk\r\n"
           b"Content-Type: text/plain; charset=utf-8\r\n\r\n" + body)
    rec = extract_email(eml)
    assert len(rec["text"].encode("utf-8")) <= (1 << 22)


# ── fast-path vs stdlib differential (r14) ──────────────────────


def test_fast_path_matches_stdlib_differential():
    """extract_email routes through the guarded fast parser; this
    pins its equivalence to the stdlib policy.default path over the
    corpus shapes, the hostile fixtures above, and truncation /
    byte-flip / insertion / line-ending fuzz. Outcomes compare
    EXCEPTIONS too (some malformed headers make the stdlib registry
    itself raise — the fast path must mirror, not mask, that)."""
    import random

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
        email_text as et,
    )

    def outcome(fn, raw):
        try:
            return ("ok", fn(raw))
        except Exception as e:  # noqa: BLE001 — parity includes raises
            return ("raise", type(e).__name__)

    cases = []
    for d in range(260):
        if d % 11 == 7:
            cases.append(b"\x00\x01\x02 headerless binary")
        elif d % 4 == 0:
            cases.append(et._eml_plain(d))
        elif d % 4 == 1:
            cases.append(et._eml_multipart(d))
        elif d % 4 == 2:
            cases.extend(et.split_mbox(et.build_mbox(d)))
        else:
            cases.append(et._eml_forward(d))
    rnd = random.Random(20260818)
    base = [
        et._eml_plain(3),
        et._eml_multipart(5),
        et._eml_forward(9),
        et.split_mbox(et.build_mbox(6))[0],
    ]
    for b in base:
        for _ in range(120):
            cases.append(b[: rnd.randrange(1, len(b))])
        for _ in range(120):
            i = rnd.randrange(len(b))
            nb = bytearray(b)
            nb[i] = rnd.randrange(256)
            cases.append(bytes(nb))
        for _ in range(60):
            i = rnd.randrange(len(b))
            cases.append(b[:i] + bytes([rnd.randrange(256)]) + b[i:])
            cases.append(b[:i] + b"\r\n" + b[i:])
        cases.append(b.replace(b"\r\n", b"\n"))
    for raw in cases:
        if not raw or len(raw) < 8:
            continue
        assert outcome(et.extract_email, raw) == outcome(
            et._extract_stdlib, raw
        ), raw[:200]


def test_fast_path_covers_the_corpus():
    # the speedup only exists if corpus shapes do NOT fall back
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
        email_text as et,
    )

    for d in (0, 1, 3, 4, 5, 9, 12, 13):
        raws = (
            [et._eml_plain(d)] if d % 4 == 0
            else [et._eml_multipart(d)] if d % 4 == 1
            else [et._eml_forward(d)]
        )
        for raw in raws:
            # raises _Unsupported if the fast envelope regressed
            rec = et._extract_from(et._fast_message(raw))
            assert rec is not None
    for raw in et.split_mbox(et.build_mbox(6)):
        assert et._extract_from(et._fast_message(raw)) is not None


# ── synthetic corpus + driver-row leg (r11) ─────────────────────


def test_corpus_deterministic_and_shape_coverage():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.email_text import (  # noqa: E501
        _eml_forward,
        _eml_multipart,
        _eml_plain,
        build_mbox,
        extract_email,
        split_mbox,
    )

    for d in range(120):
        assert _eml_plain(d) == _eml_plain(d)
        assert build_mbox(d) == build_mbox(d)
        p = extract_email(_eml_plain(d))
        assert p and p["date_ms"] is not None and "café" in p["text"]
        m = extract_email(_eml_multipart(d))
        # html-funnel body + one counted (never decoded) attachment
        assert m and "Html body" in m["text"] and "<b>" not in m["text"]
        assert m["n_attachments"] == 1 and m["attachment_bytes"] > 0
        assert "café" in m["subject"]  # RFC 2047 decode
        f = extract_email(_eml_forward(d))
        assert f and "Plain body" in f["text"]  # message/rfc822 walk
        msgs = split_mbox(build_mbox(d))
        assert len(msgs) == 2 + d % 2
        r0 = extract_email(msgs[0])
        assert r0 and ">From the munged" not in r0["text"]
        assert "From the munged" in r0["text"]  # mboxrd unescape


@pytest.mark.usefixtures("spark")
class TestCorpusKernel:
    def test_kernel_equals_driver_over_corpus(self, spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.email_text import (  # noqa: E501
            _eml_forward,
            _eml_multipart,
            _eml_plain,
            build_mbox,
            email_text,
            extract_email,
            split_mbox,
            synthetic_email_corpus,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
        from pyspark.sql import functions as F

        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 60
        )
        got = {}
        for r in email_text(
            synthetic_email_corpus(docs).select("doc_id", "blob")
        ).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["msg_idx"], r["subject"], r["message_id"],
                 r["date_ms"], r["text"], r["n_parts"],
                 r["n_attachments"], r["attachment_bytes"])
            )
        for d in range(60):
            if d % 11 == 7:
                assert d not in got, d  # headerless binary → S4
                continue
            if d % 4 == 2:
                raws = split_mbox(build_mbox(d))
            elif d % 4 == 0:
                raws = [_eml_plain(d)]
            elif d % 4 == 1:
                raws = [_eml_multipart(d)]
            else:
                raws = [_eml_forward(d)]
            want = []
            for idx, raw in enumerate(raws):
                rec = extract_email(raw)
                want.append(
                    (idx, rec["subject"], rec["message_id"],
                     rec["date_ms"], rec["text"], rec["n_parts"],
                     rec["n_attachments"], rec["attachment_bytes"])
                )
            assert sorted(got[d]) == sorted(want), d
