"""Office text extraction (docx/pptx/odt = zip + XML on the
in-repo archive layer): fixture round trips, whitespace-element
semantics, hostile-XML refusal (DTD/ENTITY pre-parse), damaged-part
tolerance, sniffing from member names, and the Spark kernel with a
landing-zone composition (tar drop → archive_extract →
office_text)."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.office import (
    encode_docx,
    encode_odt,
    encode_pptx,
    extract_office_text,
    office_text,
    sniff_office,
)


def test_docx_roundtrip_runs_and_escapes():
    blob = encode_docx(
        ["First paragraph.", ["Two ", "runs joined."],
         "Dash — & <escaped>."]
    )
    assert sniff_office(blob) == "docx"
    rows = extract_office_text(blob)
    assert [r["text"] for r in rows] == [
        "First paragraph.", "Two runs joined.", "Dash — & <escaped>.",
    ]
    assert all(r["kind"] == "docx" for r in rows)
    assert [r["part"] for r in rows] == [0, 1, 2]


def test_docx_tabs_and_breaks_hand_built():
    # hand-write the XML (independent of encode_docx) with w:tab
    # and w:br elements interleaved in runs
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>c</w:t></w:r></w:p>"
        "<w:p><w:r><w:cr/><w:t>d</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    rows = extract_office_text(buf.getvalue())
    assert [r["text"] for r in rows] == ["a\tb\nc", "\nd"]


def test_docx_table_cells_in_document_order():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>cell A</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>cell B</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:t>after table</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    rows = extract_office_text(buf.getvalue())
    assert [r["text"] for r in rows] == ["cell A", "cell B",
                                        "after table"]


def test_pptx_slide_order_numeric_not_lexicographic():
    blob = encode_pptx(
        [["s%d" % i] for i in range(1, 13)]  # slide12 after slide2
    )
    rows = extract_office_text(blob)
    assert [r["part"] for r in rows] == list(range(1, 13))
    assert rows[-1]["text"] == "s12"


def test_pptx_damaged_slide_siblings_extract():
    blob = encode_pptx([["good one"], ["broken"], ["good two"]])
    mut = bytearray(blob)
    # corrupt slide2's deflate payload
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        info = z.getinfo("ppt/slides/slide2.xml")
    start = blob.find(b"slide2.xml") + len(b"slide2.xml")
    mut[start + 4] ^= 0xFF
    rows = extract_office_text(bytes(mut))
    texts = [r["text"] for r in rows]
    assert "good one" in texts and "good two" in texts
    assert "broken" not in texts
    del info


def test_odt_whitespace_elements():
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:'
        'tc:opendocument:xmlns:text:1.0"><office:body><office:text>'
        "<text:p>a<text:tab/>b<text:line-break/>c</text:p>"
        '<text:p>x<text:s text:c="3"/>y</text:p>'
        "<text:h>heading</text:h>"
        "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype",
                   "application/vnd.oasis.opendocument.text",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("content.xml", content)
    rows = extract_office_text(buf.getvalue())
    assert [r["text"] for r in rows] == ["a\tb\nc", "x   y", "heading"]


def test_dtd_and_entity_refused():
    for payload in (
        "<!DOCTYPE x [<!ENTITY a 'b'>]><w:document/>",
        '<?xml version="1.0"?><w:document xmlns:w="u">'
        "<!ENTITY bomb 'x'></w:document>",
    ):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", payload)
        assert extract_office_text(buf.getvalue()) is None


def test_non_office_zip_and_garbage():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("data.csv", "a,b\n1,2")
    assert sniff_office(buf.getvalue()) is None
    assert extract_office_text(buf.getvalue()) is None
    assert extract_office_text(b"plain text") is None
    assert extract_office_text(b"") is None


def test_truncation_sweep_never_raises():
    blob = encode_docx(["sweep paragraph " * 10] * 3)
    for cut in range(0, len(blob), 19):
        r = extract_office_text(blob[:cut])
        assert r is None or isinstance(r, list)


@pytest.mark.usefixtures("spark")
class TestKernel:
    def test_kernel_equals_driver_and_mixed_kinds(self, spark):
        blobs = [
            (1, encode_docx(["doc one para %d" % i for i in range(3)])),
            (2, encode_pptx([["deck slide a"], ["deck slide b"]])),
            (3, encode_odt(["odt text."])),
            (4, b"not an office doc"),
        ]
        df = spark.createDataFrame(
            [(d, bytearray(b)) for d, b in blobs],
            "doc_id long, blob binary",
        )
        rows = office_text(df).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(
                (r["kind"], r["part"], r["text"])
            )
        for d, blob in blobs:
            ref = extract_office_text(blob)
            if ref is None:
                assert d not in got
                continue
            assert sorted(got[d]) == sorted(
                (r["kind"], r["part"], r["text"]) for r in ref
            )
        assert {k for rs in got.values() for k, _, _ in rs} == {
            "docx", "pptx", "odt"
        }

    def test_landing_zone_composition(self, spark):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.archives import (  # noqa: E501
            archive_extract,
        )

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            for name, payload in [
                ("drop/a.docx", encode_docx(["word body text"])),
                ("drop/b.pptx", encode_pptx([["deck text"]])),
            ]:
                ti = tarfile.TarInfo(name)
                ti.size = len(payload)
                t.addfile(ti, io.BytesIO(payload))
        drop = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "doc_id long, blob binary"
        )
        from pyspark.sql import functions as F

        members = archive_extract(drop).select(
            F.monotonically_increasing_id().alias("doc_id"), "blob"
        )
        texts = {r["text"] for r in office_text(members).collect()}
        assert texts == {"word body text", "deck text"}


# ── review-pass regressions ─────────────────────────────────────


def test_utf16_entity_bomb_refused():
    # a UTF-16 part NUL-interleaves the markers — the guard must
    # scan in the part's encoding (finding 1)
    bomb = (
        '<?xml version="1.0" encoding="utf-16"?>'
        "<!DOCTYPE r [<!ENTITY a 'bbbbbbbb'>]>"
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>&a;&a;</w:t></w:r></w:p>"
        "</w:body></w:document>"
    ).encode("utf-16")  # with BOM
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", bomb)
    assert extract_office_text(buf.getvalue()) is None


def test_deeply_nested_odt_never_crashes():
    # 5000 nested spans: the iterative walker must not hit the
    # recursion limit (finding 2)
    inner = "deep"
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:'
        'tc:opendocument:xmlns:text:1.0"><office:body><office:text>'
        "<text:p>" + "<text:span>" * 5000 + inner
        + "</text:span>" * 5000 + "</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype",
                   "application/vnd.oasis.opendocument.text",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("content.xml", content)
    rows = extract_office_text(buf.getvalue())
    assert rows is not None and rows[0]["text"] == "deep"


def test_nested_paragraphs_not_double_extracted():
    # ODT footnote body: the nested text:p is its own row, NOT
    # merged into the enclosing paragraph too (finding 3)
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:'
        'tc:opendocument:xmlns:text:1.0"><office:body><office:text>'
        "<text:p>body<text:note><text:note-body>"
        "<text:p>footnote</text:p>"
        "</text:note-body></text:note> tail</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype",
                   "application/vnd.oasis.opendocument.text",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("content.xml", content)
    rows = extract_office_text(buf.getvalue())
    texts = [r["text"] for r in rows]
    assert texts == ["body tail", "footnote"], texts
    # DOCX textbox content likewise
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>outer</w:t>"
        "<w:txbxContent><w:p><w:r><w:t>boxed</w:t></w:r></w:p>"
        "</w:txbxContent></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    rows = extract_office_text(buf.getvalue())
    assert [r["text"] for r in rows] == ["outer", "boxed"]


def test_pptx_numbering_gap_keeps_slide_identity():
    # slide1 + slide3 with no slide2: parts must be [1, 3]
    # (finding 5)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        for n, text in [(1, "one"), (3, "three")]:
            z.writestr(
                "ppt/slides/slide%d.xml" % n,
                '<p:sld xmlns:p="p" xmlns:a="http://schemas.'
                'openxmlformats.org/drawingml/2006/main">'
                "<a:p><a:r><a:t>%s</a:t></a:r></a:p></p:sld>" % text,
            )
    rows = extract_office_text(buf.getvalue())
    assert [(r["part"], r["text"]) for r in rows] == [
        (1, "one"), (3, "three")
    ]


def test_doctype_past_4k_refused():
    # a DOCTYPE pushed past 4 KiB by a leading comment used to slip
    # the (windowed) pre-expat scan (advice catch r10) — the guard
    # must scan the whole buffer in both encodings
    pad = "<!-- " + "x" * 5000 + " -->"
    payload = (
        '<?xml version="1.0"?>' + pad
        + '<!DOCTYPE w:document SYSTEM "http://example.com/evil.dtd">'
        + '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body><w:p><w:r>'
        "<w:t>hi</w:t></w:r></w:p></w:body></w:document>"
    )
    for data in (payload.encode("utf-8"), payload.encode("utf-16")):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", data)
        assert extract_office_text(buf.getvalue()) is None
