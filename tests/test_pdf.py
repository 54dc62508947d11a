"""PDF structure + text extraction: the parser pinned against
HAND-BUILT byte-level fixtures (written object-by-object from ISO
32000-1's published layouts — independent of the module's own
encoder, so encoder and parser cannot co-confirm a misreading),
the published LZW example vector, encoder round trips across wire
shapes (classic xref / xref stream + ObjStm, Flate, WinAnsi and
Type0/ToUnicode fonts), filter units, bomb guards, truncation and
bit-flip sweeps, and the Spark kernels over the synthetic corpus."""

from __future__ import annotations

import zlib

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (
    _Bomb,
    _Lexer,
    _PdfDoc,
    _Truncated,
    _ascii85,
    _asciihex,
    _flate,
    _lzw,
    _parse_object,
    _parse_tounicode,
    _predictor,
    _runlength,
    encode_pdf,
    extract_pdf_text,
    parse_pdf_meta,
    pdf_meta,
    pdf_text,
    synthetic_pdf_corpus,
)


# ── hand-built classic-xref fixture ─────────────────────────────


def _classic_pdf(objects: dict, root: int = 1, extra_trailer: str = "",
                 clip_tail: int = 0) -> bytes:
    """Assemble a classic-xref PDF from {num: body} object bodies —
    byte-level, independent of encode_pdf."""
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_off = len(buf)
    size = max(objects) + 1
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for num in range(1, size):
        buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R %s>>\nstartxref\n%d\n%%%%EOF"
        % (size, root, extra_trailer.encode(), xref_off)
    )
    out = bytes(buf)
    return out[:-clip_tail] if clip_tail else out


def _page_fixture(content: bytes, resources: bytes = b"", extra: dict
                  | None = None) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           b"/Resources << /Font << /F1 5 0 R >> " + resources + b">> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
           b"/Encoding /WinAnsiEncoding >>",
    }
    if extra:
        objs.update(extra)
    return _classic_pdf(objs)


def test_hand_built_minimal_meta_and_text():
    blob = _page_fixture(
        b"BT /F1 12 Tf 72 720 Td (Hand-built fixture line.) Tj ET"
    )
    m = parse_pdf_meta(blob)
    assert m == {
        "version": "1.4", "n_pages": 1, "n_objects": 5,
        "encrypted": False, "decryptable": False,
        "has_xref_stream": False,
        "has_object_streams": False, "recovered_xref": False,
        "title": None, "producer": None,
    }
    t = extract_pdf_text(blob)
    assert [p["text"] for p in t] == ["Hand-built fixture line."]
    assert t[0]["unmapped_chars"] == 0


def test_resources_inherited_from_pages_node():
    # the page dict above carries NO /Resources — §7.7.3.4
    # inheritance from the Pages node must supply the font
    blob = _page_fixture(b"BT /F1 10 Tf 10 10 Td (inh) Tj ET")
    assert extract_pdf_text(blob)[0]["text"] == "inh"


def test_td_tstar_quote_and_tm_newlines():
    content = (
        b"BT /F1 12 Tf 20 700 Td (first) Tj "
        b"14 TL T* (second) Tj "
        b"(third) ' "
        b"1 0 0 1 20 600 Tm (fourth) Tj ET"
    )
    blob = _page_fixture(content)
    assert extract_pdf_text(blob)[0]["text"] == (
        "first\nsecond\nthird\nfourth"
    )


def test_tj_array_adjustment_inserts_space():
    content = (
        b"BT /F1 12 Tf 0 0 Td [(Hello) -300 (world)] TJ "
        b"[(jo) -20 (ined)] TJ ET"
    )
    blob = _page_fixture(content)
    # -300 crosses the documented 180-milliem threshold; -20 doesn't.
    # The second TJ continues the same baseline; its x starts where
    # the heuristic advance left off, so no gap-space either.
    assert extract_pdf_text(blob)[0]["text"] == "Hello worldjoined"


def test_literal_string_escapes_and_eol_normalization():
    lex = _Lexer(b"(a\\(b\\)c\\\\d\\n\\t\\101 \\zq)")
    assert lex.next_token() == b"a(b)c\\d\n\tA zq"
    # raw CR, CRLF, LF inside a literal all read as LF (§7.3.4.2)
    lex = _Lexer(b"(x\ry\r\nz\nw)")
    assert lex.next_token() == b"x\ny\nz\nw"
    # line continuation: backslash-EOL vanishes
    lex = _Lexer(b"(ab\\\ncd)")
    assert lex.next_token() == b"abcd"


def test_hex_string_odd_padding_and_name_escapes():
    lex = _Lexer(b"<48656C6C6F2")
    with pytest.raises(_Truncated):
        lex.next_token()  # unterminated
    lex = _Lexer(b"<48656C6C6F2>")
    assert lex.next_token() == b"Hello "  # odd digit pads with 0
    lex = _Lexer(b"/A#20B#2FC")
    assert str(lex.next_token()) == "A B/C"


def test_indirect_ref_lookahead_does_not_eat_numbers():
    # "1 2 3" is three numbers; "1 0 R" is a reference
    lex = _Lexer(b"[1 2 3 1 0 R 4]")
    arr = _parse_object(lex)
    assert arr[:3] == [1, 2, 3]
    assert tuple(arr[3]) == (1, 0)
    assert arr[4] == 4


# ── filters ─────────────────────────────────────────────────────


def test_lzw_published_example_vector():
    # hand-derived vector in the ISO 32000-1 §7.4.4 example's shape:
    # input bytes (decimal) 45*5, 65, 45*3, 66 → 9-bit code stream
    # 256, 45, 258, 258, 65, 259, 66, 257, packed MSB-first by hand
    enc = bytes.fromhex("800b6050220c0c8501")
    assert _lzw(enc, [1 << 20]) == bytes(
        [45] * 5 + [65] + [45] * 3 + [66]
    )


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Test-local LZW encoder mirroring the decoder's width-growth
    timing — differential partner for arbitrary inputs."""
    codes = []
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    size = 258
    first = True

    def emit(code):
        nonlocal first, size, width
        codes.append((code, width))
        if first:
            first = False
        else:
            size += 1
            if size + early >= (1 << width) and width < 12:
                width += 1

    codes.append((256, width))
    w = b""
    for b in data:
        k = bytes([b])
        if w + k in table:
            w += k
            continue
        emit(table[w])
        table[w + k] = next_code
        next_code += 1
        w = k
    if w:
        emit(table[w])
    codes.append((257, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("payload", [
    b"", b"A", b"ABABABABAB" * 3,
    bytes(range(256)) * 4,            # grows the table monotonically
    b"the quick brown fox " * 200,    # crosses the 9->10->11 widths
])
def test_lzw_roundtrip_differential(payload):
    assert _lzw(_lzw_encode(payload), [1 << 24]) == payload


def test_flate_clipped_tail_salvages_prefix():
    full = zlib.compress(b"prefix-bytes " * 100)
    out = _flate(full[:len(full) // 2], [1 << 20])
    assert out.startswith(b"prefix-bytes ")


def test_ascii_filters_and_runlength():
    assert _asciihex(b"48 65 6c6C 6f>") == b"Hello"
    assert _asciihex(b"486") == b"H`"  # odd pads 0
    import base64

    assert _ascii85(base64.a85encode(b"Some text!") + b"~>") == (
        b"Some text!"
    )
    # RLE: (length-1 literal) and (257-length run)
    assert _runlength(b"\x02abc" + b"\xfeZ" + b"\x80") == b"abc" + b"Z" * 3


def test_png_predictor_up_and_tiff():
    # 2 rows of 3 bytes, Up filter: row2 stored as deltas
    raw = bytes([2, 1, 2, 3]) + bytes([2, 1, 1, 1])
    out = _predictor(raw, {"Predictor": 12, "Columns": 3})
    assert out == bytes([1, 2, 3, 2, 3, 4])
    out = _predictor(bytes([1, 1, 1, 1]), {"Predictor": 2, "Columns": 4})
    assert out == bytes([1, 2, 3, 4])


# ── bombs and damage ────────────────────────────────────────────


def test_inflate_bomb_refuses_document():
    bomb = zlib.compress(b"\x00" * (80 << 20), 9)  # 80 MiB of zeros
    content = b"BT (x) Tj ET"
    blob = _page_fixture(
        b"BT /F1 9 Tf (ok) Tj ET",
        extra={
            4: b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
               % len(bomb) + bomb + b"\nendstream",
        },
    )
    assert extract_pdf_text(blob) is None  # _Bomb → whole-doc refusal
    del content


def test_deep_nesting_refuses():
    deep = b"[" * 64 + b"1" + b"]" * 64
    blob = _page_fixture(b"BT (x) Tj ET", extra={6: deep})
    # object 6 unused → harmless; but as page annots it must refuse
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Annots " + deep + b" >>",
    }
    assert parse_pdf_meta(_classic_pdf(objs)) is None
    del blob


def test_page_tree_cycle_refuses():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>",
    }
    assert parse_pdf_meta(_classic_pdf(objs)) is None


def test_truncation_sweep_never_raises():
    blob = encode_pdf(
        [["Truncation sweep line one.", "And line two."]],
        compress=True, xref_stream=True, title="T",
    )
    for cut in range(0, len(blob), 7):
        r = parse_pdf_meta(blob[:cut])
        assert r is None or isinstance(r, dict)
        t = extract_pdf_text(blob[:cut])
        assert t is None or isinstance(t, list)


def test_bitflip_sweep_never_raises():
    blob = bytearray(encode_pdf([["Bit flip sweep."]], compress=True))
    for pos in range(0, len(blob), 11):
        mut = bytearray(blob)
        mut[pos] ^= 0x5A
        r = parse_pdf_meta(bytes(mut))
        assert r is None or isinstance(r, dict)
        t = extract_pdf_text(bytes(mut))
        assert t is None or isinstance(t, list)


def test_non_pdf_and_empty():
    assert parse_pdf_meta(None) is None
    assert parse_pdf_meta(b"") is None
    assert parse_pdf_meta(b"GIF89a not a pdf") is None
    assert extract_pdf_text(b"%PDF-1.4 junk with no structure") is None


# ── recovery and layouts ────────────────────────────────────────


def test_clipped_trailer_recovers_classic_and_xrefstream():
    for xs in (False, True):
        blob = encode_pdf(
            [["Recovered body text."]], xref_stream=xs, compress=xs,
        )
        clipped = blob[:blob.rfind(b"startxref")]
        m = parse_pdf_meta(clipped)
        assert m and m["recovered_xref"] and m["n_pages"] == 1, (xs, m)
        t = extract_pdf_text(clipped)
        assert t and t[0]["text"] == "Recovered body text."


def test_lying_xref_offset_falls_back_to_scan():
    blob = _page_fixture(b"BT /F1 8 Tf 5 5 Td (scan me) Tj ET")
    # corrupt the first xref entry's offset (points at garbage)
    x = blob.rfind(b"xref")
    mut = bytearray(blob)
    entry = blob.find(b"\n", x) + len(b"0 6\n0000000000 65535 f \n")
    mut[entry:entry + 10] = b"0000000003"
    t = extract_pdf_text(bytes(mut))
    assert t and t[0]["text"] == "scan me"


def test_prev_chain_and_updated_object():
    # incremental update: second xref section with /Prev; the newer
    # section's object 3 (page) wins
    base = _page_fixture(b"BT /F1 9 Tf 1 1 Td (old) Tj ET")
    start1 = base.rfind(b"startxref")
    xref1_off = int(base[start1:].split()[1])
    new_content = b"BT /F1 9 Tf 1 1 Td (new) Tj ET"
    add = bytearray(base)
    off4 = len(add)
    add += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
            + new_content + b"\nendstream\nendobj\n")
    xref2_off = len(add)
    add += b"xref\n4 1\n%010d 00000 n \n" % off4
    add += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF" % (xref1_off, xref2_off))
    t = extract_pdf_text(bytes(add))
    assert t and t[0]["text"] == "new"


# ── fonts and encodings ─────────────────────────────────────────


def test_winansi_high_range_and_differences():
    # 0x93/0x94 are curly quotes in WinAnsi (cp1252)
    content = b"BT /F1 10 Tf 0 0 Td (\x93quoted\x94 \x85) Tj ET"
    blob = _page_fixture(content)
    assert extract_pdf_text(blob)[0]["text"] == "“quoted” …"

    # Differences: remap code 65 ('A') to /bullet, 66 stays 'B'
    objs_font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /bullet] >> >>"
    )
    blob = _page_fixture(
        b"BT /F1 10 Tf 0 0 Td (AB) Tj ET", extra={5: objs_font}
    )
    assert extract_pdf_text(blob)[0]["text"] == "•B"


def test_standard_encoding_quote_deltas():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman "
        b"/Encoding /StandardEncoding >>"
    )
    blob = _page_fixture(
        b"BT /F1 10 Tf 0 0 Td (it\x27s \x60x\x27) Tj ET",
        extra={5: font},
    )
    assert extract_pdf_text(blob)[0]["text"] == "it’s ‘x’"


def test_unknown_glyph_and_missing_font_count_unmapped():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /X "
        b"/Encoding << /Differences [65 /notarealglyphname] >> >>"
    )
    blob = _page_fixture(
        b"BT /F1 10 Tf 0 0 Td (A) Tj ET", extra={5: font}
    )
    t = extract_pdf_text(blob)
    assert t[0]["text"] == "�" and t[0]["unmapped_chars"] == 1
    # Tf naming an absent resource falls back (WinAnsi-ish), never dies
    blob = _page_fixture(b"BT /F9 10 Tf 0 0 Td (ok) Tj ET")
    assert extract_pdf_text(blob)[0]["text"] == "ok"


def test_tounicode_bfchar_and_bfrange_forms():
    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <0041> <0002> <00420043> endbfchar\n"
        b"1 beginbfrange <0010> <0012> <0391> endbfrange\n"
        b"1 beginbfrange <0020> <0021> [<05D0> <05D1>] endbfrange\n"
    )
    m, lengths = _parse_tounicode(cmap)
    assert m[1] == "A" and m[2] == "BC"
    assert m[0x10] == "Α" and m[0x12] == "Γ"  # incrementing
    assert m[0x20] == "א" and m[0x21] == "ב"  # array form
    assert lengths == {2}


def test_type0_identity_h_with_tounicode_hand_built():
    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"3 beginbfchar <0001> <4F60> <0002> <597D> <0003> <0021> "
        b"endbfchar\n"
    )
    extra = {
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /S "
           b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        6: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
           + b"\nendstream",
    }
    blob = _page_fixture(
        b"BT /F1 10 Tf 0 0 Td <000100020003> Tj ET", extra=extra
    )
    t = extract_pdf_text(blob)
    assert t[0]["text"] == "你好!"
    assert t[0]["unmapped_chars"] == 0


# ── structure variants ──────────────────────────────────────────


def test_form_xobject_recursion():
    form = b"BT /F1 8 Tf 3 3 Td (from the form) Tj ET"
    extra = {
        6: b"<< /Subtype /Form /Length %d >>\nstream\n" % len(form)
           + form + b"\nendstream",
    }
    blob = _page_fixture(
        b"BT /F1 8 Tf 0 0 Td (before) Tj ET /X1 Do",
        resources=b"/XObject << /X1 6 0 R >> ",
        extra=extra,
    )
    assert extract_pdf_text(blob)[0]["text"] == "before\nfrom the form"


def test_inline_image_with_embedded_ei_bytes_is_skipped():
    payload = b"\x00\x01EIz\x02"  # contains EI NOT at a token spot
    content = (
        b"BT /F1 8 Tf 0 0 Td (a) Tj ET "
        b"BI /W 2 /H 1 /BPC 8 /CS /G ID " + payload + b" EI\n"
        b"BT /F1 8 Tf 0 -10 Td (b) Tj ET"
    )
    blob = _page_fixture(content)
    assert extract_pdf_text(blob)[0]["text"] == "a\nb"


def test_contents_array_concatenation():
    c1 = b"BT /F1 8 Tf 0 10 Td (part one"
    c2 = b") Tj ET"
    # split MID-TOKEN is not required to work (§7.8.2 says streams
    # divide at lexical boundaries); split at operator boundary:
    c1 = b"BT /F1 8 Tf 0 10 Td (part one) Tj"
    c2 = b"0 -10 Td (part two) Tj ET"
    extra = {
        6: b"<< /Length %d >>\nstream\n" % len(c1) + c1 + b"\nendstream",
        7: b"<< /Length %d >>\nstream\n" % len(c2) + c2 + b"\nendstream",
    }
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           b"/Resources << /Font << /F1 5 0 R >> >> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents [6 0 R 7 0 R] >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
           b"/Encoding /WinAnsiEncoding >>",
    }
    objs.update(extra)
    t = extract_pdf_text(_classic_pdf(objs))
    assert t[0]["text"] == "part one\npart two"


def test_broken_length_scans_to_endstream():
    content = b"BT /F1 8 Tf 1 1 Td (len lies) Tj ET"
    extra = {
        4: b"<< /Length 999999 >>\nstream\n" + content + b"\nendstream",
    }
    blob = _page_fixture(b"", extra=extra)
    assert extract_pdf_text(blob)[0]["text"] == "len lies"


def test_encrypted_reports_structure_refuses_text():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
        4: b"<< /Filter /Standard /V 2 /R 3 /O (x) /U (y) /P -44 >>",
    }
    blob = _classic_pdf(objs, extra_trailer="/Encrypt 4 0 R ")
    m = parse_pdf_meta(blob)
    assert m and m["encrypted"] and m["n_pages"] == 1
    assert m["title"] is None
    assert extract_pdf_text(blob) == []


def test_damaged_single_page_yields_null_text_siblings_extract():
    good = b"BT /F1 8 Tf 1 1 Td (good page) Tj ET"
    bomb = b"\xff\xfe\xfd" * 8  # not zlib at all — inflates nothing
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 "
           b"/Resources << /Font << /F1 5 0 R >> >> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(bomb)
           + bomb + b"\nendstream",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
           b"/Encoding /WinAnsiEncoding >>",
        6: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        7: b"<< /Length %d >>\nstream\n" % len(good) + good
           + b"\nendstream",
    }
    t = extract_pdf_text(_classic_pdf(objs))
    assert t is not None and len(t) == 2
    assert t[0]["text"] is None and t[0]["n_chars"] == 0
    assert t[1]["text"] == "good page"


def test_info_strings_utf16_and_pdfdoc():
    blob = encode_pdf([["x"]], title="Plain title", producer="Prod")
    m = parse_pdf_meta(blob)
    assert m["title"] == "Plain title" and m["producer"] == "Prod"
    # hand-built UTF-16BE title
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
        4: b"<< /Title <FEFF04140430> >>",
    }
    blob = _classic_pdf(objs, extra_trailer="/Info 4 0 R ")
    assert parse_pdf_meta(blob)["title"] == "Да"


# ── encoder round trips ─────────────────────────────────────────


@pytest.mark.parametrize("xs", [False, True])
@pytest.mark.parametrize("comp", [False, True])
def test_encoder_roundtrip_layout_matrix(xs, comp):
    pages = [
        ["Alpha beta gamma.", "Second line — with dash."],
        ["Γειά σου unicode page."],
        ["Third page."],
    ]
    blob = encode_pdf(pages, compress=comp, xref_stream=xs,
                      title="RT", producer="tests")
    m = parse_pdf_meta(blob)
    assert m["n_pages"] == 3 and m["title"] == "RT"
    assert m["has_xref_stream"] == xs
    t = extract_pdf_text(blob)
    assert [p["text"] for p in t] == [
        "Alpha beta gamma.\nSecond line — with dash.",
        "Γειά σου unicode page.",
        "Third page.",
    ]
    assert all(p["unmapped_chars"] == 0 for p in t)


def test_hypothesis_text_roundtrip():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    line = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs", "Cc"),
        ),
        min_size=1, max_size=40,
    ).filter(lambda s: s.strip())

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.lists(line, min_size=1, max_size=4),
                    min_size=1, max_size=3),
           st.booleans(), st.booleans())
    def inner(pages, comp, xs):
        blob = encode_pdf(pages, compress=comp, xref_stream=xs)
        t = extract_pdf_text(blob)
        assert t is not None and len(t) == len(pages)
        for spec, got in zip(pages, t):
            assert got["text"] == "\n".join(spec)
            assert got["unmapped_chars"] == 0

    inner()


# ── Spark kernels ───────────────────────────────────────────────


@pytest.mark.usefixtures("spark")
class TestKernels:
    def test_kernel_equals_driver(self, spark):
        docs = spark.range(40).withColumnRenamed("id", "doc_id")
        corpus = synthetic_pdf_corpus(docs).select("doc_id", "blob")
        blobs = {r["doc_id"]: bytes(r["blob"])
                 for r in corpus.collect()}

        meta_rows = {r["doc_id"]: r.asDict()
                     for r in pdf_meta(corpus).collect()}
        text_rows = {}
        for r in pdf_text(corpus).collect():
            text_rows.setdefault(r["doc_id"], []).append(r.asDict())

        n_skipped = 0
        for d, blob in blobs.items():
            m = parse_pdf_meta(blob)
            pages = extract_pdf_text(blob)
            if m is None:
                assert d not in meta_rows
                n_skipped += 1
                continue
            got = meta_rows[d]
            assert got["n_pages"] == m["n_pages"]
            assert got["encrypted"] == int(m["encrypted"])
            assert got["recovered_xref"] == int(m["recovered_xref"])
            assert got["title"] == m["title"]
            kernel_pages = sorted(
                text_rows.get(d, []), key=lambda r: r["page"]
            )
            assert [p["text"] for p in kernel_pages] == [
                p["text"] for p in pages
            ]
            assert [p["unmapped_chars"] for p in kernel_pages] == [
                p["unmapped_chars"] for p in pages
            ]
        assert n_skipped >= 1  # the %17 garbage docs were S4-skipped

    def test_corpus_cycles_shapes(self, spark):
        docs = spark.range(40).withColumnRenamed("id", "doc_id")
        meta = pdf_meta(
            synthetic_pdf_corpus(docs).select("doc_id", "blob")
        )
        rows = {r["doc_id"]: r for r in meta.collect()}
        assert any(r["has_xref_stream"] for r in rows.values())
        assert any(not r["has_xref_stream"] for r in rows.values())
        assert any(r["recovered_xref"] for r in rows.values())
        assert {r["n_pages"] for r in rows.values()} == {1, 2, 3}
        # encrypted docs cycle: d % 19 == 11 → 11 (rc4, empty pw)
        # and 30 (aes, REAL pw → structure only)
        assert rows[11]["encrypted"] and rows[11]["decryptable"]
        assert rows[30]["encrypted"] and not rows[30]["decryptable"]

    def test_text_feeds_downstream_ops(self, spark):
        from pyspark.sql import functions as F

        docs = spark.range(20).withColumnRenamed("id", "doc_id")
        corpus = synthetic_pdf_corpus(docs).select("doc_id", "blob")
        txt = pdf_text(corpus)
        agg = (
            txt.filter(F.col("text").isNotNull())
            .groupBy("doc_id")
            .agg(F.sum("n_chars").alias("chars"),
                 F.count("*").alias("pages"))
        )
        out = {r["doc_id"]: (r["chars"], r["pages"])
               for r in agg.collect()}
        for d, (chars, pages) in out.items():
            assert chars > 0 and pages == 1 + d % 3


# ── review-pass regressions (r10 code-review findings) ──────────


def test_19_byte_xref_rows_parse_without_recovery():
    # single-EOL 19-byte rows (finding 1): stride must resync
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
    }
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_off = len(buf)
    buf += b"xref\n0 4\n0000000000 65535 f\n"  # 19-byte rows
    for num in (1, 2, 3):
        buf += b"%010d 00000 n\n" % offsets[num]
    buf += (b"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % xref_off)
    m = parse_pdf_meta(bytes(buf))
    assert m and m["n_pages"] == 1 and not m["recovered_xref"], m
    assert m["n_objects"] == 3


def test_free_entry_in_update_shadows_older_section():
    # finding 4: an incremental update FREES page object 4's content;
    # a conforming reader must not resurrect the old object
    base_objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 "
           b"/Resources << /Font << /F1 7 0 R >> >> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 36 >>\nstream\n"
           b"BT /F1 8 Tf 1 1 Td (doomed) Tj ET\nendstream",
        5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        6: b"<< /Length 37 >>\nstream\n"
           b"BT /F1 8 Tf 1 1 Td (survivor) Tj ET\nendstream",
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /H "
           b"/Encoding /WinAnsiEncoding >>",
    }
    base = _classic_pdf(base_objs)
    start1 = base.rfind(b"startxref")
    xref1_off = int(base[start1:].split()[1])
    upd = bytearray(base)
    xref2_off = len(upd)
    upd += b"xref\n4 1\n0000000000 65535 f \n"  # free object 4
    upd += (b"trailer\n<< /Size 8 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF" % (xref1_off, xref2_off))
    t = extract_pdf_text(bytes(upd))
    assert t is not None and len(t) == 2
    # freed content object → page 1 has no readable content (empty),
    # page 2 untouched; the OLD 'doomed' text must not appear
    assert t[0]["text"] in ("", None)
    assert t[1]["text"] == "survivor"


def test_shared_streams_decode_once_per_document(monkeypatch):
    # finding 2: a ToUnicode CMap shared by many pages must inflate
    # exactly once per document (budget + CPU)
    import amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf as pdfmod

    calls = {"n": 0}
    real = pdfmod._flate

    def counting(data, budget):
        calls["n"] += 1
        return real(data, budget)

    monkeypatch.setattr(pdfmod, "_flate", counting)
    cmap = zlib.compress(
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0001> <0041> endbfchar\n"
    )
    font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /S "
        b"/Encoding /Identity-H /ToUnicode 9 0 R >>"
    )
    content = b"BT /F1 10 Tf 0 0 Td <0001> Tj ET"
    n_pages = 4
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [%s] /Count %d "
           b"/Resources << /Font << /F1 8 0 R >> >> >>"
           % (b" ".join(b"%d 0 R" % (10 + i) for i in range(n_pages)),
              n_pages),
        8: font,
        9: b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(cmap)
           + cmap + b"\nendstream",
    }
    for i in range(n_pages):
        objs[10 + i] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>"
            % (20 + i)
        )
        objs[20 + i] = (
            b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream"
        )
    t = extract_pdf_text(_classic_pdf(objs))
    assert [p["text"] for p in t] == ["A"] * n_pages
    assert calls["n"] == 1, calls


def test_dangling_multibyte_code_counts_unmapped():
    # finding 5: odd-length show string under a 2-byte font
    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0001> <0041> endbfchar\n"
    )
    extra = {
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /S "
           b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        6: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
           + b"\nendstream",
    }
    blob = _page_fixture(
        b"BT /F1 10 Tf 0 0 Td <000102> Tj ET", extra=extra
    )
    t = extract_pdf_text(blob)
    assert t[0]["text"] == "A�"
    assert t[0]["unmapped_chars"] == 1


def test_encoder_xref_stream_self_entry_is_correct():
    # finding 3: the xref stream's own entry must carry its real
    # offset (§7.5.8 requires it), not a patch landed one byte off
    blob = encode_pdf([["self entry"]], xref_stream=True)
    start = int(blob[blob.rfind(b"startxref"):].split()[1])
    doc = _PdfDoc(blob)
    self_num = max(
        n for n, e in doc.xref.items() if e[0] == "n"
    )
    assert doc.xref[self_num] == ("n", start)
    # and the object at that offset really is the XRef stream
    obj, num, _gen = doc._parse_indirect_at(start)
    assert num == self_num and str(obj.dict.get("Type")) == "XRef"


def test_encoder_survives_64k_offsets():
    # finding 6: offsets past 64 KiB need a wider W field
    pages = [["Line %d of page %d." % (i, p) for i in range(40)]
             for p in range(60)]
    blob = encode_pdf(pages, xref_stream=True)
    assert len(blob) > (1 << 16)
    m = parse_pdf_meta(blob)
    assert m and m["n_pages"] == 60 and not m["recovered_xref"]
    t = extract_pdf_text(blob)
    assert t[10]["text"].startswith("Line 0 of page 10.")


# ── §8.9 image XObjects ─────────────────────────────────────────


def test_image_xobject_hand_built_and_jpeg_decode():
    import numpy as np

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        decode_jpeg,
        encode_jpeg,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
        extract_pdf_images,
    )

    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:8] = (200, 30, 40)
    px[8:] = (10, 180, 90)
    jpg = encode_jpeg(px, quality=90)
    # hand-built: Flate-wrapped DCT (two filters) must strip the
    # Flate and yield the raw JFIF bytes
    wrapped = zlib.compress(jpg)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /ImA 4 0 R >> >> >>",
        4: b"<< /Subtype /Image /Width 16 /Height 16 "
           b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
           b"/Filter [/FlateDecode /DCTDecode] /Length %d >>\n"
           b"stream\n" % len(wrapped) + wrapped + b"\nendstream",
    }
    out = extract_pdf_images(_classic_pdf(objs))
    assert len(out) == 1
    im = out[0]
    assert im["codec"] == "jpeg" and im["data"] == jpg
    dec = decode_jpeg(im["data"])
    assert dec.shape == (16, 16, 3)
    assert abs(int(dec[0, 0, 0]) - 200) < 16
    assert abs(int(dec[15, 15, 1]) - 180) < 16


def test_image_xobject_encoder_roundtrip_and_encrypted():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
        extract_pdf_images,
    )

    rawpx = bytes((i * 7) % 256 for i in range(8 * 4 * 3))
    imgs = [[{"codec": "rgb", "pixels": rawpx, "width": 8, "height": 4}],
            None]
    for comp in (False, True):
        for enc in (None, "rc4-128", "aes-128"):
            blob = encode_pdf(
                [["img page"], ["plain page"]],
                compress=comp, images=imgs, encrypt=enc,
            )
            out = extract_pdf_images(blob)
            assert len(out) == 1, (comp, enc)
            assert out[0]["data"] == rawpx
            assert out[0]["page"] == 1
            assert out[0]["colorspace"] == "DeviceRGB"
    # undecryptable → []
    blob = encode_pdf([["img page"]], images=imgs[:1],
                      encrypt="aes-128", user_pw=b"x")
    assert extract_pdf_images(blob) == []


def test_damaged_image_skipped_page_survives():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
        extract_pdf_images,
    )

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /Bad 4 0 R /Good 5 0 R >> >> >>",
        4: b"<< /Subtype /Image /Width 4 /Height 4 "
           b"/Filter /FlateDecode /Length 8 >>\nstream\n"
           b"\xff\xfe\xfd\xfc\xfb\xfa\xf9\xf8\nendstream",
        5: b"<< /Subtype /Image /Width 2 /Height 1 "
           b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
           b"/Length 2 >>\nstream\nAB\nendstream",
    }
    out = extract_pdf_images(_classic_pdf(objs))
    assert [im["name"] for im in out] == ["Good"]
    assert out[0]["data"] == b"AB"


@pytest.mark.usefixtures("spark")
class TestImageKernel:
    def test_pdf_images_kernel_equals_driver(self, spark):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
            extract_pdf_images,
            pdf_images,
        )

        docs = spark.range(40).withColumnRenamed("id", "doc_id")
        corpus = synthetic_pdf_corpus(docs).select("doc_id", "blob")
        blobs = {r["doc_id"]: bytes(r["blob"])
                 for r in corpus.collect()}
        rows = {}
        for r in pdf_images(corpus).collect():
            rows.setdefault(r["doc_id"], []).append(r)
        saw_jpeg = saw_raw = False
        for d, blob in blobs.items():
            imgs = extract_pdf_images(blob) or []
            got = sorted(rows.get(d, []), key=lambda r: r["name"])
            assert len(got) == len(imgs), d
            for r, im in zip(got, sorted(imgs, key=lambda x: x["name"])):
                assert bytes(r["blob"]) == im["data"]
                assert r["codec"] == im["codec"]
                saw_jpeg |= r["codec"] == "jpeg"
                saw_raw |= r["codec"] == "raw"
        assert saw_jpeg and saw_raw


# ── r10 advice regressions ──────────────────────────────────────


def test_text_cap_counts_utf8_bytes(monkeypatch):
    # the cap is a BYTE budget (Arrow memory), so CJK text must be
    # charged at its UTF-8 width, not its character count
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
        pdf as pdf_mod,
    )

    s = pdf_mod._TextSink()
    s.show("漢字", 0, 0.0, 0.0, 12.0)
    assert s.nbytes == len("漢字".encode("utf-8")) == 6
    monkeypatch.setattr(pdf_mod, "_MAX_TEXT_BYTES", 100)
    s2 = pdf_mod._TextSink()
    with pytest.raises(_Bomb):
        # 40 chars = 120 UTF-8 bytes: a character count would pass
        s2.show("漢" * 40, 0, 0.0, 0.0, 12.0)


def _xrefstream_objstm_lying_catalog() -> bytes:
    """Hand-built PDF 1.5 fixture: catalog/pages/page/font live in an
    uncompressed ObjStm; the xref STREAM mis-types the catalog as a
    type-1 entry whose offset points at the ObjStm header (lying), so
    get(1) triggers _recover_scan while /Root is already known."""
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /Resources "
           b"<< /Font << /F1 5 0 R >> >> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
           b"/Encoding /WinAnsiEncoding >>",
    }
    hdr_parts, body, offs = [], b"", {}
    for num in (1, 2, 3, 5):
        offs[num] = len(body)
        body += inner[num] + b" "
    for num in (1, 2, 3, 5):
        hdr_parts.append(b"%d %d" % (num, offs[num]))
    objstm_hdr = b" ".join(hdr_parts) + b" "
    objstm_data = objstm_hdr + body
    content = b"BT /F1 11 Tf 10 10 Td (objstm recovered) Tj ET"

    buf = bytearray(b"%PDF-1.5\n")
    off4 = len(buf)
    buf += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream\nendobj\n")
    off6 = len(buf)
    buf += (b"6 0 obj\n<< /Type /ObjStm /N 4 /First %d /Length %d "
            b">>\nstream\n" % (len(objstm_hdr), len(objstm_data))
            + objstm_data + b"\nendstream\nendobj\n")
    off7 = len(buf)
    rows = {
        0: bytes([0, 0, 0, 0]),
        1: bytes([1]) + off6.to_bytes(2, "big") + b"\x00",  # LYING
        2: bytes([2]) + (6).to_bytes(2, "big") + bytes([1]),
        3: bytes([2]) + (6).to_bytes(2, "big") + bytes([2]),
        4: bytes([1]) + off4.to_bytes(2, "big") + b"\x00",
        5: bytes([2]) + (6).to_bytes(2, "big") + bytes([3]),
        6: bytes([1]) + off6.to_bytes(2, "big") + b"\x00",
        7: bytes([1]) + off7.to_bytes(2, "big") + b"\x00",
    }
    xdata = b"".join(rows[i] for i in range(8))
    buf += (b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 2 1] "
            b"/Root 1 0 R /Length %d >>\nstream\n" % len(xdata)
            + xdata + b"\nendstream\nendobj\n")
    buf += b"startxref\n%d\n%%%%EOF" % off7
    return bytes(buf)


def test_recovery_with_root_present_reexpands_objstm():
    # advice catch r10: _recover_scan used to expand ObjStm members
    # only on the Root-missing path, so a lying type-1 offset with
    # /Root already in the trailer degraded a salvageable document
    # to an S4 skip (every page-tree object lives in the ObjStm)
    blob = _xrefstream_objstm_lying_catalog()
    m = parse_pdf_meta(blob)
    assert m and m["recovered_xref"] and m["n_pages"] == 1, m
    t = extract_pdf_text(blob)
    assert t and t[0]["text"] == "objstm recovered"
