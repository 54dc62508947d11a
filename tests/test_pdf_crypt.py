"""PDF standard security handler: crypto primitives pinned against
PUBLISHED known-answer vectors (FIPS-197 Appendix C.1 for AES-128,
the canonical 'Key'/'Plaintext' RC4 vector), §7.6.3 key-derivation
round trips, empty-user-password authentication, tamper refusal,
and really-encrypted end-to-end fixtures in every mode × layout."""

from __future__ import annotations

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (
    encode_pdf,
    extract_pdf_text,
    parse_pdf_meta,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (
    PAD,
    _Unsupported,
    aes128_decrypt_block,
    aes128_encrypt_block,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    authenticate_empty_user,
    build_decryptor,
    file_key,
    object_key,
    owner_entry,
    rc4,
    user_entry,
)


# ── published known-answer vectors ──────────────────────────────


def test_aes128_fips197_appendix_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert aes128_encrypt_block(key, pt) == ct
    assert aes128_decrypt_block(key, ct) == pt


def test_rc4_canonical_vector():
    # the widely-published 'Key'/'Plaintext' test vector
    assert rc4(b"Key", b"Plaintext") == bytes.fromhex(
        "bbf316e8d940af0ad3"
    )
    # RC4 is symmetric
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_aes_cbc_roundtrip_and_padding_validation():
    key = b"0123456789abcdef"
    for n in range(0, 40):
        data = bytes(range(n % 256))[:n]
        enc = aes_cbc_encrypt(key, data, iv=b"\x11" * 16)
        assert aes_cbc_decrypt(key, enc) == data
        # full-block padding: ciphertext is always IV + k*16
        assert len(enc) % 16 == 0 and len(enc) >= 32
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, b"short")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, b"\x00" * 31)  # not block-aligned


def test_pad_constant_shape():
    assert len(PAD) == 32
    assert PAD[:4] == bytes([0x28, 0xBF, 0x4E, 0x5E])
    assert PAD[-4:] == bytes([0x64, 0x53, 0x69, 0x7A])


# ── §7.6.3 algorithms ───────────────────────────────────────────


@pytest.mark.parametrize("r,klen", [(2, 5), (3, 16), (4, 16)])
def test_empty_user_auth_roundtrip(r, klen):
    id0 = b"\x01\x02" * 8
    o = owner_entry(b"owner-secret", b"", r, klen)
    fkey = file_key(b"", o, -44, id0, r, klen)
    u = user_entry(fkey, id0, r)
    got = authenticate_empty_user(o, u, -44, id0, r, klen)
    assert got == fkey


@pytest.mark.parametrize("r,klen", [(2, 5), (3, 16)])
def test_real_user_password_refuses(r, klen):
    id0 = b"\x07" * 16
    o = owner_entry(b"owner", b"userpw", r, klen)
    fkey = file_key(b"userpw", o, -44, id0, r, klen)
    u = user_entry(fkey, id0, r)
    assert authenticate_empty_user(o, u, -44, id0, r, klen) is None


def test_tampered_u_entry_refuses():
    id0 = b"\x09" * 16
    o = owner_entry(b"owner", b"", 3, 16)
    fkey = file_key(b"", o, -44, id0, 3, 16)
    u = bytearray(user_entry(fkey, id0, 3))
    u[3] ^= 0xFF
    assert authenticate_empty_user(o, bytes(u), -44, id0, 3, 16) is None


def test_object_key_truncation_and_salt():
    fkey = b"\xaa" * 16
    k_plain = object_key(fkey, 7, 0)
    k_aes = object_key(fkey, 7, 0, aes=True)
    assert len(k_plain) == 16 and len(k_aes) == 16
    assert k_plain != k_aes  # sAlT changes the hash
    # 40-bit key: 5+5 = 10 bytes
    assert len(object_key(b"\xbb" * 5, 1, 0)) == 10


def test_build_decryptor_refuses_unsupported():
    base = {
        "Filter": "Standard", "V": 4, "R": 4, "Length": 128,
        "O": b"\x00" * 32, "U": b"\x00" * 32, "P": -44,
    }
    with pytest.raises(_Unsupported):
        build_decryptor({**base, "Filter": "Custom"}, b"")
    with pytest.raises(_Unsupported):
        # V5/R6 with R4-shaped entries (32-byte U, no UE) is
        # malformed — the supported R6 path needs the 48-byte set
        build_decryptor({**base, "V": 5, "R": 6}, b"")
    with pytest.raises(_Unsupported):
        build_decryptor(
            {**base, "CF": {"StdCF": {"CFM": "AESV3"}},
             "StmF": "StdCF", "StrF": "StdCF"}, b"",
        )


# ── end-to-end fixtures ─────────────────────────────────────────


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128"])
@pytest.mark.parametrize("xs", [False, True])
def test_encrypted_fixture_roundtrip(mode, xs):
    pages = [["Crypt fixture line.", "Second — line."],
             ["Ünïcödé page ↦ tail."]]
    blob = encode_pdf(pages, compress=True, xref_stream=xs,
                      encrypt=mode, title="Enc T")
    # ciphertext really on the wire
    assert b"Crypt fixture" not in blob
    assert b"Enc T" not in blob.replace(b"/Enc", b"")
    m = parse_pdf_meta(blob)
    assert m["encrypted"] == 1 or m["encrypted"] is True
    assert m["decryptable"]
    assert m["title"] == "Enc T"
    assert m["has_xref_stream"] == xs
    t = extract_pdf_text(blob)
    assert [p["text"] for p in t] == [
        "Crypt fixture line.\nSecond — line.",
        "Ünïcödé page ↦ tail.",
    ]
    assert all(p["unmapped_chars"] == 0 for p in t)


def test_real_password_fixture_reports_structure_refuses_text():
    blob = encode_pdf([["hidden"]], encrypt="aes-128",
                      user_pw=b"secret", title="T")
    m = parse_pdf_meta(blob)
    assert m and m["encrypted"] and not m["decryptable"]
    assert m["n_pages"] == 1
    assert m["title"] is None  # ciphertext — never reported raw
    assert extract_pdf_text(blob) == []


def test_tampered_encrypted_fixture_never_raises():
    blob = bytearray(encode_pdf([["tamper sweep"]], encrypt="rc4-128"))
    for pos in range(0, len(blob), 13):
        mut = bytearray(blob)
        mut[pos] ^= 0x42
        r = parse_pdf_meta(bytes(mut))
        assert r is None or isinstance(r, dict)
        t = extract_pdf_text(bytes(mut))
        assert t is None or isinstance(t, list)


def test_encrypted_clip_shapes():
    blob = encode_pdf([["clip target line"]], encrypt="rc4-128",
                      compress=True)
    # clip at startxref: the trailer SURVIVES (classic layout), so
    # recovery finds /Encrypt and the text fully decrypts — pin that
    t = extract_pdf_text(blob[:blob.rfind(b"startxref")])
    assert t and t[0]["text"] == "clip target line"
    # clip at the trailer itself: /Encrypt is unrecoverable; without
    # it the ciphertext content stream cannot decode (Flate header is
    # garbage) — pages may surface as damaged (None) but plaintext
    # must never appear, and nothing raises
    t2 = extract_pdf_text(blob[:blob.rfind(b"trailer")])
    if t2:
        for pg in t2:
            assert pg["text"] is None or "clip target" not in pg["text"]


# ── R5/R6 AES-256 (PDF 2.0 §7.6.4) ──────────────────────────────


def test_aes256_fips197_appendix_c3_and_fast_equals_slow():
    import os

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
        pdf_crypt as pc,
    )

    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert pc.aes_encrypt_block(key, pt).hex() == (
        "8ea2b7ca516745bfeafc49904b496089"
    )
    assert pc.aes_decrypt_block(key, pc.aes_encrypt_block(key, pt)) == pt
    # the T-table fast path is differentially pinned against the
    # spec-literal round structure for both key sizes
    for _ in range(25):
        for klen in (16, 32):
            k, b = os.urandom(klen), os.urandom(16)
            assert pc.aes_encrypt_block(k, b) == (
                pc._aes_encrypt_block_slow(k, b)
            )
            assert pc.aes_decrypt_block(k, b) == (
                pc._aes_decrypt_block_slow(k, b)
            )


def test_r6_entries_roundtrip_and_refusals():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        authenticate_empty_user_r56,
        make_r6_entries,
        perms_check,
    )

    fkey = bytes(range(32))
    salts = bytes(range(100, 132))
    ent = make_r6_entries(fkey, b"", b"owner-secret", -44, salts)
    got = authenticate_empty_user_r56(ent["U"], ent["UE"], 6)
    assert got == fkey
    assert perms_check(fkey, ent["Perms"], -44)
    assert not perms_check(fkey, ent["Perms"], -45)  # P mismatch
    # real user password → validation hash differs → None
    ent2 = make_r6_entries(fkey, b"realpw", b"owner", -44, salts)
    assert authenticate_empty_user_r56(ent2["U"], ent2["UE"], 6) is None
    # tampered validation salt → None
    u = bytearray(ent["U"])
    u[33] ^= 0x01
    assert authenticate_empty_user_r56(bytes(u), ent["UE"], 6) is None


def test_r5_plain_sha256_variant():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        aes_cbc_encrypt_nopad,
        authenticate_empty_user_r56,
        hash_r5,
    )

    fkey = b"\x5a" * 32
    uvs, uks = b"validsal", b"keysalt!"
    u = hash_r5(b"", uvs) + uvs + uks
    ue = aes_cbc_encrypt_nopad(hash_r5(b"", uks), fkey)
    assert authenticate_empty_user_r56(u, ue, 5) == fkey


def test_r6_encrypted_fixture_roundtrip():
    blob = encode_pdf(
        [["R6 page one.", "Second — line."], ["Ünïcödé ↦ r6."]],
        compress=True, xref_stream=True, encrypt="aes-256",
        title="R6 T",
    )
    assert b"R6 page one" not in blob
    m = parse_pdf_meta(blob)
    assert m["encrypted"] and m["decryptable"] and m["title"] == "R6 T"
    t = extract_pdf_text(blob)
    assert [p["text"] for p in t] == [
        "R6 page one.\nSecond — line.", "Ünïcödé ↦ r6.",
    ]


def test_r6_real_password_and_tampered_perms_refuse():
    blob = encode_pdf([["hidden r6"]], encrypt="aes-256",
                      user_pw=b"secret")
    m = parse_pdf_meta(blob)
    assert m and m["encrypted"] and not m["decryptable"]
    assert extract_pdf_text(blob) == []
    # a tampered /Perms breaks the 'adb' echo: the derived key no
    # longer proves itself → fail-closed refusal, never garbage
    bb = bytearray(encode_pdf([["perm gate"]], encrypt="aes-256"))
    i = bytes(bb).find(b"/Perms")
    j = bytes(bb).find(b"(", i)
    bb[j + 2] ^= 0xFF
    m = parse_pdf_meta(bytes(bb))
    assert m is None or not m["decryptable"]


# ── review-pass regressions (second /code-review pass) ──────────


def test_aesv3_under_v4_refuses_not_misdecrypts():
    # a V4 doc (16-byte RC4/MD5-authenticated key) declaring CFM
    # AESV3 previously slipped into the AES-256 path and fabricated
    # content; it must refuse (finding 1)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        file_key,
        owner_entry,
        user_entry,
    )

    id0 = b"\x21" * 16
    o = owner_entry(b"owner", b"", 4, 16)
    fkey = file_key(b"", o, -44, id0, 4, 16)
    u = user_entry(fkey, id0, 4)
    enc = {
        "Filter": "Standard", "V": 4, "R": 4, "Length": 128,
        "O": o, "U": u, "P": -44,
        "CF": {"StdCF": {"CFM": "AESV3"}},
        "StmF": "StdCF", "StrF": "StdCF",
    }
    with pytest.raises(_Unsupported):
        build_decryptor(enc, id0)
    # and AESV2 under V5 likewise refuses
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        _cf_method,
    )

    with pytest.raises(_Unsupported):
        _cf_method({"CF": {"StdCF": {"CFM": "AESV2"}},
                    "StmF": "StdCF", "StrF": "StdCF"}, "StmF", v=5)


def test_unsigned_p_value_decrypts(monkeypatch):
    # writers emit /P as the unsigned rendering of the same 32-bit
    # pattern; both must authenticate and perms-check (finding 2)
    import amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf as pdfmod
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        make_r6_entries,
        perms_check,
    )

    fkey = bytes(range(32))
    ent = make_r6_entries(fkey, b"", b"o", -44, bytes(range(32)))
    assert perms_check(fkey, ent["Perms"], -44)
    assert perms_check(fkey, ent["Perms"], 4294967252)  # unsigned -44
    # end-to-end: rewrite the fixture's /P to the unsigned form
    blob = pdfmod.encode_pdf([["unsigned P"]], encrypt="aes-256")
    mut = blob.replace(b"/P -44", b"/P 4294967252")
    assert mut != blob
    t = pdfmod.extract_pdf_text(mut)
    assert t and t[0]["text"] == "unsigned P"
    # and the rc4 modes' Algorithm 2 likewise
    blob = pdfmod.encode_pdf([["unsigned P rc4"]], encrypt="rc4-128")
    mut = blob.replace(b"/P -44", b"/P 4294967252")
    t = pdfmod.extract_pdf_text(mut)
    assert t and t[0]["text"] == "unsigned P rc4"


def test_bad_aes_key_size_degrades_not_crashes():
    # a crafted 40-bit-Length AESV2 doc derives a 10-byte AES key:
    # ValueError (graceful raw passthrough), never KeyError
    # (finding 4)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        aes_encrypt_block,
    )

    with pytest.raises(ValueError):
        aes_encrypt_block(b"0123456789", b"x" * 16)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
        encode_pdf as ep,
        extract_pdf_text as et,
        parse_pdf_meta as pm,
    )

    blob = ep([["short key doc"]], encrypt="aes-128")
    # corrupt the declared key length down to 40 bits: object keys
    # become 10 bytes → AES refuses per-string with ValueError and
    # the parser degrades instead of dying
    mut = blob.replace(b"/Length 128", b"/Length 40")
    r = pm(mut)
    assert r is None or isinstance(r, dict)
    t = et(mut)
    assert t is None or isinstance(t, list)


def test_hash_r6_frozen_pin():
    # NOT an external vector (none is available offline — see the
    # module ADR): a frozen pin of this implementation's output so
    # any accidental change to the Algorithm 2.B composition is loud
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf_crypt import (  # noqa: E501
        hash_r6,
    )

    assert hash_r6(b"", b"saltsalt")[:8].hex() == "f383e1cdcd8e7e67"
    assert hash_r6(b"pw", b"\x00" * 8, b"u" * 48)[:8].hex() == (
        hash_r6(b"pw", b"\x00" * 8, b"u" * 48)[:8].hex()
    )


def test_form_nested_images_extracted():
    # images painted via a Form XObject live in the FORM's
    # resources — the extractor must recurse like the text path
    # (finding 3)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
        extract_pdf_images,
    )
    from tests.test_pdf import _classic_pdf

    form = b"q 8 0 0 4 0 0 cm /Nested Do Q"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources "
           b"<< /XObject << /Fm1 4 0 R >> >> >>",
        4: b"<< /Subtype /Form /Resources "
           b"<< /XObject << /Nested 5 0 R >> >> /Length %d >>\n"
           b"stream\n" % len(form) + form + b"\nendstream",
        5: b"<< /Subtype /Image /Width 2 /Height 1 "
           b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
           b"/Length 2 >>\nstream\nXY\nendstream",
    }
    out = extract_pdf_images(_classic_pdf(objs))
    assert len(out) == 1
    assert out[0]["name"] == "Fm1/Nested"
    assert out[0]["data"] == b"XY"
    # a self-referencing form must not loop
    objs[4] = (
        b"<< /Subtype /Form /Resources "
        b"<< /XObject << /Self 4 0 R /Nested 5 0 R >> >> /Length %d >>\n"
        b"stream\n" % len(form) + form + b"\nendstream"
    )
    out = extract_pdf_images(_classic_pdf(objs))
    assert [im["name"] for im in out] == ["Fm1/Nested"]
