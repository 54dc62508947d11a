"""Archive ingestion (zip central directory / ZIP64, tar ustar +
GNU + pax, tar.gz): DIFFERENTIAL against stdlib zipfile/tarfile
(an independent implementation of both specs authoring the
fixtures), plus hand-built header bytes from the published layouts,
bomb guards, truncation sweeps, and the Spark kernels with a
cross-family composition (zip members → PDF text / JPEG decode)."""

from __future__ import annotations

import gzip
import io
import struct
import tarfile
import zipfile
import zlib

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.archives import (
    _Bomb,
    _Broken,
    _MAX_MEMBERS,
    archive_extract,
    archive_member_list,
    archive_members,
    parse_tar_members,
    parse_zip_members,
    sniff_archive,
    tar_extract_member,
    zip_extract_member,
    zip_member_range,
)


def _stdlib_zip(entries, compress=zipfile.ZIP_DEFLATED) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compress) as z:
        for name, payload in entries:
            z.writestr(name, payload)
    return buf.getvalue()


# ── zip: differential vs stdlib ─────────────────────────────────


def test_zip_stdlib_differential_listing_and_extraction():
    entries = [
        ("docs/a.txt", b"hello archive world " * 50),
        ("docs/b.json", b'{"k": 1}'),
        ("unicode → name.txt", "päyload".encode()),
        ("empty.bin", b""),
    ]
    blob = _stdlib_zip(entries)
    members = parse_zip_members(blob)
    byname = {m["name"]: m for m in members}
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        ref = {i.filename: i for i in z.infolist()}
        assert set(byname) == set(ref)
        for name, info in ref.items():
            m = byname[name]
            assert m["size"] == info.file_size
            assert m["compressed_size"] == info.compress_size
            assert m["crc32"] == info.CRC
            assert zip_extract_member(blob, m) == z.read(name)


def test_zip_member_range_is_exact_compressed_payload():
    blob = _stdlib_zip([("x.txt", b"range me " * 100)])
    m = parse_zip_members(blob)[0]
    start, clen = zip_member_range(blob, m)
    d = zlib.decompressobj(-15)
    assert d.decompress(blob[start:start + clen]) == b"range me " * 100


def test_zip64_extras_differential():
    # force ZIP64 records without multi-GB fixtures
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        with z.open("big.bin", "w", force_zip64=True) as f:
            f.write(b"Z" * 100_000)
        z.writestr("small.txt", "tiny")
    blob = buf.getvalue()
    members = {m["name"]: m for m in parse_zip_members(blob)}
    assert members["big.bin"]["size"] == 100_000
    assert zip_extract_member(blob, members["big.bin"]) == b"Z" * 100_000
    assert zip_extract_member(blob, members["small.txt"]) == b"tiny"


def test_zip_hand_built_single_member():
    # APPNOTE §4.3.7/§4.3.12/§4.3.16 records written field-by-field
    payload = b"hand built"
    crc = zlib.crc32(payload)
    name = b"h.txt"
    local = (b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 20, 0, 0, 0, 0, crc, len(payload),
        len(payload), len(name), 0) + name + payload)
    cd = (b"PK\x01\x02" + struct.pack(
        "<HHHHHHIIIHHHHHII", 20, 20, 0, 0, 0, 0, crc, len(payload),
        len(payload), len(name), 0, 0, 0, 0, 0, 0) + name)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(cd), len(local), 0)
    blob = local + cd + eocd
    members = parse_zip_members(blob)
    assert len(members) == 1 and members[0]["name"] == "h.txt"
    assert members[0]["method"] == "stored"
    assert zip_extract_member(blob, members[0]) == payload


def test_zip_crc_mismatch_is_damage_siblings_survive():
    blob = bytearray(_stdlib_zip(
        [("good.txt", b"fine"), ("bad.txt", b"willbreak")],
        compress=zipfile.ZIP_STORED,
    ))
    # corrupt bad.txt's stored payload (after its local header)
    idx = bytes(blob).find(b"willbreak")
    blob[idx] ^= 0xFF
    members = parse_zip_members(bytes(blob))
    byname = {m["name"]: m for m in members}
    with pytest.raises(_Broken):
        zip_extract_member(bytes(blob), byname["bad.txt"])
    assert zip_extract_member(bytes(blob), byname["good.txt"]) == b"fine"


def test_zip_unsupported_method_listed_not_extracted():
    blob = bytearray(_stdlib_zip([("x.dat", b"payload")],
                                 compress=zipfile.ZIP_STORED))
    # rewrite method 0 → 93 (zstd) in BOTH local and cd records
    b = bytes(blob)
    li = b.find(b"PK\x03\x04")
    ci = b.find(b"PK\x01\x02")
    blob[li + 8:li + 10] = struct.pack("<H", 93)
    blob[ci + 10:ci + 12] = struct.pack("<H", 93)
    members = parse_zip_members(bytes(blob))
    assert members[0]["method"] == "zstd"
    assert zip_extract_member(bytes(blob), members[0]) is None


def test_zip_inflate_bomb_refuses():
    # claims a huge size so the cap is the global one; payload
    # inflates past 256 MiB → _Bomb
    payload = zlib.compressobj(9, zlib.DEFLATED, -15)
    data = payload.compress(b"\x00" * (300 << 20)) + payload.flush()
    crc = zlib.crc32(b"\x00" * (300 << 20))
    name = b"bomb.bin"
    local = (b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 20, 0, 8, 0, 0, crc, len(data),
        300 << 20, len(name), 0) + name + data)
    cd = (b"PK\x01\x02" + struct.pack(
        "<HHHHHHIIIHHHHHII", 20, 20, 0, 8, 0, 0, crc, len(data),
        300 << 20, len(name), 0, 0, 0, 0, 0, 0) + name)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(cd), len(local), 0)
    blob = local + cd + eocd
    with pytest.raises(_Bomb):
        zip_extract_member(blob, parse_zip_members(blob)[0])


def test_zip_member_count_bomb_refuses():
    # an EOCD64 claiming 10^9 entries must refuse before any loop
    blob = _stdlib_zip([("a", b"1")])
    # build a fake zip64 EOCD chain claiming too many entries
    e64 = (b"PK\x06\x06" + struct.pack("<Q", 44) + b"\x00" * 12
           + struct.pack("<II", 0, 0)
           + struct.pack("<QQQQ", _MAX_MEMBERS + 1, _MAX_MEMBERS + 1,
                         10, 0))
    loc = b"PK\x06\x07" + struct.pack("<IQI", 0, len(blob), 1)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0)
    assert parse_zip_members(blob + e64 + loc + eocd) is None


# ── tar: differential vs stdlib ─────────────────────────────────


@pytest.mark.parametrize("fmt", [tarfile.USTAR_FORMAT,
                                 tarfile.GNU_FORMAT,
                                 tarfile.PAX_FORMAT])
def test_tar_stdlib_differential(fmt):
    entries = [("plain.txt", b"tar payload"),
               ("dir/nested.bin", b"\x01\x02" * 300)]
    if fmt != tarfile.USTAR_FORMAT:
        entries.append(("long/" + "x" * 150 + ".dat", b"L" * 100))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as t:
        for name, payload in entries:
            ti = tarfile.TarInfo(name)
            ti.size = len(payload)
            t.addfile(ti, io.BytesIO(payload))
    blob = buf.getvalue()
    members = parse_tar_members(blob)
    assert [m["name"] for m in members] == [e[0] for e in entries]
    for m, (_, payload) in zip(members, entries):
        assert m["size"] == len(payload)
        assert tar_extract_member(blob, m) == payload


def test_tar_hand_built_ustar_header():
    payload = b"hand tar"
    hdr = bytearray(512)
    hdr[0:9] = b"hand.txt\x00"
    hdr[100:108] = b"0000644\x00"
    hdr[124:136] = ("%011o" % len(payload)).encode() + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[156] = ord("0")
    hdr[257:263] = b"ustar\x00"
    # checksum (offset 148): sum of header bytes with the checksum
    # field itself read as 8 spaces
    csum = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
    hdr[148:156] = ("%06o" % csum).encode() + b"\x00 "
    blob = bytes(hdr) + payload + b"\x00" * (512 - len(payload)) + (
        b"\x00" * 1024
    )
    members = parse_tar_members(blob)
    assert len(members) == 1
    assert members[0]["name"] == "hand.txt"
    assert tar_extract_member(blob, members[0]) == payload
    # a corrupted size field breaks the checksum → refuse the
    # archive instead of emitting a garbage listing
    bad = bytearray(blob)
    bad[125] ^= 0x01
    assert parse_tar_members(bytes(bad)) is None


def test_tar_gnu_base256_size_field():
    # GNU base-256 numeric encoding for sizes > 8 GiB octal range —
    # synthesize the header field directly
    field = bytearray(12)
    field[0] = 0x80
    val = 12_345
    for i in range(11, 0, -1):
        field[i] = val & 0xFF
        val >>= 8
    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.archives import (  # noqa: E501
        _octal,
    )

    assert _octal(bytes(field)) == 12_345
    assert _octal(b"0000644\x00    ") == 0o644
    assert _octal(b"\x00" * 12) == 0


def test_targz_and_sniffing():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        ti = tarfile.TarInfo("inner.txt")
        ti.size = 5
        t.addfile(ti, io.BytesIO(b"12345"))
    tblob = buf.getvalue()
    gz = gzip.compress(tblob)
    assert sniff_archive(gz) == "tar.gz"
    assert sniff_archive(tblob) == "tar"
    assert sniff_archive(_stdlib_zip([("a", b"b")])) == "zip"
    assert sniff_archive(b"plain text") is None
    fmt, members = archive_member_list(gz)
    assert fmt == "tar.gz" and members[0]["name"] == "inner.txt"


def test_truncation_sweep_never_raises():
    blob = _stdlib_zip([("a.txt", b"abc" * 100), ("b.txt", b"xyz")])
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        ti = tarfile.TarInfo("m.txt")
        ti.size = 700
        t.addfile(ti, io.BytesIO(b"m" * 700))
    tblob = buf.getvalue()
    for src in (blob, tblob, gzip.compress(tblob)):
        for cut in range(0, len(src), 37):
            r = archive_member_list(src[:cut])
            assert r is None or isinstance(r, tuple)


# ── Spark kernels ───────────────────────────────────────────────


@pytest.mark.usefixtures("spark")
class TestKernels:
    def _corpus(self, spark):
        rows = []
        for d in range(12):
            if d % 3 == 0:
                blob = _stdlib_zip(
                    [("doc%d/a.txt" % d, b"zip text %d " % d * 20),
                     ("doc%d/skip.zst" % d, b"nope")]
                )
            elif d % 3 == 1:
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as t:
                    payload = b"tar text %d " % d * 20
                    ti = tarfile.TarInfo("doc%d/b.txt" % d)
                    ti.size = len(payload)
                    t.addfile(ti, io.BytesIO(payload))
                blob = buf.getvalue()
                if d % 6 == 4:
                    blob = gzip.compress(blob)
            else:
                blob = b"garbage not an archive " + bytes([d]) * 40
            rows.append((d, bytearray(blob)))
        return spark.createDataFrame(
            rows, "doc_id long, blob binary"
        )

    def test_members_kernel_equals_driver(self, spark):
        corpus = self._corpus(spark)
        got = {}
        for r in archive_members(corpus).collect():
            got.setdefault(r["doc_id"], []).append(r)
        blobs = {r["doc_id"]: bytes(r["blob"]) for r in corpus.collect()}
        for d, blob in blobs.items():
            ref = archive_member_list(blob)
            if ref is None:
                assert d not in got
                continue
            fmt, members = ref
            krows = sorted(got[d], key=lambda r: r["member"])
            assert len(krows) == len(members)
            for kr, m in zip(
                krows, sorted(members, key=lambda m: m["name"])
            ):
                assert kr["format"] == fmt
                assert kr["size"] == m["size"]

    def test_extract_kernel_suffix_filter(self, spark):
        corpus = self._corpus(spark)
        out = archive_extract(corpus, suffix=".txt").collect()
        assert out and all(r["member"].endswith(".txt") for r in out)
        for r in out:
            body = bytes(r["blob"]).decode()
            assert body.startswith(("zip text", "tar text"))
        # the unsupported-method member was never extracted
        assert not any(r["member"].endswith(".zst") for r in out)

    def test_zip_of_pdfs_feeds_pdf_text(self, spark):
        # cross-family composition: a zip drop of PDFs → members →
        # the PDF text kernel
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
            encode_pdf,
            pdf_text,
        )

        pdfs = [
            ("reports/r%d.pdf" % i,
             encode_pdf([["Report %d body line." % i]]))
            for i in range(4)
        ]
        blob = _stdlib_zip(pdfs)
        archives = spark.createDataFrame(
            [(1, bytearray(blob))], "doc_id long, blob binary"
        )
        from pyspark.sql import functions as F

        extracted = archive_extract(archives, suffix=".pdf")
        docs = extracted.select(
            F.regexp_extract("member", r"r(\d+)\.pdf", 1)
            .cast("long").alias("doc_id"),
            "blob",
        )
        texts = {r["doc_id"]: r["text"]
                 for r in pdf_text(docs).collect()}
        assert texts == {
            i: "Report %d body line." % i for i in range(4)
        }


# ── review-pass regressions ─────────────────────────────────────


def test_pax_fractional_mtime_parses():
    # stdlib PAX_FORMAT writes mtime=....123456 (finding 1)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as t:
        ti = tarfile.TarInfo("frac.txt")
        ti.size = 3
        ti.mtime = 1618393453.123456
        t.addfile(ti, io.BytesIO(b"abc"))
    members = parse_tar_members(buf.getvalue())
    assert members and members[0]["mtime"] == 1618393453


def test_huge_zip64_size_refused_before_arrow():
    # a crafted usize=2^64-1 must refuse at parse (finding 2)
    payload = b"x"
    crc = zlib.crc32(payload)
    name = b"h.bin"
    z64 = struct.pack("<HH", 0x0001, 8) + struct.pack(
        "<Q", 0xFFFFFFFFFFFFFFFF
    )
    local = (b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 45, 0, 0, 0, 0, crc, len(payload),
        0xFFFFFFFF, len(name), 0) + name + payload)
    cd = (b"PK\x01\x02" + struct.pack(
        "<HHHHHHIIIHHHHHII", 45, 45, 0, 0, 0, 0, crc, len(payload),
        0xFFFFFFFF, len(name), len(z64), 0, 0, 0, 0, 0) + name + z64)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(cd), len(local), 0)
    assert parse_zip_members(local + cd + eocd) is None


def test_tar_named_pk_not_misrouted():
    # a tar whose first member starts with 'PK' must sniff as tar
    # (finding 3)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        ti = tarfile.TarInfo("PKI/cert.pem")
        ti.size = 4
        t.addfile(ti, io.BytesIO(b"cert"))
    blob = buf.getvalue()
    assert sniff_archive(blob) == "tar"
    fmt, members = archive_member_list(blob)
    assert fmt == "tar" and members[0]["name"] == "PKI/cert.pem"


def test_multi_member_gzip_and_truncated_gzip():
    # concatenated gzip members are one valid stream (finding 4)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        ti = tarfile.TarInfo("a.txt")
        ti.size = 600
        t.addfile(ti, io.BytesIO(b"A" * 600))
    tblob = buf.getvalue()
    half = len(tblob) // 2
    gz = gzip.compress(tblob[:half]) + gzip.compress(tblob[half:])
    fmt, members = archive_member_list(gz)
    assert fmt == "tar.gz" and members[0]["name"] == "a.txt"
    # a gzip cut mid-payload is refused, not silently shortened
    cut = gzip.compress(tblob)[:-20]
    assert archive_member_list(cut) is None


def test_lying_member_skipped_siblings_extracted(spark):
    # finding 8: one member lying about its size must not abort the
    # rest — hand-build good + lying + good (stored members)
    def stored(name, payload, fake_usize=None):
        crc = zlib.crc32(payload)
        usize = len(payload) if fake_usize is None else fake_usize
        local = (b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 20, 0, 0, 0, 0, crc, len(payload),
            usize, len(name), 0) + name + payload)
        return local, crc, usize

    parts, cds, off = [], [], 0
    for name, payload, fake in [
        (b"one.txt", b"first", None),
        (b"lie.txt", b"liar!", 4),       # wrong size → _Broken skip
        (b"two.txt", b"third", None),
    ]:
        local, crc, usize = stored(name, payload, fake)
        cds.append((b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, 0, 0, 0, crc,
            len(payload), usize, len(name), 0, 0, 0, 0, 0, off)
            + name))
        parts.append(local)
        off += len(local)
    cd = b"".join(cds)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 3, 3, len(cd), off, 0)
    blob = b"".join(parts) + cd + eocd
    archives = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, blob binary"
    )
    out = {r["member"]: bytes(r["blob"])
           for r in archive_extract(archives).collect()}
    assert out == {"one.txt": b"first", "two.txt": b"third"}


def test_zip_bzip2_and_lzma_methods_differential():
    # methods 12 and 14: stdlib-authored, our reader inverts them
    for method, label in [(zipfile.ZIP_BZIP2, "bzip2"),
                          (zipfile.ZIP_LZMA, "lzma")]:
        payload = b"stdlib method payload " * 40
        blob = _stdlib_zip([("m.bin", payload)], compress=method)
        members = parse_zip_members(blob)
        assert members[0]["method"] == label
        assert zip_extract_member(blob, members[0]) == payload
        # corrupt the compressed stream → _Broken, never a crash
        mut = bytearray(blob)
        start, clen = zip_member_range(bytes(mut), members[0])
        mut[start + clen // 2] ^= 0xFF
        with pytest.raises(_Broken):
            zip_extract_member(bytes(mut), members[0])


def test_tar_signed_byte_sum_checksum_accepted():
    # pre-POSIX tars sum header bytes as SIGNED chars; GNU tar and
    # stdlib tarfile accept either convention (advice catch r10) —
    # a high-byte name under the signed sum must not S4-skip
    payload = b"signed sum"
    hdr = bytearray(512)
    name = "café.txt".encode("utf-8")  # bytes >= 0x80
    hdr[0:len(name)] = name
    hdr[100:108] = b"0000644\x00"
    hdr[124:136] = ("%011o" % len(payload)).encode() + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[156] = ord("0")
    hdr[257:263] = b"ustar\x00"
    signed = sum(
        b - 256 if b >= 0x80 else b for b in hdr[:148]
    ) + 8 * 0x20 + sum(
        b - 256 if b >= 0x80 else b for b in hdr[156:]
    )
    hdr[148:156] = ("%06o" % (signed & 0o777777)).encode() + b"\x00 "
    # the unsigned sum differs (name has high bytes) — only the
    # signed convention matches
    assert sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:]) != signed
    blob = bytes(hdr) + payload + b"\x00" * (512 - len(payload)) + (
        b"\x00" * 1024
    )
    # differential: stdlib tarfile reads it
    with tarfile.open(fileobj=io.BytesIO(blob)) as t:
        assert t.getmembers()[0].size == len(payload)
    members = parse_tar_members(blob)
    assert len(members) == 1
    assert tar_extract_member(blob, members[0]) == payload
    # a checksum wrong under BOTH conventions is still refused
    bad = bytearray(blob)
    bad[125] ^= 0x01
    assert parse_tar_members(bytes(bad)) is None
