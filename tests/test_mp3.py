"""MPEG-audio walk (operators/mp3.py): hand-built frame headers
written bit-by-bit from ISO 11172-3 §2.4.1.3's field layout
(independent of the module's fixture encoder), the spec's published
frame-length identity, ID3v2.2/2.3/2.4 + ID3v1 tag shapes, VBR
headers, damage semantics, and the Spark kernel vs the driver-side
reference."""

from __future__ import annotations

import struct

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (
    build_mp3_fixture,
    encode_mp3,
    mp3_meta,
    parse_id3v1,
    parse_id3v2,
    parse_mp3_meta,
    sniff_mp3,
    synthetic_mp3_corpus,
)


def _hand_header(sync=0x7FF, version=3, layer=1, nocrc=1, bidx=9,
                 sridx=0, pad=0, mode=3, emphasis=0) -> bytes:
    """Field-by-field header assembly straight from the spec's bit
    positions — NOT via the module's encoder (clean-room cross-check).
    Defaults: MPEG-1 (version bits 11), Layer III (layer bits 01),
    128 kbps, 44.1 kHz, mono."""
    h = (
        (sync << 21) | (version << 19) | (layer << 17) | (nocrc << 16)
        | (bidx << 12) | (sridx << 10) | (pad << 9) | (mode << 6)
        | emphasis
    )
    return h.to_bytes(4, "big")


def test_hand_built_header_and_published_frame_length():
    # the canonical public example: FF FB = sync + MPEG-1 + Layer III
    # + no CRC; 128 kbps @ 44.1 kHz has the well-known 417-byte
    # unpadded frame (144 * 128000 / 44100 = 417.96 → 417)
    hdr = _hand_header()
    assert hdr[:2] == b"\xff\xfb"
    frame = hdr + bytes(417 - 4)
    m = parse_mp3_meta(frame + frame)
    assert m is not None
    assert (m["version"], m["layer"]) == ("1", 3)
    assert m["sample_rate"] == 44_100 and m["channels"] == 1
    assert m["bitrate_kbps"] == 128 and m["n_frames"] == 2
    assert m["duration_ms"] == 2 * 1152 * 1000 // 44_100
    # padded frame is one byte longer
    pf = _hand_header(pad=1) + bytes(418 - 4)
    assert parse_mp3_meta(pf + pf)["n_frames"] == 2


def test_hand_built_reserved_fields_refused():
    ok = _hand_header() + bytes(417 - 4)
    # a single unconfirmed frame that does not end at EOF → no sync
    assert parse_mp3_meta(ok + b"\x00" * 50) is None
    for bad in (
        _hand_header(version=1),       # reserved version
        _hand_header(layer=0),         # reserved layer
        _hand_header(bidx=0),          # free format (documented gate)
        _hand_header(bidx=15),         # forbidden bitrate
        _hand_header(sridx=3),         # reserved sample rate
        _hand_header(emphasis=2),      # reserved emphasis
    ):
        assert parse_mp3_meta((bad + bytes(413)) * 2) is None, bad.hex()


def test_mpeg2_and_25_tables():
    # MPEG-2 Layer III 64 kbps @ 22.05 kHz: 576-sample granules,
    # 72 * 64000 / 22050 = 208.9 → 208 bytes
    hdr = _hand_header(version=2, bidx=8, sridx=0)
    m = parse_mp3_meta((hdr + bytes(208 - 4)) * 3)
    assert m["version"] == "2" and m["sample_rate"] == 22_050
    assert m["bitrate_kbps"] == 64 and m["n_frames"] == 3
    # MPEG-2.5 @ 8 kHz exists only through the version-bits-00 escape
    hdr = _hand_header(version=0, bidx=8, sridx=2)
    m = parse_mp3_meta((hdr + bytes(72 * 64000 // 8000 - 4)) * 2)
    assert m["version"] == "2.5" and m["sample_rate"] == 8_000


def test_layer1_slot_length():
    # Layer I counts 4-byte slots: 256 kbps @ 44.1 kHz →
    # (12*256000/44100)*4 = 278.6 → 69*4 = 276 bytes
    hdr = _hand_header(layer=3, bidx=8)  # layer bits 11 = Layer I
    flen = 12 * 256_000 // 44_100 * 4
    m = parse_mp3_meta((hdr + bytes(flen - 4)) * 2)
    assert m["layer"] == 1 and m["n_frames"] == 2
    assert m["duration_ms"] == 2 * 384 * 1000 // 44_100


def test_id3v2_all_majors_and_unsync():
    for major in (2, 3, 4):
        b = encode_mp3(
            n_frames=4, id3v2={"title": "Tt", "artist": "Aé",
                               "album": "Bb"}, id3v2_major=major,
        )
        m = parse_mp3_meta(b)
        assert m["id3v2_major"] == major
        assert (m["title"], m["artist"], m["album"]) == (
            "Tt", "Aé", "Bb"
        ), major
    # unsynchronised tag body (FF 00 stuffing must be undone)
    tags, major, _ = parse_id3v2(
        encode_mp3(n_frames=4, id3v2={"title": "Fancy ÿ"},
                   id3v2_major=3, id3v2_unsync=True)
    )
    assert tags["title"] == "Fancy ÿ" and major == 3


def test_id3v1_trailer_and_precedence():
    b = encode_mp3(n_frames=4, id3v2={"title": "v2 wins"},
                   id3v1={"title": "v1 title", "artist": "v1 artist"})
    m = parse_mp3_meta(b)
    assert m["has_id3v1"]
    assert m["title"] == "v2 wins"        # v2 outranks v1
    assert m["artist"] == "v1 artist"     # v1 fills what v2 lacks
    assert parse_id3v1(b)["title"] == "v1 title"


def test_vbr_headers_and_duration_excludes_carrier():
    b = encode_mp3(n_frames=12, xing="xing", vbr_indices=[3, 5, 7])
    m = parse_mp3_meta(b)
    assert m["vbr"] and m["vbr_tag"] == "xing"
    assert m["n_frames"] == 12 == m["tag_frames"]
    assert m["bitrate_kbps"] is None
    assert m["duration_ms"] == 12 * 1152 * 1000 // 44_100
    # an Info tag on a CBR stream: tag present, stream still CBR
    m = parse_mp3_meta(encode_mp3(n_frames=8, xing="info"))
    assert m["vbr_tag"] == "info" and m["n_frames"] == 8
    m = parse_mp3_meta(encode_mp3(n_frames=9, vbri=True,
                                  vbr_indices=[4, 8]))
    assert m["vbr_tag"] == "vbri" and m["tag_frames"] == 9
    # untagged per-frame bitrate changes still detected as VBR
    m = parse_mp3_meta(encode_mp3(n_frames=10, vbr_indices=[3, 9]))
    assert m["vbr"] and m["vbr_tag"] is None and m["bitrate_kbps"] is None


def test_sync_scan_and_lenient_prefix():
    b = encode_mp3(n_frames=6, junk_prefix=300)
    m = parse_mp3_meta(b)
    assert m is not None and m["n_frames"] == 6
    # mid-stream corruption → the walked prefix surfaces
    # (48 kHz: the encoder never pads, so frames are exactly 384B)
    whole = encode_mp3(n_frames=10, rate=48_000)
    flen = 144 * 128_000 // 48_000
    cut = bytearray(whole)
    cut[5 * flen] = 0x00  # kill the 6th frame's sync
    m = parse_mp3_meta(bytes(cut))
    assert m is not None and m["n_frames"] == 5


def test_damage_sweeps_never_raise():
    full = build_mp3_fixture(12)
    for cutlen in range(0, len(full), 61):
        parse_mp3_meta(full[:cutlen])
    for i in range(0, len(full), 43):
        dam = bytearray(full)
        dam[i] ^= 0x40
        parse_mp3_meta(bytes(dam))
    assert parse_mp3_meta(None) is None
    assert parse_mp3_meta(b"") is None
    assert parse_mp3_meta(b"\xff\xfb") is None


def test_sniff_and_decode_audio_gate():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
        decode_audio,
    )

    mp3 = encode_mp3(n_frames=6)
    assert sniff_mp3(mp3)
    assert sniff_mp3(encode_mp3(n_frames=4, id3v2={"title": "x"}))
    assert not sniff_mp3(b"RIFF\x00\x00\x00\x00WAVE")
    assert not sniff_mp3(b"\x00\x01 junk \xff\xfb junk")
    # an MP3 reaching the audio tier is an explicit S4, not a
    # misparse — and WAV/FLAC keep decoding
    assert decode_audio(mp3) is None
    import io
    import wave as stdwave

    import numpy as np

    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((np.sin(np.arange(200) / 7.0) * 9000)
                      .astype("<i2").tobytes())
    assert decode_audio(buf.getvalue()) is not None


def test_fixture_corpus_deterministic_and_covers_shapes():
    seen_k = set()
    seen_major = set()
    for d in range(0, 132):
        if d % 11 == 7:
            continue
        blob = build_mp3_fixture(d)
        assert blob == build_mp3_fixture(d)
        m = parse_mp3_meta(blob)
        assert m is not None, d
        seen_k.add((m["version"], m["layer"], m["vbr_tag"]))
        if m["id3v2_major"] is not None:
            seen_major.add(m["id3v2_major"])
    assert ("1", 3, None) in seen_k and ("2", 3, None) in seen_k
    assert ("1", 3, "xing") in seen_k and ("1", 3, "vbri") in seen_k
    assert ("1", 2, None) in seen_k and ("2.5", 3, None) in seen_k
    assert seen_major == {2, 3, 4}


class TestKernel:
    def test_mp3_meta_equals_driver(self, spark):
        blobs = [
            (d, build_mp3_fixture(d) if d % 11 != 7
             else b"\x00 garbage \xff\xfb")
            for d in range(60)
        ]
        df = spark.createDataFrame(
            [(d, bytearray(b)) for d, b in blobs],
            "doc_id long, blob binary",
        )
        got = {r["doc_id"]: r for r in mp3_meta(df).collect()}
        for d, blob in blobs:
            ref = parse_mp3_meta(blob)
            if ref is None:
                assert d not in got
                continue
            row = got[d]
            for k in ("version", "layer", "sample_rate", "channels",
                      "n_frames", "duration_ms", "bitrate_kbps",
                      "vbr", "vbr_tag", "tag_frames", "has_crc",
                      "id3v2_major", "has_id3v1", "title", "artist",
                      "album"):
                assert row[k] == ref[k], (d, k, row[k], ref[k])

    def test_corpus_kernel_s4_rows_absent(self, spark):
        docs = spark.range(0, 44).withColumnRenamed("id", "doc_id")
        out = mp3_meta(
            synthetic_mp3_corpus(docs).select("doc_id", "blob")
        ).collect()
        ids = {r["doc_id"] for r in out}
        assert ids == {d for d in range(44) if d % 11 != 7}


def test_cover_art_extraction_and_image_composition():
    import numpy as np

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
        _encode_apic,
        extract_cover_art,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        decode_image,
        encode_png,
    )

    yy, xx = np.mgrid[0:12, 0:10]
    px = np.stack([(xx * 9) % 256, (yy * 7) % 256,
                   (xx + yy) % 256], -1).astype(np.uint8)
    cover = encode_jpeg(px, quality=90)

    def mp3_with(frames: bytes, major: int = 3) -> bytes:
        # splice raw frames into an ID3v2 tag ahead of real audio
        size = len(frames) + 32
        ss = bytes((size >> s) & 0x7F for s in (21, 14, 7, 0))
        tag = b"ID3" + bytes([major, 0, 0]) + ss + frames + b"\x00" * 32
        return tag + encode_mp3(n_frames=4)

    # v2.3 APIC front cover → exact bytes back, and they DECODE
    for major in (2, 3, 4):
        blob = mp3_with(
            _encode_apic("image/jpeg", 3, cover, major=major),
            major=major,
        )
        got = extract_cover_art(blob)
        assert got is not None, major
        mime, ptype, img = got
        assert mime == "image/jpeg" and ptype == 3
        assert img == cover, major
        assert decode_image(img, prefer_pil=False) is not None
        # the tagged file still walks as a normal MP3
        assert parse_mp3_meta(blob)["n_frames"] == 4
    # front cover (type 3) preferred over an icon (type 1)
    png = encode_png(px)
    both = mp3_with(
        _encode_apic("image/png", 1, png)
        + _encode_apic("image/jpeg", 3, cover)
    )
    assert extract_cover_art(both)[1] == 3
    only_icon = mp3_with(_encode_apic("image/png", 1, png))
    mime, ptype, img = extract_cover_art(only_icon)
    assert (mime, ptype, img) == ("image/png", 1, png)
    # no tag / no APIC / damage → None, never a raise
    assert extract_cover_art(encode_mp3(n_frames=4)) is None
    assert extract_cover_art(
        encode_mp3(n_frames=4, id3v2={"title": "x"})
    ) is None
    full = both
    for i in range(0, min(len(full), 400), 11):
        dam = bytearray(full)
        dam[i] ^= 0x7F
        extract_cover_art(bytes(dam))
    for cut in range(0, min(len(full), 400), 17):
        extract_cover_art(full[:cut])


# ── r12 review-pass regressions ─────────────────────────────────


def test_single_frame_with_id3v1_trailer_parses():
    # a one-frame tagged stream was S4-dropped: the lone frame ends
    # 128 bytes before EOF at the 'TAG' trailer (review catch)
    b = encode_mp3(n_frames=1, id3v1={"title": "only one"})
    m = parse_mp3_meta(b)
    assert m is not None and m["n_frames"] == 1
    assert m["has_id3v1"] and m["title"] == "only one"
    assert sniff_mp3(b)
    # bare single frame at EOF still parses (pre-existing behavior)
    assert parse_mp3_meta(encode_mp3(n_frames=1))["n_frames"] == 1
    # but a single frame followed by arbitrary junk stays refused
    assert parse_mp3_meta(
        encode_mp3(n_frames=1) + b"\x00" * 100
    ) is None


def test_id3v24_per_frame_unsynchronisation():
    # v2.4 stuffs per frame with ON-WIRE syncsafe sizes (review
    # catch: the old whole-tag scheme mis-walked real v2.4 files —
    # an FF-bearing early frame shifted every later frame). The
    # encoder now emits the real-writer shape; a tag whose FIRST
    # frame carries 0xFF bytes must still yield the LATER text
    # frames.
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
        _encode_apic,
        _id3_frames,
        extract_cover_art,
    )

    # hand-assemble a v2.4 tag: APIC with raw 0xFF runs (per-frame
    # unsync, flag bit 0x02) followed by TIT2/TPE1
    img = b"\xff\xd8" + b"\xff\xe0\x00\x10" + b"\xff" * 40 + b"\xd9"
    apic_body = (b"\x00image/jpeg\x00\x03cover\x00" + img).replace(
        b"\xff", b"\xff\x00"
    )
    size = bytes((len(apic_body) >> s) & 0x7F for s in (21, 14, 7, 0))
    apic = b"APIC" + size + bytes([0, 0x02]) + apic_body
    tit_body = b"\x03after-pic\x00"
    tit = b"TIT2" + bytes(
        (len(tit_body) >> s) & 0x7F for s in (21, 14, 7, 0)
    ) + b"\x00\x00" + tit_body
    frames = apic + tit
    ss = bytes((len(frames) >> s) & 0x7F for s in (21, 14, 7, 0))
    tag = b"ID3\x04\x00\x00" + ss + frames
    blob = tag + encode_mp3(n_frames=3)
    m = parse_mp3_meta(blob)
    assert m is not None and m["title"] == "after-pic"
    got = extract_cover_art(blob)
    assert got is not None
    mime, ptype, out_img = got
    assert mime == "image/jpeg" and ptype == 3 and out_img == img
    # the shared iterator yields both frames de-stuffed
    fr, major, _ = _id3_frames(blob)
    assert major == 4 and [f[0] for f in fr] == ["APIC", "TIT2"]
    # encoder round trip: v2.4 unsync with FF-prone UTF-8 text
    b2 = encode_mp3(n_frames=4, id3v2={"title": "ÿÿ mark"},
                    id3v2_major=4, id3v2_unsync=True)
    assert parse_mp3_meta(b2)["title"] == "ÿÿ mark"
