"""MP4/ISO-BMFF container layer: the parser pinned against HAND-
BUILT byte-level fixtures (struct.pack'ed here from ISO 14496-12's
published layouts — independent of the module's own encoder, so
encoder and parser cannot co-confirm a misreading), encoder round
trips across wire shapes (mvhd v0/v1, stco/co64, largesize, stss
present/absent, multi-chunk stsc), keyframe byte-range hand
derivations with payload CRCs, truncation/garbage sweeps, bomb
guards, and the Spark kernels over the synthetic corpus."""

from __future__ import annotations

import struct
import zlib

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp4 import (
    decode_mp4_samples,
    encode_mp4,
    keyframe_byte_ranges,
    mp4_meta,
    parse_mp4_meta,
    sample_mp4_keyframes,
    synthetic_mp4_corpus,
)


def _b(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fb(btype: bytes, version: int, payload: bytes) -> bytes:
    return _b(btype, struct.pack(">I", version << 24) + payload)


def _hand_built() -> bytes:
    """A minimal valid MP4 written box-by-box from the spec, NOT via
    encode_mp4: ftyp(mp42) + mdat with 3 samples of 5/6/7 bytes +
    moov(mvhd ts=1000 dur=2500, one video trak: mdhd ts=600 dur=1200,
    hdlr vide, stsd avc1 320x180, stts 3 samples, stsz [5,6,7],
    stsc one run of 3/chunk, stco one chunk at the mdat payload,
    stss sync=[1,3])."""
    ftyp = _b(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    samples = [b"\x11" * 5, b"\x22" * 6, b"\x33" * 7]
    mdat = _b(b"mdat", b"".join(samples))
    mdat_payload_off = len(ftyp) + 8
    mvhd = _fb(
        b"mvhd", 0,
        # 16 bytes times/ts/dur + 80 bytes rate..next_track_ID (§8.2.2)
        struct.pack(">IIII", 0, 0, 1000, 2500) + b"\x00" * 80,
    )
    tkhd = _fb(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, 1200) + b"\x00" * 52
        + struct.pack(">II", 320 << 16, 180 << 16),
    )
    mdhd = _fb(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, 600, 1200)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _fb(
        b"hdlr", 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"t\x00",
    )
    # VisualSampleEntry: 6 reserved + u16 data_ref_idx, then 16
    # bytes pre_defined/reserved, u16 width, u16 height (§12.1.3)
    avc1 = _b(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 320, 180) + b"\x00" * 50,
    )
    stsd = _fb(b"stsd", 0, struct.pack(">I", 1) + avc1)
    stts = _fb(b"stts", 0, struct.pack(">III", 1, 3, 400))
    stsz = _fb(
        b"stsz", 0,
        struct.pack(">II", 0, 3) + struct.pack(">III", 5, 6, 7),
    )
    stsc = _fb(b"stsc", 0, struct.pack(">IIII", 1, 1, 3, 1))
    stco = _fb(b"stco", 0, struct.pack(">II", 1, mdat_payload_off))
    stss = _fb(b"stss", 0, struct.pack(">III", 2, 1, 3))
    stbl = _b(b"stbl", stsd + stts + stsz + stsc + stco + stss)
    minf = _b(b"minf", stbl)
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    trak = _b(b"trak", tkhd + mdia)
    moov = _b(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_hand_built_fixture_parses_exactly():
    blob = _hand_built()
    m = parse_mp4_meta(blob)
    assert m == {
        "brand": "mp42",
        "duration_ms": 2500,  # 2500 / 1000 ts
        "n_tracks": 1,
        "tracks": [
            {
                "handler": "vide", "codec": "avc1",
                "width": 320, "height": 180,
                "n_samples": 3, "n_keyframes": 2,
                "duration_ms": 2000,  # 1200 / 600 ts
            }
        ],
    }


def test_hand_built_keyframe_ranges_and_payloads():
    blob = _hand_built()
    got = keyframe_byte_ranges(blob)
    # sync samples 1 and 3; one chunk at ftyp+8 header = payload off;
    # sample 3's offset = chunk + 5 + 6
    off = blob.index(b"\x11" * 5)
    assert got == [
        {"track_idx": 0, "sample_number": 1, "offset": off, "size": 5},
        {"track_idx": 0, "sample_number": 3, "offset": off + 11,
         "size": 7},
    ]
    assert blob[off + 11:off + 18] == b"\x33" * 7
    # every=2 keeps sync list positions 0, 2, ... → sample 1 only
    assert [r["sample_number"] for r in keyframe_byte_ranges(blob, 2)] == [1]


def test_no_stss_means_every_sample_sync():
    blob = encode_mp4(
        [{"handler": "vide", "codec": "avc1", "width": 16, "height": 9,
          "samples": [b"ab", b"cde", b"fghi"]}]
    )
    m = parse_mp4_meta(blob)
    assert m["tracks"][0]["n_keyframes"] == 3
    assert [r["sample_number"] for r in keyframe_byte_ranges(blob)] == [
        1, 2, 3,
    ]


@pytest.mark.parametrize("co64", [False, True])
@pytest.mark.parametrize("mvhd_version", [0, 1])
@pytest.mark.parametrize("large_mdat", [False, True])
def test_wire_shape_round_trips(co64, mvhd_version, large_mdat):
    samples = [bytes([i + 1]) * (3 + i) for i in range(7)]
    blob = encode_mp4(
        [
            {"handler": "vide", "codec": "hvc1", "width": 48,
             "height": 27, "samples": samples,
             "keyframes": [1, 5], "samples_per_chunk": 2},
            {"handler": "soun", "codec": "mp4a",
             "samples": [b"zz"] * 4},
        ],
        movie_timescale=90000,
        movie_duration=180000,
        co64=co64,
        mvhd_version=mvhd_version,
        large_mdat=large_mdat,
    )
    m = parse_mp4_meta(blob)
    assert m["duration_ms"] == 2000
    assert [t["codec"] for t in m["tracks"]] == ["hvc1", "mp4a"]
    assert m["tracks"][0]["n_samples"] == 7
    assert m["tracks"][0]["n_keyframes"] == 2
    assert m["tracks"][1]["n_keyframes"] == 4  # no stss → all sync
    # multi-chunk stsc (2/chunk over 7 samples → chunks of 2,2,2,1):
    # every range must slice exactly its sample's bytes
    for r in keyframe_byte_ranges(blob):
        payload = blob[r["offset"]:r["offset"] + r["size"]]
        if r["track_idx"] == 0:
            i = r["sample_number"] - 1
            assert payload == bytes([i + 1]) * (3 + i)
        else:
            assert payload == b"zz"


def test_truncation_and_garbage_never_raise():
    blob = _hand_built()
    full = keyframe_byte_ranges(blob)
    for i in range(0, len(blob), 7):
        got = parse_mp4_meta(blob[:i])
        assert got is None or isinstance(got, dict)
        kr = keyframe_byte_ranges(blob[:i])
        # a PREFIX can never yield ranges the full blob doesn't have,
        # and every returned range must be inside the prefix
        assert kr is None or all(
            r in full and r["offset"] + r["size"] <= i for r in kr
        )
    # flipping a size byte deep in moov must degrade to None/dict,
    # never an exception
    for pos in range(len(blob) - 200, len(blob), 3):
        mutated = bytearray(blob)
        mutated[pos] ^= 0xFF
        parse_mp4_meta(bytes(mutated))
        keyframe_byte_ranges(bytes(mutated))
    assert parse_mp4_meta(b"") is None
    assert parse_mp4_meta(None) is None
    assert parse_mp4_meta(b"not an mp4 file at all, just text!") is None
    # valid box grammar but zero BMFF boxes (e.g. raw JPEG) → None
    assert parse_mp4_meta(b"\xff\xd8\xff\xe0" + b"\x00" * 64) is None


def test_trailing_junk_keeps_parsed_metadata():
    """Real muxers pad; a torn download keeps a moov-first file's
    whole metadata. Bytes AFTER the structures parsed must not
    discard them (review catch: the old walk threw away a complete
    moov over 3 trailing zero bytes)."""
    blob = _hand_built()
    want = parse_mp4_meta(blob)
    assert parse_mp4_meta(blob + b"\x00\x00\x00") == want
    assert parse_mp4_meta(blob + b"\x99" * 17) == want
    assert keyframe_byte_ranges(blob + b"\x00\x00\x00") == \
        keyframe_byte_ranges(blob)
    # moov-first (faststart) layout with mdat's tail torn off: the
    # metadata is complete even though the ranges must refuse
    moov_at = blob.index(b"moov") - 4
    faststart = blob[:24] + blob[moov_at:] + blob[24:moov_at][:-6]
    got = parse_mp4_meta(faststart)
    assert got is not None and got["tracks"][0]["n_samples"] == 3


def test_undersized_header_boxes_refuse_not_misread():
    """An mvhd holding only its FullBox header must NOT read its
    sibling's bytes as timescale/duration (review catch)."""
    stub_mvhd = _fb(b"mvhd", 0, b"")
    free = _b(b"free", struct.pack(">IIII", 9, 9, 77, 88) + b"\x00" * 60)
    blob = _b(b"ftyp", b"isom" + b"\x00" * 8) + _b(
        b"moov", stub_mvhd + free
    )
    assert parse_mp4_meta(blob) is None


def test_moov_referencing_missing_mdat_bytes_is_refused():
    """A moov whose stco points past the blob (torn download that
    kept the moov but lost the mdat bytes) must not yield ranges —
    the metadata itself stays parseable (tolerant tail), but every
    byte range would slice absent data."""
    blob = _hand_built()
    moov_at = blob.index(b"moov") - 4
    ftyp, moov = blob[:24], blob[moov_at:]
    # patch the stored chunk offset to point far past the blob end
    # (dropping mdat alone would leave the old offset 32 pointing at
    # in-bounds moov bytes — a different failure mode)
    patched = bytearray(moov)
    pos = patched.index(b"stco") + 4 + 4 + 4  # type + fullbox + count
    patched[pos:pos + 4] = struct.pack(">I", 0x7FFF)
    assert parse_mp4_meta(ftyp + bytes(patched)) is not None
    assert keyframe_byte_ranges(ftyp + bytes(patched)) is None


def test_bomb_guards():
    # stts claiming 5M samples → the metadata walk refuses
    stts = _fb(b"stts", 0, struct.pack(">III", 1, 5 << 20, 10))
    trak = _b(
        b"trak", _b(b"mdia", _b(b"minf", _b(b"stbl", stts)))
    )
    blob = _b(b"ftyp", b"isom" + b"\x00" * 8) + _b(
        b"moov", _fb(b"mvhd", 0, struct.pack(">IIII", 0, 0, 1, 1)
                     + b"\x00" * 76) + trak
    )
    assert parse_mp4_meta(blob) is None
    # uniform stsz claiming 4M+1 samples → the RANGE walk (the one
    # that would materialize a size list) refuses before allocating
    stsz = _fb(b"stsz", 0, struct.pack(">II", 1, (1 << 22) + 1))
    stsc = _fb(b"stsc", 0, struct.pack(">IIII", 1, 1, 1, 1))
    stco = _fb(b"stco", 0, struct.pack(">II", 1, 16))
    trak2 = _b(
        b"trak",
        _b(b"mdia", _b(b"minf", _b(b"stbl", stsz + stsc + stco))),
    )
    blob2 = _b(b"ftyp", b"isom" + b"\x00" * 8) + _b(b"moov", trak2)
    assert keyframe_byte_ranges(blob2) is None
    # container nesting deeper than the cap (mdia¹² inside trak):
    # the trak flattening walk must refuse, not descend
    bomb = _fb(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
               + b"\x00" * 12 + b"\x00")
    for _ in range(12):
        bomb = _b(b"mdia", bomb)
    deep = _b(b"ftyp", b"isom" + b"\x00" * 8) + _b(
        b"moov", _b(b"trak", bomb)
    )
    assert parse_mp4_meta(deep) is None
    # a moov nested inside moov is NOT a recursion vector — unknown
    # children are skipped, so the walk stays shallow and the valid
    # outer structure still parses
    nested = b"xxxxxxxx"
    for _ in range(12):
        nested = _b(b"moov", nested)
    got = parse_mp4_meta(_b(b"ftyp", b"isom" + b"\x00" * 8) + nested)
    assert got == {"brand": "isom", "duration_ms": None,
                   "n_tracks": 0, "tracks": []}
    # a TRAILING box whose declared size exceeds the blob is tail
    # junk: boxes already parsed are kept (tolerant tail), and the
    # liar contributes nothing
    lying = struct.pack(">I", 1 << 30) + b"moov" + b"\x00" * 32
    got2 = parse_mp4_meta(_b(b"ftyp", b"isom" + b"\x00" * 8) + lying)
    assert got2 == {"brand": "isom", "duration_ms": None,
                    "n_tracks": 0, "tracks": []}
    # a LEADING liar means no box ever parses → not a BMFF file
    assert parse_mp4_meta(lying + _b(b"ftyp", b"isom" + b"\x00" * 8)) is None


def test_decode_gate_is_loud():
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_samples(b"xx", "avc1")


def test_spark_meta_kernel_matches_driver_parse(spark):
    docs = spark.range(24).withColumnRenamed("id", "doc_id")
    corpus = synthetic_mp4_corpus(docs)
    rows = mp4_meta(corpus.select("doc_id", "blob")).collect()
    # every even doc has an audio track: 24 video + 12 audio rows
    assert len(rows) == 36
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    blobs = {r["doc_id"]: bytes(r["blob"]) for r in corpus.collect()}
    for doc_id, blob in blobs.items():
        want = parse_mp4_meta(blob)
        got = sorted(by_doc[doc_id], key=lambda r: r["track_idx"])
        assert len(got) == want["n_tracks"]
        for g, w in zip(got, want["tracks"]):
            assert g["codec"] == w["codec"]
            assert g["n_samples"] == w["n_samples"]
            assert g["n_keyframes"] == w["n_keyframes"]
            assert g["brand"] == want["brand"]
            assert g["movie_duration_ms"] == want["duration_ms"]


def test_spark_keyframe_kernel_crc_and_s4_skip(spark):
    import pandas as pd

    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    corpus = synthetic_mp4_corpus(docs).select("doc_id", "blob")
    # poison one row: truncated blob must emit nothing, not fail
    poisoned = corpus.toPandas()
    poisoned.loc[poisoned["doc_id"] == 3, "blob"] = (
        poisoned.loc[poisoned["doc_id"] == 3, "blob"].map(
            lambda b: bytes(b)[:40]
        )
    )
    media = spark.createDataFrame(poisoned)
    got = sample_mp4_keyframes(media, every=2).collect()
    assert {r["doc_id"] for r in got} == {0, 1, 2, 4, 5}
    blobs = {int(r["doc_id"]): bytes(r["blob"]) for _, r in
             poisoned.iterrows()}
    for r in got:
        blob = blobs[r["doc_id"]]
        ranges = keyframe_byte_ranges(blob, every=2)
        match = [
            x for x in ranges
            if x["track_idx"] == r["track_idx"]
            and x["sample_number"] == r["sample_number"]
        ]
        assert len(match) == 1
        payload = blob[r["offset"]:r["offset"] + r["size"]]
        assert r["payload_crc32"] == zlib.crc32(payload)


def test_every_validation_is_loud():
    with pytest.raises(ValueError, match="every"):
        keyframe_byte_ranges(_hand_built(), every=0)
