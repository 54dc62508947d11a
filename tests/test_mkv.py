"""Matroska/WebM (EBML) container layer: vint framing pinned with
hand-computed bytes, a HAND-BUILT element tree independent of the
module's own encoder, encoder round trips across wire shapes
(SimpleBlock vs BlockGroup, unknown-size clusters, doctype/Cues
variants), cue-index validation against a lying index, truncation /
bit-flip / bomb sweeps, and the Spark kernels over the synthetic
corpus."""

from __future__ import annotations

import struct
import zlib

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mkv import (
    _Bomb,
    _read_vint,
    _Truncated,
    encode_mkv,
    mkv_cues,
    mkv_keyframe_ranges,
    mkv_meta,
    parse_mkv_meta,
    sample_mkv_keyframes,
    synthetic_mkv_corpus,
)


# ── vint framing (RFC 8794 §4) ──────────────────────────────────


def test_vint_widths_hand_computed():
    # 1-byte: 1xxxxxxx → value 0x7F max
    assert _read_vint(b"\x81", 0, False) == (1, 1)
    assert _read_vint(b"\xfe", 0, False) == (0x7E, 1)
    # 2-byte: 01xxxxxx xxxxxxxx
    assert _read_vint(b"\x41\x23", 0, False) == (0x123, 2)
    # 4-byte ID keeps its marker (Segment)
    assert _read_vint(b"\x18\x53\x80\x67", 0, True) == (0x18538067, 4)
    # all-ones data = unknown size at every width
    assert _read_vint(b"\xff", 0, False)[0] == -1
    assert _read_vint(b"\x7f\xff", 0, False)[0] == -1
    # 0x00 first byte = >8-byte vint: malformed
    with pytest.raises(_Truncated):
        _read_vint(b"\x00\x01", 0, False)
    with pytest.raises(_Truncated):
        _read_vint(b"\x41", 0, False)  # cut mid-vint


# ── hand-built element tree (independent of encode_mkv) ─────────


def _hb_el(eid: int, payload: bytes) -> bytes:
    ide = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    # hand-build the size as a 2-byte vint for variety
    assert len(payload) < 0x3FFF
    size = (0x4000 | len(payload)).to_bytes(2, "big")
    return ide + size + payload


def _hand_built() -> bytes:
    head = _hb_el(
        0x1A45DFA3,  # EBML
        _hb_el(0x4282, b"webm") + _hb_el(0x4286, b"\x01"),
    )
    info = _hb_el(
        0x1549A966,
        _hb_el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        + _hb_el(0x4489, struct.pack(">d", 600.0)),
    )
    track = _hb_el(
        0x1654AE6B,
        _hb_el(
            0xAE,
            _hb_el(0xD7, b"\x01") + _hb_el(0x83, b"\x01")
            + _hb_el(0x86, b"V_VP9")
            + _hb_el(
                0xE0,
                _hb_el(0xB0, (320).to_bytes(2, "big"))
                + _hb_el(0xBA, (240).to_bytes(2, "big")),
            ),
        ),
    )
    # cluster: ts=100, one keyframe SimpleBlock (track 1, rel +5,
    # flags 0x80) and one delta block
    kf_payload = b"KEYFRAME-BYTES"
    blocks = (
        _hb_el(0xA3, b"\x81" + struct.pack(">h", 5) + b"\x80"
               + kf_payload)
        + _hb_el(0xA3, b"\x81" + struct.pack(">h", 38) + b"\x00"
                 + b"delta")
    )
    cluster = _hb_el(
        0x1F43B675, _hb_el(0xE7, b"\x64") + blocks
    )
    segment = _hb_el(0x18538067, info + track + cluster)
    return head + segment, kf_payload


def test_hand_built_tree_meta_and_keyframes():
    blob, kf_payload = _hand_built()
    m = parse_mkv_meta(blob)
    assert m["doctype"] == "webm"
    assert m["duration_ms"] == 600
    assert m["n_tracks"] == 1 and m["n_clusters"] == 1
    assert m["n_blocks"] == 2
    tr = m["tracks"][0]
    assert (tr["track_id"], tr["type"], tr["codec"]) == (
        1, "video", "V_VP9"
    )
    assert (tr["width"], tr["height"]) == (320, 240)
    kf = mkv_keyframe_ranges(blob)
    assert len(kf) == 1
    r = kf[0]
    assert blob[r["offset"]:r["offset"] + r["size"]] == kf_payload
    assert r["timestamp_ms"] == 105  # cluster 100 + rel 5 @ 1ms scale
    assert r["laced"] == 0


# ── encoder round trips ─────────────────────────────────────────


def _two_track_fixture(**kw):
    tracks = [
        {"track_id": 1, "type": "video", "codec": "V_VP9",
         "width": 640, "height": 360},
        {"track_id": 2, "type": "audio", "codec": "A_OPUS",
         "sample_rate": 44100.0, "channels": 1},
    ]
    clusters = [
        {"timestamp": 0,
         "blocks": [(1, 0, True, b"K0"), (1, 33, False, b"d"),
                    (2, 0, True, b"a0")]},
        {"timestamp": 500,
         "blocks": [(1, 0, True, b"K1K1"), (2, 7, True, b"a1")]},
    ]
    return encode_mkv(tracks, clusters, duration_ticks=1000.0, **kw)


@pytest.mark.parametrize("unk", [False, True])
@pytest.mark.parametrize("doctype", ["webm", "matroska"])
def test_roundtrip_matrix(unk, doctype):
    blob = _two_track_fixture(
        unknown_size_clusters=unk, doctype=doctype
    )
    m = parse_mkv_meta(blob)
    assert m["doctype"] == doctype
    assert m["n_tracks"] == 2 and m["n_clusters"] == 2
    assert m["duration_ms"] == 1000
    assert m["tracks"][1]["sample_rate"] == 44100.0
    assert m["tracks"][1]["channels"] == 1
    kf = mkv_keyframe_ranges(blob)
    payloads = {blob[r["offset"]:r["offset"] + r["size"]]
                for r in kf}
    assert payloads == {b"K0", b"a0", b"K1K1", b"a1"}
    times = {(r["track_id"], r["timestamp_ms"]) for r in kf}
    assert (1, 500) in times and (2, 507) in times


def test_every_k_cadence_per_track():
    tracks = [{"track_id": 1, "type": "video", "codec": "V_VP9"}]
    clusters = [
        {"timestamp": i * 100,
         "blocks": [(1, 0, True, b"K%d" % i)]}
        for i in range(6)
    ]
    blob = encode_mkv(tracks, clusters)
    kf = mkv_keyframe_ranges(blob, every=2)
    got = [blob[r["offset"]:r["offset"] + r["size"]] for r in kf]
    assert got == [b"K0", b"K2", b"K4"]


def test_blockgroup_reference_semantics():
    tracks = [{"track_id": 1, "type": "video", "codec": "V_VP9"}]
    clusters = [
        {"timestamp": 0,
         "blocks": [(1, 0, True, b"RAP", True),
                    (1, 33, False, b"DELTA", True)]},
    ]
    blob = encode_mkv(tracks, clusters)
    kf = mkv_keyframe_ranges(blob)
    assert [blob[r["offset"]:r["offset"] + r["size"]]
            for r in kf] == [b"RAP"]


def test_laced_block_flagged_whole_payload():
    # hand-flip the lacing bits of a keyframe SimpleBlock
    tracks = [{"track_id": 1, "type": "video", "codec": "V_VP9"}]
    blob = bytearray(encode_mkv(
        tracks, [{"timestamp": 0, "blocks": [(1, 0, True, b"LACEDX")]}]
    ))
    i = bytes(blob).find(b"LACEDX") - 1  # flags byte
    assert blob[i] == 0x80
    blob[i] = 0x80 | 0x06  # EBML lacing
    kf = mkv_keyframe_ranges(bytes(blob))
    assert len(kf) == 1 and kf[0]["laced"] == 1


def test_timestamp_scale_respected():
    tracks = [{"track_id": 1, "type": "video", "codec": "V_VP9"}]
    clusters = [{"timestamp": 4, "blocks": [(1, 1, True, b"K")]}]
    blob = encode_mkv(tracks, clusters, timestamp_scale=500_000,
                      duration_ticks=100.0)
    m = parse_mkv_meta(blob)
    assert m["timestamp_scale_ns"] == 500_000
    assert m["duration_ms"] == 50  # 100 ticks × 0.5ms
    kf = mkv_keyframe_ranges(blob)
    assert kf[0]["timestamp_ms"] == 2  # (4+1) × 0.5ms


# ── cues ────────────────────────────────────────────────────────


def test_cues_validated_against_clusters():
    blob = _two_track_fixture()
    cues = mkv_cues(blob)
    assert cues and all(c["position_valid"] for c in cues)
    assert {c["time_ms"] for c in cues} == {0, 500}
    # corrupt one CueClusterPosition → flagged, not trusted
    mut = bytearray(blob)
    i = bytes(mut).rfind(b"\xf1")  # CueClusterPosition id
    mut[i + 2] ^= 0x3F
    cues2 = mkv_cues(bytes(mut))
    assert any(not c["position_valid"] for c in cues2)


def test_cues_absent_is_empty_not_error():
    blob = _two_track_fixture(with_cues=False)
    assert mkv_cues(blob) == []
    assert parse_mkv_meta(blob)["n_cues"] == 0


# ── damage and bombs ────────────────────────────────────────────


def test_truncation_sweep_never_raises():
    blob = _two_track_fixture()
    for cut in range(0, len(blob), 5):
        r = parse_mkv_meta(blob[:cut])
        assert r is None or isinstance(r, dict)
        assert isinstance(mkv_keyframe_ranges(blob[:cut]), list)
        assert isinstance(mkv_cues(blob[:cut]), list)


def test_bitflip_sweep_never_raises():
    blob = _two_track_fixture()
    for pos in range(0, len(blob), 7):
        mut = bytearray(blob)
        mut[pos] ^= 0x55
        r = parse_mkv_meta(bytes(mut))
        assert r is None or isinstance(r, dict)
        assert isinstance(mkv_keyframe_ranges(bytes(mut)), list)


def test_non_ebml_and_empty():
    assert parse_mkv_meta(None) is None
    assert parse_mkv_meta(b"") is None
    assert parse_mkv_meta(b"RIFF....WEBPVP8 ") is None
    assert parse_mkv_meta(b"\x1a\x45\xdf\xa3") is None  # header only


def test_track_bomb_refuses():
    # 100 tracks > cap
    tracks = [{"track_id": i + 1, "type": "video", "codec": "V"}
              for i in range(100)]
    blob = encode_mkv(tracks, [])
    assert parse_mkv_meta(blob) is None


# ── Spark kernels ───────────────────────────────────────────────


@pytest.mark.usefixtures("spark")
class TestKernels:
    def test_kernels_equal_driver(self, spark):
        docs = spark.range(30).withColumnRenamed("id", "doc_id")
        corpus = synthetic_mkv_corpus(docs).select("doc_id", "blob")
        blobs = {r["doc_id"]: bytes(r["blob"])
                 for r in corpus.collect()}
        meta_rows = {}
        for r in mkv_meta(corpus).collect():
            meta_rows.setdefault(r["doc_id"], []).append(r)
        kf_rows = {}
        for r in sample_mkv_keyframes(corpus, every=2).collect():
            kf_rows.setdefault(r["doc_id"], []).append(r)
        for d, blob in blobs.items():
            m = parse_mkv_meta(blob)
            assert m is not None
            rows = sorted(meta_rows[d], key=lambda r: r["track_idx"])
            assert len(rows) == m["n_tracks"]
            for row, tr in zip(rows, m["tracks"]):
                assert row["codec"] == tr["codec"]
                assert row["n_clusters"] == m["n_clusters"]
            ref = mkv_keyframe_ranges(blob, every=2)
            krows = sorted(
                kf_rows.get(d, []),
                key=lambda r: (r["track_id"], r["timestamp_ms"]),
            )
            refs = sorted(
                ref, key=lambda r: (r["track_id"], r["timestamp_ms"])
            )
            assert len(krows) == len(refs)
            for kr, rr in zip(krows, refs):
                payload = blob[rr["offset"]:rr["offset"] + rr["size"]]
                assert kr["payload_crc32"] == zlib.crc32(payload)

    def test_corpus_cycles_shapes(self, spark):
        docs = spark.range(30).withColumnRenamed("id", "doc_id")
        meta = mkv_meta(
            synthetic_mkv_corpus(docs).select("doc_id", "blob")
        )
        rows = meta.collect()
        doctypes = {r["doctype"] for r in rows}
        assert doctypes == {"webm", "matroska"}
        assert {r["track_type"] for r in rows} == {"video", "audio"}
        assert any(r["n_cues"] == 0 for r in rows)   # d%6==5
        assert any(r["n_cues"] > 0 for r in rows)


# ── review-pass regressions ─────────────────────────────────────


def test_track_127_single_byte_vint():
    # track number 0xFF is a LEGAL all-ones data vint (127), not
    # 'unknown' — the unknown-size rule applies to element sizes
    # only (review catch); hand-build the SimpleBlock
    blob, _ = _hand_built()
    mut = bytearray(blob)
    i = bytes(mut).find(b"\x81" + struct.pack(">h", 5) + b"\x80")
    assert i > 0
    mut[i] = 0xFF  # track 127, minimal width
    kf = mkv_keyframe_ranges(bytes(mut))
    assert len(kf) == 1 and kf[0]["track_id"] == 127


def test_cues_before_clusters_layout_validates():
    # the web-optimized layout places Cues BEFORE the clusters —
    # honest positions must validate (review catch: document-order
    # judging flagged them all)
    info = _hb_el(0x1549A966,
                  _hb_el(0x2AD7B1, (1_000_000).to_bytes(3, "big")))
    track = _hb_el(
        0x1654AE6B,
        _hb_el(0xAE, _hb_el(0xD7, b"\x01") + _hb_el(0x83, b"\x01")
               + _hb_el(0x86, b"V_VP9")),
    )
    cluster = _hb_el(
        0x1F43B675,
        _hb_el(0xE7, b"\x00")
        + _hb_el(0xA3, b"\x81" + struct.pack(">h", 0) + b"\x80"
                 + b"KF"),
    )
    # cues size is fixed once the position field is 4 bytes wide
    def cues_el(pos):
        return _hb_el(
            0x1C53BB6B,
            _hb_el(0xBB, _hb_el(0xB3, b"\x00")
                   + _hb_el(0xB7, _hb_el(0xF7, b"\x01")
                            + _hb_el(0xF1, pos.to_bytes(4, "big")))),
        )

    cues_len = len(cues_el(0))
    pos = len(info) + len(track) + cues_len
    body = info + track + cues_el(pos) + cluster
    head = _hb_el(0x1A45DFA3, _hb_el(0x4282, b"webm"))
    blob = head + _hb_el(0x18538067, body)
    cues = mkv_cues(blob)
    assert len(cues) == 1
    assert cues[0]["position_valid"] == 1, cues
