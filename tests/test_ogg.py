"""Ogg container walk (operators/ogg.py): hand-built page fixture
written field-by-field from RFC 3533's layout with an independently
computed CRC (bitwise long division — different algorithm than the
module's table form), encoder round trips across codecs/packet
shapes incl. cross-page continuation, damage semantics, and the
Spark kernel vs the driver-side reference."""

from __future__ import annotations

import struct

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.ogg import (
    encode_ogg_opus,
    encode_ogg_vorbis,
    ogg_crc,
    ogg_meta,
    parse_ogg_meta,
    sniff_ogg,
)


def _crc_longdiv(data: bytes) -> int:
    reg = 0
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            fb = (reg >> 31) ^ bit
            reg = (reg << 1) & 0xFFFFFFFF
            if fb:
                reg ^= 0x04C11DB7
    return reg


def test_crc_against_independent_long_division():
    for data in (b"", b"\x00", b"OggS123456", bytes(range(200))):
        assert ogg_crc(data) == _crc_longdiv(data), data


def _hand_built_page() -> bytes:
    """One BOS+EOS page, serial 7, one 19-byte OpusHead packet —
    every field placed by hand per RFC 3533 §6."""
    head = b"OpusHead" + bytes([1, 2]) + struct.pack("<HIhB", 100, 8000, 0, 0)
    assert len(head) == 19
    page = bytearray()
    page += b"OggS"                       # capture pattern
    page += bytes([0])                    # version
    page += bytes([2 | 4])                # BOS | EOS
    page += struct.pack("<q", 4900)       # granule position
    page += struct.pack("<I", 7)          # serial
    page += struct.pack("<I", 0)          # page sequence
    page += b"\x00\x00\x00\x00"           # CRC placeholder
    page += bytes([1, len(head)])         # 1 lacing value
    page += head
    crc = _crc_longdiv(bytes(page))       # INDEPENDENT crc
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def test_hand_built_page_parses():
    blob = _hand_built_page()
    m = parse_ogg_meta(blob)
    assert m is not None and len(m) == 1
    s = m[0]
    assert s["serial"] == 7 and s["codec"] == "opus"
    assert s["channels"] == 2 and s["sample_rate"] == 8000
    assert s["pre_skip"] == 100 and s["eos"]
    # (4900 - 100) / 48000 s = 100 ms
    assert s["duration_ms"] == 100
    assert sniff_ogg(blob) and not sniff_ogg(b"RIFF")
    # CRC tamper → the only page refuses → S4 None
    mut = bytearray(blob)
    mut[-1] ^= 0x01
    assert parse_ogg_meta(bytes(mut)) is None


def test_opus_round_trip_duration_and_tags():
    blob = encode_ogg_opus(
        n_frames=50, pre_skip=312,
        tags={"TITLE": "Song", "ARTIST": "Band"},
    )
    (s,) = parse_ogg_meta(blob)
    assert s["codec"] == "opus" and s["channels"] == 1
    assert s["duration_ms"] == 50 * 960 * 1000 // 48_000
    assert (s["title"], s["artist"]) == ("Song", "Band")
    assert s["eos"] and s["n_packets"] == 52


def test_vorbis_round_trip():
    blob = encode_ogg_vorbis(n_packets=40, tags={"title": "V"})
    (s,) = parse_ogg_meta(blob)
    assert s["codec"] == "vorbis"
    assert (s["channels"], s["sample_rate"]) == (2, 44_100)
    assert s["duration_ms"] == 1024 * 40 * 1000 // 44_100
    assert s["title"] == "V" and s["artist"] is None


def test_multiplexed_streams_and_big_packet_continuation():
    # two logical streams interleaved by concatenation of their page
    # sequences is NOT valid ogg muxing, so build a real mux: pages
    # from both serials in one byte stream (RFC 3533 allows any page
    # interleave); also a >255*3-byte tag packet forces lacing-255
    # continuation
    big_tags = {"title": "x" * 900}
    a = encode_ogg_opus(n_frames=3, serial=1, tags=big_tags)
    b = encode_ogg_vorbis(n_packets=3, serial=2)
    m = parse_ogg_meta(a + b)
    assert m is not None and [s["serial"] for s in m] == [1, 2]
    assert m[0]["title"] == "x" * 900  # reassembled across lacing
    assert m[0]["codec"] == "opus" and m[1]["codec"] == "vorbis"


def test_damage_sweeps_never_raise():
    blob = encode_ogg_opus(n_frames=20, tags={"a": "b"})
    for cut in range(0, len(blob), 13):
        r = parse_ogg_meta(blob[:cut])
        assert r is None or isinstance(r, list)
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(100):
        mut = bytearray(blob)
        mut[int(rng.integers(len(mut)))] ^= 1 << int(rng.integers(8))
        r = parse_ogg_meta(bytes(mut))
        assert r is None or isinstance(r, list)
    assert parse_ogg_meta(b"") is None
    assert parse_ogg_meta(b"not ogg at all, truly") is None


def test_mid_stream_damage_surfaces_prefix():
    # lenient reader: a CRC-broken LATER page stops the walk but the
    # identified stream (BOS pages intact) still surfaces
    blob = bytearray(encode_ogg_opus(n_frames=40, page_size=512))
    second_page = blob.index(b"OggS", 4)
    third_page = blob.index(b"OggS", second_page + 4)
    blob[third_page + 40] ^= 0xFF
    m = parse_ogg_meta(bytes(blob))
    assert m is not None and m[0]["codec"] == "opus"
    assert m[0]["n_pages"] >= 2 and not m[0]["eos"]


@pytest.mark.usefixtures("spark")
def test_kernel_equals_driver(spark):
    blobs = [
        (1, encode_ogg_opus(n_frames=25, tags={"TITLE": "t1"})),
        (2, encode_ogg_vorbis(n_packets=12)),
        (3, b"garbage, not a container"),
    ]
    df = spark.createDataFrame(
        [(d, bytearray(b)) for d, b in blobs],
        "doc_id long, blob binary",
    )
    got = {}
    for r in ogg_meta(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["codec"], r["channels"], r["sample_rate"],
             r["duration_ms"], r["title"])
        )
    for d, blob in blobs:
        ref = parse_ogg_meta(blob)
        if ref is None:
            assert d not in got
            continue
        assert got[d] == [
            (m["codec"], m["channels"], m["sample_rate"],
             m["duration_ms"], m["title"])
            for m in ref
        ]


# ── r12: Theora id-header dimensions (review catch) ─────────────


def _theora_id(fmbw_mb, fmbh_mb, picw, pich):
    """Hand-built Theora I id header, field-by-field from spec §6.2:
    magic, VMAJ/VMIN/VREV, FMBW/FMBH (16-bit macroblock counts),
    PICW/PICH (24-bit exact picture size), PICX/PICY, FRN/FRD,
    PARN/PARD, colorspace, NOMBR, quality/kfg bits."""
    p = b"\x80theora"
    p += bytes([3, 2, 1])                       # VMAJ VMIN VREV
    p += fmbw_mb.to_bytes(2, "big")             # FMBW
    p += fmbh_mb.to_bytes(2, "big")             # FMBH
    p += picw.to_bytes(3, "big")                # PICW
    p += pich.to_bytes(3, "big")                # PICH
    p += bytes([0, 0])                          # PICX PICY
    p += (30).to_bytes(4, "big")                # FRN
    p += (1).to_bytes(4, "big")                 # FRD
    p += (0).to_bytes(3, "big")                 # PARN
    p += (0).to_bytes(3, "big")                 # PARD
    p += bytes([0])                             # colorspace
    p += (0).to_bytes(3, "big")                 # NOMBR
    p += bytes([0, 0])                          # QUAL/KFGSHIFT/PF
    assert len(p) == 42
    return p


def test_theora_id_header_dimensions():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.ogg import (  # noqa: E501
        _ident,
    )

    # 640x480: FMBW=40, FMBH=30; exact picture size preferred
    codec, info = _ident(_theora_id(40, 30, 640, 480))
    assert codec == "theora"
    assert (info["width"], info["height"]) == (640, 480)
    # non-mod-16 picture inside a larger macroblock frame
    codec, info = _ident(_theora_id(7, 5, 100, 70))
    assert codec == "theora"
    assert (info["width"], info["height"]) == (100, 70)
    # non-conformant zero PICW/PICH → macroblock-frame fallback
    codec, info = _ident(_theora_id(40, 30, 0, 0))
    assert (info["width"], info["height"]) == (640, 480)
