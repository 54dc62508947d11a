"""Clean-room FLAC codec (operators/flac.py): HAND-BUILT byte
fixtures written field-by-field from RFC 9639's published layouts —
independent of the module's own encoder, so encoder and decoder
cannot co-confirm a misreading (the test-strategy precedent of
tests/test_pdf.py) — encoder↔decoder differentials across every wire
shape, the spec MD5 integrity check, CRC refusal, damage sweeps, a
hypothesis property differential, and the Spark kernel vs the
driver-side reference. The independent CRC references below are
computed by plain bitwise long division — a different algorithm than
the module's table-driven form."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.flac import (
    build_flac_fixture,
    crc8,
    crc16,
    decode_flac,
    decode_flac_pcm,
    encode_flac,
    flac_meta,
    parse_flac_meta,
    sniff_flac,
    synthetic_flac_corpus,
)


# ── independent CRC references (bitwise long division) ──────────


def _crc_longdiv(data: bytes, poly: int, width: int) -> int:
    reg = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            fb = (reg >> (width - 1)) ^ bit
            reg = ((reg << 1) & mask) | 0
            if fb:
                reg ^= poly & mask
    return reg


def test_crc_against_independent_long_division():
    for data in (b"", b"\x00", b"123456789", bytes(range(64))):
        assert crc8(data) == _crc_longdiv(data, 0x07, 8), data
        assert crc16(data) == _crc_longdiv(data, 0x8005, 16), data


# ── hand-built byte fixture ─────────────────────────────────────


def _hand_built_flac(md5: bytes | None = None) -> tuple[bytes, list]:
    """Minimal spec-layout FLAC written byte-by-byte: STREAMINFO
    (rate 8000, mono, 16-bit, 4 samples) + one frame with a VERBATIM
    subframe. Returns (blob, expected samples)."""
    samples = [5, -3, 1027, -1028]
    si = bytearray()
    si += (16).to_bytes(2, "big")        # min blocksize
    si += (4096).to_bytes(2, "big")      # max blocksize
    si += (0).to_bytes(3, "big") * 2     # min/max framesize
    # rate(20) | ch-1(3) | bps-1(5) | total(36) = 64 bits
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | 4
    si += packed.to_bytes(8, "big")
    si += md5 if md5 is not None else b"\x00" * 16
    assert len(si) == 34
    blob = bytearray(b"fLaC")
    blob += bytes([0x80]) + (34).to_bytes(3, "big") + si
    frame = bytearray()
    frame += b"\xff\xf8"                 # sync + reserved + fixed-bs
    frame += bytes([0x60])               # bs code 6 | sr code 0
    frame += bytes([0x00])               # ch 0 | ss 0 | reserved
    frame += bytes([0x00])               # coded frame number 0
    frame += bytes([0x03])               # 8-bit blocksize-1 = 3
    frame += bytes([crc8(bytes(frame))])
    frame += bytes([0x02])               # pad0|type 000001|no wasted
    for s in samples:
        frame += (s & 0xFFFF).to_bytes(2, "big")
    frame += crc16(bytes(frame)).to_bytes(2, "big")
    return bytes(blob + frame), samples


def test_hand_built_fixture_decodes():
    blob, samples = _hand_built_flac()
    dec = decode_flac_pcm(blob)
    assert dec is not None
    chans, rate, bps, md5_ok = dec
    assert chans == [samples] and rate == 8000 and bps == 16
    assert md5_ok is None  # zero MD5 in STREAMINFO = unset
    m = parse_flac_meta(blob)
    assert m["total_samples"] == 4 and m["n_frames"] == 1
    assert sniff_flac(blob) and not sniff_flac(b"RIFFxxxx")


def test_hand_built_fixture_md5_verdict():
    # the spec MD5 is over interleaved little-endian PCM — computed
    # HERE with hashlib directly, independent of the module
    samples = [5, -3, 1027, -1028]
    raw = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    good, _ = _hand_built_flac(md5=hashlib.md5(raw).digest())
    assert decode_flac_pcm(good)[3] is True
    bad, _ = _hand_built_flac(md5=hashlib.md5(b"wrong").digest())
    assert decode_flac_pcm(bad)[3] is False


def test_hand_built_crc_refusal():
    blob, _ = _hand_built_flac()
    # flip one PCM byte: frame CRC-16 must refuse the frame
    mut = bytearray(blob)
    mut[-4] ^= 0x01
    assert decode_flac_pcm(bytes(mut)) is None
    # flip a header byte past the sync: CRC-8 must refuse
    mut = bytearray(blob)
    mut[len(blob) - len(_hand_built_flac()[0]) + 45] ^= 0x01
    assert decode_flac_pcm(bytes(mut)) is None


# ── encoder↔decoder differentials ───────────────────────────────


def _sig(n, amp=1000, period=37):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * t / period)).astype(int).tolist()


@pytest.mark.parametrize("kw", [
    dict(subframe="constant"),
    dict(subframe="verbatim", blocksize=256),
    dict(subframe="fixed", order=0, blocksize=200),
    dict(subframe="fixed", order=1, blocksize=200),
    dict(subframe="fixed", order=2, blocksize=200),
    dict(subframe="fixed", order=3, blocksize=200),
    dict(subframe="fixed", order=4, blocksize=200),
    dict(subframe="lpc", lpc_coefs=[40, -20, 10], blocksize=250),
    dict(subframe="fixed", order=2, partition_order=2, blocksize=256),
    dict(subframe="fixed", order=1, rice5=True, blocksize=200),
    dict(subframe="fixed", order=0, escape_raw=14, blocksize=100),
    dict(subframe="verbatim", wasted=3, blocksize=128),
    dict(blocksize=192),                 # multi-frame
    dict(blocksize=256, variable_blocking=True),
    dict(tags={"TITLE": "t", "ARTIST": "a"}, blocksize=500),
])
def test_round_trip_mono_shapes(kw):
    chans = (
        [[42] * 500] if kw.get("subframe") == "constant"
        else [[s * 8 for s in _sig(400, amp=100)]] if kw.get("wasted")
        else [_sig(1000)]
    )
    blob = encode_flac(chans, **kw)
    dec = decode_flac_pcm(blob)
    assert dec is not None
    assert dec[0] == [[int(s) for s in c] for c in chans]
    assert dec[3] is True  # spec MD5 green = full value integrity


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_round_trip_stereo_modes(mode):
    chans = [_sig(900), _sig(900, amp=700, period=23)]
    blob = encode_flac(
        chans, stereo_mode=mode, subframe="fixed", order=2,
        blocksize=300,
    )
    dec = decode_flac_pcm(blob)
    assert dec is not None and dec[3] is True
    assert dec[0] == [[int(s) for s in c] for c in chans]


@pytest.mark.parametrize("bps,amp", [(8, 100), (16, 9000), (24, 4e6)])
def test_round_trip_sample_sizes(bps, amp):
    chans = [_sig(300, amp=amp)]
    blob = encode_flac(chans, bps=bps, subframe="fixed", order=2,
                       blocksize=150)
    dec = decode_flac_pcm(blob)
    assert dec is not None and dec[3] is True and dec[2] == bps
    assert dec[0] == [[int(s) for s in c] for c in chans]


def test_escape_width_refused_not_wrapped():
    # a residual that does not fit the escape width must refuse at
    # ENCODE time — a masked write would emit a CRC-valid stream
    # that decodes to wrong samples
    with pytest.raises(ValueError):
        encode_flac([[0, 0, 20_000]], subframe="fixed", order=1,
                    escape_raw=4, blocksize=3)


def test_decode_flac_mono_folding_and_scale():
    chans = [[16384] * 100, [-16384] * 100]
    blob = encode_flac(chans, subframe="constant", blocksize=100)
    mono, rate = decode_flac(blob)
    assert rate == 16_000
    assert np.allclose(mono, 0.0)
    blob = encode_flac([[16384] * 64], subframe="constant",
                       blocksize=64)
    mono, _ = decode_flac(blob)
    assert np.allclose(mono, 0.5)


def test_damage_sweeps_never_raise():
    blob = build_flac_fixture(5)
    for cut in range(0, len(blob), 7):
        r = decode_flac_pcm(blob[:cut])
        assert r is None or isinstance(r, tuple)
    rng = np.random.default_rng(3)
    for _ in range(120):
        mut = bytearray(blob)
        mut[int(rng.integers(len(mut)))] ^= 1 << int(rng.integers(8))
        r = decode_flac_pcm(bytes(mut))
        assert r is None or isinstance(r, tuple)
        m = parse_flac_meta(bytes(mut))
        assert m is None or isinstance(m, dict)
    assert decode_flac_pcm(b"") is None
    assert decode_flac_pcm(b"fLaC") is None
    assert decode_flac_pcm(b"not flac at all") is None


def test_wav_and_flac_fingerprints_identical():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
        decode_audio,
        frame_fingerprints,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        encode_wav_pcm16,
    )

    t = np.arange(16_000)
    pcm = (
        2000 * np.sin(2 * np.pi * t / 50)
        + 500 * np.sin(2 * np.pi * t / 13)
    ).astype(np.int16)
    wav = decode_audio(encode_wav_pcm16(pcm, 16_000))
    fl = decode_audio(encode_flac([pcm.tolist()], rate=16_000))
    assert wav is not None and fl is not None
    assert np.array_equal(wav[0], fl[0]) and wav[1] == fl[1]
    fps_w = frame_fingerprints(*wav)
    fps_f = frame_fingerprints(*fl)
    assert fps_w == fps_f and len(fps_w) > 20


def test_corpus_deterministic_and_covers_shapes():
    saw = set()
    for d in range(60):
        assert build_flac_fixture(d) == build_flac_fixture(d)
        m = parse_flac_meta(build_flac_fixture(d))
        assert m is not None and m["decoded_samples"] == (
            m["total_samples"]
        ), d
        saw.add((m["channels"], m["title"] is not None))
    assert (1, True) in saw and (2, False) in saw


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.integers(-32768, 32767), min_size=1, max_size=300
        ),
        st.sampled_from(["verbatim", "fixed"]),
        st.integers(0, 4),
        st.integers(0, 7),
    )
    def test_property_round_trip(samples, kind, order, param):
        if kind == "fixed" and order > len(samples):
            order = 0
        blob = encode_flac(
            [samples], subframe=kind, order=order,
            rice_param=param, blocksize=128,
        )
        dec = decode_flac_pcm(blob)
        assert dec is not None and dec[3] is True
        assert dec[0] == [samples]
except ImportError:  # pragma: no cover
    pass


@pytest.mark.usefixtures("spark")
class TestKernel:
    def test_flac_meta_equals_driver(self, spark, sf_dir):
        import zlib

        from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
        from pyspark.sql import functions as F

        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 40
        )
        rows = {
            r["doc_id"]: r
            for r in flac_meta(
                synthetic_flac_corpus(docs).select("doc_id", "blob")
            ).collect()
        }
        for d in range(40):
            if d % 11 == 7:
                assert d not in rows, d  # garbage → S4
                continue
            blob = build_flac_fixture(d)
            meta = parse_flac_meta(blob)
            chans, _r, bps, md5_ok = decode_flac_pcm(blob)
            width = (bps + 7) // 8
            raw = b"".join(
                int(chans[c][i]).to_bytes(width, "little", signed=True)
                for i in range(len(chans[0]))
                for c in range(len(chans))
            )
            r = rows[d]
            assert r["n_frames"] == meta["n_frames"]
            assert r["md5_state"] == 1 and md5_ok is True
            assert r["pcm_crc32"] == zlib.crc32(raw), d
            assert r["title"] == meta["title"]


def test_sample_bomb_cap_scales_with_channel_count(monkeypatch):
    # The retained-PCM bomb cap must bound total×nch (what decode
    # actually holds), not per-channel totals: a Rice-escape bomb in
    # an 8-channel stream otherwise retains 8× the cap (review
    # catch). Metadata-only walks retain nothing, so there the cap
    # stays a CPU bound on raw totals.
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import flac as flacmod

    n = 512
    chans = [
        [((i * (c + 3)) % 97) - 48 for i in range(n)] for c in range(4)
    ]
    blob = flacmod.encode_flac(chans, blocksize=128)
    # full decode fine under a generous cap
    assert flacmod.decode_flac_pcm(blob) is not None
    # cap set so total(512) <= cap but total*nch(2048) > cap:
    # decode (retains) must refuse, meta-only walk must still pass
    monkeypatch.setattr(flacmod, "_MAX_TOTAL_SAMPLES", 1024)
    assert flacmod.decode_flac_pcm(blob) is None
    info, _tags, pos = flacmod._walk_metadata(blob)
    info["__first_frame"] = pos
    out, _rate, n_frames, total = flacmod._walk_frames(
        blob, info, keep_samples=False
    )
    assert total == n and n_frames == 4
    assert all(not c for c in out)
