"""Audio near-dup fingerprinting (after Haitsma-Kalker 2002, spatial
bits + simhash-style multi-probe): the claimed invariances are
QUANTIFIED (volume scaling exact, light/heavy noise via probes),
unrelated audio shares nothing, the Spark kernels match the driver
reference, pairs behave like the other dedup tiers (ubiquity cap,
min-shared cut), and corrupt blobs skip (S4)."""

from __future__ import annotations

import numpy as np

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (
    audio_fingerprints,
    audio_near_dup_pairs,
    audio_probes,
    frame_fingerprints,
    probe_keys,
    shared_audio_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
    decode_wav,
    encode_wav_pcm16,
)

RATE = 16_000


def _voice_like(seed: int, seconds: float = 2.0) -> np.ndarray:
    """Deterministic band-limited 'speech-ish' signal: a sum of
    drifting tones inside the 300-3000 Hz fingerprint band plus a
    little shaped noise — enough spectral structure that the sign
    bits carry information."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(RATE * seconds)) / RATE
    x = np.zeros_like(t)
    for _ in range(6):
        f0 = rng.uniform(320, 2800)
        drift = rng.uniform(-80, 80)
        amp = rng.uniform(0.05, 0.2)
        x += amp * np.sin(2 * np.pi * (f0 + drift * t) * t + rng.uniform(0, 6))
    x += 0.01 * rng.standard_normal(t.size)
    return (x / np.max(np.abs(x)) * 0.7).astype(np.float64)


def _shared_probes(a: np.ndarray, b: np.ndarray) -> int:
    pa = set(probe_keys(frame_fingerprints(a, RATE)))
    pb = set(probe_keys(frame_fingerprints(b, RATE)))
    return len(pa & pb)


def test_shape_and_determinism():
    x = _voice_like(1)
    fps = frame_fingerprints(x, RATE)
    assert len(fps) == 1 + (x.size - 1024) // 512  # one per hop
    assert fps == frame_fingerprints(x, RATE)
    assert all(0 <= v < (1 << 16) for v in fps)
    # probes: ≤ 33 per consecutive-frame key, distinct, 32-bit
    probes = probe_keys(fps)
    assert len(probes) <= 33 * (len(fps) - 1)
    assert all(0 <= v < (1 << 32) for v in probes)
    # shorter than one window / unusable rates → empty
    assert frame_fingerprints(x[:1000], RATE) == []
    assert frame_fingerprints(x, 0) == []
    assert frame_fingerprints(x, 4000) == []  # 3 kHz band past Nyquist
    assert probe_keys([]) == [] and probe_keys([7]) == []


def test_invariances_quantified():
    """Volume scaling is an EXACT invariance of the sign bits; light
    and heavy additive noise keep 100+ shared probe keys; an
    unrelated recording shares none."""
    x = _voice_like(2)
    base = frame_fingerprints(x, RATE)
    assert frame_fingerprints(0.5 * x, RATE) == base
    assert frame_fingerprints(0.05 * x, RATE) == base
    rng = np.random.default_rng(99)
    light = _shared_probes(x, x + 0.005 * rng.standard_normal(x.size))
    heavy = _shared_probes(x, x + 0.05 * rng.standard_normal(x.size))
    unrelated = _shared_probes(x, _voice_like(3))
    assert light >= 100, light
    assert heavy >= 20, heavy
    assert unrelated == 0, unrelated


def test_pcm16_round_trip_preserves_fingerprints():
    """encode → decode through the real RIFF path barely perturbs
    the bits (16-bit quantization is ~96 dB SNR): most FRAME hashes
    survive exactly, not just probes."""
    x = _voice_like(4)
    blob = encode_wav_pcm16((x * 20_000).astype(np.int16), RATE)
    decoded, rate = decode_wav(blob)
    assert rate == RATE
    a = frame_fingerprints(x * 20_000 / 32768.0, RATE)
    b = frame_fingerprints(decoded, RATE)
    frac = sum(u == v for u, v in zip(a, b)) / len(a)
    assert frac >= 0.9, frac


def test_kernels_match_driver_and_pairs_find_the_dup(spark):
    """6-doc corpus: doc 1 is doc 0 at 60% volume with noticeable
    noise (the near-dup), docs 2-5 unrelated. Both kernels equal the
    driver reference per doc; the pair query surfaces exactly (0, 1)."""
    rng = np.random.default_rng(7)
    waves = {0: _voice_like(10)}
    waves[1] = 0.6 * waves[0] + 0.02 * rng.standard_normal(waves[0].size)
    for d in range(2, 6):
        waves[d] = _voice_like(20 + d)
    rows = [
        (d, bytearray(encode_wav_pcm16((w * 20_000).astype(np.int16), RATE)))
        for d, w in waves.items()
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")

    by_doc: dict = {d: {} for d in waves}
    for r in audio_fingerprints(media).collect():
        by_doc[r["doc_id"]][r["frame_idx"]] = r["fp"]
    for d in waves:
        want = frame_fingerprints(*decode_wav(bytes(rows[d][1])))
        assert [by_doc[d][i] for i in sorted(by_doc[d])] == want, d

    probe_by_doc: dict = {d: set() for d in waves}
    for r in audio_probes(media).collect():
        probe_by_doc[r["doc_id"]].add(r["probe"])
    for d in waves:
        want = set(probe_keys(frame_fingerprints(*decode_wav(bytes(rows[d][1])))))
        assert probe_by_doc[d] == want, d

    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_probes"]
        for r in audio_near_dup_pairs(media).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)] >= 50
    assert all(k == (0, 1) or v < pairs[(0, 1)] / 3 for k, v in pairs.items())


def test_ubiquity_cap_and_corrupt_blobs(spark):
    """A probe key carried by every doc (shared silence) is dropped
    by the cap exactly like boilerplate chunks; corrupt and non-WAV
    blobs emit nothing (S4)."""
    shared = np.zeros(RATE)  # one second of silence → shared probes
    rows = []
    for d in range(5):
        w = np.concatenate([shared, _voice_like(40 + d, 1.0)])
        rows.append(
            (d, bytearray(encode_wav_pcm16((w * 20_000).astype(np.int16), RATE)))
        )
    rows.append((9, bytearray(b"not a wav at all")))
    rows.append((10, bytearray(b"RIFF\x00\x00\x00\x00WAVEjunk")))
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    probes = audio_probes(media)
    assert probes.filter("doc_id >= 9").count() == 0
    # without a tight cap, shared silence manufactures pairs between
    # EVERY doc pair; capping below the 5 carriers kills exactly those
    loose = shared_audio_pairs(probes, max_posting=64, min_shared=8)
    assert loose.count() == 10  # all C(5,2) silence pairs
    strict = shared_audio_pairs(probes, max_posting=4, min_shared=8)
    assert strict.count() < 10


def test_truncated_fmt_chunk_skips_not_crashes(spark):
    """Review catch (runtime-confirmed): a RIFF blob whose fmt chunk
    is truncated used to raise struct.error out of decode_wav,
    killing the Spark task instead of the S4 per-row skip every
    media kernel promises."""
    import struct

    bad = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 8) + b"\x00" * 8
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert decode_wav(bad) is None
    ok = encode_wav_pcm16(
        (np.zeros(2048)).astype(np.int16), RATE
    )
    media = spark.createDataFrame(
        [(1, bytearray(bad)), (2, bytearray(ok))],
        "doc_id long, blob binary",
    )
    got = audio_fingerprints(media).select("doc_id").distinct().collect()
    assert {r["doc_id"] for r in got} == {2}
    assert audio_probes(media).filter("doc_id = 1").count() == 0


def test_blockwise_framing_is_exact():
    """The bounded-memory frame blocks concatenate to exactly the
    monolithic result — force a tiny block so a short signal crosses
    many boundaries."""
    import amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp as afp

    x = _voice_like(6)
    want = frame_fingerprints(x, RATE)
    orig = afp._FRAME_BLOCK
    afp._FRAME_BLOCK = 3
    try:
        assert frame_fingerprints(x, RATE) == want
    finally:
        afp._FRAME_BLOCK = orig
