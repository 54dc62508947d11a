"""operators/resample.py — clean-room polyphase resampler, pinned
QUANTITATIVELY (accuracy against analytically generated references,
alias rejection in dB, passband flatness) plus the capability it
exists for: cross-sample-rate audio dedup — the same recording
stored at 8/16/44.1 kHz sharing fingerprint probes after canonical-
rate analysis (closing audio_fp's former SCOPE LIMIT)."""

from __future__ import annotations

import numpy as np
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.resample import (
    resample,
)

TRIM = 400  # filter edge transients excluded from accuracy asserts


def _tone(f, rate, dur=1.0):
    t = np.arange(int(rate * dur)) / rate
    return np.sin(2 * np.pi * f * t)


@pytest.mark.parametrize("from_rate,to_rate,tol", [
    (8_000, 16_000, 1e-4),     # integer upsample
    (16_000, 8_000, 1e-4),     # integer downsample
    (44_100, 16_000, 1e-4),    # rational 160/441
    (22_050, 16_000, 1e-4),    # rational 320/441
    (48_000, 44_100, 1e-4),    # rational 147/160
])
def test_tone_matches_analytic_reference(from_rate, to_rate, tol):
    # the output must equal a tone SAMPLED AT the target rate — an
    # independent analytic reference, not a round trip
    y = resample(_tone(1_000, from_rate), from_rate, to_rate)
    ref = _tone(1_000, to_rate)
    n = min(y.size, ref.size)
    err = np.abs(y[TRIM:n - TRIM] - ref[TRIM:n - TRIM]).max()
    assert err < tol, (from_rate, to_rate, err)


def test_alias_rejection_quantitative():
    # a 5 kHz tone folded through 16k→8k would alias to 3 kHz; the
    # low-pass must kill it — assert ≥60 dB below the unit input
    y = resample(_tone(5_000, 16_000), 16_000, 8_000)
    rms = np.sqrt((y[TRIM:-TRIM] ** 2).mean())
    assert rms < 10 ** (-60 / 20), f"alias rms {rms}"


def test_passband_flatness():
    # 3 kHz is inside the fingerprinter's band range and inside the
    # 16k→8k passband: amplitude must survive within 1%
    y = resample(_tone(3_000, 16_000), 16_000, 8_000)
    rms = np.sqrt((y[TRIM:-TRIM] ** 2).mean())
    assert abs(rms - 1 / np.sqrt(2)) < 0.01, rms


def test_identity_empty_length_and_validation():
    x = _tone(500, 8_000)
    assert resample(x, 8_000, 8_000) is not None
    assert np.array_equal(resample(x, 8_000, 8_000), x)
    assert resample(np.array([]), 8_000, 16_000).size == 0
    assert resample(np.zeros(8_000), 8_000, 16_000).size == 16_000
    assert resample(np.zeros(441), 44_100, 16_000).size == 160
    with pytest.raises(ValueError):
        resample(x, 0, 16_000)
    with pytest.raises(ValueError):
        resample(x, 8_000, -1)


def _chirp_rec(rate, f0=440.0, dur=3.0, sweep_frac=0.5, trem=2.0):
    # NON-stationary (chirp + tremolo): a stationary tone mixture
    # yields ONE distinct frame fingerprint, making any sharing
    # threshold vacuous (the first cut of this test did exactly that)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        encode_wav_pcm16,
    )

    t = np.arange(int(rate * dur)) / rate
    sweep = f0 * (1.0 + sweep_frac * t / dur)
    phase = 2 * np.pi * np.cumsum(sweep) / rate
    x = (
        0.5 * np.sin(phase)
        + 0.3 * np.sin(2.7 * phase + 0.4) * (0.6 + 0.4 * np.sin(
            2 * np.pi * trem * t))
        + 0.2 * np.sin(5.1 * phase + 1.1)
    )
    return encode_wav_pcm16((x * 20_000).astype(np.int16), rate)


def test_cross_rate_fingerprint_keys_align():
    # the capability the resampler exists for, stated on EXACT
    # 32-bit keys (the probe expansion is index machinery): the
    # same recording INDEPENDENTLY sampled at 44.1/8 kHz, analyzed
    # at canonical 16 kHz, yields the IDENTICAL key set as the
    # 16 kHz original; without the canonical rate the mismatched
    # frame spans lose a large fraction of keys, and an unrelated
    # recording shares fewer still (measured 28/28 vs 15 vs 7 on
    # this fixed signal)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
        _N_BANDS,
        decode_audio,
        frame_fingerprints,
    )

    def keys(blob, cr=None):
        decoded = decode_audio(blob, canonical_rate=cr)
        assert decoded is not None
        fps = frame_fingerprints(*decoded)
        return set(
            (a << _N_BANDS) | b for a, b in zip(fps, fps[1:])
        )

    base = keys(_chirp_rec(16_000), 16_000)
    assert len(base) >= 20, len(base)
    assert keys(_chirp_rec(44_100), 16_000) == base
    assert keys(_chirp_rec(8_000), 16_000) == base
    raw_hi = keys(_chirp_rec(44_100))
    assert len(base & raw_hi) <= 0.7 * len(base), (
        len(base & raw_hi), len(base)
    )
    other = keys(_chirp_rec(16_000, f0=333.0), 16_000)
    assert len(base & other) <= 0.4 * len(base), (
        len(base & other), len(base)
    )


@pytest.mark.usefixtures("spark")
def test_kernel_canonical_rate_crosses_rates(spark):
    # end-to-end through the Spark kernel: two docs, same recording
    # at 16k and 44.1k, pair up under shared_audio_pairs ONLY with
    # the canonical rate
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
        audio_probes,
        shared_audio_pairs,
    )

    media = spark.createDataFrame(
        [(1, bytearray(_chirp_rec(16_000))),
         (2, bytearray(_chirp_rec(44_100)))],
        "doc_id long, blob binary",
    )
    # min_shared between the measured raw-probe overlap (~490) and
    # the canonical overlap (== all ~850 of doc 1's probes): the
    # pair forms ONLY when both docs are analyzed at one rate
    paired = shared_audio_pairs(
        audio_probes(media, canonical_rate=16_000), min_shared=700
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in paired] == [(1, 2)]
    unpaired = shared_audio_pairs(
        audio_probes(media), min_shared=700
    ).collect()
    assert unpaired == []


@pytest.mark.usefixtures("spark")
def test_end_to_end_entry_points_take_canonical_rate(spark, tmp_path):
    # review catch: the capability must be reachable from the
    # production APIs, not only the kernels — the batch pair entry
    # point AND the streaming index fold
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
        audio_near_dup_pairs,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (  # noqa: E501
        ParquetTable,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.audio_index import (  # noqa: E501
        fold_audio_index,
    )

    media = spark.createDataFrame(
        [(1, bytearray(_chirp_rec(16_000))),
         (2, bytearray(_chirp_rec(44_100)))],
        "doc_id long, blob binary",
    )
    got = audio_near_dup_pairs(
        media, min_shared=700, canonical_rate=16_000
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]

    # streaming: fold the 16 kHz doc first, then the 44.1 kHz
    # re-upload in a LATER batch — discovered through the index
    idx = ParquetTable(spark, str(tmp_path / "audio_idx"))
    b1 = media.filter("doc_id = 1")
    b2 = media.filter("doc_id = 2")
    assert fold_audio_index(
        idx, b1, batch_id=0, min_shared=700, canonical_rate=16_000
    ).collect() == []
    pairs = fold_audio_index(
        idx, b2, batch_id=1, min_shared=700, canonical_rate=16_000
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]


def test_resampled_decode_clipped_to_contract():
    # Gibbs overshoot on sharp transients must not leak past the
    # documented [-1, 1] decode contract (review catch)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
        decode_audio,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        encode_wav_pcm16,
    )

    square = np.tile(
        np.concatenate([np.full(50, 32767), np.full(50, -32768)]), 80
    ).astype(np.int16)
    decoded = decode_audio(
        encode_wav_pcm16(square, 8_000), canonical_rate=16_000
    )
    assert decoded is not None
    assert decoded[0].max() <= 1.0 and decoded[0].min() >= -1.0
