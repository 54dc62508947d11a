"""Subtitle ingestion (SRT / WebVTT): hand-written cue fixtures,
timing math, lenient damage handling, markup stripping, encodings,
and the Spark kernel with an as-of alignment composition against
MKV keyframe timestamps."""

from __future__ import annotations

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.subtitles import (
    parse_srt,
    parse_vtt,
    sniff_subtitles,
    subtitle_text,
)

SRT = b"""1
00:00:01,000 --> 00:00:03,500
First subtitle line.
Second line of same cue.

2
00:01:02,250 --> 00:01:04,000
<i>Italic</i> and <b>bold</b> stripped.

BROKEN BLOCK WITHOUT TIMES

3
01:02:03,004 --> 01:02:05,006
After the broken one.
"""

VTT = "﻿".encode() + b"""WEBVTT - with a header comment

NOTE this note block is skipped

STYLE
::cue { color: red }

intro-cue-id
00:05.000 --> 00:07.250 align:start position:10%
<v Alice>Hello there.
plain continuation

01:02:03.400 --> 01:02:04.000
<c.yellow>Styled</c> text.
"""


def test_srt_cues_timing_and_tolerance():
    cues = parse_srt(SRT)
    assert len(cues) == 3
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 3500
    assert cues[0]["text"] == (
        "First subtitle line.\nSecond line of same cue."
    )
    assert cues[1]["text"] == "Italic and bold stripped."
    assert cues[2]["start_ms"] == 3723004
    assert cues[2]["text"] == "After the broken one."


def test_vtt_cues_optional_hours_and_markup():
    cues = parse_vtt(VTT)
    assert len(cues) == 2
    assert cues[0]["start_ms"] == 5000 and cues[0]["end_ms"] == 7250
    assert cues[0]["text"] == (
        "Alice: Hello there.\nplain continuation"
    )
    assert cues[1]["start_ms"] == 3723400
    assert cues[1]["text"] == "Styled text."


def test_sniffing_and_s4():
    assert sniff_subtitles(VTT) == "vtt"
    assert sniff_subtitles(SRT) == "srt"
    assert sniff_subtitles(b"just some text") is None
    assert parse_srt(b"") is None
    assert parse_srt(b"no arrows here") is None
    assert parse_vtt(SRT) is None  # no WEBVTT signature
    assert parse_srt(None) is None


def test_latin1_fallback():
    srt = ("1\n00:00:01,000 --> 00:00:02,000\n"
           "caf\xe9 accent\n").encode("latin-1")
    cues = parse_srt(srt)
    assert cues[0]["text"] == "café accent"


def test_truncation_sweep_never_raises():
    for src in (SRT, VTT):
        for cut in range(0, len(src), 17):
            for fn in (parse_srt, parse_vtt):
                r = fn(src[:cut])
                assert r is None or isinstance(r, list)


@pytest.mark.usefixtures("spark")
class TestKernel:
    def test_kernel_and_asof_alignment_with_mkv(self, spark):
        from pyspark.sql import functions as F

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.asof import (  # noqa: E501
            asof_join,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mkv import (  # noqa: E501
            encode_mkv,
            sample_mkv_keyframes,
        )

        clip = encode_mkv(
            [{"track_id": 1, "type": "video", "codec": "V_VP9"}],
            [{"timestamp": t * 1000,
              "blocks": [(1, 0, True, bytes([t]) * 10)]}
             for t in range(4)],
        )
        srt = b"""1
00:00:00,500 --> 00:00:01,400
cue near one second

2
00:00:02,600 --> 00:00:03,400
cue near three seconds
"""
        media = spark.createDataFrame(
            [(7, bytearray(clip))], "doc_id long, blob binary"
        )
        subs = spark.createDataFrame(
            [(7, bytearray(srt))], "doc_id long, blob binary"
        )
        cues = subtitle_text(subs)
        assert cues.count() == 2
        kf = sample_mkv_keyframes(media).select(
            "doc_id", F.col("timestamp_ms"),
        )
        # each keyframe picks the latest cue that started at or
        # before it — the frame ↔ transcript pairing
        aligned = asof_join(
            kf, cues.select("doc_id", "start_ms", "text"),
            key=["doc_id"], left_ts="timestamp_ms",
            right_ts="start_ms", right_cols=["text"],
            direction="backward",
        )
        got = {r["timestamp_ms"]: r["asof_text"]
               for r in aligned.collect()}
        assert got[1000] == "cue near one second"
        assert got[3000] == "cue near three seconds"


# ── review-pass regressions ─────────────────────────────────────


def test_whitespace_only_separator_splits_cues():
    # hand-edited files leave a stray space on the "blank" line
    srt = (b"1\n00:00:01,000 --> 00:00:02,000\nfirst\n \n"
           b"2\n00:00:03,000 --> 00:00:04,000\nsecond\n")
    cues = parse_srt(srt)
    assert [c["text"] for c in cues] == ["first", "second"]
    assert "-->" not in cues[0]["text"]


def test_out_of_range_stamp_skips_not_misparses():
    # '120:00.000' must NOT partially match as 20 minutes
    vtt = (b"WEBVTT\n\n120:00.000 --> 121:00.000\nwrong clock\n\n"
           b"00:05.000 --> 00:06.000\ngood cue\n")
    cues = parse_vtt(vtt)
    assert [c["text"] for c in cues] == ["good cue"]
    # and a stamp with trailing junk on the token skips too
    srt = b"1\n00:00:01,000x --> 00:00:02,000\nbad\n"
    assert parse_srt(srt) is None


def test_note_prefixed_cue_id_is_still_a_cue():
    # 'NOTEWORTHY SCENE' is a cue identifier, not a comment (the
    # spec's comment keyword requires a boundary)
    vtt = (b"WEBVTT\n\nNOTEWORTHY SCENE\n00:05.000 --> 00:07.000\n"
           b"hello\n\nNOTE a real comment\nwith more text\n")
    cues = parse_vtt(vtt)
    assert [c["text"] for c in cues] == ["hello"]


def test_text_budget_counts_bytes():
    # ~3 MiB of 3-byte chars per cue: the 4 MiB BYTE budget admits
    # one cue, not three
    big = ("汉" * (1 << 20)).encode("utf-8")
    blocks = []
    for i in range(3):
        blocks.append(
            b"%d\n00:00:0%d,000 --> 00:00:0%d,500\n" % (i, i, i)
            + big
        )
    cues = parse_srt(b"\n\n".join(blocks))
    total = sum(len(c["text"].encode("utf-8")) for c in cues)
    assert total <= (1 << 22)
    assert len(cues) < 3


# ── synthetic corpus + driver-row leg (r11) ─────────────────────


def test_corpus_deterministic_and_shape_coverage():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.subtitles import (  # noqa: E501
        build_srt,
        build_vtt,
        parse_srt,
        parse_vtt,
    )

    saw_bom = saw_latin1 = saw_skip = saw_voice = saw_id = False
    for d in range(120):
        s1, s2 = build_srt(d), build_srt(d)
        v1, v2 = build_vtt(d), build_vtt(d)
        assert s1 == s2 and v1 == v2, d  # pure function of doc_id
        cues_s, cues_v = parse_srt(s1), parse_vtt(v1)
        assert cues_s and cues_v, d
        saw_bom |= s1[:3] == b"\xef\xbb\xbf"
        saw_latin1 |= d % 13 == 5 and b"Caf\xe9" in s1
        # the broken-timing block is dropped, neighbors survive
        if d % 7 == 3:
            saw_skip = True
            assert len(cues_s) == (2 + d % 4) - 1, d
        saw_voice |= any(
            c["text"].startswith("Speaker") for c in cues_v
        )
        saw_id |= b"cue-%d-0" % d in v1
    assert saw_bom and saw_latin1 and saw_skip and saw_voice and saw_id


@pytest.mark.usefixtures("spark")
class TestCorpusKernel:
    def test_kernel_equals_driver_over_corpus(self, spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.subtitles import (  # noqa: E501
            build_srt,
            build_vtt,
            parse_srt,
            parse_vtt,
            subtitle_text,
            synthetic_subtitle_corpus,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
        from pyspark.sql import functions as F

        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 60
        )
        got = {}
        for r in subtitle_text(
            synthetic_subtitle_corpus(docs).select("doc_id", "blob")
        ).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["kind"], r["cue_idx"], r["start_ms"], r["end_ms"],
                 r["text"])
            )
        for d in range(60):
            if d % 11 == 7:
                assert d not in got, d  # S4 garbage emits nothing
                continue
            kind = "srt" if d % 2 == 0 else "vtt"
            cues = (parse_srt(build_srt(d)) if kind == "srt"
                    else parse_vtt(build_vtt(d)))
            assert got[d] == [
                (kind, c["cue_idx"], c["start_ms"], c["end_ms"],
                 c["text"])
                for c in cues
            ], d
