"""AVI/RIFF container walk + MJPEG decode (operators/avi.py):
hand-checked header fields, frame index vs idx1 keyframe flags (both
offset conventions), MJPEG frames decoding bit-equal to the JPEG
kernel, torn-tail leniency, hostile sweeps, kernel==driver."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.avi import (
    avi_frame_index,
    avi_meta,
    encode_avi,
    mjpeg_frames,
    parse_avi_meta,
    sniff_avi,
    synthetic_avi_corpus,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (
    _base_image,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
    encode_jpeg,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
    decode_image,
)


def _fixture(n=3, fps=10, with_idx1=True):
    imgs = [_base_image(15 * i) for i in range(n)]  # same dims
    frames = [encode_jpeg(im, quality=85) for im in imgs]
    h, w = imgs[0].shape[:2]
    return encode_avi(frames, w, h, fps=fps,
                      with_idx1=with_idx1), imgs, frames


def test_header_fields():
    avi, imgs, frames = _fixture(4, fps=24)
    m = parse_avi_meta(avi)
    h, w = imgs[0].shape[:2]
    assert (m["width"], m["height"]) == (w, h)
    assert m["total_frames"] == 4 and m["fps"] == 24.0
    assert m["n_streams"] == 1 and m["n_movi_chunks"] == 4
    assert m["has_idx1"]
    # µs/frame × frames: 1_000_000 // 24 × 4 // 1000
    assert m["duration_ms"] == (1_000_000 // 24) * 4 // 1000
    st = m["streams"][0]
    assert st["type"] == "vids" and st["handler"] == "MJPG"
    assert st["compression"] == "MJPG"


def test_frame_index_and_keyframe_flags():
    avi, _imgs, frames = _fixture(3)
    idx = avi_frame_index(avi)
    assert len(idx) == 3
    for (off, size, kf), fr in zip(idx, frames):
        assert avi[off:off + size] == fr
        assert kf is True
    # absolute-offset idx1 convention: rewrite offsets, flags must
    # still resolve
    b = bytearray(avi)
    i = bytes(b).find(b"idx1")
    assert i > 0
    (n_bytes,) = struct.unpack_from("<I", b, i + 4)
    for k in range(n_bytes // 16):
        o = i + 8 + k * 16 + 8
        (rel,) = struct.unpack_from("<I", b, o)
        movi = bytes(b).find(b"movi")
        struct.pack_into("<I", b, o, movi + rel)
    idx2 = avi_frame_index(bytes(b))
    assert [f[2] for f in idx2] == [True, True, True]


def test_mjpeg_frames_decode_through_jpeg_kernel():
    avi, _imgs, frames = _fixture(3)
    dec = mjpeg_frames(avi)
    assert len(dec) == 3
    for arr, fr in zip(dec, frames):
        assert np.array_equal(arr, decode_image(fr, prefer_pil=False))
    assert len(mjpeg_frames(avi, every=2)) == 2


def test_torn_tail_keeps_prefix():
    avi, _imgs, _frames = _fixture(4)
    cut = avi[: len(avi) * 2 // 3]
    m = parse_avi_meta(cut)
    assert m is not None  # hdrl parsed → metadata survives
    assert m["total_frames"] == 4  # declared
    assert 0 < m["n_movi_chunks"] <= 4  # walked prefix


def test_hostile_sweeps_never_raise():
    avi, _imgs, _frames = _fixture(2)
    for c in range(0, len(avi), 41):
        parse_avi_meta(avi[:c])
        avi_frame_index(avi[:c])
        mjpeg_frames(avi[:c])
    for i in range(0, len(avi), 23):
        d = bytearray(avi)
        d[i] ^= 0x7C
        parse_avi_meta(bytes(d))
        avi_frame_index(bytes(d))
    assert parse_avi_meta(b"RIFF\x10\x00\x00\x00WAVEdata") is None
    assert not sniff_avi(b"RIFF\x10\x00\x00\x00WAVE")


def test_kernel_equals_driver(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 24
    )
    corpus = synthetic_avi_corpus(docs)
    blobs = {r["doc_id"]: bytes(r["blob"])
             for r in corpus.collect()}
    rows = {r["doc_id"]: r for r in avi_meta(corpus).collect()}
    for d, blob in blobs.items():
        ref = parse_avi_meta(blob)
        if ref is None:
            assert d not in rows
            continue
        r = rows[d]
        assert r["width"] == ref["width"]
        assert r["total_frames"] == ref["total_frames"]
        assert r["n_movi_chunks"] == ref["n_movi_chunks"]
        assert r["compression"] == "MJPG"
    # truncated rows (d % 6 == 5) still produce rows (torn tail)
    assert any(d % 6 == 5 for d in rows)
