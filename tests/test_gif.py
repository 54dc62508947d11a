"""Native GIF codec: external ground truth (published sample stream +
javax.imageio cross-codec both directions via the Spark JVM — no
Python image library needed), round trips incl. interlace and the
4096-entry LZW reset, container-level features (87a, local color
table, extension skipping), and corruption behavior (None, never an
exception)."""

from __future__ import annotations

import numpy as np
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
    _interlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)

# The GIF89a walkthrough sample image (public documentation of the
# format): 10x10, 4-color global table, mcs=2 — its LZW stream crosses
# the width-3→4→5 boundaries, pinning the interop off-by-one a
# self-round-tripping codec cannot pin by itself.
_SAMPLE = bytes.fromhex(
    "474946383961"
    "0a000a00"
    "910000"
    "ffffff" "ff0000" "0000ff" "000000"
    "21f904" "00000000" "00"
    "2c00000000" "0a000a00" "00"
    "02"
    "168c2d99872a1cdc33a00275ec95faa8de608c04914c0100"
    "3b"
)
_SAMPLE_ROWS = (
    ["1111122222"] * 3
    + ["1110000222"] * 2
    + ["2220000111"] * 2
    + ["2222211111"] * 3
)


def _pal(n):
    return np.stack(
        [(np.arange(n) * 37) % 256, (np.arange(n) * 91) % 256,
         (np.arange(n) * 53) % 256],
        -1,
    ).astype(np.uint8)


def _entropy_image(ncol, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    idx = (xx * 7 + yy * 13 + (xx * xx) // 3 + (yy * yy) // 5) % ncol
    return _pal(ncol)[idx]


def test_published_sample_stream():
    arr = decode_gif(_SAMPLE)
    assert arr is not None and arr.shape == (10, 10, 3)
    palette = {(255, 255, 255): "0", (255, 0, 0): "1",
               (0, 0, 255): "2", (0, 0, 0): "3"}
    got = ["".join(palette[tuple(arr[y, x])] for x in range(10))
           for y in range(10)]
    assert got == _SAMPLE_ROWS


def test_round_trips_across_width_boundaries():
    """Palettes sized to force LZW width growth at 3, 5, and 9 bits,
    plus a high-entropy 80x80 image that crosses the 4096-entry
    dictionary reset; sequential and interlaced."""
    cases = [
        np.full((3, 4, 3), 200, np.uint8),
        np.zeros((1, 1, 3), np.uint8),
        _entropy_image(4, 20, 20),
        _entropy_image(16, 40, 40),
        _entropy_image(251, 80, 80),  # > 4096 LZW entries → reset
    ]
    for px in cases:
        for interlace in (False, True):
            blob = encode_gif(px, interlace=interlace)
            back = decode_gif(blob)
            assert back is not None and (back == px).all()


def test_cross_codec_with_javaimageio(spark, tmp_path):
    """Both-ways golden against OpenJDK's independent GIF codec:
    javax.imageio reads our streams pixel-exact (sequential AND
    interlaced), and we read javax.imageio's. The JVM is always
    present where Spark runs, so unlike the PIL-gated JPEG
    cross-check this one never skips."""
    # pixel transfer to/from the JVM rides our independently-pinned
    # BMP codec (ImageIO reads/writes BMP natively), so each image
    # crosses py4j in ONE call instead of w*h getRGB/setRGB calls
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        _decode_bmp,
        encode_bmp24,
    )

    jvm = spark._jvm

    def java_read(path):
        """GIF file → pixels, via ImageIO gif-read + bmp-write
        (indexed→RGB first: BMPImageWriter rejects indexed rasters)."""
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
        if img is None:
            return None
        rgb = jvm.java.awt.image.BufferedImage(
            img.getWidth(), img.getHeight(), 1
        )
        rgb.getGraphics().drawImage(img, 0, 0, None)
        bmp = path + ".bmp"
        assert jvm.javax.imageio.ImageIO.write(rgb, "bmp", jvm.java.io.File(bmp))
        return _decode_bmp(open(bmp, "rb").read())

    def java_write(px, path):
        """pixels → GIF file, via ImageIO bmp-read + gif-write."""
        bmp = path + ".src.bmp"
        open(bmp, "wb").write(encode_bmp24(px))
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(bmp))
        assert img is not None
        assert jvm.javax.imageio.ImageIO.write(img, "gif", jvm.java.io.File(path))

    for i, px in enumerate(
        [_entropy_image(4, 20, 20), _entropy_image(16, 40, 40),
         _entropy_image(251, 80, 80)]
    ):
        p = str(tmp_path / f"ours_{i}.gif")
        open(p, "wb").write(encode_gif(px))
        assert (java_read(p) == px).all(), f"java misread our case {i}"
        pi = str(tmp_path / f"ours_i_{i}.gif")
        open(pi, "wb").write(encode_gif(px, interlace=True))
        assert (java_read(pi) == px).all(), f"java misread interlaced {i}"
        pj = str(tmp_path / f"java_{i}.gif")
        java_write(px, pj)
        back = decode_gif(open(pj, "rb").read())
        assert back is not None and (back == px).all(), f"we misread java {i}"


def test_gif87a_and_local_color_table():
    """An 87a header decodes; a local color table overrides the
    global one."""
    px = _entropy_image(8, 6, 9)
    blob = bytearray(encode_gif(px))
    blob[:6] = b"GIF87a"
    assert (decode_gif(bytes(blob)) == px).all()

    # rebuild with the palette moved to a LOCAL table and an
    # all-zero global table (decoder must use the local one)
    b = encode_gif(px)
    f = b[10] & 7
    n = 2 << f
    gct = b[13 : 13 + 3 * n]
    rest = b[13 + 3 * n :]  # image descriptor (10 bytes) + data
    assert rest[0] == 0x2C
    out = (
        b[:13]
        + bytes(3 * n)                      # zeroed global table
        + rest[:9]
        + bytes([rest[9] | 0x80 | f])       # local-table flag + size
        + gct                               # the real palette, local
        + rest[10:]
    )
    got = decode_gif(bytes(out))
    assert got is not None and (got == px).all()


def test_extensions_are_skipped():
    """Graphic-control / comment / application extensions before the
    image must be walked via their sub-block framing."""
    px = _entropy_image(5, 4, 7)
    b = encode_gif(px)
    ext = (
        b"\x21\xf9\x04\x01\x00\x00\x00\x00"          # GCE w/ transparency
        b"\x21\xfe\x05hello\x00"                      # comment
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # app loop
    )
    idx = b.index(b"\x2c")
    assert decode_gif(b[:idx] + ext + b[idx:]) is not None
    assert (decode_gif(b[:idx] + ext + b[idx:]) == px).all()


def test_corruption_returns_none_never_raises():
    px = _entropy_image(16, 10, 10)
    b = encode_gif(px)
    assert decode_gif(b"") is None
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(b"NOTGIF" + b[6:]) is None
    for cut in (10, len(b) // 2, len(b) - 2):
        assert decode_gif(b[:cut]) is None
    # bit flips anywhere: decode or None, never an exception
    for pos in range(0, len(b), 7):
        mutated = bytearray(b)
        mutated[pos] ^= 0x5A
        out = decode_gif(bytes(mutated))
        assert out is None or out.dtype == np.uint8


def test_offset_frame_composites_onto_canvas(spark, tmp_path):
    """Self-review r7: a frame smaller than / offset within the
    logical screen returns the SCREEN-sized canvas (background color
    under the uncovered area, frame at its offset), matching renderer
    semantics — verified against javax.imageio's canvas pixels for
    the covered region."""
    px = _entropy_image(4, 5, 6)  # 6x5 frame
    b = bytearray(encode_gif(px))
    # enlarge the canvas to 10x9 and offset the frame to (3, 2);
    # background index 1
    b[6:8] = (10).to_bytes(2, "little")
    b[8:10] = (9).to_bytes(2, "little")
    b[11] = 1
    idx = bytes(b).index(b"\x2c")
    b[idx + 1 : idx + 3] = (3).to_bytes(2, "little")  # left
    b[idx + 3 : idx + 5] = (2).to_bytes(2, "little")  # top
    out = decode_gif(bytes(b))
    assert out is not None and out.shape == (9, 10, 3)
    assert (out[2:7, 3:9] == px).all()                    # frame placed
    assert (out[0, 0] == _pal(4)[1]).all()                # bg color fill
    # javax.imageio returns the bare FRAME rect for offset frames
    # (PIL and browsers composite to canvas — our choice); its frame
    # pixels must still equal ours in the covered region
    p = str(tmp_path / "offset.gif")
    open(p, "wb").write(bytes(b))
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
    assert (img.getHeight(), img.getWidth()) == (5, 6)
    rgb = jvm.java.awt.image.BufferedImage(6, 5, 1)
    rgb.getGraphics().drawImage(img, 0, 0, None)
    bmp = p + ".bmp"
    jvm.javax.imageio.ImageIO.write(rgb, "bmp", jvm.java.io.File(bmp))
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        _decode_bmp,
    )

    jarr = _decode_bmp(open(bmp, "rb").read())
    assert (jarr == out[2:7, 3:9]).all()


def test_dispatch_is_environment_independent(monkeypatch):
    """ADVICE r7 + self-review r8: decode_image's GIF output must
    not depend on whether PIL is installed — the DEFAULT path is
    always the native decoder (PIL also diverges on corrupt streams
    it tolerates, which no header check can predict). An EXPLICIT
    prefer_pil=True opts into the PIL fast path, and even then only
    for frames that exactly cover the canvas (where losslessness
    makes outputs identical); under-covering frames stay native."""
    import numpy as np

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
        multimodal,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        first_frame_covers_canvas,
    )

    full = encode_gif(_entropy_image(3, 4, 5))
    under = bytearray(encode_gif(_entropy_image(3, 4, 5)))
    under[6:8] = (8).to_bytes(2, "little")  # canvas wider than frame
    under = bytes(under)
    assert first_frame_covers_canvas(full) is True
    assert first_frame_covers_canvas(under) is False
    assert first_frame_covers_canvas(b"GIF89a\x00") is None
    assert first_frame_covers_canvas(b"NOPE") is None

    sentinel = np.zeros((1, 1, 3), np.uint8)
    monkeypatch.setattr(multimodal, "pil_available", lambda: True)
    monkeypatch.setattr(multimodal, "_pil_decode", lambda b: sentinel)
    # DEFAULT: the fake "PIL" must be IGNORED for every GIF — native
    got = multimodal.decode_image(under)
    assert got.shape == (4, 8, 3)
    assert (got == decode_gif(under)).all()
    assert (multimodal.decode_image(full) == decode_gif(full)).all()
    # explicit opt-in: PIL fast path for covering frames ONLY
    assert multimodal.decode_image(full, prefer_pil=True) is sentinel
    assert (multimodal.decode_image(under, prefer_pil=True)
            == decode_gif(under)).all()
    # explicit pin still forces native
    assert (multimodal.decode_image(full, prefer_pil=False)
            == decode_gif(full)).all()


def test_decompression_bomb_guard():
    """A tiny blob declaring a huge frame must S4-skip (None), not
    allocate gigabytes."""
    px = _entropy_image(4, 5, 6)
    b = bytearray(encode_gif(px))
    idx = bytes(b).index(b"\x2c")
    for pos in (6, idx + 5):  # screen w / frame w
        big = bytearray(b)
        big[pos : pos + 2] = (65_535).to_bytes(2, "little")
        big[pos + 2 : pos + 4] = (65_535).to_bytes(2, "little")
        assert decode_gif(bytes(big)) is None


def test_encoder_rejects_unquantizable():
    yy, xx = np.mgrid[0:40, 0:40]
    px = np.stack([xx * 6 % 256, yy * 6 % 256, (xx + yy) % 256], -1).astype(
        np.uint8
    )
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_gif(px)


def test_lzw_truncation_and_garbage():
    comp = _lzw_encode(bytes(range(16)) * 5, 4)
    assert _lzw_decode(comp, 4, 80) is not None
    assert _lzw_decode(comp[: len(comp) // 2], 4, 80) is None  # truncated
    assert _lzw_decode(comp, 13, 80) is None   # impossible mcs
    assert _lzw_decode(b"", 4, 1) is None


def test_interlace_order_is_a_permutation():
    for h in (1, 2, 3, 4, 5, 8, 9, 17):
        order = _interlace_order(h)
        assert sorted(order) == list(range(h))


# ---------------------------------------------------------------------------
# Animation: every-k sampling with disposal-method compositing (VERDICT r7 #5)
# ---------------------------------------------------------------------------

_BG = (10, 10, 10)
_R, _G, _T = (200, 0, 0), (0, 200, 0), (1, 2, 3)


def _anim_fixture():
    """4x4 canvas, four frames exercising every disposal method and
    GCE transparency; expected canvases are derived BY HAND below,
    never from the decoder."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        encode_gif_animation,
    )

    frames = [
        {"pixels": np.full((2, 2, 3), _R, np.uint8), "disposal": 1},
        {
            "pixels": np.array([[_G, _T], [_T, _G]], np.uint8),
            "left": 1, "top": 1, "disposal": 2, "transparent_rgb": _T,
        },
        {"pixels": np.full((1, 1, 3), _G, np.uint8),
         "left": 3, "top": 3, "disposal": 3},
        {"pixels": np.full((1, 1, 3), _R, np.uint8), "left": 0, "top": 3},
    ]
    return encode_gif_animation(frames, screen=(4, 4), bg_rgb=_BG)


def _expected_canvases():
    c = np.full((4, 4, 3), _BG, np.uint8)
    # frame 0: opaque 2x2 red at (0,0); disposal 1 = keep
    c0 = c.copy(); c0[0:2, 0:2] = _R
    # frame 1 draws on c0: G at (1,1) and (2,2); its T pixels leave the
    # canvas visible ((1,2) and (2,1) stay background)
    c1 = c0.copy(); c1[1, 1] = _G; c1[2, 2] = _G
    # frame 1's disposal 2 then restores ITS rect (rows 1-2, cols 1-2)
    # to background — including (1,1), which frame 0 had painted red
    pre2 = c1.copy(); pre2[1:3, 1:3] = _BG
    # frame 2: 1x1 green at (3,3); disposal 3 = restore-to-previous
    c2 = pre2.copy(); c2[3, 3] = _G
    # frame 3 draws AFTER (3,3) reverted to background
    c3 = pre2.copy(); c3[3, 0] = _R
    return [c0, c1, c2, c3]


def test_animation_disposal_hand_fixtures():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        count_gif_frames,
        decode_gif_frames,
    )

    blob = _anim_fixture()
    got = decode_gif_frames(blob)
    want = _expected_canvases()
    assert got is not None and len(got) == 4
    for i, (g, w) in enumerate(zip(got, want)):
        assert (g == w).all(), f"frame {i} composite mismatch"
    assert count_gif_frames(blob) == 4
    # frame 1 of the single-image path equals the animation path's
    # first canvas here (frame 0 is opaque)
    assert (decode_gif(blob) == want[0]).all()


def test_animation_sampling_and_cap():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        count_gif_frames,
        decode_gif_frames,
        encode_gif_animation,
    )

    frames = [
        {"pixels": np.full((2, 2, 3), (10 * i, 0, 0), np.uint8),
         "left": i, "disposal": 1}
        for i in range(7)
    ]
    blob = encode_gif_animation(frames, screen=(9, 2), bg_rgb=_BG)
    assert count_gif_frames(blob) == 7
    allf = decode_gif_frames(blob, every=1)
    assert len(allf) == 7
    sampled = decode_gif_frames(blob, every=3)
    assert len(sampled) == 3  # frames 0, 3, 6
    for k, i in enumerate((0, 3, 6)):
        assert (sampled[k] == allf[i]).all()
    # max_frames cap: processes 4 frames, emits 0 and 3; the TRUE
    # count stays visible via count_gif_frames (no silent cap)
    capped = decode_gif_frames(blob, every=3, max_frames=4)
    assert len(capped) == 2
    assert (capped[1] == allf[3]).all()
    with pytest.raises(ValueError):
        decode_gif_frames(blob, every=0)


def test_animation_cross_codec_javaimageio(spark, tmp_path):
    """javax.imageio's ImageReader reads our multi-frame stream:
    frame COUNT matches and every per-frame raster (the bare frame
    rect, pre-compositing) is pixel-exact. Opaque frames only — Java
    composites transparency against black on the RGB convert, which
    would test the harness, not the codec."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        encode_gif_animation,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        _decode_bmp,
    )

    rng = [_entropy_image(5, 3, 4), _entropy_image(9, 4, 3), _entropy_image(13, 2, 5)]
    frames = [
        {"pixels": px, "left": i, "top": i, "disposal": 1 + i}
        for i, px in enumerate(rng)
    ]
    p = str(tmp_path / "anim.gif")
    open(p, "wb").write(
        encode_gif_animation(frames, screen=(8, 8), bg_rgb=(0, 0, 0))
    )

    jvm = spark._jvm
    stream = jvm.javax.imageio.ImageIO.createImageInputStream(
        jvm.java.io.File(p)
    )
    reader = jvm.javax.imageio.ImageIO.getImageReaders(stream).next()
    reader.setInput(stream)
    assert reader.getNumImages(True) == 3
    for i, px in enumerate(rng):
        img = reader.read(i)
        rgb = jvm.java.awt.image.BufferedImage(
            img.getWidth(), img.getHeight(), 1
        )
        rgb.getGraphics().drawImage(img, 0, 0, None)
        bmp = p + f".{i}.bmp"
        assert jvm.javax.imageio.ImageIO.write(
            rgb, "bmp", jvm.java.io.File(bmp)
        )
        back = _decode_bmp(open(bmp, "rb").read())
        assert back is not None and (back == px).all(), f"frame {i}"


def test_animation_truncation_contract():
    """Any cut or bit flip: frames-or-None, never an exception; a
    stream cut anywhere before the trailer is None (no partial
    salvage)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        decode_gif_frames,
    )

    blob = _anim_fixture()
    assert decode_gif_frames(b"") is None
    for cut in range(0, len(blob) - 1, 5):
        assert decode_gif_frames(blob[:cut]) is None
    for pos in range(0, len(blob), 7):
        mutated = bytearray(blob)
        mutated[pos] ^= 0x5A
        out = decode_gif_frames(bytes(mutated))
        assert out is None or all(f.dtype == np.uint8 for f in out)


def test_gif_frame_features_operator(spark):
    """The Spark leg: deterministic animated corpus → composited
    every-k sampling → per-doc stats; motion is non-zero (the sprite
    moves) and the output is partitioning-independent."""
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        gif_frame_features,
        synthetic_gif_animation_corpus,
    )

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    media = synthetic_gif_animation_corpus(docs, n_frames=6)
    feats = gif_frame_features(media, every=2).orderBy("doc_id")
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert r["n_frames"] == 6
        assert r["n_sampled"] == 3  # frames 0, 2, 4
        assert r["motion"] > 0.0
        assert r["width"] >= 16 and r["height"] >= 12
    again = (
        gif_frame_features(
            synthetic_gif_animation_corpus(docs.repartition(5), n_frames=6),
            every=2,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_animation_review_edges():
    """Review-pinned edges: (a) interlaced animation frames de-
    scramble (the corpus's d%3==0 docs ship them); (b) a
    transparent_rgb color absent from every frame joins the palette
    instead of silently aliasing a neighboring index; (c) the lazy
    canvas a 0-size screen adopts is bomb-guarded against offset
    inflation; (d) the cumulative decoded-pixel budget trips across
    many small frames, not only one big one."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    # (a) interlace: same pixels encoded both ways decode identically
    px0, px1 = _entropy_image(7, 9, 6), _entropy_image(11, 9, 6)
    plain = encode_gif_animation(
        [{"pixels": px0, "disposal": 1}, {"pixels": px1, "disposal": 1}]
    )
    inter = encode_gif_animation(
        [{"pixels": px0, "disposal": 1, "interlace": True},
         {"pixels": px1, "disposal": 1, "interlace": True}]
    )
    a, b = decode_gif_frames(plain), decode_gif_frames(inter)
    assert len(a) == len(b) == 2
    for fa, fb in zip(a, b):
        assert (fa == fb).all()

    # (b) an absent transparent color must not mark real pixels
    red = np.full((3, 3, 3), _R, np.uint8)
    blob = encode_gif_animation(
        [{"pixels": red, "transparent_rgb": (0, 0, 255)}],
        bg_rgb=_BG,
    )
    frames = decode_gif_frames(blob)
    assert (frames[0] == _R).all()  # nothing leaked to background

    # (c) 0-size screen + 16-bit offsets: the lazy canvas would be
    # 65536x65536 (12.9 GB) — must degrade to None, not allocate
    tiny = encode_gif_animation(
        [{"pixels": np.full((1, 1, 3), _R, np.uint8),
          "left": 65534, "top": 65534}],
        screen=(0, 0), bg_rgb=_BG,
    )
    assert decode_gif_frames(tiny) is None
    # ... while a small lazy canvas still works
    ok = encode_gif_animation(
        [{"pixels": np.full((1, 1, 3), _R, np.uint8), "left": 2, "top": 1}],
        screen=(0, 0), bg_rgb=_BG,
    )
    got = decode_gif_frames(ok)
    assert got is not None and got[0].shape == (2, 3, 3)

    # (d) aggregate budget: 7 frames x 4 px = 28 px > a 10 px budget
    many = encode_gif_animation(
        [{"pixels": np.full((2, 2, 3), _R, np.uint8), "disposal": 1}] * 7,
        screen=(2, 2), bg_rgb=_BG,
    )
    assert decode_gif_frames(many, max_total_pixels=10) is None
    assert len(decode_gif_frames(many)) == 7

    # (e) EMITTED canvases count against the budget too: a 50x50
    # screen with 8 one-pixel frames decodes only 8 px, but each
    # frames.append copies the whole 2500-px canvas — the retained
    # output, not the LZW work, is the bomb (the real-world shape is
    # an 8192x8192 screen x 256 frames = ~48 GB of appends that the
    # decoded-pixel and per-canvas guards both wave through)
    dot = np.full((1, 1, 3), _R, np.uint8)
    wide = encode_gif_animation(
        [{"pixels": dot, "disposal": 1}] * 8,
        screen=(50, 50), bg_rgb=_BG,
    )
    assert decode_gif_frames(wide, max_total_pixels=2600) is None
    got = decode_gif_frames(wide)  # default budget: fine
    assert len(got) == 8 and got[0].shape == (50, 50, 3)


def test_animation_corpus_palette_is_bounded(spark):
    """The advertised n_frames parameter must never trip the encoder's
    256-color limit (review: disjoint per-frame gradients used to
    crash at n_frames >= 10)."""
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        gif_frame_features,
        synthetic_gif_animation_corpus,
    )

    docs = spark.range(4).select(F.col("id").alias("doc_id"))
    media = synthetic_gif_animation_corpus(docs, n_frames=16)
    rows = gif_frame_features(media, every=4).orderBy("doc_id").collect()
    assert len(rows) == 4
    assert all(r["n_frames"] == 16 and r["n_sampled"] == 4 for r in rows)
