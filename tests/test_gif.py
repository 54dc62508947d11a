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
