"""TIFF 6.0 + EXIF (operators/tiff.py): hand-built IFDs written
field-by-field from the spec's layout (independent of the module's
fixture encoder), the PUBLISHED Apple PackBits example from the
TIFF 6.0 §9 reference, a hand-derived LZW code sequence packed by an
independent in-test bit packer, the full layout/compression round-trip
matrix, damage semantics, and the Spark kernel vs the driver-side
reference."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    exif_app1,
    insert_app1,
    lzw_decode,
    lzw_encode,
    packbits_encode,
    parse_exif,
    parse_exif_tiff,
    parse_tiff_meta,
    sniff_tiff,
    tiff_meta,
    unpackbits,
)


def _px(h=21, w=17, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7 + yy * 13 + seed) % 256, (xx * 3 + 5 * seed) % 256,
         (yy * 11 + 3 + seed) % 256], -1
    ).astype(np.uint8)


# ── hand-built wire fixtures ────────────────────────────────────


def _hand_tiff_gray_2x2() -> bytes:
    """A complete little-endian TIFF written byte-by-byte from the
    spec: header, one IFD with 8 entries, one uncompressed strip of
    4 gray pixels [10, 20, 30, 40]."""
    # layout: header(8) + pixel data(4) + pad(0) + IFD at 12
    out = b"II*\x00" + struct.pack("<I", 12)
    out += bytes([10, 20, 30, 40])  # strip at offset 8
    entries = [
        (256, 3, 1, struct.pack("<HH", 2, 0)),    # ImageWidth
        (257, 3, 1, struct.pack("<HH", 2, 0)),    # ImageLength
        (258, 3, 1, struct.pack("<HH", 8, 0)),    # BitsPerSample
        (259, 3, 1, struct.pack("<HH", 1, 0)),    # Compression none
        (262, 3, 1, struct.pack("<HH", 1, 0)),    # BlackIsZero
        (273, 4, 1, struct.pack("<I", 8)),        # StripOffsets
        (278, 3, 1, struct.pack("<HH", 2, 0)),    # RowsPerStrip
        (279, 4, 1, struct.pack("<I", 4)),        # StripByteCounts
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)  # no next IFD
    return out


def test_hand_built_gray_tiff_decodes():
    arr = decode_tiff(_hand_tiff_gray_2x2())
    assert arr is not None and arr.shape == (2, 2, 3)
    assert arr[:, :, 0].ravel().tolist() == [10, 20, 30, 40]
    assert np.array_equal(arr[:, :, 0], arr[:, :, 2])
    meta = parse_tiff_meta(_hand_tiff_gray_2x2())
    assert len(meta) == 1
    m = meta[0]
    assert (m["width"], m["height"], m["compression"]) == (2, 2, 1)
    assert m["samples_per_pixel"] == 1 and not m["tiled"]


def test_hand_built_big_endian_and_whitezero():
    # same image, big-endian, PhotometricInterpretation 0 → inverted
    out = b"MM\x00*" + struct.pack(">I", 12)
    out += bytes([10, 20, 30, 40])
    entries = [
        (256, 3, 1, struct.pack(">HH", 2, 0)),
        (257, 3, 1, struct.pack(">HH", 2, 0)),
        (258, 3, 1, struct.pack(">HH", 8, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (262, 3, 1, struct.pack(">HH", 0, 0)),   # WhiteIsZero
        (273, 4, 1, struct.pack(">I", 8)),
        (278, 3, 1, struct.pack(">HH", 2, 0)),
        (279, 4, 1, struct.pack(">I", 4)),
    ]
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHI", tag, typ, cnt) + val
    out += struct.pack(">I", 0)
    arr = decode_tiff(out)
    assert arr is not None
    assert arr[:, :, 0].ravel().tolist() == [245, 235, 225, 215]


def test_hand_built_bilevel():
    # 10×2 1-bit image, one strip, row-padded to whole bytes:
    # row0 = 1010101010, row1 = 1111100000
    row0 = bytes([0b10101010, 0b10000000])
    row1 = bytes([0b11111000, 0b00000000])
    out = b"II*\x00" + struct.pack("<I", 12)
    out += row0 + row1
    entries = [
        (256, 3, 1, struct.pack("<HH", 10, 0)),
        (257, 3, 1, struct.pack("<HH", 2, 0)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),   # BlackIsZero
        (273, 4, 1, struct.pack("<I", 8)),
        (278, 3, 1, struct.pack("<HH", 2, 0)),
        (279, 4, 1, struct.pack("<I", 4)),
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)
    arr = decode_tiff(out)
    assert arr is not None and arr.shape == (2, 10, 3)
    assert (arr[0, :, 0] == 255).tolist() == [
        True, False, True, False, True, False, True, False, True, False
    ]
    assert (arr[1, :, 0] == 255).tolist() == [True] * 5 + [False] * 5


def test_packbits_published_apple_example():
    # the worked example from the PackBits reference TIFF 6.0 §9
    # cites (Apple TN1023): 24 unpacked bytes → this exact packing
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xaa" * 10
    assert unpackbits(packed, len(want)) == want
    # our writer round-trips the same buffer (byte stream may differ,
    # value must not)
    assert unpackbits(packbits_encode(want), len(want)) == want


def test_lzw_hand_derived_code_sequence():
    # data 07 07 07 08 08 07 07 → hand-traced §13 writer codes:
    # Clear, 7, 258(=07 07), 8, 8, 258, EOI — packed MSB-first at
    # 9 bits by an INDEPENDENT in-test packer
    codes = [256, 7, 258, 8, 8, 258, 257]
    bits = "".join(format(c, "09b") for c in codes)
    bits += "0" * (-len(bits) % 8)
    packed = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    data = bytes([7, 7, 7, 8, 8, 7, 7])
    assert lzw_decode(packed, len(data)) == data
    assert lzw_encode(data) == packed


def test_lzw_early_change_and_clears_round_trip():
    # distinct-pair data grows the table past 511/1023/2047 and into
    # a 12-bit Clear; byte-exact round trip proves writer/reader
    # agree across every width change
    data = bytes((i * 7 + (i >> 3)) % 256 for i in range(300_000))
    assert lzw_decode(lzw_encode(data), len(data)) == data
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(noise), len(noise)) == noise
    # KwKwK case (code == next table entry)
    tricky = b"abababababab"
    assert lzw_decode(lzw_encode(tricky), len(tricky)) == tricky


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("shape", ["strips", "tiled", "planar"])
def test_rgb_round_trip_matrix(comp, endian, shape):
    px = _px()
    for pred in (False, True):
        if pred and comp == "none":
            continue
        b = encode_tiff(
            px, compression=comp, endian=endian, predictor=pred,
            tiled=shape == "tiled", planar=shape == "planar",
        )
        out = decode_tiff(b)
        assert out is not None and np.array_equal(out, px), (
            comp, endian, shape, pred
        )


def test_gray_palette_multipage():
    px = _px(seed=3)
    b = encode_tiff(px, photometric="gray", compression="lzw",
                    predictor=True)
    g = ((299 * px[:, :, 0].astype(np.uint32)
          + 587 * px[:, :, 1].astype(np.uint32)
          + 114 * px[:, :, 2].astype(np.uint32)) // 1000
         ).astype(np.uint8)
    assert np.array_equal(decode_tiff(b), np.stack([g, g, g], -1))
    pal_px = px // 64 * 64
    b = encode_tiff(pal_px, photometric="palette",
                    compression="packbits")
    assert np.array_equal(decode_tiff(b), pal_px)
    b = encode_tiff(px, extra_pages=2, make="CamCo", model="X9",
                    dt="2026:08:16 10:00:00")
    meta = parse_tiff_meta(b)
    assert [m["page"] for m in meta] == [0, 1, 2]
    assert meta[0]["make"] == "CamCo" and meta[0]["model"] == "X9"
    assert np.array_equal(decode_tiff(b), px)


def test_gated_compressions_are_s4():
    # CCITT G4 (ADR-gated) → meta parses, pixel decode refuses
    b = bytearray(encode_tiff(_px(), compression="none"))
    # patch the Compression SHORT from 1 → 4 in place
    idx = b.find(struct.pack("<HHI", 259, 3, 1))
    assert idx > 0
    b[idx + 8:idx + 10] = struct.pack("<H", 4)
    assert decode_tiff(bytes(b)) is None
    meta = parse_tiff_meta(bytes(b))
    assert meta is not None and meta[0]["compression"] == 4


def test_damage_sweeps_never_raise():
    full = encode_tiff(_px(), compression="lzw", predictor=True,
                       extra_pages=1, tiled=False)
    for cut in range(0, len(full), 31):
        decode_tiff(full[:cut])
        parse_tiff_meta(full[:cut])
    for i in range(0, len(full), 17):
        dam = bytearray(full)
        dam[i] ^= 0x80
        decode_tiff(bytes(dam))
        parse_tiff_meta(bytes(dam))
    assert decode_tiff(None) is None
    assert parse_tiff_meta(b"") is None
    assert not sniff_tiff(b"II+\x00")


def test_exif_round_trip_and_hand_checks():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )

    px = _px()
    j = encode_jpeg(px, quality=90)
    for endian in ("<", ">"):
        j2 = insert_app1(j, exif_app1(
            "CamCo", "X100", "2026:08:16 10:00:00",
            exposure=(1, 125), fnumber=(28, 10), iso=200,
            focal=(50, 1), pix=(17, 21), gps=(48.8584, -122.25),
            endian=endian,
        ))
        ex = parse_exif(j2)
        assert ex["make"] == "CamCo" and ex["model"] == "X100"
        assert abs(ex["exposure_s"] - 1 / 125) < 1e-12
        assert abs(ex["fnumber"] - 2.8) < 1e-12 and ex["iso"] == 200
        assert (ex["pixel_x"], ex["pixel_y"]) == (17, 21)
        assert abs(ex["gps_lat"] - 48.8584) < 1e-4
        assert abs(ex["gps_lon"] + 122.25) < 1e-4
        # decoded pixels unaffected by the spliced segment
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
            decode_image,
        )

        assert np.array_equal(
            decode_image(j, prefer_pil=False),
            decode_image(j2, prefer_pil=False),
        )
    assert parse_exif(j) is None          # no APP1
    assert parse_exif(b"\x00\x01") is None  # not a jpeg
    # camera tags read from a plain TIFF through the same machinery
    t = encode_tiff(px, make="CamCo", model="X9",
                    dt="2026:08:16 10:00:00")
    ex = parse_exif_tiff(t)
    assert ex["make"] == "CamCo" and ex["model"] == "X9"


def test_exif_damage_sweep_never_raises():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )

    j = insert_app1(
        encode_jpeg(_px(), quality=90),
        exif_app1("A", "B", "2020:01:01 00:00:00", gps=(1.5, -2.5)),
    )
    for i in range(0, min(len(j), 600), 7):
        dam = bytearray(j)
        dam[i] ^= 0x55
        parse_exif(bytes(dam))
    for cut in range(0, min(len(j), 600), 13):
        parse_exif(j[:cut])


class TestKernel:
    def test_tiff_meta_equals_driver(self, spark):
        blobs = []
        for d in range(40):
            if d % 11 == 7:
                blobs.append((d, b"\x00 not a tiff"))
                continue
            comp = ("none", "packbits", "lzw")[d % 3]
            blobs.append((d, encode_tiff(
                _px(seed=d), compression=comp,
                endian="<" if d % 2 else ">",
                predictor=comp != "none" and d % 5 < 2,
                tiled=d % 16 == 13,
                extra_pages=d % 4 == 1,
                make="Cam %d" % (d % 7), model="M%d" % (d % 4),
                dt="2026:08:%02d 12:00:00" % (1 + d % 28),
            )))
        df = spark.createDataFrame(
            [(d, bytearray(b)) for d, b in blobs],
            "doc_id long, blob binary",
        )
        got = {}
        for r in tiff_meta(df).collect():
            got.setdefault(r["doc_id"], []).append(r)
        for d, blob in blobs:
            ref = parse_tiff_meta(blob)
            if ref is None:
                assert d not in got
                continue
            rows = sorted(got[d], key=lambda r: r["page"])
            assert len(rows) == len(ref)
            for row, m in zip(rows, ref):
                for k in ("page", "width", "height",
                          "samples_per_pixel", "compression",
                          "photometric", "predictor", "tiled",
                          "n_segments", "make", "model", "datetime"):
                    assert row[k] == m[k], (d, k)

    def test_image_corpus_tiff_leg_and_exif_column(self, spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
            _exif_summary,
            decode_image_features,
            synthetic_image_corpus,
        )
        from pyspark.sql import functions as F

        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 64
        )
        corpus = synthetic_image_corpus(docs)
        blobs = {r["doc_id"]: bytes(r["blob"]) for r in corpus.collect()}
        # the carved residue class is TIFF, its neighbors unchanged
        assert sniff_tiff(blobs[5]) and sniff_tiff(blobs[13])
        assert blobs[1][:2] == b"P6" and blobs[9][:2] == b"P6"
        feats = {
            r["doc_id"]: r
            for r in decode_image_features(corpus).collect()
        }
        assert set(feats) == set(range(64))
        for d in (5, 13, 21, 29):
            assert feats[d]["exif"] is not None, d
            assert feats[d]["exif"].startswith("Cam %d|M%d|" % (d % 7, d % 4))
            assert feats[d]["exif"] == _exif_summary(blobs[d])
        # EXIF'd baseline JPEG (d%16==3) and plain one (d%16==11)
        assert feats[3]["exif"] is not None
        assert feats[3]["exif"] == _exif_summary(blobs[3])
        assert feats[11]["exif"] is None
        # TIFF is lossless: stats equal the PPM leg's pixels for the
        # same generator (doc 5's pixels == what PPM would hold)
        assert feats[5]["width"] == 8 + 5 % 9


def test_exif_orientation_transforms():
    # a 2×3 asymmetric ramp makes every one of the 8 transforms
    # distinguishable; values worked by hand from the spec's
    # "0th row is the visual <X> side" table
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.tiff import (  # noqa: E501
        apply_exif_orientation,
    )

    a = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    # stored:
    #   0 1 2
    #   3 4 5
    got = {
        k: apply_exif_orientation(a, k)[:, :, 0].tolist()
        for k in range(1, 9)
    }
    assert got[1] == [[0, 1, 2], [3, 4, 5]]
    assert got[2] == [[2, 1, 0], [5, 4, 3]]          # mirror H
    assert got[3] == [[5, 4, 3], [2, 1, 0]]          # rot 180
    assert got[4] == [[3, 4, 5], [0, 1, 2]]          # mirror V
    assert got[5] == [[0, 3], [1, 4], [2, 5]]        # transpose
    assert got[6] == [[3, 0], [4, 1], [5, 2]]        # rot 90 CW
    assert got[7] == [[5, 2], [4, 1], [3, 0]]        # transverse
    assert got[8] == [[2, 5], [1, 4], [0, 3]]        # rot 270 CW
    # inverses: applying the rotation pairs round-trips
    for k, inv in ((6, 8), (8, 6), (3, 3), (2, 2), (4, 4)):
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(a, k), inv),
            a,
        ), k
    assert apply_exif_orientation(a, None) is a
    assert apply_exif_orientation(a, 99) is a


def test_decode_oriented_end_to_end():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        decode_image,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.tiff import (  # noqa: E501
        apply_exif_orientation,
        decode_oriented,
    )

    px = _px(h=16, w=24)  # asymmetric so rotation shows
    j = encode_jpeg(px, quality=95)
    stored = decode_image(j, prefer_pil=False)
    # orientation 6 spliced in → decode_oriented rotates 90 CW
    j6 = insert_app1(j, _app1_with_orientation(6))
    arr = decode_oriented(j6)
    assert arr.shape == (24, 16, 3)
    assert np.array_equal(arr, apply_exif_orientation(stored, 6))
    # TIFF path: tag 274 on the IFD
    t = encode_tiff(px)
    t8 = _tiff_with_orientation(t, 8)
    arr = decode_oriented(t8)
    assert arr.shape[:2] == (24, 16)
    assert np.array_equal(
        arr, apply_exif_orientation(decode_tiff(t8), 8)
    )
    # no orientation → identity with plain decode
    assert np.array_equal(decode_oriented(j), stored)
    assert decode_oriented(b"junk") is None


def _app1_with_orientation(o: int) -> bytes:
    """exif_app1 writes Orientation=1; patch the SHORT in place."""
    seg = bytearray(exif_app1("C", "M", "2026:01:01 00:00:00"))
    idx = seg.find(struct.pack("<HHI", 274, 3, 1))
    assert idx > 0
    seg[idx + 8:idx + 10] = struct.pack("<H", o)
    return bytes(seg)


def _tiff_with_orientation(t: bytes, o: int) -> bytes:
    """Append-free patch: encode_tiff writes no Orientation tag, so
    splice is overkill — rebuild via make-tag patching is fiddly;
    instead patch a tag the fixture DOES write? Simpler: hand-add by
    regenerating with make= so the IFD exists, then overwrite the
    DATETIME tag id with 274/SHORT/value. Kept minimal: replace the
    Make tag (271, ASCII) entry's header with Orientation SHORT."""
    b = bytearray(encode_tiff(_px(h=16, w=24), make="x"))
    idx = bytes(b).find(struct.pack("<HH", 271, 2))
    assert idx > 0
    b[idx:idx + 12] = struct.pack("<HHI", 274, 3, 1) + struct.pack(
        "<HH", o, 0
    )
    return bytes(b)


def test_exif_ifd1_thumbnail_round_trip():
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
        decode_image,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.tiff import (  # noqa: E501
        exif_thumbnail,
    )

    main_px = _px(h=32, w=48)
    thumb_px = _px(h=8, w=12, seed=5)
    thumb = encode_jpeg(thumb_px, quality=80)
    for endian in ("<", ">"):
        j = insert_app1(
            encode_jpeg(main_px, quality=90),
            exif_app1("C", "M", "2026:01:01 00:00:00",
                      thumbnail=thumb, endian=endian),
        )
        got = exif_thumbnail(j)
        assert got == thumb, endian
        # the preview decodes without touching the main image
        assert decode_image(got, prefer_pil=False).shape == (8, 12, 3)
        # main-image metadata and decode are unaffected
        assert parse_exif(j)["make"] == "C"
        assert decode_image(j, prefer_pil=False).shape == (32, 48, 3)
    # absent thumbnail / absent APP1 / damage → None, never a raise
    j_plain = insert_app1(
        encode_jpeg(main_px, quality=90),
        exif_app1("C", "M", "2026:01:01 00:00:00"),
    )
    assert exif_thumbnail(j_plain) is None
    assert exif_thumbnail(encode_jpeg(main_px, quality=90)) is None
    withthumb = insert_app1(
        encode_jpeg(main_px, quality=90),
        exif_app1("C", "M", "2026:01:01 00:00:00", thumbnail=thumb),
    )
    for i in range(0, 700, 13):
        dam = bytearray(withthumb)
        dam[i] ^= 0x3C
        exif_thumbnail(bytes(dam))
    for cut in range(0, 700, 19):
        exif_thumbnail(withthumb[:cut])


# ── r12 review-pass regressions ─────────────────────────────────


def test_hostile_tag_values_never_raise():
    # RowsPerStrip=0 with planar config reached a division (review
    # catch); FLOAT-typed width reached shape arithmetic; spp wilder
    # than reality. All must be S4 Nones or valid decodes — never
    # exceptions.
    base = encode_tiff(_px(), planar=True)

    def patch_tag(b, tag, typ, cnt, val4):
        buf = bytearray(b)
        for t in (3, 4):
            for c in (1, 3):
                idx = bytes(buf).find(struct.pack("<HHI", tag, t, c))
                if idx >= 0:
                    buf[idx:idx + 12] = struct.pack(
                        "<HHI", tag, typ, cnt
                    ) + val4
                    return bytes(buf)
        raise AssertionError("tag %d not found" % tag)

    dam = patch_tag(base, 278, 3, 1, struct.pack("<HH", 0, 0))
    decode_tiff(dam)  # rps=0: must not raise
    dam = patch_tag(base, 256, 11, 1, struct.pack("<f", 17.0))
    assert decode_tiff(dam) is None  # float width → S4
    dam = patch_tag(base, 277, 3, 1, struct.pack("<HH", 200, 0))
    assert decode_tiff(dam) is None  # absurd spp → S4
    meta = parse_tiff_meta(dam)
    assert meta is not None  # meta walk still surfaces structure


def test_spp2_gray_alpha_decodes_to_rgb():
    # hand-build a 2×2 gray+alpha TIFF: the decode contract is
    # (h, w, 3) — channel 0 is luminance, alpha dropped
    pix = bytes([10, 255, 20, 128, 30, 0, 40, 64])  # g,a pairs
    out = b"II*\x00" + struct.pack("<I", 16)
    out += pix
    entries = [
        (256, 3, 1, struct.pack("<HH", 2, 0)),
        (257, 3, 1, struct.pack("<HH", 2, 0)),
        (258, 3, 2, struct.pack("<HH", 8, 8)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<HH", 2, 0)),
        (278, 3, 1, struct.pack("<HH", 2, 0)),
        (279, 4, 1, struct.pack("<I", 8)),
    ]
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)
    arr = decode_tiff(out)
    assert arr is not None and arr.shape == (2, 2, 3)
    assert arr[:, :, 0].ravel().tolist() == [10, 20, 30, 40]
    assert np.array_equal(arr[:, :, 0], arr[:, :, 1])


def test_damaged_second_ifd_surfaces_first_page():
    # the documented lenient-prefix contract (review catch: any
    # damaged IFD dropped the whole file)
    full = encode_tiff(_px(), extra_pages=1, make="X")
    meta = parse_tiff_meta(full)
    assert len(meta) == 2
    # corrupt the SECOND IFD's entry count: find its offset via the
    # first IFD's next pointer
    en_pages = struct.unpack_from("<I", full, 4)[0]
    n0 = struct.unpack_from("<H", full, en_pages)[0]
    (second_off,) = struct.unpack_from(
        "<I", full, en_pages + 2 + 12 * n0
    )
    dam = bytearray(full)
    dam[second_off:second_off + 2] = struct.pack("<H", 60000)
    meta = parse_tiff_meta(bytes(dam))
    assert meta is not None and len(meta) == 1  # prefix survives
    assert decode_tiff(bytes(dam)) is not None  # page 0 decodes


def test_gps_empty_ref_does_not_flip_sign():
    # '' in 'Ss' is True — an empty/NUL GPS ref silently negated the
    # coordinate (review catch); now it yields None, and one-letter
    # refs keep exact semantics
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )

    j = insert_app1(
        encode_jpeg(_px(), quality=90),
        exif_app1("C", "M", "2026:01:01 00:00:00", gps=(10.5, 20.25)),
    )
    # patch the GPSLatitudeRef ASCII 'N\x00' to '\x00\x00'
    b = bytearray(j)
    idx = bytes(b).find(struct.pack("<HHI", 1, 2, 2) + b"N\x00\x00\x00")
    assert idx > 0
    b[idx + 8] = 0
    ex = parse_exif(bytes(b))
    assert ex is not None and ex["gps_lat"] is None
    assert abs(ex["gps_lon"] - 20.25) < 1e-4  # untouched ref intact


# ── r13: hostile tag RETYPING (the Arrow-serialization hole) ────


def _hand_tiff(entries, pix=b"\x00\x00\x00\x00"):
    """Minimal little-endian TIFF: pixels at 8, IFD right after."""
    out = b"II*\x00" + struct.pack("<I", 8 + len(pix)) + pix
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack("<HHI", tag, typ, cnt) + val[:4].ljust(4, b"\0")
    out += struct.pack("<I", 0)
    return out


def _gray_entries(retype=None):
    """Valid 2×2 gray-8 IFD; ``retype`` = {tag: (typ, cnt, raw4)}
    overrides — the hostile writer rewriting a tag's TYPE field."""
    base = {
        256: (3, 1, struct.pack("<HH", 2, 0)),
        257: (3, 1, struct.pack("<HH", 2, 0)),
        258: (3, 1, struct.pack("<HH", 8, 0)),
        259: (3, 1, struct.pack("<HH", 1, 0)),
        262: (3, 1, struct.pack("<HH", 1, 0)),
        273: (4, 1, struct.pack("<I", 8)),
        277: (3, 1, struct.pack("<HH", 1, 0)),
        278: (3, 1, struct.pack("<HH", 2, 0)),
        279: (4, 1, struct.pack("<I", 4)),
    }
    base.update(retype or {})
    return [(tag, t, c, v) for tag, (t, c, v) in base.items()]


# every hostile variant: tag → retyped (typ, cnt, raw4)
_RETYPES = {
    "width_ascii": {256: (2, 3, b"ab\x00\x00")},
    "width_float": {256: (11, 1, struct.pack("<f", 17.5))},
    "height_rational_ptr": {257: (5, 1, struct.pack("<I", 8))},
    "make_short": {271: (3, 2, struct.pack("<HH", 65, 66))},
    "model_float": {272: (11, 1, struct.pack("<f", 1.25))},
    "datetime_short": {306: (3, 1, struct.pack("<HH", 9, 0))},
    "orientation_ascii": {274: (2, 2, b"6\x00\x00\x00")},
    "bits_ascii": {258: (2, 2, b"8\x00\x00\x00")},
    "spp_float": {277: (11, 1, struct.pack("<f", 3.0))},
    "compression_ascii": {259: (2, 2, b"5\x00\x00\x00")},
}


@pytest.mark.parametrize("name", sorted(_RETYPES))
def test_retyped_tags_yield_typed_meta_never_str_or_float(name):
    # ADVICE r12 (high): Width retyped ASCII gave width='ab', which
    # passed triage_blob's try/except but DIED at pandas→Arrow in
    # the LongType kernel schema. parse_tiff_meta must coerce every
    # emitted value to its declared kernel type (int/str) or None.
    blob = _hand_tiff(_gray_entries(_RETYPES[name]))
    meta = parse_tiff_meta(blob)
    if meta is None:
        return  # S4 drop is fine; a wrong TYPE is not
    for page in meta:
        for k in ("width", "height", "samples_per_pixel",
                  "compression", "photometric", "predictor",
                  "n_segments", "orientation", "page"):
            assert page[k] is None or (
                isinstance(page[k], int)
                and not isinstance(page[k], bool)
            ), (name, k, page[k])
        for k in ("make", "model", "datetime"):
            assert page[k] is None or isinstance(page[k], str), (
                name, k, page[k])
        assert isinstance(page["bits"], list) and all(
            isinstance(x, int) for x in page["bits"]), (name, page)
        for k in ("tiled", "has_exif_ifd"):
            assert isinstance(page[k], bool), (name, k)
    # triage forwards meta[0] width/height into its LongType schema
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.triage import (  # noqa: E501
        triage_blob,
    )

    t = triage_blob(blob)
    for k in ("width", "height", "duration_ms", "n_streams"):
        assert t[k] is None or (
            isinstance(t[k], int) and not isinstance(t[k], bool)
        ), (name, k, t[k])


def test_retyped_exif_tags_never_raise_and_stay_typed():
    # EXIF sub-IFD rationals retyped as SHORT/ASCII reach _rat/dms;
    # the JPEG APP1 path must neither raise nor emit wrong types.
    px = _px(16, 16)
    j = insert_app1(
        encode_jpeg_for_exif(px),
        exif_app1("C", "M", "2026:01:01 00:00:00",
                  gps=(14.5995, 120.9842)),
    )
    # retype every RATIONAL(5)/SRATIONAL(10) entry in the APP1 to
    # SHORT, then every ASCII(2) to FLOAT — byte-surgery sweep
    for src_typ, dst_typ in ((5, 3), (10, 3), (2, 11), (3, 2)):
        b = bytearray(j)
        i = 0
        while i + 12 <= len(b):
            tag, typ = struct.unpack_from("<HH", b, i)
            if typ == src_typ and 256 <= tag <= 0xA500:
                struct.pack_into("<H", b, i + 2, dst_typ)
            i += 2
        ex = parse_exif(bytes(b))  # must not raise
        if ex is None:
            continue
        for k in ("make", "model", "datetime", "datetime_original"):
            assert ex[k] is None or isinstance(ex[k], str), (
                src_typ, k, ex[k])
        for k in ("exposure_s", "fnumber", "focal_mm",
                  "gps_lat", "gps_lon"):
            assert ex[k] is None or isinstance(ex[k], float), (
                src_typ, k, ex[k])
        for k in ("iso", "pixel_x", "pixel_y", "orientation"):
            assert ex[k] is None or (
                isinstance(ex[k], int)
                and not isinstance(ex[k], bool)
            ), (src_typ, k, ex[k])


def encode_jpeg_for_exif(px):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (  # noqa: E501
        encode_jpeg,
    )

    return encode_jpeg(px, quality=90)
