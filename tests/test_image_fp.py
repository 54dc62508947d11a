"""Image near-dup tier (operators/image_fp.py): quantified invariance
pins per transform (re-encode / resize / brightness, cross-codec),
kernel==driver parity, banded-pair completeness with zero cross-group
leakage, the ubiquity cap on degenerate thumbnails, and damage
robustness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (
    _VARIANTS,
    _base_image,
    _variant,
    ahash64,
    dhash64,
    image_near_dup_pairs,
    image_signatures,
    synthetic_near_dup_image_corpus,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
    encode_jpeg,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
    decode_image,
    encode_bmp24,
    encode_png,
    encode_ppm,
)

_ENC = {
    "png": encode_png,
    "ppm": encode_ppm,
    "bmp": encode_bmp24,
    "jpeg85": lambda p: encode_jpeg(p, quality=85),
    "jpeg75": lambda p: encode_jpeg(p, quality=75),
    "jpeg40": lambda p: encode_jpeg(p, quality=40),
}


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _sig(group: int, v: int):
    px, kind = _variant(_base_image(group), v, group)
    arr = decode_image(_ENC[kind](px), prefer_pil=False)
    assert arr is not None, (group, v, kind)
    return dhash64(arr), ahash64(arr)


N_GROUPS = 10

#: the quantified invariance contract, per variant transform — the
#: image tier's analog of the audio tier's probe-set pins. Bounds are
#: deliberately looser than observed (observed max 5 over 12 groups)
#: but MUCH tighter than the cross-group floor (observed min 12).
_VARIANT_BOUND = {
    1: 6,   # JPEG q=85 re-encode of the PNG original
    2: 8,   # JPEG q=40 heavy re-encode
    3: 8,   # half-size box resample (PPM — codec family change too)
    4: 0,   # +18 brightness shift: EXACT invariance, by construction
    5: 8,   # 1.5× upsample + JPEG q=75
}


@pytest.mark.parametrize("v", sorted(_VARIANT_BOUND))
def test_invariance_bounds_per_transform(v):
    for g in range(N_GROUPS):
        d0, a0 = _sig(g, 0)
        dv, av = _sig(g, v)
        bound = _VARIANT_BOUND[v]
        assert _ham(d0, dv) <= bound, (g, v, _ham(d0, dv))
        assert _ham(a0, av) <= max(bound, 2), (g, v, _ham(a0, av))


def test_cross_group_separation_floor():
    sigs = [_sig(g, 0) for g in range(N_GROUPS)]
    for i in range(N_GROUPS):
        for j in range(i + 1, N_GROUPS):
            assert _ham(sigs[i][0], sigs[j][0]) >= 11, (i, j)


def test_brightness_shift_is_exactly_invariant():
    for g in range(4):
        base = _base_image(g)
        shifted = (base.astype(np.int16) + 18).clip(0, 255).astype(
            np.uint8)
        assert dhash64(base) == dhash64(shifted)
        assert ahash64(base) == ahash64(shifted)


def test_gray_flat_image_hashes_defined():
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    assert dhash64(flat) == 0  # no gradients anywhere
    # ahash of a constant image: no pixel exceeds the mean
    assert ahash64(flat) == 0


class TestSpark:
    def _corpus(self, spark, sf_dir, n_docs):
        docs = catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < n_docs
        )
        return synthetic_near_dup_image_corpus(docs)

    def test_kernel_equals_driver(self, spark, sf_dir):
        corpus = self._corpus(spark, sf_dir, 36)
        got = {
            r["doc_id"]: (r["dhash"], r["ahash"])
            for r in image_signatures(corpus).collect()
        }
        assert set(got) == set(range(36))
        for d in range(36):
            want = _sig(d // _VARIANTS, d % _VARIANTS)
            assert got[d] == want, d

    def test_pairs_complete_and_clean(self, spark, sf_dir):
        corpus = self._corpus(spark, sf_dir, 36)  # 6 groups × 6
        pairs = image_near_dup_pairs(corpus).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # every same-group pair present (15 per group × 6 groups)…
        for g in range(6):
            ids = range(g * _VARIANTS, (g + 1) * _VARIANTS)
            for a in ids:
                for b in ids:
                    if a < b:
                        assert (a, b) in got, (a, b)
        # …and nothing across groups
        for a, b in got:
            assert a // _VARIANTS == b // _VARIANTS, (a, b)
        # distances are the kernel's own
        for r in pairs:
            da, _ = _sig(r["id_a"] // _VARIANTS, r["id_a"] % _VARIANTS)
            db, _ = _sig(r["id_b"] // _VARIANTS, r["id_b"] % _VARIANTS)
            assert r["dhash_hamming"] == _ham(da, db)

    def test_ubiquity_cap_drops_degenerate_slots(self, spark, sf_dir):
        # 40 byte-identical flat images: every band slot holds all
        # 40 → with max_posting=8 the slots are boilerplate and NO
        # pairs may come out of them (and nothing explodes)
        flat = encode_png(np.full((16, 16, 3), 77, dtype=np.uint8))
        df = spark.createDataFrame(
            [(i, bytearray(flat)) for i in range(40)],
            "doc_id long, blob binary",
        )
        assert image_near_dup_pairs(df, max_posting=8).count() == 0
        # with the cap lifted they all pair (39·40/2 rows)
        assert image_near_dup_pairs(
            df, max_posting=None
        ).count() == 780

    def test_damaged_blobs_skipped_not_fatal(self, spark, sf_dir):
        corpus = self._corpus(spark, sf_dir, 12)
        damaged = corpus.withColumn(
            "blob",
            F.when(F.col("doc_id") % 5 == 2,
                   F.substring(F.col("blob"), 1, 7)).otherwise(
                       F.col("blob")),
        )
        got = {r["doc_id"] for r in
               image_signatures(damaged).collect()}
        assert got == {d for d in range(12) if d % 5 != 2}
