"""Multimodal plumbing tests: metadata extraction, Arrow-batched
feature kernel (deterministic stand-in), and the marked decode STUB."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
    attach_media_meta,
    decode_image_batch,
    documents_as_media,
    extract_features,
    size_partitioned,
)


def test_media_meta_matches_bytes(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents").limit(5)
    media = attach_media_meta(documents_as_media(docs))
    for r in media.select("media_meta", F.col("blob")).collect():
        blob = bytes(r["blob"])
        assert r["media_meta"]["byte_length"] == len(blob)
        assert r["media_meta"]["content_md5"] == hashlib.md5(blob).hexdigest()


def test_feature_kernel_deterministic_and_typed(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents").limit(20)
    media = size_partitioned(documents_as_media(docs), total_bytes=1 << 20)
    feats = extract_features(media)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == 20
    # independently recompute one feature vector
    doc = docs.filter(F.col("doc_id") == min(rows)).collect()[0]
    blob = doc["text"].encode()
    vals = list(blob)
    mean = sum(vals) / len(vals)
    got = rows[min(rows)]
    assert abs(got["feature"][0] - mean) < 1e-9
    assert got["byte_length"] == len(blob)
    assert len(got["feature"]) == 4


def test_decode_stub_raises(spark):
    df = documents_as_media(
        spark.createDataFrame([(1, "abc", "en", "s", 3)],
                              "doc_id long, text string, lang string, source string, n_chars long")
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
        FEATURE_SCHEMA,
    )

    # The NotImplementedError surfaces as a PythonException whose
    # message content varies by worker-reuse state; asserting the
    # job fails is the contract (the stub must prevent execution).
    with pytest.raises(Exception):
        df.mapInPandas(decode_image_batch, FEATURE_SCHEMA).collect()
