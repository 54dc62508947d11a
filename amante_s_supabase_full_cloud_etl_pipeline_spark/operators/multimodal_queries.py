"""Registry queries for multimodal column plumbing.

The metadata path (binary length/md5/typing) is oracle-checked
against live SQL; the real BMP/PPM image-decode Arrow kernel is
deterministic, so its expected output is a committed golden table
(tests/golden/) that DuckDB reads as the oracle — a full value
check, not rows-only. (The byte-moment fallback kernel
``extract_features`` stays unit-tested in tests/test_multimodal.py;
the registry proves the family through the real decode.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import DRIVER_SF, golden_oracle, register
from .multimodal import (
    attach_media_meta,
    decode_image_features,
    documents_as_media,
    synthetic_image_corpus,
)


@register(
    "multimodal_media_meta",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           COUNT(*) AS n_blobs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS distinct_contents
    FROM documents
    GROUP BY 1 ORDER BY media_type
    """,
)
def multimodal_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction (length/md5/typed columns) —
    no decode, pure JVM expressions over blobs."""
    docs = catalog.table(spark, sf_dir, "documents")
    media = attach_media_meta(documents_as_media(docs))
    return (
        media.groupBy(F.col("media_meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("media_meta.byte_length").alias("total_bytes"),
            F.countDistinct("media_meta.content_md5").alias("distinct_contents"),
        )
        .orderBy("media_type")
    )


@register(
    "multimodal_image_decode",
    oracle=golden_oracle("multimodal_image_decode"),
    golden_sf=DRIVER_SF,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over all five native codecs (24-bit BMP,
    binary PPM, zlib PNG, LZW GIF incl. interlace via operators/gif.py,
    baseline JPEG via the pure-numpy Huffman+DCT decoder in
    operators/jpeg.py) on a worker-generated deterministic
    corpus: per-channel means, luminance moments, width/height. The
    8×8 pooled-thumb "resize" output is asserted in
    tests/test_multimodal.py; doc_id < 500 keeps the corpus identical
    across scale factors."""
    docs = catalog.table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    feats = decode_image_features(synthetic_image_corpus(docs))
    return feats.drop("thumb").orderBy("doc_id")
