"""Multimodal column handling (charter extension, SURVEY.md §2.10).

Design: media (image/audio/video) live as opaque ``binary`` columns
with a typed metadata struct alongside — the lakehouse-standard
layout for multimodal training data. All Spark-side plumbing is real
(schema, batch iteration, partition sizing); the actual codec work is
stubbed because media libraries aren't in this container:

- :func:`decode_image_batch` raises ``NotImplementedError`` at the
  pixel-decode step (clearly marked STUB).
- :func:`fake_decode_features` is the deterministic stand-in used by
  tests/queries: "features" derived from the bytes themselves, so
  the mapInPandas pipeline (Arrow batching, schema contract,
  per-partition iteration) is exercised for real.

At 100 TB: media rows are large, so the operators repartition by
byte-size budget rather than row count (``target_partition_mb``) —
the knob that keeps Arrow batches and executor memory bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: metadata struct carried next to every media blob
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("byte_length", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_length", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata from an opaque binary column — pure JVM
    expressions (length/md5), no decode."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_type").alias("media_type"),
            F.length(F.col(blob_col)).cast("long").alias("byte_length"),
            F.md5(F.col(blob_col)).alias("content_md5"),
        ),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Local stand-in corpus: text bytes as the opaque blob (the
    pipeline doesn't care what the bytes encode)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
    )


def size_partitioned(df: DataFrame, total_bytes: int, target_partition_mb: int = 128) -> DataFrame:
    """Repartition a media table by byte budget, not row count —
    media rows are wildly variable-sized; this is the partitioning
    rule that keeps Arrow batches/executor memory bounded at scale."""
    n = max(1, total_bytes // (target_partition_mb * 1024 * 1024))
    return df.repartition(n)


def decode_image_batch(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """mapInPandas kernel: decode → feature-extract. STUB — the
    pixel decode needs an image library not present in this
    container; the Arrow plumbing around it is the real contract."""
    for batch in batches:  # pragma: no cover - exercised only to raise
        raise NotImplementedError(
            "STUB: image decode requires PIL/libvips; use "
            "fake_decode_features for the deterministic test path"
        )


def fake_decode_features(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Deterministic decode stand-in with the REAL kernel shape:
    per-batch vectorized work over the blob bytes → fixed-width
    feature vector (4 moments of the byte distribution)."""
    import numpy as np
    import pandas as pd

    for batch in batches:
        feats = []
        for blob in batch["blob"]:
            arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
            if arr.size == 0:
                feats.append([0.0, 0.0, 0.0, 0.0])
            else:
                feats.append(
                    [
                        float(arr.mean()),
                        float(arr.std()),
                        float(arr.min()),
                        float(arr.max()),
                    ]
                )
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "byte_length": batch["blob"].str.len().astype("int64"),
                "feature": feats,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """The multimodal feature-extraction pipeline: size-aware
    partitioning → Arrow-batched mapInPandas kernel → typed schema.

    The kernel is a nested closure (not a module-level reference) so
    cloudpickle ships it BY VALUE: Python workers don't need this
    package importable on their sys.path (the driver may run from an
    arbitrary cwd — e.g. the verification harness)."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for batch in batches:
            feats = []
            for blob in batch["blob"]:
                arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
                if arr.size == 0:
                    feats.append([0.0, 0.0, 0.0, 0.0])
                else:
                    feats.append(
                        [
                            float(arr.mean()),
                            float(arr.std()),
                            float(arr.min()),
                            float(arr.max()),
                        ]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "media_type": batch["media_type"],
                    "byte_length": batch["blob"].str.len().astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)
