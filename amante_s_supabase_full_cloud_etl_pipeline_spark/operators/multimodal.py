"""Multimodal column handling (charter extension, SURVEY.md §2.10).

Design: media (image/audio/video) live as opaque ``binary`` columns
with a typed metadata struct alongside — the lakehouse-standard
layout for multimodal training data. All Spark-side plumbing is real
(schema, batch iteration, partition sizing), and the image decode is
REAL for uncompressed formats:

- :func:`decode_image` decodes 24-bit uncompressed BMP and binary
  PPM (P6) with pure numpy — no image library needed. Compressed
  codecs (JPEG/PNG/video) still gate behind
  :func:`decode_image_batch`'s NotImplementedError (PIL/libvips not
  in this container); swap :func:`decode_image` for a PIL call and
  nothing else changes.
- :func:`image_feature_kernel` is the Arrow ``mapInPandas`` kernel:
  decode → stats (per-channel means, luminance moments) → resize
  (mean-pooled 8×8 thumb — the "resize" step of the charter).
- :func:`fake_decode_features` remains the byte-moment stand-in used
  where content is NOT an image (text-as-blob corpus).

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
    """mapInPandas kernel for COMPRESSED codecs (JPEG/PNG/video).
    STUB — these need PIL/libvips, not present in this container;
    uncompressed BMP/PPM decode is real (:func:`decode_image`)."""
    for batch in batches:  # pragma: no cover - exercised only to raise
        raise NotImplementedError(
            "STUB: compressed-image decode requires PIL/libvips; "
            "BMP/PPM are decoded natively by decode_image"
        )


# --------------------------------------------------------------------------
# Real pixel codecs: 24-bit uncompressed BMP + binary PPM (P6).
# Pure numpy — deterministic everywhere, no image libraries.
# --------------------------------------------------------------------------


def encode_ppm(pixels) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp24(pixels) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic layout)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[:2]
    row_len = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].tobytes() + pad  # RGB → BGR
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def _decode_ppm(blob: bytes):
    """Binary PPM (P6) → (h, w, 3) uint8, honoring comments and
    arbitrary whitespace in the header. Returns None if malformed."""
    import numpy as np

    if not blob.startswith(b"P6"):
        return None
    # tokenize header: magic, width, height, maxval (comments allowed)
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(blob):
        ch = blob[pos : pos + 1]
        if ch == b"#":
            pos = blob.find(b"\n", pos)
            if pos < 0:
                return None
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(blob) and not blob[end : end + 1].isspace():
                end += 1
            fields.append(blob[pos:end])
            pos = end
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    pos += 1  # exactly one whitespace byte after maxval
    raw = blob[pos : pos + w * h * 3]
    if len(raw) != w * h * 3:
        return None
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()


def _decode_bmp(blob: bytes):
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB; handles
    bottom-up (positive height) and top-down (negative) row order and
    4-byte row padding. Returns None for compressed/other depths."""
    import struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    _, w, h, _, bpp, compression = struct.unpack_from("<IiiHHI", blob, 14)
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    if data_offset + row_len * h > len(blob):
        return None
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_len * h, offset=data_offset)
    rows = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_image(blob: bytes):
    """Dispatch on magic bytes → (h, w, 3) uint8 RGB, or None when
    the format is unknown/corrupt (per-row skip, S4 semantics)."""
    if blob is None:
        return None
    b = bytes(blob)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    return None


def pooled_thumb(arr, n: int = 8):
    """Charter "resize": n×n mean-pooled grayscale thumbnail. Exact
    box pooling over integral images — deterministic, no resampling
    library."""
    import numpy as np

    luma = (
        0.299 * arr[:, :, 0].astype(np.float64)
        + 0.587 * arr[:, :, 1].astype(np.float64)
        + 0.114 * arr[:, :, 2].astype(np.float64)
    )
    h, w = luma.shape
    ys = np.linspace(0, h, n + 1).astype(int)
    xs = np.linspace(0, w, n + 1).astype(int)
    out = np.empty((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(n):
            block = luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i, j] = block.mean()
    return out


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


# --------------------------------------------------------------------------
# Real image pipeline: synthetic corpus → decode → stats + thumb.
# --------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("luma_mean", DoubleType()),
        StructField("luma_std", DoubleType()),
        StructField("thumb", ArrayType(DoubleType())),
    ]
)


def synthetic_image_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic image corpus keyed on doc_id: even ids encode a
    gradient as 24-bit BMP, odd ids as binary PPM. Generated
    worker-side in the Arrow kernel (never a driver loop), so the
    corpus scales with the input table."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        # import inside the kernel: resolution happens on the
        # executor against the package zip session.configure ships
        # via addPyFile (works even when the driver cwd ≠ repo)
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
            encode_bmp24,
            encode_ppm,
        )

        for batch in batches:
            blobs, types = [], []
            for doc_id in batch["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 9, 6 + d % 7
                yy, xx = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        (xx * 7 + yy * 13 + d) % 256,
                        (xx * 3 + d * 5) % 256,
                        (yy * 11 + d * 3) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                if d % 2 == 0:
                    blobs.append(encode_bmp24(px))
                    types.append("image/bmp")
                else:
                    blobs.append(encode_ppm(px))
                    types.append("image/ppm")
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"], "blob": blobs, "media_type": types}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("blob", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(kernel, schema)


def decode_image_features(media: DataFrame, round_to: int = 6) -> DataFrame:
    """REAL decode → feature-extract → resize over BMP/PPM blobs:
    per-channel means, luminance moments, 8×8 mean-pooled thumb.
    Undecodable blobs are skipped (S4 per-row semantics). Floats are
    rounded so results are stable across BLAS builds."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
            decode_image,
            pooled_thumb,
        )

        for batch in batches:
            out = {k: [] for k in (
                "doc_id", "media_type", "width", "height",
                "mean_r", "mean_g", "mean_b", "luma_mean", "luma_std", "thumb",
            )}
            for doc_id, mt, blob in zip(batch["doc_id"], batch["media_type"], batch["blob"]):
                arr = decode_image(blob)
                if arr is None:
                    continue  # per-row skip
                f64 = arr.astype(np.float64)
                luma = 0.299 * f64[:, :, 0] + 0.587 * f64[:, :, 1] + 0.114 * f64[:, :, 2]
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_r"].append(round(float(f64[:, :, 0].mean()), round_to))
                out["mean_g"].append(round(float(f64[:, :, 1].mean()), round_to))
                out["mean_b"].append(round(float(f64[:, :, 2].mean()), round_to))
                out["luma_mean"].append(round(float(luma.mean()), round_to))
                out["luma_std"].append(round(float(luma.std()), round_to))
                out["thumb"].append([round(float(v), round_to) for v in pooled_thumb(arr).ravel()])
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)
