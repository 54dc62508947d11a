"""Landing-zone document ingestion — the round-10 multimodal intake
path, end to end:

    python examples/document_ingest.py

A data drop arrives as MIXED archives (zip / tar / tar.gz) holding
PDFs — some permissions-only encrypted, some with embedded images —
plus WebM clips and loose text. One pipeline:

1. ``archive_members`` lists every archive WITHOUT materializing
   payloads (at object-store scale the zip path is a tail ranged
   read of the central directory);
2. ``archive_extract`` inflates only the members a suffix filter
   selected (CRC-validated; damaged members skip while their
   siblings extract);
3. routing by sniffed type: ``.pdf`` payloads → ``pdf_text`` (the
   per-page text that feeds the SAME dedup/quality operators as
   HTML — shown here with token stats) and ``pdf_images`` (embedded
   DCTDecode payloads decoded by the native JPEG kernel);
   ``.webm`` → ``mkv_meta`` + keyframe ranges (ship sampled frames,
   not files);
4. the round trip is asserted, not narrated: extracted text matches
   what was authored into the PDFs (including an AES-encrypted one —
   the empty-user-password shape a crawl actually meets), the
   embedded image decodes back to its source color, and every WebM
   keyframe's CRC matches the payload its byte range slices.
"""

from __future__ import annotations

import io
import os
import sys
import tarfile
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mkv import (
    encode_mkv,
    mkv_meta,
    sample_mkv_keyframes,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (
    encode_pdf,
    pdf_images,
    pdf_text,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.archives import (
    archive_extract,
    archive_members,
)


def build_drop() -> list[tuple[int, bytes]]:
    """Three archives the way a real landing zone mixes them."""
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:] = (180, 40, 60)
    reports = [
        ("reports/q%d.pdf" % i,
         encode_pdf(
             [["Quarterly report %d." % i,
               "Revenue grew by %d basis points." % (100 + i)]],
             compress=True,
             images=[[{"codec": "jpeg",
                       "data": encode_jpeg(px, quality=90),
                       "width": 16, "height": 16}]] if i == 0 else None,
         ))
        for i in range(3)
    ]
    # one permissions-only encrypted PDF (empty user password)
    reports.append(
        ("reports/confidential.pdf",
         encode_pdf([["Encrypted but readable by any conforming "
                      "reader.", "Because the user password is "
                      "empty."]], encrypt="aes-128"))
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, payload in reports:
            z.writestr(name, payload)
        z.writestr("reports/notes.txt", "loose note " * 20)
    zip_blob = buf.getvalue()

    clip = encode_mkv(
        [{"track_id": 1, "type": "video", "codec": "V_VP9",
          "width": 640, "height": 360}],
        [{"timestamp": t * 500,
          "blocks": [(1, 0, True, bytes([t]) * 40),
                     (1, 33, False, b"\x00" * 25)]}
         for t in range(4)],
        duration_ticks=2000.0,
    )
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as t:
        ti = tarfile.TarInfo("media/clip.webm")
        ti.size = len(clip)
        t.addfile(ti, io.BytesIO(clip))
    tar_blob = buf.getvalue()
    return [(1, zip_blob), (2, tar_blob)]


def main() -> None:
    spark = get_spark("document-ingest-example")
    drop = spark.createDataFrame(
        [(d, bytearray(b)) for d, b in build_drop()],
        "doc_id long, blob binary",
    )

    # 1. list without extracting
    listing = archive_members(drop)
    n_members = listing.count()
    pdf_names = [r["member"] for r in listing.filter(
        F.col("member").endswith(".pdf")
    ).collect()]
    print(f"listed {n_members} members across the drop; "
          f"{len(pdf_names)} PDFs")
    assert len(pdf_names) == 4

    # 2. extract selectively
    pdfs = archive_extract(drop, suffix=".pdf").select(
        F.col("member"), F.col("blob")
    )
    docs = pdfs.select(
        F.monotonically_increasing_id().alias("doc_id"),
        "member", "blob",
    )
    docs.cache()

    # 3a. per-page text → the same token stats any HTML page gets
    pages = pdf_text(docs.select("doc_id", "blob"))
    joined = pages.join(docs.select("doc_id", "member"), "doc_id")
    texts = {r["member"]: r["text"] for r in joined.collect()}
    assert texts["reports/q1.pdf"].startswith("Quarterly report 1.")
    assert "310 basis points" not in texts["reports/q1.pdf"]
    assert texts["reports/confidential.pdf"].startswith(
        "Encrypted but readable"
    )
    stats = (
        pages.filter(F.col("text").isNotNull())
        .select(F.sum("n_chars").alias("chars"),
                F.count("*").alias("pages"))
        .first()
    )
    print(f"extracted {stats['pages']} pages, {stats['chars']} chars "
          "(incl. the AES-encrypted report)")

    # 3b. embedded images → the native JPEG decoder
    imgs = pdf_images(docs.select("doc_id", "blob")).collect()
    assert len(imgs) == 1 and imgs[0]["codec"] == "jpeg"
    arr = decode_jpeg(bytes(imgs[0]["blob"]))
    assert arr.shape == (16, 16, 3)
    assert abs(int(arr[8, 8, 0]) - 180) < 16
    print("embedded JPEG decoded:", arr.shape,
          "mean R =", round(float(arr[..., 0].mean()), 1))

    # 3c. the WebM clip: track meta + sampled keyframes with CRC
    media = archive_extract(drop, suffix=".webm").select(
        F.lit(100).alias("doc_id"), "blob"
    )
    tracks = mkv_meta(media).collect()
    assert tracks[0]["codec"] == "V_VP9"
    kf = sample_mkv_keyframes(media, every=2).collect()
    blob = bytes(media.first()["blob"])
    import zlib as _z

    for r in kf:
        payload = blob[r["offset"]:r["offset"] + r["size"]]
        assert _z.crc32(payload) == r["payload_crc32"]
    print(f"webm: {tracks[0]['n_clusters']} clusters, "
          f"{len(kf)} sampled keyframes, CRCs verified")

    print("document ingest example OK")
    spark.stop()


if __name__ == "__main__":
    main()
