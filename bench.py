"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>}

Each query is forced end-to-end with the noop sink (full execution,
no driver collect cost). The timed window covers frame CONSTRUCTION
plus the action (r14, ADVICE r13: eager persist sites materialize
work at construction time — a post-build-only timer would let that
work escape the window). Every query gets one un-timed warm-up pass
before its timed pass: the first execution of a plan pays Catalyst
analysis + whole-stage codegen + C1/C2 JIT (2-10s of one-off compile
observed on the larger kernels), which a long-lived engine session
never sees again. The timed pass is therefore steady-state query
execution — the number that predicts cluster throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark

#: headline set: one representative per operator family, weighted
#: toward the shapes that dominate at scale (star join, two-level agg,
#: window top-k, inverted-index self-join, ANN scan, sessionization).
HEADLINE = (
    "star_net_sales_by_region",
    "a4_a7_headline_kpis",
    "a10_a11_share_of_total",
    "topk_parts_per_type",
    "explode_regex_part_attrs",
    "validation_routing",
    "dedup_exact_survivors",
    "dedup_jaccard_pairs",
    "decontaminate_eval_overlap",
    "pack_sequence_chunks",
    "knn_bruteforce_cosine",
    "knn_lsh_bucketed",
    "events_sessionization",
    "text_quality_band",
    # round-3 families: per-user funnel chain (k grouped mins +
    # user-key joins), mergeable theta sketch cube, bounded-state
    # grouped top-k
    "funnel_user_depths",
    "sketch_cube_daily_users",
    "grouped_topk_orders",
    # round-4 families: lexical retrieval (inverted-index build +
    # Okapi probe), native-JPEG Arrow decode kernel
    "bm25_docs_topk",
    "jpeg_decode_kernel",
    # round-7/8 families (VERDICT r7 #2: these subsystems were
    # driver-checked but never timed): the full crawl front half
    # (WARC parse → extract → canonical dedup → RFC 9309 robots) and
    # the native GIF/LZW decode kernel
    "crawl_front_half",
    "gif_decode_kernel",
    # round-9 families: MP4/ISO-BMFF container walk + keyframe
    # byte-range sampling (the video-corpus triage step) and
    # content-defined chunking (sub-document dedup granularity) —
    # measured the same round they land, per the r7/r8 precedent
    "mp4_keyframe_kernel",
    "cdc_chunk_stats",
    # round-10: blob-scale chunking at production params — the shape
    # the numpy prefix-doubling scan exists for (sf documents are all
    # <4 KiB and take the scalar path)
    "cdc_blob_chunking",
    # round-10: audio near-dup fingerprint kernel (RIFF decode +
    # framed rFFT + multi-probe keys) — measured the round it lands
    "audio_fp_kernel",
    # round-10: PDF structure walk + per-page text extraction (the
    # document-triage kernel) — measured the round it lands
    "pdf_text_kernel",
    # round-10: zip/tar member listing + extraction (the landing-
    # zone unpack step) — measured the round it lands
    "archive_extract_kernel",
    # round-10: Matroska/WebM EBML walk + keyframe ranges (the mkv
    # twin of the mp4 kernel) — measured the round it lands
    "mkv_keyframe_kernel",
    # round-10: docx/pptx/odt text extraction (zip + guarded XML)
    # — measured the round it lands
    "office_text_kernel",
    # round-11: SRT/WebVTT cue parse and eml/mbox message extraction
    # — the two text-ingest families that were pytest-only in r10
    # (VERDICT r10 missing #1) — measured the round they land
    "subtitle_cue_kernel",
    "email_text_kernel",
    # round-11: clean-room FLAC decode (RFC 9639 Rice/LPC — the
    # first compressed audio codec; VERDICT r10 missing #2) —
    # measured the round it lands
    "flac_decode_kernel",
    # round-11: Ogg page walk + Vorbis/Opus identification (the
    # third container next to mp4/mkv) — measured the round it lands
    "ogg_meta_kernel",
    # round-12: MPEG-audio frame walk + Xing/VBRI + ID3 tags (the
    # dominant web audio container) — measured the round it lands
    "mp3_meta_kernel",
    # round-12: TIFF 6.0 decode (IFD walk, PackBits/LZW+predictor,
    # strip/tile/planar) + EXIF extraction — measured the round it
    # lands
    "tiff_decode_kernel",
    # round-12: one-pass media triage (magic-sniff classifier across
    # all ~15 blob families over the mixed corpus) — the first scan
    # a real drop gets; measured the round it lands
    "media_triage_kernel",
    # round-12: keyframe ↔ subtitle-cue as-of alignment (the timed-
    # text tier's payoff composition, examples/transcript_align.py)
    # — measured the round it lands
    "transcript_align",
    # round-13: perceptual image near-dup (decode → dHash/aHash →
    # banded Hamming pairs across codec families) — measured the
    # round it lands
    "image_near_dup_pairs",
    # round-13: HEIF/AVIF item-level metadata walk (meta/iinf/iloc/
    # ipma/ispe through the shared ISO-BMFF machinery) — measured
    # the round it lands
    "heif_meta_kernel",
    # round-13: perceptual video near-dup (AVI walk → MJPEG frame
    # decode → per-frame dHash band probes → capped-posting pairs)
    # — measured the round it lands
    "video_near_dup_pairs",
)

#: the 13-row subset matching the r1 headline set's COMPOSITION —
#: the basis of the driver's fixed 2× gate (BASELINE.json = 16.89 s
#: over 13 rows). As the headline table grew 13 → 36 rows for
#: per-family visibility, the all-rows total stopped being
#: comparable to that gate (r11: 5 of 10 same-tree runs crossed it
#: on contended windows purely from added coverage). The summary
#: line's "value" is therefore THIS subset's total — same
#: composition as the gate's own basis (consolidations mapped by
#: name: a5→a4_a7, a11→a10_a11, explode_part_words→
#: explode_regex_part_attrs, lineitem_validation_clean→
#: validation_routing, text_quality_scores→text_quality_band) —
#: while every row stays measured and reported in "queries" /
#: "full_total". Documented in BASELINE.md (VERDICT r11 #5).
BASELINE_SET = (
    "star_net_sales_by_region",
    "a4_a7_headline_kpis",
    "a10_a11_share_of_total",
    "topk_parts_per_type",
    "explode_regex_part_attrs",
    "validation_routing",
    "dedup_exact_survivors",
    "dedup_jaccard_pairs",
    "knn_bruteforce_cosine",
    "knn_lsh_bucketed",
    "events_sessionization",
    "text_quality_band",
    "pos_kernel_1m_orders",
)


def _extra_queries():
    """Headline shapes that are no longer standalone registry rows
    (the registry holds the driver's 50 consolidated slots; several
    slots are labeled unions of these) — the bench keeps timing each
    NARROW shape so per-operator numbers stay comparable across
    rounds."""
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
        dedup_queries,
        similarity_queries,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.funnel import (
        funnel_times,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sketches import (
        theta_partials,
        theta_rollup,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.topk import (
        grouped_topk,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.plans import dashboard

    def funnel_user_depths(spark, sf_dir):
        ev = catalog.table(spark, sf_dir, "events")
        return funnel_times(ev, ("view", "click", "purchase"), within="6 hours")

    def sketch_cube_daily_users(spark, sf_dir):
        ev = catalog.table(spark, sf_dir, "events").withColumn(
            "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        )
        parts = theta_partials(ev, ["day", "event_type"], "user_id")
        return theta_rollup(parts, ["event_type"])

    def grouped_topk_orders(spark, sf_dir):
        orders = catalog.table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_totalprice", "o_orderkey"
        )
        return grouped_topk(
            orders, ["o_orderpriority"], ["o_totalprice", "o_orderkey"], k=3
        )

    def bm25_docs_topk(spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.bm25 import (
            bm25_score,
            build_index,
        )

        docs = catalog.table(spark, sf_dir, "documents")
        postings, stats = build_index(docs)
        queries = spark.createDataFrame(
            [
                (0, ["join", "hash"]),
                (1, ["spark", "vector"]),
                (2, ["customer"]),
                (3, ["scan", "filter", "merge"]),
            ],
            "query_id long, terms array<string>",
        )
        return bm25_score(postings, stats, queries, k=10)

    def jpeg_decode_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
            image_features_from_docs,
        )

        # doc_id % 4 == 3 → JPEG blobs only: times the native
        # Huffman+DCT decode path through the Arrow kernel
        # (r14: corpus + decode fused into one Python hop)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            (FF.col("doc_id") % 4 == 3) & (FF.col("doc_id") < 4000)
        )
        return image_features_from_docs(docs)

    def gif_decode_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
            image_features_from_docs,
        )

        # doc_id % 8 == 6 → GIF blobs only (half interlaced): times
        # the native LZW decode + canvas compositing Arrow kernel
        docs = catalog.table(spark, sf_dir, "documents").filter(
            (FF.col("doc_id") % 8 == 6) & (FF.col("doc_id") < 8000)
        )
        return image_features_from_docs(docs)

    def mp4_keyframe_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp4 import (
            mp4_keyframes_from_docs,
        )

        # container walk + keyframe byte-range resolution + payload
        # CRC over fixture MP4s (co64 / mvhd-v1 / audio-track shapes
        # cycle by doc_id) — the map-only video-triage kernel; named
        # for the kernel it times (sample_mp4_keyframes, which
        # subsumes the box walk)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + walk fused into one Python hop (fuse.py)
        return mp4_keyframes_from_docs(docs, every=3)

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_queries import (
        front_half_pages,
    )

    def cdc_chunk_stats(spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (
            chunk_dedup_stats,
            chunk_documents,
        )

        # FastCDC gear chunking over every document + the one-pass
        # duplication profile — map-only kernel + one hash agg
        docs = catalog.table(spark, sf_dir, "documents")
        return chunk_dedup_stats(chunk_documents(docs))

    def audio_fp_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (  # noqa: E501
            audio_probes_from_docs,
        )

        # r10: RIFF decode → framed rFFT → 16-bit band-sign prints →
        # 33× multi-probe keys, over the deterministic PCM corpus —
        # the audio near-dup triage kernel (map-only)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + probes fused into one Python hop (fuse.py)
        return audio_probes_from_docs(docs)

    def pdf_text_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pdf import (  # noqa: E501
            pdf_text_from_docs,
        )

        # r10: ISO 32000 structure walk + per-page text extraction
        # over fixture PDFs (classic/xref-stream layouts, Flate,
        # Type0 unicode, clipped-trailer recovery cycle by doc_id)
        # — the document-triage kernel of the multimodal family
        # (map-only)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + extraction fused into one Python hop
        return pdf_text_from_docs(docs)

    def office_text_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.office import (  # noqa: E501
            office_text_from_docs,
        )

        # r10: docx/pptx/odt member walk + DTD-guarded XML text
        # extraction over the fixture corpus — the office leg of the
        # document intake path (map-only)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + extraction fused into one Python hop
        return office_text_from_docs(docs)

    def subtitle_cue_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.subtitles import (  # noqa: E501
            subtitle_text_from_docs,
        )

        # r11: SRT/WebVTT cue parse over the fixture corpus — the
        # timed-transcript leg of the video intake path (map-only).
        # No seed repartition here: the cue parse is ~50 µs/doc, so
        # the shuffle + task fan-out costs more than it recovers
        # (measured 0.45 s unpartitioned vs 1.03 s at 64 tasks)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + cue parse fused into one Python hop
        return subtitle_text_from_docs(docs)

    def email_text_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.email_text import (  # noqa: E501
            email_text_from_docs,
        )

        # r11: eml/mbox header+body extraction (stdlib email walk +
        # html funnel) over the fixture corpus (map-only). The seed
        # (doc_id < 8000 covers every sf; 5000 rows at sf0.1)
        # arrives as ONE parquet split, which would run
        # the ~1.7 ms/message Python kernel single-threaded —
        # repartition the seed so the measurement reflects the
        # many-input-split layout any real corpus has. Bounded at
        # 4000 docs (covers the 44-shape corpus cycle 90x; the
        # jpeg row's doc_id<4000 precedent)
        # r14: corpus synthesis + extraction fused into ONE Python
        # hop (guide §4.1, operators/fuse.py) — same rows, one fewer
        # JVM↔Python round trip per task
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 4000
        ).repartition(64)
        return email_text_from_docs(docs)

    def flac_decode_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.flac import (  # noqa: E501
            flac_meta_from_docs,
        )

        # r11: full FLAC decode (Rice residuals + predictors + CRCs
        # + PCM crc32) over the fixture corpus (map-only; seed
        # repartitioned — the per-doc decode is ~7 ms of Python, so
        # a single parquet split would serialize it). Bounded at
        # 600 docs: the per-pass corpus ENCODE costs more than the
        # decode being measured, and 600 already covers every wire
        # shape 5x over (the jpeg row's doc_id<4000 precedent)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 600
        ).repartition(64)
        # r14: corpus + decode fused into one Python hop
        return flac_meta_from_docs(docs)

    def ogg_meta_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.ogg import (  # noqa: E501
            ogg_meta_from_docs,
        )

        # r11: RFC 3533 page walk (CRC per page) + codec ident over
        # the fixture corpus (map-only; seed repartitioned like the
        # email row — page CRC is Python-side work; bounded at 1500
        # docs, 12x over the 125-shape corpus cycle)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 1500
        ).repartition(64)
        # r14: corpus + page walk fused into one Python hop
        return ogg_meta_from_docs(docs)

    def mp3_meta_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mp3 import (  # noqa: E501
            mp3_meta_from_docs,
        )

        # r12: ISO 11172-3 frame walk + VBR headers + ID3 tags over
        # the fixture corpus (map-only; seed repartitioned like the
        # flac/ogg rows — the walk is Python-side byte work; bounded
        # at 1500 docs, 11x over the 132-shape corpus cycle)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 1500
        ).repartition(64)
        # r14: corpus + frame walk fused into one Python hop
        return mp3_meta_from_docs(docs)

    def tiff_decode_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (  # noqa: E501
            image_features_from_docs,
        )

        # doc_id % 8 == 5 → TIFF blobs only (LZW/PackBits, tiles,
        # planar, predictor cycling): times the native IFD walk +
        # decompression + EXIF-tag read through the Arrow kernel
        docs = catalog.table(spark, sf_dir, "documents").filter(
            (FF.col("doc_id") % 8 == 5) & (FF.col("doc_id") < 8000)
        )
        return image_features_from_docs(docs)

    def media_triage_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.triage import (  # noqa: E501
            synthetic_mixed_corpus,
            triage_media,
        )

        # r12: the one-pass classifier over the all-family mixed
        # corpus (1400 docs = 100 per residue class). The corpus is
        # persisted and FORCED during construction (untimed): its
        # generation runs 14 family ENCODERS whose costs other rows
        # already measure — timing it here would report encoder
        # wall as classifier wall (measured 9.9s of which <1s was
        # triage). The timed pass reads cached blobs → the number
        # is classifier throughput, the thing this row exists for.
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cache import (  # noqa: E501
            tracked_persist,
        )

        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 1400
        ).repartition(64)
        # the 14-leg union stacks each leg's partitioning (14×64 ≈
        # 900 near-empty tasks — measured 4.9s of scheduler overhead
        # for ~0.5s of classification); repartition the ~2 MB of
        # blobs down to 64 before caching
        corpus = tracked_persist(
            synthetic_mixed_corpus(docs)
            .select("doc_id", "blob").repartition(64)
        )

        # r14: with the timed window now covering frame construction
        # (see force()), this row's documented exclusion — corpus
        # GENERATION runs 14 family encoders whose costs other rows
        # already measure; timing it here would report encoder wall
        # as classifier wall — moves to an explicit untimed-setup
        # protocol: the setup above runs once (eager tracked_persist
        # materializes the blobs; released when the next row starts),
        # and each timed pass rebuilds only the classifier frame.
        def per_pass():
            return triage_media(corpus)

        return per_pass

    media_triage_kernel.untimed_setup = True

    def image_near_dup_pairs(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (  # noqa: E501
            image_near_dup_pairs as _pairs,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (  # noqa: E501
            synthetic_near_dup_image_corpus,
        )

        # r13: 100 duplicate groups × 6 cross-codec variants; timed
        # FULL-CALL (decode + hash + banded pair join — unlike the
        # triage row there is no separate encoder corpus to
        # exclude: generation is part of the measured kernel the
        # way the other decode rows measure it)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 600
        )
        return _pairs(synthetic_near_dup_image_corpus(docs))

    def video_near_dup_pairs(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.video_fp import (  # noqa: E501
            synthetic_near_dup_video_corpus,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.video_fp import (  # noqa: E501
            video_near_dup_pairs as _vpairs,
        )

        # r13: 60 duplicate groups × 4 variants (q85/q40/bright/
        # truncated MJPEG clips, ~5 frames each ≈ 1.2k JPEG decodes);
        # timed FULL-CALL like the image row — encode + walk +
        # decode + hash + posting pairs
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 240
        )
        return _vpairs(synthetic_near_dup_video_corpus(docs))

    def heif_meta_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.heif import (  # noqa: E501
            heif_meta_from_docs,
        )

        # r13: the ISO-BMFF item walk over the heic/avif fixture
        # corpus (dims/rotation/Exif/truncation cycle by doc_id) —
        # map-only; seed repartitioned like the other byte-walk rows
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        ).repartition(64)
        # r14: corpus + item walk fused into one Python hop
        return heif_meta_from_docs(docs)

    def transcript_align(spark, sf_dir):
        # r12: the exact composition examples/transcript_align.py
        # ships — two map-only extraction kernels + the partition-
        # local as-of merge (400 docs ≈ 60k keyframes × 1.4k cues)
        import importlib.util
        import os as _os

        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "examples", "transcript_align.py",
        )
        spec = importlib.util.spec_from_file_location(
            "_transcript_align_bench", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.align_transcripts(spark, sf_dir, n_docs=400)

    def mkv_keyframe_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.mkv import (  # noqa: E501
            mkv_keyframes_from_docs,
        )

        # r10: EBML walk + keyframe byte-range resolution + payload
        # CRC over fixture WebM/Matroska (SimpleBlock/BlockGroup,
        # unknown-size streaming clusters, doctype variants cycle by
        # doc_id) — the mkv twin of mp4_keyframe_kernel (map-only)
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + walk fused into one Python hop
        return mkv_keyframes_from_docs(docs, every=3)

    def archive_extract_kernel(spark, sf_dir):
        from pyspark.sql import functions as FF

        from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.archives import (  # noqa: E501
            archive_extract_from_docs,
        )

        # r10: zip central-directory walk + tar header walk +
        # member extraction (CRC-validated deflate) with the .txt
        # suffix filter — the landing-zone unpack step (map-only);
        # corpus is stdlib-authored, so the bench doubles as a
        # differential
        docs = catalog.table(spark, sf_dir, "documents").filter(
            FF.col("doc_id") < 8000
        )
        # r14: corpus + extraction fused into one Python hop
        return archive_extract_from_docs(docs, suffix=".txt")

    def cdc_blob_chunking(spark, sf_dir):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (
            chunk_documents,
        )

        # r10: blob-scale chunking at PRODUCTION params (8 KiB avg)
        # — 16 × ~2 MB synthetic texts, the shape that exercises the
        # numpy prefix-doubling cut scan (sf documents are all <4 KiB
        # and take the scalar path; a vector-path regression would be
        # invisible to cdc_chunk_stats). Content is deterministic and
        # varies per doc so chunk hashes don't collapse. Much of the
        # measured wall is the Arrow hop of the ~32 MB text to the
        # kernel — the honest cost of any Python-side blob kernel.
        blobs = spark.range(16).select(
            F.col("id").alias("doc_id"),
            F.repeat(
                F.concat(
                    F.lit("synthetic corpus blob "),
                    F.col("id").cast("string"),
                    F.lit(" with content-defined boundaries "),
                    F.sha2(F.col("id").cast("string"), 256),
                ),
                16384,
            ).alias("text"),
        )
        return chunk_documents(
            blobs, min_size=2048, avg_size=8192, max_size=65536
        )

    return {
        "crawl_front_half": front_half_pages,
        "mp4_keyframe_kernel": mp4_keyframe_kernel,
        "cdc_chunk_stats": cdc_chunk_stats,
        "cdc_blob_chunking": cdc_blob_chunking,
        "audio_fp_kernel": audio_fp_kernel,
        "pdf_text_kernel": pdf_text_kernel,
        "archive_extract_kernel": archive_extract_kernel,
        "mkv_keyframe_kernel": mkv_keyframe_kernel,
        "office_text_kernel": office_text_kernel,
        "subtitle_cue_kernel": subtitle_cue_kernel,
        "email_text_kernel": email_text_kernel,
        "flac_decode_kernel": flac_decode_kernel,
        "ogg_meta_kernel": ogg_meta_kernel,
        "mp3_meta_kernel": mp3_meta_kernel,
        "tiff_decode_kernel": tiff_decode_kernel,
        "media_triage_kernel": media_triage_kernel,
        "transcript_align": transcript_align,
        "image_near_dup_pairs": image_near_dup_pairs,
        "heif_meta_kernel": heif_meta_kernel,
        "video_near_dup_pairs": video_near_dup_pairs,
        "bm25_docs_topk": bm25_docs_topk,
        "jpeg_decode_kernel": jpeg_decode_kernel,
        "gif_decode_kernel": gif_decode_kernel,
        "topk_parts_per_type": dashboard.topk_parts_per_type,
        "dedup_exact_survivors": dedup_queries.dedup_exact_survivors,
        "dedup_jaccard_pairs": dedup_queries.dedup_jaccard_pairs,
        "knn_bruteforce_cosine": similarity_queries.knn_bruteforce_cosine,
        "knn_lsh_bucketed": similarity_queries.knn_lsh_bucketed,
        "funnel_user_depths": funnel_user_depths,
        "sketch_cube_daily_users": sketch_cube_daily_users,
        "grouped_topk_orders": grouped_topk_orders,
    }


def pagerank_throughput(spark, sf_dir: str) -> tuple[float, float]:
    """(min_sec, spread_sec) over 3 timed passes of PageRank on a
    deterministic power-law graph sized by the sf's documents count
    (sf0.1 → 50k nodes / 500k edges, Zipf in-degree — the web's hub
    skew landing in the dst aggregation). Timed FULL-CALL: an
    iterative driver-loop algorithm does its work while the frame is
    BUILT (each iteration eagerly checkpoints), so the registry
    harness's noop-write timing would clock only the final vector
    scan. Fixed iteration count (tol=0) keeps every pass the same
    work — 4 iterations times the steady-state per-iteration cost
    the 1M-node stress leg (tools/crawl_stress.py) pins stays flat.
    VERDICT r8 #1: the one subsystem with zero wall-clock evidence."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pagerank import (
        pagerank,
        synthetic_link_graph,
    )

    n_nodes = catalog.table(spark, sf_dir, "documents").count() * 10
    edges = synthetic_link_graph(spark, n_nodes, n_nodes * 10)

    def one_pass() -> float:
        t0 = time.perf_counter()
        ranks = pagerank(edges, max_iters=4, tol=0.0)
        ranks.write.mode("overwrite").format("noop").save()
        elapsed = time.perf_counter() - t0
        # release the returned vector's checkpoint between passes
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pagerank import (
            _free_checkpoint,
        )

        _free_checkpoint(ranks)
        return elapsed

    one_pass()  # warm-up: Catalyst/codegen/JIT for the loop's plans
    times = [one_pass() for _ in range(3)]
    return min(times), max(times) - min(times)


def synthetic_pos_raw(spark, n_orders: int = 1_000_000):
    """The bench's synthetic n-order POS input, built by cycling the
    fixture's product grammar — ONE definition shared by the timed
    pass (:func:`pos_kernel_throughput`) and the plan dump
    (``tools/dump_plans.py``), so PLANS.md records exactly the frame
    the bench times."""
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark.plans import pos_fixture

    products = [r[2] for r in pos_fixture.POS_ROWS if r[2]]
    prod_arr = F.array(*[F.lit(p) for p in products])
    return spark.range(n_orders).select(
        F.concat(F.lit("ORD"), F.col("id")).alias("Order ID"),
        F.when(F.col("id") % 2 == 0, "Dine-in").otherwise("Takeaway").alias("Type/Channel"),
        F.element_at(prod_arr, (F.col("id") % len(products) + 1).cast("int")).alias("Products"),
        F.lit("1,234.00").alias("Product amount"),
        F.lit("1,234.00").alias("Received amount"),
        F.when(F.col("id") % 3 == 0, "-").otherwise("1234.00").alias("Cash"),
        F.lit("-").alias("Gcash"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400)
        .cast("string")
        .alias("Payment time"),
    )


def pos_kernel_throughput(spark, n_orders: int = 1_000_000) -> tuple[float, float]:
    """(min_sec, spread_sec) over 3 timed passes of the full POS
    transform kernel on a synthetic n-order input built by cycling the
    fixture's product grammar — the ETL flagship path at volume
    (explode + regex + dim joins)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.plans.pos_kernel import (
        transform_pos,
    )

    fact = transform_pos(synthetic_pos_raw(spark, n_orders), spark)
    # The kernel is one large WholeStageCodegen unit; C2 JIT keeps
    # compiling through the first post-warm-up pass (observed 11s on
    # pass 1 vs 1.7s on pass 3 in a fresh JVM). One warm-up pass, then
    # min of 3 timed passes = steady-state throughput.
    fact.write.mode("overwrite").format("noop").save()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fact.write.mode("overwrite").format("noop").save()
        times.append(time.perf_counter() - t0)
    return min(times), max(times) - min(times)


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("amante-bench")
    registry.load_all_queries()
    extra = _extra_queries()

    def query_fn(name: str):
        # _extra_queries takes precedence: where a registry row is a
        # consolidated/extended slot (labeled unions; crawl_front_half
        # carrying the centrality column since r9), the bench keeps
        # timing the NARROW per-operator shape under the same name so
        # cross-round numbers stay comparable
        inner = extra.get(name)
        if inner is None:
            fn = registry.QUERIES.get(name)
            if fn is not None:
                return fn
            raise KeyError(name)

        def wrapped(spark_, sf_dir_):
            # same cache lifecycle as the registry wrapper: release
            # the previous query's tracked persists before running
            from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cache import (
                release_tracked,
            )

            release_tracked()
            return inner(spark_, sf_dir_)

        return wrapped

    def force(name: str) -> tuple[float, float]:
        fn = query_fn(name)
        built = fn(spark, sf_dir)
        # an untimed-setup row (media_triage_kernel) returns a
        # per-pass frame BUILDER instead of a frame: fn itself ran
        # that row's documented untimed corpus setup (see the row's
        # comment) and each pass rebuilds only the measured frame
        mk = built if callable(built) else None
        # warm-up pass: pays one-off Catalyst/codegen/JIT compile
        (mk() if mk else built).write.mode("overwrite").format(
            "noop"
        ).save()
        # each timed pass is a FRESH invocation: the registry wrapper
        # releases any caches the prior pass persisted, so data is
        # fully recomputed — only the code is warm, never the data.
        # r14 (ADVICE r13 finding 1): the timer now starts BEFORE the
        # frame is built, not after — eager persist sites
        # (operators/cache.py tracked_persist) materialize expensive
        # upstreams during DataFrame construction, and timing only
        # the post-build action let that work escape the measured
        # window. The timed quantity is build + full noop execution;
        # cross-round deltas against r13-and-earlier numbers on
        # tracked_persist rows must account for the window change
        # (OPTIMIZATION_r14.md records both windows for those rows).
        # Min of 3 timed passes rides out background-JIT stragglers;
        # the (max - min) spread is reported so cross-round deltas are
        # falsifiable against measurement noise (VERDICT r3 asked for
        # a self-evidencing bench after two unexplained +50% outliers
        # turned out unverifiable).
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = mk() if mk else fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        return min(times), max(times) - min(times)

    def _quiesce():
        # r11: between rows, release the previous query's JVM garbage
        # (broadcast blocks, shuffle files, codegen transients). As
        # the headline set grew 13 → 34 rows, the LAST rows' timings
        # began absorbing the whole run's accumulated heap pressure:
        # pos_kernel_1m_orders measured 2.2-2.8 s at the tail of a
        # full run vs 1.28 s in a fresh JVM (r11 measurement). A GC
        # fence between rows makes each row's number depend on THAT
        # row, not on how many rows ran before it.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        _quiesce()
        best, spread = force(name)
        timings[name] = round(best, 4)
        spreads[name] = round(spread, 4)
    _quiesce()
    best, spread = pagerank_throughput(spark, sf_dir)
    timings["pagerank_crawl_graph"] = round(best, 4)
    spreads["pagerank_crawl_graph"] = round(spread, 4)
    best, spread = pos_kernel_throughput(spark)
    timings["pos_kernel_1m_orders"] = round(best, 4)
    spreads["pos_kernel_1m_orders"] = round(spread, 4)

    full_total = round(sum(timings.values()), 4)
    # gate-comparable headline: the 13-row subset matching the r1
    # basis (see BASELINE_SET docstring + BASELINE.md)
    total = round(sum(timings[n] for n in BASELINE_SET), 4)
    # the COMPLETE measurement (queries + spread) always lands on
    # disk next to the script, so bench_compare has a full-fidelity
    # input even when the driver's stdout tail clips the spread line
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_last.json"),
            "w",
        ) as f:
            json.dump(
                {
                    "metric": "headline_query_wall_total",
                    "value": total,
                    "basis": "baseline_set_13",
                    "full_total": full_total,
                    "baseline_set": list(BASELINE_SET),
                    "unit": "sec",
                    "queries": timings,
                    "spread": spreads,
                    "passes": 3,
                    "sf": sf_dir,
                },
                f,
            )
    except OSError:
        pass  # read-only checkout: stdout lines still carry it
    # TWO lines, diagnostics first, summary LAST and COMPACT: the
    # driver records a bounded tail of stdout, and r10's single
    # ~2.7 KB line (queries + spread together) overflowed it — the
    # artifact's "parsed" came back null and bench_compare lost its
    # input (VERDICT r10 "What's wrong" #1). The spread dict rides
    # on its own earlier line; the final line holds everything the
    # gate needs and stays ~1.1 KB at 31 rows.
    print(
        json.dumps(
            {"spread": spreads, "passes": 3},
            separators=(",", ":"),
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                # r12 advice: "value" switched basis (all-rows →
                # 13-row gate set) in r12; the explicit basis field
                # keeps cross-round tooling from misreading old files
                "basis": "baseline_set_13",
                "full_total": full_total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    run()
