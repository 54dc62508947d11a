"""Fused one-hop corpus→kernel variants (operators/fuse.py, r14
optimization round, guide §4.1) must be bit-identical to their
two-stage compositions — the contract every bench row and declared
query leg that switched to a ``*_from_docs`` variant relies on."""

from __future__ import annotations

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.mark.usefixtures("spark")
class TestFusedVariants:
    @pytest.fixture(scope="class")
    def docs(self, spark, sf_dir):
        from pyspark.sql import functions as F

        return catalog.table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 60
        )

    def test_email(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            email_text as m,
        )

        assert _rows(m.email_text_from_docs(docs)) == _rows(
            m.email_text(
                m.synthetic_email_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_office(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            office as m,
        )

        assert _rows(m.office_text_from_docs(docs)) == _rows(
            m.office_text(
                m.synthetic_office_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_subtitles(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            subtitles as m,
        )

        assert _rows(m.subtitle_text_from_docs(docs)) == _rows(
            m.subtitle_text(
                m.synthetic_subtitle_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_ogg(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            ogg as m,
        )

        assert _rows(m.ogg_meta_from_docs(docs)) == _rows(
            m.ogg_meta(
                m.synthetic_ogg_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_mp3(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            mp3 as m,
        )

        assert _rows(m.mp3_meta_from_docs(docs)) == _rows(
            m.mp3_meta(
                m.synthetic_mp3_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_flac(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            flac as m,
        )

        assert _rows(m.flac_meta_from_docs(docs)) == _rows(
            m.flac_meta(
                m.synthetic_flac_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_heif(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            heif as m,
        )

        assert _rows(m.heif_meta_from_docs(docs)) == _rows(
            m.heif_meta(m.synthetic_heif_corpus(docs))
        )

    def test_pdf(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            pdf as m,
        )

        assert _rows(m.pdf_text_from_docs(docs)) == _rows(
            m.pdf_text(
                m.synthetic_pdf_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_mp4(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            mp4 as m,
        )

        assert _rows(m.mp4_keyframes_from_docs(docs, every=3)) == _rows(
            m.sample_mp4_keyframes(
                m.synthetic_mp4_corpus(docs).select("doc_id", "blob"),
                every=3,
            )
        )

    def test_mkv(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            mkv as m,
        )

        assert _rows(m.mkv_keyframes_from_docs(docs, every=3)) == _rows(
            m.sample_mkv_keyframes(
                m.synthetic_mkv_corpus(docs).select("doc_id", "blob"),
                every=3,
            )
        )

    def test_archives(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.sources import (
            archives as m,
        )

        assert _rows(
            m.archive_extract_from_docs(docs, suffix=".txt")
        ) == _rows(
            m.archive_extract(
                m.synthetic_archive_corpus(docs).select("doc_id", "blob"),
                suffix=".txt",
            )
        )

    def test_audio_probes(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            audio_fp as a,
        )
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            multimodal as mm,
        )

        assert _rows(a.audio_probes_from_docs(docs)) == _rows(
            a.audio_probes(
                mm.synthetic_audio_corpus(docs).select("doc_id", "blob")
            )
        )

    def test_image_features(self, docs):
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import (
            multimodal as mm,
        )

        assert _rows(mm.image_features_from_docs(docs)) == _rows(
            mm.decode_image_features(mm.synthetic_image_corpus(docs))
        )
