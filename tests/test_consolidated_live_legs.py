"""Any-SF live-leg differentials for the golden-pinned consolidated
rows (r10 self-review catch): ``golden_sf`` pins a row's registry
oracle check to the driver SF, which would silently DROP the any-SF
live-SQL coverage the pre-consolidation rows had — an sf-dependent
regression in the live legs (drop_exact_dups, attach_media_meta)
would then pass the oracle gate. These compares run the live legs
against their own SQL at the test SF, restoring that coverage."""

from __future__ import annotations

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup_queries import (
    PANEL_FP_CTE,
    PANEL_LIVE_ARMS,
    panel_live_legs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal_queries import (
    BLOB_META_SQL,
    blob_meta_leg,
)

from .oracle_harness import compare


def test_exact_dedup_panel_live_legs_any_sf(spark, sf_dir):
    compare(
        spark,
        sf_dir,
        lambda sp, sd: panel_live_legs(sp, sd).orderBy("leg", "key"),
        f"WITH {PANEL_FP_CTE} SELECT * FROM ({PANEL_LIVE_ARMS}) "
        "ORDER BY leg, key",
        name="exact_dedup_panel_live_legs",
    )


def test_multimodal_blob_meta_leg_any_sf(spark, sf_dir):
    compare(
        spark,
        sf_dir,
        lambda sp, sd: blob_meta_leg(sp, sd).orderBy("key"),
        f"SELECT * FROM ({BLOB_META_SQL}) ORDER BY key",
        name="multimodal_blob_meta_leg",
    )
