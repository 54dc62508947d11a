"""Sketch cubes: HLL rollup accuracy vs exact distincts, partition
independence (the golden-pin soundness argument), and theta
set-algebra accuracy vs exact pairwise overlaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sketches import (
    hll_partials,
    hll_rollup,
    theta_partials,
    theta_rollup,
    theta_segment_overlap,
)


@pytest.fixture(scope="module")
def ev(spark):
    # 3 segments over overlapping user ranges with known distincts
    rows = []
    for u in range(400):
        rows.append((u, "a"))
    for u in range(200, 500):
        rows.append((u, "b"))
    for u in range(0, 500, 2):
        rows.append((u, "c"))
    return spark.createDataFrame(rows, "user_id long, seg string")


def test_hll_rollup_close_to_exact(ev):
    parts = hll_partials(ev, ["seg"], "user_id", lgk=12)
    per_seg = {r["seg"]: r["estimate"] for r in parts.collect()}
    exact = {"a": 400, "b": 300, "c": 250}
    for seg, n in exact.items():
        assert abs(per_seg[seg] - n) <= max(3, 0.05 * n)
    total = hll_rollup(parts, []).collect()[0]["estimate"]
    assert abs(total - 500) <= 25  # union of partials vs exact 500


def test_theta_exact_mode_is_partition_independent_and_exact(ev, spark):
    """Below the sketch's nominal 4096 entries theta is in EXACT
    mode: estimates equal true distinct counts on ANY partition
    layout — the soundness argument for the COUNT(DISTINCT) oracles
    on the sketch registry rows. (HLL deliberately has no such test:
    DataSketches HLL estimates shift with the merge path, which is
    why HLL is tolerance-pinned only.)"""
    exact = {"a": 400, "b": 300, "c": 250}
    for n_parts in (1, 13):
        parts = theta_partials(ev.repartition(n_parts), ["seg"], "user_id")
        per_seg = {
            r["seg"]: r["estimate"] for r in theta_rollup(parts, ["seg"]).collect()
        }
        assert {k: round(v) for k, v in per_seg.items()} == exact
        total = theta_rollup(parts, []).collect()[0]["estimate"]
        assert round(total) == 500


def test_theta_estimation_regime_error_bound(spark):
    """Past 4096 entries theta samples; the rollup estimate stays
    within a few percent of truth (1/sqrt(k) scale)."""
    big = spark.range(0, 40_000).select(
        (F.col("id") % 2).cast("string").alias("seg"), F.col("id").alias("user_id")
    )
    parts = theta_partials(big, ["seg"], "user_id")
    total = theta_rollup(parts, []).collect()[0]["estimate"]
    assert abs(total - 40_000) <= 0.05 * 40_000


def test_theta_overlap_close_to_exact(ev):
    out = {
        (r["segment_a"], r["segment_b"]): r
    for r in theta_segment_overlap(ev, "seg", "user_id").collect()}
    exact_inter = {("a", "b"): 200, ("a", "c"): 200, ("b", "c"): 150}
    exact_union = {("a", "b"): 500, ("a", "c"): 450, ("b", "c"): 400}
    for pair, r in out.items():
        assert abs(r["est_intersection"] - exact_inter[pair]) <= max(
            5, 0.08 * exact_inter[pair]
        )
        assert abs(r["est_union"] - exact_union[pair]) <= max(
            5, 0.08 * exact_union[pair]
        )
        # set-algebra sanity on the estimates themselves
        assert r["est_intersection"] <= min(r["est_a"], r["est_b"]) + 5
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 5
