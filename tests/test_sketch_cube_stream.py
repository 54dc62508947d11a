"""Streaming sketch-cube maintenance: the stored cube folded across
micro-batches (and a restart) must answer every rollup with the same
estimates as one batch pass — in the exact-mode regime, equal to
true distinct counts; replays fold exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.sketch_cube import (
    cube_estimates,
    fold_partials,
    sketch_cube_writer,
)

KEYS = ["day", "event_type"]


def _with_day(ev):
    return ev.withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )


def test_streamed_cube_matches_exact_distincts(spark, sf_dir, tmp_path):
    ev = _with_day(catalog.table(spark, sf_dir, "events"))
    cube = ParquetTable(spark, str(tmp_path / "cube"))

    src = str(tmp_path / "src")
    out_ckpt = str(tmp_path / "ckpt")
    # three ts-ordered chunks; stream them one micro-batch each
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    cuts = [lo + span, lo + 2 * span]
    chunks = [
        ev.filter(F.col("ts") <= F.lit(cuts[0])),
        ev.filter((F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))),
        ev.filter(F.col("ts") > F.lit(cuts[1])),
    ]
    chunks[0].coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sketch_cube_writer(cube, KEYS, "user_id"))
            .option("checkpointLocation", out_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # restart mid-stream: remaining chunks arrive after the checkpoint
    chunks[1].coalesce(1).write.mode("append").parquet(src)
    chunks[2].coalesce(1).write.mode("append").parquet(src)
    run_once()

    exact_types = {
        (r["event_type"],): r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    got_types = {
        (r["event_type"],): round(r["estimate"])
        for r in cube_estimates(cube, ["event_type"]).collect()
    }
    assert got_types == exact_types  # exact-mode theta: no error at all
    total = cube_estimates(cube, []).collect()[0]["estimate"]
    exact_total = ev.agg(F.count_distinct("user_id")).collect()[0][0]
    assert round(total) == exact_total
    # stored grains are day x type sized, not event sized
    assert cube.read().count() == ev.select(*KEYS).distinct().count()


def test_fold_replay_is_exactly_once(spark, sf_dir, tmp_path):
    ev = _with_day(catalog.table(spark, sf_dir, "events")).limit(500)
    cube = ParquetTable(spark, str(tmp_path / "cube2"))
    v1 = fold_partials(cube, ev, KEYS, "user_id", batch_id=7)
    # crash-replay of the same micro-batch: same batch_id, no refold
    v2 = fold_partials(cube, ev, KEYS, "user_id", batch_id=7)
    assert v2 == v1
    # idempotent even semantically: theta union is idempotent on the
    # same hash set, so a DIFFERENT batch_id replay of identical data
    # still yields identical estimates (exact mode)
    before = sorted(
        (tuple(r[k] for k in KEYS), round(r["estimate"]))
        for r in cube_estimates(cube, KEYS).collect()
    )
    fold_partials(cube, ev, KEYS, "user_id", batch_id=8)
    after = sorted(
        (tuple(r[k] for k in KEYS), round(r["estimate"]))
        for r in cube_estimates(cube, KEYS).collect()
    )
    assert after == before


def test_fold_rejects_null_grain_keys(spark, tmp_path):
    """ADVICE r3: a NULL grain key never equi-joins, so it would
    re-insert a fresh row on every fold and double-count in rollups —
    fail loudly instead (scd2_apply's duplicate-guard contract)."""
    import pytest

    cube = ParquetTable(spark, str(tmp_path / "cube"))
    ok = spark.createDataFrame(
        [("2024-01-01", "view", 1)], "day string, event_type string, user_id long"
    )
    fold_partials(cube, ok, KEYS, "user_id")
    bad = spark.createDataFrame(
        [("2024-01-02", None, 2)], "day string, event_type string, user_id long"
    )
    with pytest.raises(ValueError, match="NULL grain key"):
        fold_partials(cube, bad, KEYS, "user_id")
    # nothing committed by the rejected fold; the stored cube still
    # answers rollups from the good batch only
    assert cube.read().count() == 1
