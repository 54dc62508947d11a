"""Streaming z-score == batch twin when events arrive in event-time
order, including across a restart (ring-buffer state restored from
the checkpoint mid-series)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.timeseries import (
    rolling_zscore,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.anomaly import (
    streaming_zscore,
)

WINDOW, THRESHOLD = 20, 1.5


def test_streaming_zscore_matches_batch_twin_across_restart(spark, sf_dir, tmp_path):
    events = (
        catalog.table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("error", "purchase"))
        .select("event_type", "ts", "event_id", "value")
    )
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) / 2
    # two ts-ordered file batches: the ring buffer must survive the
    # restart between them for the tail scores to be right
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        events.filter(F.col("ts") <= F.lit(cut))
        .orderBy("ts", "event_id").coalesce(1)
        .write.mode("append").parquet(src)
    )
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            streaming_zscore(
                spark.readStream.schema(schema).parquet(src),
                window=WINDOW,
                threshold=THRESHOLD,
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .foreachBatch(lambda bdf, bid: bdf.write.mode("append").parquet(out))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    (
        events.filter(F.col("ts") > F.lit(cut))
        .orderBy("ts", "event_id").coalesce(1)
        .write.mode("append").parquet(src)
    )
    run_once()

    got = sorted(
        (r["key"], r["ts"], r["value"], r["zscore"])
        for r in spark.read.parquet(out).collect()
    )
    expected = sorted(
        (r["event_type"], r["ts"], r["value"], r["zscore"])
        for r in rolling_zscore(
            events,
            key_cols=["event_type"],
            ts_col="ts",
            value_col="value",
            order_cols=["ts", "event_id"],
            window=WINDOW,
            threshold=THRESHOLD,
        ).collect()
    )
    assert len(expected) > 0
    assert got == expected
