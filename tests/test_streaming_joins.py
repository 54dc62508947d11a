"""Stream-stream interval join + stream-static enrichment: the
streaming run over micro-batched files must equal the batch run of
the SAME transform (withWatermark is a batch no-op), outer-join
unmatched rows must flush once a sentinel advances the watermark,
and join state must stay bounded by construction (the interval
condition both sides are watermarked on)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.joins import (
    attribution_join,
    enrich_stream,
)


def _events(spark, sf_dir):
    return catalog.table(spark, sf_dir, "events")


def _split(ev):
    imp = ev.filter(F.col("event_type") == "click")
    conv = ev.filter(F.col("event_type") == "purchase")
    return imp, conv


def _stream_run(spark, tmp_path, ev, fn, name):
    """Write events as 3 TIME-ORDERED single-file parquet chunks and
    stream them with maxFilesPerTrigger=1 (one micro-batch per chunk,
    arrival order = event-time order, the shape a real feed has), run
    fn, drain with AvailableNow into a memory sink, return rows.
    Ordering matters: a chunk arriving behind the watermark would be
    (correctly) dropped as late — late-data semantics have their own
    test (events_late_data_filter); here the twins must agree."""
    src = str(tmp_path / f"{name}_src")
    n = ev.count()
    third = n // 3 + 1
    rows = ev.orderBy("ts", "event_id").collect()
    schema = ev.schema
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_stream_inner_join_equals_batch_twin(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    imp, conv = _split(ev)

    def run(source):
        i = source.filter(F.col("event_type") == "click")
        c = source.filter(F.col("event_type") == "purchase")
        return attribution_join(i, c, max_delay="30 minutes")

    batch = {tuple(r) for r in run(ev).collect()}
    assert batch, "fixture must produce at least one attribution pair"
    got = {tuple(r) for r in _stream_run(spark, tmp_path, ev, run, "ss_inner")}
    assert got == batch
    # sanity on the interval semantics
    for r in batch:
        assert 0 <= r[-1] <= 30 * 60


def test_stream_stream_left_outer_flushes_after_sentinel(spark, sf_dir, tmp_path):
    """Unmatched impressions emit null conversion columns only once
    the watermark passes them; a far-future sentinel click in the
    final micro-batch advances it past every real event."""
    ev = _events(spark, sf_dir)
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(10_000_000, max_ts, -1, "click", 0.0, "{}")], ev.schema
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    with_sentinel = ev.unionByName(sentinel)

    def run(source):
        i = source.filter(F.col("event_type") == "click")
        c = source.filter(F.col("event_type") == "purchase")
        return attribution_join(i, c, max_delay="30 minutes", how="left_outer")

    # the sentinel click itself can never flush (no watermark ever
    # passes IT) — compare everything else
    batch = {tuple(r) for r in run(with_sentinel).collect() if r[0] != -1}
    got = {
        tuple(r)
        for r in _stream_run(spark, tmp_path, with_sentinel, run, "ss_outer")
        if r[0] != -1
    }
    assert got == batch
    unmatched = [r for r in got if r[3] is None]
    matched = [r for r in got if r[3] is not None]
    assert unmatched and matched, "need both matched and unmatched impressions"


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    """Streaming events joined to a static dimension: results equal
    the batch join, and the dim side is broadcast."""
    ev = _events(spark, sf_dir)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("purchase", "revenue"), ("view", "engagement"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, family string",
    )

    def run(source):
        return enrich_stream(source, dim, "event_type").select(
            "event_id", "event_type", "family"
        )

    batch = {tuple(r) for r in run(ev).collect()}
    got = {tuple(r) for r in _stream_run(spark, tmp_path, ev, run, "ss_enrich")}
    assert got == batch
    plan = run(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
