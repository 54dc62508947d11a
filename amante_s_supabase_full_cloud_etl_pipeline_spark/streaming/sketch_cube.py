"""Incrementally-maintained distinct-count sketch cube: a streaming
foreachBatch sink that folds each micro-batch's theta partials into
a persistent cube table (operators/sketches.py + the transactional
table format). This is the full at-scale story for distinct-count
dashboards: the stream maintains kilobyte partials per grain as
events arrive, and every query — any rollup, any segment overlap —
reads ONLY the partials table, never the raw events.

Correctness: theta sketches merge associatively and commutatively
(union keeps the k smallest hashes), so folding per-micro-batch
partials into the stored cube gives the SAME sketch as one pass over
all events — in exact mode (< 4096 distinct per grain) literally the
same hash set, so stored-cube estimates equal exact distinct counts
(pinned by test). The table format's idempotent ``merge(batch_id)``
makes the fold exactly-once under foreachBatch crash-replay.

Scale shape per micro-batch: one hash agg over the batch (partials),
one key-pruned read of the touched grains (IN-list file pruning +
blooms), one keyed merge — O(touched grains), independent of the
cube's total size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.table_format import ParquetTable


def fold_partials(
    table: ParquetTable,
    batch: DataFrame,
    keys: Sequence[str],
    value_col: str,
    batch_id: int | None = None,
) -> int:
    """Fold one batch's theta partials into the stored cube table
    (schema: keys + ``theta_sketch`` binary). Returns the committed
    version."""
    from ..operators.sketches import theta_partials

    keys = list(keys)
    # persist: the null-key guard, the touched-grain collect, and the
    # merge all consume the partials — without the persist each would
    # re-run the batch-wide theta aggregation (the scd2_apply pattern)
    parts = theta_partials(batch, keys, value_col).persist()
    try:
        # Precondition: no NULL grain keys. A NULL never equi-joins, so
        # a null-key grain would miss both the stored-row lookup and the
        # merge's keyed anti-join and re-insert a fresh row on EVERY
        # fold — rollups would then double-count that grain across
        # micro-batches. Fail loudly (the scd2_apply contract) rather
        # than coalescing to a sentinel: a null grain key in an event
        # stream is upstream data corruption the pipeline owner must
        # see. The probe reads the persisted per-batch partials
        # (|touched grains| rows).
        null_pred = F.lit(False)
        for k in keys:
            null_pred = null_pred | F.col(k).isNull()
        bad = parts.filter(null_pred).take(1)
        if bad:
            raise ValueError(
                f"fold_partials: NULL grain key in batch partials "
                f"({ {k: bad[0][k] for k in keys} }); null cube keys never "
                "equi-join and would double-count across folds — filter or "
                "coalesce keys upstream"
            )
        if table.current_version() == 0:
            return table.merge(parts, keys=keys, order_by=keys, batch_id=batch_id)
        touched = [r[keys[0]] for r in parts.select(keys[0]).distinct().collect()]
        if not touched:
            return table.current_version()
        stored = table.read(filters=[(keys[0], "in", touched)]).select(
            *keys, F.col("theta_sketch").alias("_old")
        )
        merged = (
            parts.join(stored, keys, "left")
            .select(
                *keys,
                F.when(
                    F.col("_old").isNull(), F.col("theta_sketch")
                )
                .otherwise(F.theta_union(F.col("_old"), F.col("theta_sketch")))
                .alias("theta_sketch"),
            )
        )
        return table.merge(merged, keys=keys, order_by=keys, batch_id=batch_id)
    finally:
        parts.unpersist()


def sketch_cube_writer(
    table: ParquetTable, keys: Sequence[str], value_col: str
):
    """foreachBatch handler maintaining the cube exactly-once:

        (stream.writeStream.foreachBatch(
            sketch_cube_writer(cube, ["day", "event_type"], "user_id"))
         .option("checkpointLocation", ...).start())
    """

    def handle(batch: DataFrame, batch_id: int) -> None:
        fold_partials(table, batch, keys, value_col, batch_id=batch_id)

    return handle


def cube_estimates(table: ParquetTable, keys: Sequence[str]) -> DataFrame:
    """Rollup the STORED cube to any grain (possibly coarser than the
    stored keys): merge partials, never touch raw events."""
    from ..operators.sketches import theta_rollup

    return theta_rollup(table.read(), list(keys))
