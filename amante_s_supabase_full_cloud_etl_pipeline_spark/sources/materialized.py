"""Incrementally-maintained aggregate views over a ParquetTable.

The reference's ELT finish recomputes its aggregate fact from staging
on every load (``update_final_fact_sales`` RPC, ref main.py:479,
README.md:91). At 100 TB a per-load recompute of a corpus-wide
aggregate is the single most expensive recurring query in the
system; the scalable form is *incremental view maintenance*: consume
the fact table's change feed and fold the delta into the stored
aggregate.

``IncrementalAggView`` maintains ``SUM``s and a row ``COUNT`` per
group (the self-maintainable aggregate family — AVG derives as
sum/count downstream):

- the delta is computed ONLY from ``ParquetTable.changes`` between
  the last-consumed and current source versions — cost scales with
  what the commits touched, never with the fact table;
- insert/update_postimage rows add their contribution,
  delete/update_preimage rows subtract theirs;
- the view itself is a ParquetTable keyed by the group columns, so
  refreshes commit snapshot-isolated and the consumed source version
  rides the commit's ``batch_id`` — a crashed-and-replayed refresh
  of the same source version is a no-op (exactly-once maintenance on
  top of an at-least-once caller).

Preconditions and NULL convention:

- the source must be KEY-UNIQUE on ``keys`` (a merge-maintained
  table) — the keyed change feed's join semantics require it (see
  ``ParquetTable.changes``);
- NULL measure values contribute 0 to the stored sum (``coalesce``
  in the signed delta). A group whose measure rows are ALL NULL
  therefore stores sum 0 where a from-scratch ``F.sum`` (which
  ignores nulls) would yield NULL — the 0-for-NULL convention is
  deliberate: signed incremental folding needs every row to carry a
  subtractable value, and a NULL total and a 0 total are
  indistinguishable to every downstream consumer that treats the
  view as additive. Consumers needing to reconstruct SQL NULL sums
  should additionally track a per-column non-null count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table_format import ParquetTable

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


class IncrementalAggView:
    """A stored ``groupBy(group_cols).agg(sum(sum_cols), count(*))``
    over ``source``, refreshed from the change feed."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        source: ParquetTable,
        keys: Sequence[str],
        group_cols: Sequence[str],
        sum_cols: Sequence[str],
    ):
        self.spark = spark
        self.source = source
        self.keys = list(keys)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.table = ParquetTable(spark, path)

    def last_consumed_version(self) -> int:
        """Source version folded into the stored view (rides the view
        commit's batch_id). Walks past maintenance-marked commits
        (compaction) like the replay guard does — reading only the
        LATEST manifest would reset to 0 after a view compaction and
        the next refresh would re-fold the source's entire history
        into the already-populated view, double-counting every sum
        (self-review r5)."""
        v = self.table.current_version()
        while v > 0:
            m = self.table.manifest(v)
            if not m.get("maintenance"):
                return m.get("batch_id") or 0
            v -= 1
        return 0

    def read(self) -> DataFrame:
        return self.table.read()

    def _signed_delta(self, feed: DataFrame) -> DataFrame:
        sign = (
            F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
            .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
            .otherwise(F.lit(0))
        )
        return feed.groupBy(*self.group_cols).agg(
            *[
                F.sum(sign * F.coalesce(F.col(c), F.lit(0))).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
            F.sum(sign).alias("n_rows"),
        )

    def refresh(self) -> int:
        """Fold source changes since the last refresh into the view.
        Returns the source version now reflected. Idempotent: a replay
        against an unchanged source is a no-op commit."""
        v_from = self.last_consumed_version()
        v_to = self.source.current_version()
        if v_to == v_from:
            return v_from
        delta = self._signed_delta(
            self.source.changes(v_from, to_version=v_to, keys=self.keys)
        )
        if self.table.current_version() == 0:
            merged = delta
        else:
            cur = self.table.read()
            col_order = cur.columns
            merged = (
                cur.unionByName(delta.select(*col_order))
                .groupBy(*self.group_cols)
                .agg(
                    *[
                        F.sum(f"sum_{c}").alias(f"sum_{c}")
                        for c in self.sum_cols
                    ],
                    F.sum("n_rows").alias("n_rows"),
                )
            )
        merged = merged.filter(F.col("n_rows") > 0)
        # ``merged`` is the complete new view state (groups whose rows
        # all vanished have been filtered out), so this is a replace,
        # not an upsert. The rewrite is the GROUP cardinality, not the
        # fact row count. batch_id = source version makes the refresh
        # exactly-once under caller replay.
        self.table.overwrite(merged, batch_id=v_to)
        return v_to
