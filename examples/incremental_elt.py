"""Incremental ELT finish — the reference's ``update_final_fact_sales``
stored procedure (ref main.py:479, README.md:91) recomputes its
aggregate fact from staging on every load; this demo maintains the
same aggregate *incrementally* from the fact table's change feed:

    python examples/incremental_elt.py [workdir]

1. Day-1 POS fact rows MERGE into a snapshot-isolated ParquetTable.
2. An IncrementalAggView (net sales by category) refreshes from the
   change feed — its first refresh consumes the initial commit.
3. Day-2 brings updates (price corrections), new orders, and a
   compaction pass; the refresh folds only the delta (the compaction
   contributes an empty feed) and lands exactly on a full recompute.

At 100 TB step 3 is the entire point: the day's refresh cost is the
day's commits, never the fact table.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.materialized import (
    IncrementalAggView,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)

KEYS, ORDER = ["order_line_id"], ["loaded_at"]


def _batch(spark, rows, loaded_at):
    return spark.createDataFrame(
        [(*r, loaded_at) for r in rows],
        "order_line_id int, category string, amount double, quantity int, loaded_at int",
    )


def _recompute(fact):
    return {
        (r["category"], round(r["sum_amount"], 2), r["sum_quantity"], r["n_rows"])
        for r in fact.read()
        .groupBy("category")
        .agg(
            F.sum("amount").alias("sum_amount"),
            F.sum("quantity").alias("sum_quantity"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }


def main(workdir: str) -> None:
    spark = get_spark("incremental-elt-demo")
    fact = ParquetTable(spark, os.path.join(workdir, "fact"))
    view = IncrementalAggView(
        spark,
        os.path.join(workdir, "net_sales_by_category"),
        fact,
        keys=KEYS,
        group_cols=["category"],
        sum_cols=["amount", "quantity"],
    )

    # day 1: initial load
    fact.merge(
        _batch(
            spark,
            [
                (1, "Coffee", 120.0, 2),
                (2, "Coffee", 95.5, 1),
                (3, "Pastry", 60.0, 3),
                (4, "Tea", 42.0, 1),
            ],
            loaded_at=1,
        ),
        KEYS,
        ORDER,
    )
    v = view.refresh()
    print(f"day 1: fact v{fact.current_version()}, view consumed v{v}")
    for r in sorted(view.read().collect(), key=lambda r: r["category"]):
        print(f"  {r['category']}: sum={r['sum_amount']} qty={r['sum_quantity']} rows={r['n_rows']}")

    # day 2: a price correction (line 2), a new order line, and
    # routine compaction — refresh folds only the delta
    fact.merge(
        _batch(spark, [(2, "Coffee", 99.0, 1), (5, "Pastry", 15.0, 1)], loaded_at=2),
        KEYS,
        ORDER,
    )
    fact.compact(sort_by=["order_line_id"])
    feed = fact.changes(v, keys=KEYS)
    print(f"day 2 change feed: {sorted((r['order_line_id'], r['_change_type']) for r in feed.collect())}")
    view.refresh()

    got = {
        (r["category"], round(r["sum_amount"], 2), r["sum_quantity"], r["n_rows"])
        for r in view.read().collect()
    }
    expected = _recompute(fact)
    assert got == expected, (got, expected)
    print("incremental view == full recompute:")
    for cat, amt, qty, n in sorted(got):
        print(f"  {cat}: sum={amt} qty={qty} rows={n}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="inc_elt_"))
