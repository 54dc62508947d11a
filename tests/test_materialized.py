"""Incremental materialized aggregate views: CDF-driven refresh must
land exactly on a full recompute under inserts, updates, group moves,
purges, compaction, and crash-replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.materialized import (
    IncrementalAggView,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)

KEYS, ORDER = ["k"], ["ts"]


def _fact(spark, rows):
    return spark.createDataFrame(rows, "k int, grp string, amt int, ts int")


@pytest.fixture()
def source(spark, tmp_path):
    return ParquetTable(spark, str(tmp_path / "fact"))


@pytest.fixture()
def view(spark, tmp_path, source):
    return IncrementalAggView(
        spark,
        str(tmp_path / "view"),
        source,
        keys=KEYS,
        group_cols=["grp"],
        sum_cols=["amt"],
    )


def _expected(source):
    return {
        (r["grp"], r["sum_amt"], r["n_rows"])
        for r in source.read()
        .groupBy("grp")
        .agg(F.sum("amt").alias("sum_amt"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }


def _got(view):
    return {
        (r["grp"], r["sum_amt"], r["n_rows"]) for r in view.read().collect()
    }


def test_refresh_tracks_full_recompute(spark, source, view):
    source.merge(
        _fact(spark, [(k, "a" if k % 2 else "b", k * 10, 1) for k in range(20)]),
        KEYS,
        ORDER,
    )
    view.refresh()
    assert _got(view) == _expected(source)

    # updates: amount change, group move, and a brand-new group
    source.merge(
        _fact(spark, [(1, "a", 999, 2), (2, "a", 5, 2), (21, "c", 7, 2)]),
        KEYS,
        ORDER,
    )
    view.refresh()
    assert _got(view) == _expected(source)
    assert view.last_consumed_version() == source.current_version()


def test_refresh_handles_group_disappearance(spark, source, view):
    source.merge(
        _fact(spark, [(1, "solo", 10, 1), (2, "rest", 20, 1)]), KEYS, ORDER
    )
    view.refresh()
    # purge the only 'solo' row via an overwrite commit
    source.overwrite(source.read().filter(F.col("grp") != "solo"))
    view.refresh()
    assert _got(view) == _expected(source)
    assert view.read().filter(F.col("grp") == "solo").count() == 0


def test_refresh_is_idempotent_and_skips_compaction(spark, source, view):
    for k in range(6):
        source.merge(_fact(spark, [(k, "g", k, 1)]), KEYS, ORDER)
    v = view.refresh()
    before = _got(view)
    assert view.refresh() == v, "unchanged source: no-op"
    assert _got(view) == before

    source.compact(target_file_bytes=1 << 30)
    view.refresh()  # compaction emits an empty feed
    assert _got(view) == before == _expected(source)
