"""Per-file bloom-filter data skipping: no false negatives (reads
stay correct), real pruning on point lookups min/max bounds cannot
help with, bounded false-positive rate, persistence of the bloom
config across reopen, and graceful degradation for un-bloomed files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
    _build_bloom,
    _bloom_maybe_contains,
)


@pytest.fixture()
def table(spark, tmp_path):
    """Three appends; every file's o_orderkey range COVERS the probe
    keys (ids interleave mod 3), so min/max pruning alone can never
    drop a file — any skipping observed is the bloom's."""
    t = ParquetTable(spark, str(tmp_path / "t"), bloom_columns=["k", "s"])
    for r in range(3):
        df = spark.range(r, 3000, 3).select(
            F.col("id").alias("k"),
            F.concat(F.lit("key-"), F.col("id")).alias("s"),
            (F.col("id") * 2).alias("payload"),
        ).coalesce(1)
        t.append(df)
    return t


def test_bloom_prunes_point_lookups_without_false_negatives(spark, table):
    files_all = {e["path"] for e in table.files()}
    assert len(files_all) == 3
    for key in (0, 1, 2, 600, 601, 602):
        kept = table.scan_files(None, [("k", "=", key)])
        assert len(kept) <= 1  # bloom isolates the one residue class
        rows = table.read(filters=[("k", "=", key)]).collect()
        assert [r["k"] for r in rows] == [key]  # never a lost row
    # string column blooms prune the same way
    kept = table.scan_files(None, [("s", "=", "key-601")])
    assert len(kept) <= 1
    rows = table.read(filters=[("s", "=", "key-601")]).collect()
    assert [r["s"] for r in rows] == ["key-601"]


def test_bloom_prunes_absent_keys_and_in_lists(table):
    # absent keys: every file should go (false positives permitted but
    # at fpp=1% over 6 probes essentially never all three files)
    assert len(table.scan_files(None, [("k", "=", 999_999)])) == 0
    assert table.read(filters=[("k", "=", 999_999)]).count() == 0
    # IN with members of two residue classes keeps <= 2 files
    kept = table.scan_files(None, [("k", "in", [0, 1])])
    assert len(kept) <= 2
    # IN () stays empty-match
    assert len(table.scan_files(None, [("k", "in", [])])) == 0


def test_bloom_type_mismatch_never_prunes(table):
    # a string literal against the int column's bloom must be ignored
    # (no pruning), not treated as absent
    kept = table.scan_files(None, [("k", "=", "0")])
    assert len(kept) == 3


def test_bloom_config_persists_across_reopen(spark, table):
    reopened = ParquetTable(spark, table.path)
    assert reopened.bloom_columns == ["k", "s"]
    df = spark.range(3000, 3010).select(
        F.col("id").alias("k"),
        F.concat(F.lit("key-"), F.col("id")).alias("s"),
        (F.col("id") * 2).alias("payload"),
    ).coalesce(1)
    reopened.append(df)
    assert len(reopened.scan_files(None, [("k", "=", 3005)])) == 1


def test_unbloomed_files_degrade_gracefully(spark, tmp_path):
    # overlapping id ranges so min/max bounds alone can never prune;
    # probe k=3 sits inside BOTH files' bounds but exists in neither
    t = ParquetTable(spark, str(tmp_path / "u"))  # no bloom columns
    t.append(spark.range(0, 29, 4).select(F.col("id").alias("k")).coalesce(1))
    t2 = ParquetTable(spark, str(tmp_path / "u"), bloom_columns=["k"])
    t2.append(
        spark.range(2, 31, 4).select(F.col("id").alias("k")).coalesce(1)
    )
    # old file has no bloom -> always kept; new file bloom-prunes
    kept = t2.scan_files(None, [("k", "=", 3)])
    assert len(kept) == 1  # only the un-bloomed legacy file survives
    assert t2.read(filters=[("k", "=", 3)]).count() == 0
    assert t2.read(filters=[("k", "=", 4)]).count() == 1


def test_bloom_false_positive_rate_bounded():
    bloom = _build_bloom(list(range(1000)), fpp=0.01)
    fp = sum(
        _bloom_maybe_contains(bloom, v) for v in range(10_000, 12_000)
    )
    assert fp / 2000 < 0.05
    # exactness: every member reports maybe-present
    assert all(_bloom_maybe_contains(bloom, v) for v in range(0, 1000, 97))
