"""Landing-source tests: permissive CSV scan with corrupt-record
capture (S4), tolerant projection (P5), xlsx shim gating (S3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.landing import (
    read_landing_csv,
    tolerant_select,
    xlsx_to_landing_csv,
)


def test_permissive_csv_captures_corrupt_rows(spark, tmp_path):
    p = tmp_path / "landing.csv"
    p.write_text("a,b\n1,2\n3,4,EXTRA,JUNK\n5,6\n")
    df = read_landing_csv(spark, str(p), "a int, b int")
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "EXTRA" in bad[0]["_corrupt_record"]
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert {(r["a"], r["b"]) for r in good} == {(1, 2), (5, 6)}


def test_tolerant_select_handles_drifting_schema(spark):
    df = spark.createDataFrame(
        [("O1", "x", "extra")], "`Order ID` string, Products string, Unexpected string"
    )
    out = tolerant_select(df)
    assert out.columns == ["Order ID", "Products"]  # wanted ∩ present, in order


def test_xlsx_shim_skips_unreadable_file(tmp_path):
    # S4 per-file skip: an unreadable drop returns None, never raises
    # (full conversion coverage lives in tests/test_xlsx.py).
    fake = tmp_path / "drop.xlsx"
    fake.write_bytes(b"not a real xlsx")
    assert xlsx_to_landing_csv(str(fake), str(tmp_path)) is None


def test_object_sync_idempotent_and_atomic(tmp_path):
    """The Drive-poll shape (ref main.py:414-440) as an idempotent
    sync job: new files land once, re-runs are no-ops, crash replay
    cannot duplicate, and nothing half-written is ever visible."""
    import os

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.object_sync import (
        LocalDirFetcher,
        sync_to_landing,
        synced_names,
    )

    remote = tmp_path / "remote"
    landing = tmp_path / "landing"
    remote.mkdir()
    (remote / "a.csv").write_bytes(b"a-bytes")
    (remote / "b.csv").write_bytes(b"b-bytes")

    fetcher = LocalDirFetcher(str(remote))
    assert sync_to_landing(fetcher, str(landing)) == ["a.csv", "b.csv"]
    assert sync_to_landing(fetcher, str(landing)) == []  # idempotent
    assert (landing / "a.csv").read_bytes() == b"a-bytes"

    # new remote file: only it lands
    (remote / "c.csv").write_bytes(b"c-bytes")
    assert sync_to_landing(fetcher, str(landing)) == ["c.csv"]
    assert synced_names(str(landing)) == {"a.csv", "b.csv", "c.csv"}

    # crash simulation: manifest lost a line but the file landed →
    # re-sync overwrites in place (same name), never duplicates
    manifest = landing / "_synced.manifest"
    manifest.write_text("a.csv\nb.csv\n")
    assert sync_to_landing(fetcher, str(landing)) == ["c.csv"]
    assert sorted(f for f in os.listdir(landing) if not f.startswith("_")) == [
        "a.csv", "b.csv", "c.csv",
    ]
    # no temp droppings
    assert not [f for f in os.listdir(landing) if ".tmp-" in f]

    # temps are DOT-prefixed (hidden from Hadoop file sources); a
    # crash-orphaned OLD temp is swept by the next pass, while a YOUNG
    # temp (a concurrent pass's in-flight file) is left alone
    import time

    orphan = landing / ".tmp-deadbeef-x.csv"
    orphan.write_bytes(b"half-written")
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))  # 2h old
    young = landing / ".tmp-cafebabe-y.csv"
    young.write_bytes(b"in-flight")
    (remote / "d.csv").write_bytes(b"d-bytes")
    assert sync_to_landing(fetcher, str(landing)) == ["d.csv"]
    assert not orphan.exists()
    assert young.exists()  # overlap-safe: never sweep a live temp
    young.unlink()
    # nothing the streaming source would list is ever non-final:
    visible = [f for f in os.listdir(landing) if not f.startswith((".", "_"))]
    assert sorted(visible) == ["a.csv", "b.csv", "c.csv", "d.csv"]
