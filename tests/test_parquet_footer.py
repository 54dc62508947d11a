"""Bounded parquet footer reader (sources/parquet_footer.py): parsed
against REAL pyarrow-written files (the independent writer — no shared
code), nested schemas, multi row-group layouts, the driver testdata
itself, and a hostile sweep (truncation, bit flips, absurd footer
lengths) that must yield None, never a raise or a spin."""

from __future__ import annotations

import io
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.parquet_footer import (
    parquet_meta,
)


def _blob(table, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def test_flat_schema_rows_cols_groups():
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [1.5, None, 3.5]})
    m = parquet_meta(_blob(t))
    assert m["num_rows"] == 3
    assert m["n_columns"] == 3
    assert m["n_row_groups"] == 1
    assert "arrow" in (m["created_by"] or "")


def test_nested_schema_counts_leaves():
    t = pa.table({
        "s": [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}],
        "lst": [[1, 2], [3]],
        "z": [10, 20],
    })
    m = parquet_meta(_blob(t))
    assert m["num_rows"] == 2
    # leaves: s.x, s.y, lst.element, z — group nodes excluded
    assert m["n_columns"] == 4


def test_multi_row_group():
    t = pa.table({"a": list(range(1000))})
    m = parquet_meta(_blob(t, row_group_size=100))
    assert m["num_rows"] == 1000 and m["n_row_groups"] == 10


def test_real_driver_testdata(sf_dir):
    import os

    for name in ("orders", "lineitem", "documents"):
        path = os.path.join(sf_dir, f"{name}.parquet")
        with open(path, "rb") as f:
            blob = f.read()
        m = parquet_meta(blob)
        assert m is not None and m["num_rows"] > 0, name
        assert m["n_columns"] > 1, name


@pytest.mark.parametrize("mode", ["truncate", "flip", "flen"])
def test_hostile_footers_yield_none_or_sane(mode):
    blob = _blob(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    if mode == "truncate":
        for cut in range(0, len(blob), 7):
            dam = blob[:cut] + b"PAR1"
            m = parquet_meta(dam)  # must not raise
            assert m is None or m["num_rows"] >= 0
    elif mode == "flip":
        for i in range(len(blob) - 12, len(blob) - 4):
            dam = bytearray(blob)
            dam[i] ^= 0x5A
            m = parquet_meta(bytes(dam))
            assert m is None or m["num_rows"] >= 0
    else:
        # absurd footer length fields
        for flen in (0, 1 << 30, len(blob), 0xFFFFFFFF):
            dam = bytearray(blob)
            struct.pack_into("<I", dam, len(dam) - 8, flen)
            m = parquet_meta(bytes(dam))
            assert m is None or m["num_rows"] >= 0


def test_non_parquet_is_none():
    assert parquet_meta(None) is None
    assert parquet_meta(b"") is None
    assert parquet_meta(b"PAR1") is None
    assert parquet_meta(b"PAR1" + b"\x00" * 32 + b"PAR1") is None
    assert parquet_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64) is None
