"""Pure-stdlib xlsx reader tests (SURVEY.md S3): round-trip through a
real .xlsx zip, cell-type/gap handling, and the full end-to-end path
xlsx drop → landing CSV → POS kernel, which must produce byte-equal
fact rows to the DataFrame fixture path."""

from __future__ import annotations

from amante_s_supabase_full_cloud_etl_pipeline_spark.plans.pos_fixture import (
    POS_ROWS,
    RAW_SCHEMA,
    raw_pos_df,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.plans.pos_kernel import transform_pos
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.landing import (
    read_landing_csv,
    xlsx_to_landing_csv,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.xlsx import (
    read_xlsx_rows,
    write_minimal_xlsx,
)

import pytest
from pyspark.sql import functions as F

HEADER = [
    "Order ID", "Type/Channel", "Products", "Product amount",
    "Received amount", "Cash", "Gcash", "Payment time",
]


def test_xlsx_round_trip_types_and_gaps(tmp_path):
    rows = [
        ["name", "qty", "price", "ok", "note"],
        ["Chip & Chunk <Cookies>", 2, 19.5, True, None],  # escaping + gap
        [None, 1, 100, False, "a,b \"quoted\""],           # leading gap, csv-hostile
        ["tail-short", 3],                                  # ragged row
    ]
    p = str(tmp_path / "t.xlsx")
    write_minimal_xlsx(p, "Sheet A", rows)
    got = read_xlsx_rows(p, "Sheet A")
    assert got[0] == rows[0]
    assert got[1] == ["Chip & Chunk <Cookies>", 2, 19.5, True, None]
    assert got[2] == [None, 1, 100, False, 'a,b "quoted"']
    assert got[3] == ["tail-short", 3, None, None, None]  # padded to width
    # integers survive as ints (not 2.0) — the kernel's qty parse needs this
    assert isinstance(got[1][1], int) and isinstance(got[1][2], float)


def test_xlsx_sheet_selection(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_minimal_xlsx(p, "Paid order list", [["a"], ["1"]])
    assert read_xlsx_rows(p)[0] == ["a"]  # default: first sheet
    with pytest.raises(KeyError, match="Nope"):
        read_xlsx_rows(p, "Nope")


def test_xlsx_to_landing_csv_skips_unreadable(tmp_path):
    bad = tmp_path / "drop.xlsx"
    bad.write_bytes(b"not a real xlsx")
    assert xlsx_to_landing_csv(str(bad), str(tmp_path)) is None
    p = str(tmp_path / "wrong_sheet.xlsx")
    write_minimal_xlsx(p, "Other", [["a"]])
    assert xlsx_to_landing_csv(p, str(tmp_path)) is None  # S4 skip, batch lives


def test_xlsx_end_to_end_matches_dataframe_kernel_path(spark, tmp_path):
    """The reference's real input format: an .xlsx with sheet 'Paid
    order list' → landing CSV → permissive scan → kernel. Fact rows
    must equal the DataFrame fixture path exactly."""
    rows = [HEADER] + [list(r) for r in POS_ROWS]
    xlsx = str(tmp_path / "pos_export.xlsx")
    write_minimal_xlsx(xlsx, "Paid order list", rows)

    landing = tmp_path / "landing"
    landing.mkdir()
    out = xlsx_to_landing_csv(xlsx, str(landing))
    assert out and out.endswith("pos_export.csv")

    raw = read_landing_csv(spark, out, RAW_SCHEMA).drop("_corrupt_record")
    fact_xlsx = transform_pos(
        raw.withColumn("Payment time", F.col("`Payment time`").cast("timestamp")), spark
    )
    fact_df = transform_pos(raw_pos_df(spark), spark)

    cols = fact_df.columns
    got = sorted(tuple(r[c] for c in cols) for r in fact_xlsx.collect())
    want = sorted(tuple(r[c] for c in cols) for r in fact_df.collect())
    assert got == want and len(want) == 17
