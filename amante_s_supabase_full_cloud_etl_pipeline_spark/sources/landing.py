"""Landing-directory ingestion (SURVEY.md S1-S4).

The reference pulls .xlsx files from a Google Drive folder
(ref main.py:419-440); the engine standardizes on a landing
directory of CSV/JSON/Parquet (object storage at scale) with:

- explicit schema + PERMISSIVE corrupt-record capture (S4's
  per-file try/except skip, done per-row instead — bad rows land in
  ``_corrupt_record`` rather than silently dropping whole files),
- existence-tolerant projection (P5, ref main.py:380-382) for
  drifting export formats,
- an xlsx→CSV shim for true Excel drops (import-gated: openpyxl is
  not in this container, so the shim raises a clear error unless the
  dependency is present — the conversion contract is tested with a
  CSV stand-in).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans.pos_kernel import RAW_COLUMNS


def read_landing_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-first CSV scan with permissive corrupt-record capture."""
    full_schema = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full_schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def read_landing_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_landing_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def tolerant_select(df: DataFrame, wanted: tuple[str, ...] = RAW_COLUMNS) -> DataFrame:
    """P5: project only the expected columns that actually exist."""
    have = set(df.columns)
    return df.select(*[c for c in wanted if c in have])


def xlsx_to_landing_csv(
    xlsx_path: str,
    landing_dir: str,
    sheet_name: str = "Paid order list",
) -> Optional[str]:
    """S3 shim: convert one Excel drop (sheet ``'Paid order list'``,
    ref main.py:98) to a landing CSV. Import-gated — raises with a
    clear message when openpyxl/pandas-excel support is absent."""
    try:
        import pandas as pd

        frame = pd.read_excel(xlsx_path, sheet_name=sheet_name)
    except ImportError as exc:  # openpyxl missing
        raise NotImplementedError(
            "xlsx ingestion needs openpyxl (not in this environment); "
            "drop CSV/parquet into the landing dir instead"
        ) from exc
    except Exception:
        # S4 semantics: unreadable file → skip (caller logs), don't
        # kill the batch.
        return None
    out = os.path.join(
        landing_dir, os.path.splitext(os.path.basename(xlsx_path))[0] + ".csv"
    )
    frame.to_csv(out, index=False)
    return out
