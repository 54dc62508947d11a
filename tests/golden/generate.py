"""Regenerate the committed golden tables (run from the repo root):

    python tests/golden/generate.py [query ...]

Each golden-pinned registry query (registry.GOLDEN_SF) is executed at
the driver's correctness scale factor and its result written as a
single parquet file the DuckDB oracle reads back (registry.golden_oracle).

Why goldens are sound here: every pinned kernel is deterministic and
partition-independent (seed-indexed xxhash64 signatures, HLL
register-max merges, single-partition-sorted k-means fit, pure-numpy
image decode), and each has an INDEPENDENT correctness anchor in
pytest (MinHash/SimHash estimates vs exact Jaccard, IVF recall vs
brute force, hand-computed BMP/PPM decode fixtures). The golden pins
the exact values so any regression — or any environment drift — shows
up as a driver-level hash mismatch instead of passing silently as
rows-only.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry, session  # noqa: E402
from amante_s_supabase_full_cloud_etl_pipeline_spark.registry import GOLDEN_DIR  # noqa: E402


def main(only: list[str]) -> None:
    spark = session.get_spark("golden-generate")
    registry.load_all_queries()
    # GOLDEN_TABLES maps golden FILE -> (sf, producing fn): it covers
    # both self-pinned queries and the LEG goldens of consolidated
    # rows (whose producers are no longer registry entries).
    names = only or sorted(registry.GOLDEN_TABLES)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        sf, fn = registry.GOLDEN_TABLES[name]
        df = fn(spark, sf)
        table = df.toArrow()  # preserves exact result types
        out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(table, out)
        print(f"wrote {out}: {table.num_rows} rows, schema {table.schema.names}")


if __name__ == "__main__":
    main(sys.argv[1:])
