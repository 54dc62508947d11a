"""Differential test: every registered query with an oracle must match
it exactly (count + schema + values) — same gate the driver runs."""

from __future__ import annotations

import pytest

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry

from .oracle_harness import compare

registry.load_all_queries()

WITH_ORACLE = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    # golden-pinned queries are valid only at the SF their golden was
    # generated from (the driver's correctness SF) — compare there
    run_sf = registry.GOLDEN_SF.get(name, sf_dir)
    compare(spark, run_sf, registry.QUERIES[name], registry.ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"region_name", "net_sales", "line_items"} <= set(df.columns)
