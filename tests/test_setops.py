"""Set-op extras: approx-distinct accuracy vs exact."""

from __future__ import annotations

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry

registry.load_all_queries()


def test_approx_distinct_close_to_exact(spark, sf_dir):
    rows = registry.QUERIES["distinct_counts"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["n_parts_approx"] - r["n_parts"]) <= max(3, 0.05 * r["n_parts"])
        assert abs(r["n_suppliers_approx"] - r["n_suppliers"]) <= max(
            3, 0.05 * r["n_suppliers"]
        )


def test_serving_views_surface(spark, sf_dir):
    """S10: every registry query is SQL-addressable as a view; a BI
    slicer predicate on a view composes with the underlying plan."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.serve import (
        create_serving_views,
    )

    views = create_serving_views(spark, sf_dir)
    assert len(views) == len(registry.QUERIES) and len(views) >= 50
    direct = spark.sql("SELECT * FROM serve_star_net_sales_by_region").collect()
    assert len(direct) == 5
    sliced = spark.sql(
        "SELECT region_name, net_sales FROM serve_star_net_sales_by_region "
        "WHERE region_name = 'ASIA'"
    ).collect()
    assert len(sliced) == 1 and sliced[0]["region_name"] == "ASIA"
