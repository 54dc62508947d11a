"""BI serving surface (SURVEY.md §2.1 S10): the reference serves its
star schema to Power BI through PostgreSQL; this engine serves the
same query surface through Spark SQL views.

``create_serving_views`` registers every registry query as a named
temp view (plus the base tables), so any SQL client — a notebook,
``spark.sql``, or a Thrift/JDBC endpoint in a cluster deployment —
can ``SELECT * FROM serve_a4_a7_headline_kpis`` without touching the
Python API. Views are lazy logical plans: each SELECT re-optimizes
with the caller's predicates on top (Catalyst pushes them into the
underlying plan), which is exactly what a BI slicer needs. Running
the actual Thrift server is a deployment concern, not an engine one;
the serving *surface* lives here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import catalog, registry


def create_serving_views(
    spark: SparkSession, sf_dir: str, prefix: str = "serve_"
) -> list[str]:
    """Register base tables + every registry query as temp views.
    Returns the created view names."""
    registry.load_all_queries()
    catalog.register_views(spark, sf_dir)
    names = []
    for name, fn in registry.QUERIES.items():
        view = f"{prefix}{name}"
        fn(spark, sf_dir).createOrReplaceTempView(view)
        names.append(view)
    return names
