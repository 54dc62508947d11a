"""amante_s_supabase_full_cloud_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline
(robimengote/Amante-s-Supabase-Full-Cloud-ETL-Pipeline, surveyed in
/root/repo/SURVEY.md), re-expressed as lazy DataFrame plans optimized
by Catalyst, plus the LLM-data-pipeline operator surface (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout
------
- ``session``    — SparkSession factory (AQE, shuffle sizing, UTC).
- ``catalog``    — table loading/registration for the test datasets.
- ``registry``   — query + DuckDB-oracle registry consumed by
                   ``__spark_entry__.py``.
- ``functions/`` — scalar column-expression libraries (cleaning,
                   regex extraction, date bucketing).
- ``operators/`` — relational + extension operators (explode,
                   validation split, upsert/dedup, star-schema joins,
                   near-dup detection, similarity search, text
                   analysis, multimodal plumbing).
- ``plans/``     — end-user query surfaces (POS transform kernel,
                   dashboard analytics).
- ``sources/``   — batch/streaming ingestion (landing dir, xlsx shim).
- ``streaming/`` — Structured Streaming pipelines (file-drop ETL,
                   event-time windows, sessionization).
"""

__version__ = "0.1.0"
