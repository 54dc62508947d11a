"""As-of join unit semantics: no-prior-row nulls, exact-timestamp
matches, per-key isolation."""

from __future__ import annotations

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),
         (1, "2024-01-01 12:00:00", "b"),
         (2, "2024-01-01 09:00:00", "c")],
        "k int, ts string, name string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "name")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100.0),   # exact tie → matches (≤)
         (1, "2024-01-01 11:30:00", 200.0),
         (2, "2024-01-01 09:30:00", 300.0)],  # after left's only row
        "k int, ts string, px double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "px")

    out = {
        (r["k"], r["name"]): r["asof_px"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["px"]).collect()
    }
    assert out[(1, "a")] == 100.0   # equal timestamp matches
    assert out[(1, "b")] == 200.0   # latest prior
    assert out[(2, "c")] is None    # no right row at or before → null
