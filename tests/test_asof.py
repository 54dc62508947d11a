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


def test_directions_and_tolerance_match_pandas_merge_asof(spark):
    """pandas merge_asof is the reference for forward/nearest/
    tolerance semantics — drive all three directions over a keyed
    random-ish fixture and compare row for row."""
    import pandas as pd

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.asof import (
        asof_join,
    )

    left_rows = [
        ("a", t) for t in (1, 5, 7, 10, 10, 23)
    ] + [("b", t) for t in (2, 4, 9)] + [("c", 3)]
    right_rows = [
        ("a", 0, 100.0), ("a", 5, 105.0), ("a", 8, 108.0), ("a", 20, 120.0),
        ("b", 6, 206.0),
    ]
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k string, ts long, lid long"
    )
    right = spark.createDataFrame(right_rows, "k string, ts long, px double")

    lpd = pd.DataFrame(left_rows, columns=["k", "ts"]).assign(
        lid=range(len(left_rows))
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "px"]).sort_values(
        "ts", kind="stable"
    )

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 3):
            got = {
                (r["k"], r["ts"], r["lid"]): r["asof_px"]
                for r in asof_join(
                    left, right, ["k"], "ts", "ts", ["px"],
                    direction=direction, tolerance=tol,
                ).collect()
            }
            kw = {"tolerance": tol} if tol is not None else {}
            expect_df = pd.merge_asof(
                lpd, rpd, on="ts", by="k", direction=direction, **kw
            )
            expect = {
                (r.k, r.ts, r.lid): (None if pd.isna(r.px) else r.px)
                for r in expect_df.itertuples()
            }
            assert got == expect, (direction, tol)


def test_nearest_tie_prefers_backward(spark):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame([("a", 10, 0)], "k string, ts long, lid long")
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 12, 2.0)], "k string, ts long, px double"
    )
    got = asof_join(
        left, right, ["k"], "ts", "ts", ["px"], direction="nearest"
    ).collect()[0]
    assert got["asof_px"] == 1.0  # equidistant -> backward
