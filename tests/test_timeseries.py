"""Time-series operators: hand-fixture semantics for the rolling
z-score frame (self-exclusion, completeness gate), OHLC tie rules,
and gap-fill interpolation/edge clamping. The full-table DuckDB
differential runs through the registry sweep (the consolidated
`timeseries_metrics_long` row in test_registry_oracle.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.timeseries import (
    gap_fill_interpolate,
    ohlc_buckets,
    rolling_zscore,
)


def _t(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")


def test_zscore_excludes_current_row_and_gates_on_full_window(spark):
    # 4 baseline values 10.0 then a spike; window=4 means only the
    # spike row has a complete PRECEDING frame.
    rows = [("a", _t(1, h), h, 10.0) for h in range(4)] + [("a", _t(1, 4), 4, 50.0)]
    out = rolling_zscore(
        _series(spark, rows), ["k"], "ts", "v", order_cols=["ts", "id"],
        window=4, threshold=2.0,
    ).collect()
    # baseline mean 10, var 0 -> z = inf? no: var 0 -> sqrt(0) division
    # yields +inf which fails round -> use a frame with real variance
    assert out == [] or all(r["v"] == 50.0 for r in out)

    rows = [("a", _t(1, h), h, float(v)) for h, v in enumerate((10, 12, 8, 10))]
    rows.append(("a", _t(1, 4), 4, 30.0))
    out = rolling_zscore(
        _series(spark, rows), ["k"], "ts", "v", order_cols=["ts", "id"],
        window=4, threshold=2.0,
    ).collect()
    assert len(out) == 1 and out[0]["v"] == 30.0
    # mean 10, sample var = (4+0+4+0)/3 = 8/3; z = 20/sqrt(8/3)
    assert abs(out[0]["zscore"] - 20.0 / (8.0 / 3.0) ** 0.5) < 1e-6


def test_zscore_spike_does_not_dilute_its_own_baseline(spark):
    # with the current row INSIDE the frame the spike would pull the
    # mean up and shrink its own z; the preceding-only frame keeps the
    # baseline clean — pin by asserting the exact preceding-only value
    rows = [("a", _t(1, h), h, float(v)) for h, v in enumerate((10, 12, 8, 10, 30))]
    out = rolling_zscore(
        _series(spark, rows), ["k"], "ts", "v", order_cols=["ts", "id"],
        window=4, threshold=2.0,
    ).collect()
    assert [r["v"] for r in out] == [30.0]


def test_ohlc_open_close_tie_rule_and_volume(spark):
    # two rows share the opening timestamp: the smaller id wins open;
    # two rows share the closing timestamp: the larger id wins close
    rows = [
        ("a", _t(1, 10, 0), 2, 5.0),
        ("a", _t(1, 10, 0), 1, 3.0),   # open (same ts, lower id)
        ("a", _t(1, 10, 30), 3, 9.0),  # high
        ("a", _t(1, 10, 59), 4, 1.0),  # low
        ("a", _t(1, 10, 59), 5, 7.0),  # close (same ts, higher id)
        ("b", _t(1, 10, 5), 6, 2.0),
    ]
    out = {
        r["k"]: r
        for r in ohlc_buckets(
            _series(spark, rows), ["k"], "ts", "v", tiebreak_col="id", bucket="hour"
        ).collect()
    }
    a = out["a"]
    assert (a["open"], a["high"], a["low"], a["close"]) == (3.0, 9.0, 1.0, 7.0)
    assert a["volume"] == 25.0 and a["n_rows"] == 5
    assert out["b"]["open"] == out["b"]["close"] == 2.0


def test_gap_fill_interpolates_and_clamps_edges(spark):
    # observed days 1 (=10) and 4 (=40): days 2,3 interpolate to 20,30
    rows = [("a", _t(1), 1, 10.0), ("a", _t(4), 2, 40.0)]
    out = gap_fill_interpolate(
        _series(spark, rows).select("k", "ts", F.col("v").alias("value")),
        ["k"], "ts", "value", step="1 day",
    ).collect()
    got = [(r["ts"].day, r["value"], r["filled"]) for r in out]
    assert got == [(1, 10.0, False), (2, 20.0, True), (3, 30.0, True), (4, 40.0, False)]


def test_gap_fill_single_point_key(spark):
    rows = [("solo", _t(7), 1, 5.0)]
    out = gap_fill_interpolate(
        _series(spark, rows).select("k", "ts", F.col("v").alias("value")),
        ["k"], "ts", "value", step="1 day",
    ).collect()
    assert len(out) == 1 and out[0]["value"] == 5.0 and not out[0]["filled"]
