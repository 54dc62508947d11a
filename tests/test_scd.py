"""SCD Type-2 dimension maintenance: version transitions, no-op
batches, point-in-time reconstruction, NULL attribute transitions,
and exactly-once replay via batch_id — all over the transactional
table format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.scd import (
    OPEN_END,
    scd2_apply,
    scd2_snapshot_at,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)

KEYS, TRACKED = ["item_id"], ["category", "price_band"]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "item_id long, category string, price_band string"
    )


@pytest.fixture()
def dim(spark, tmp_path):
    return ParquetTable(spark, str(tmp_path / "dim"))


def _apply(dim, spark, rows, ts, batch_id=None):
    return scd2_apply(
        dim, _batch(spark, rows), KEYS, TRACKED, ts, batch_id=batch_id
    )


def test_scd2_versions_and_current_flags(spark, dim):
    _apply(dim, spark, [(1, "drinks", "low"), (2, "mains", "mid")], "2024-01-01")
    _apply(dim, spark, [(1, "drinks", "high"), (3, "sides", "low")], "2024-02-01")
    rows = {
        (r["item_id"], str(r["valid_from"])): r
        for r in dim.read().collect()
    }
    assert len(rows) == 4  # item1 x2 versions, item2, item3
    old = rows[(1, "2024-01-01 00:00:00")]
    assert not old["is_current"] and str(old["valid_to"]) == "2024-02-01 00:00:00"
    new = rows[(1, "2024-02-01 00:00:00")]
    assert new["is_current"] and new["price_band"] == "high"
    assert str(new["valid_to"]) == OPEN_END
    assert rows[(2, "2024-01-01 00:00:00")]["is_current"]  # untouched key
    assert rows[(3, "2024-02-01 00:00:00")]["is_current"]  # new key


def test_scd2_unchanged_batch_is_a_no_op_commit(spark, dim):
    v1 = _apply(dim, spark, [(1, "drinks", "low")], "2024-01-01")
    v2 = _apply(dim, spark, [(1, "drinks", "low")], "2024-03-01")
    assert v2 == v1  # provable no-op: no version churn from replays
    assert dim.read().count() == 1


def test_scd2_point_in_time_snapshots(spark, dim):
    _apply(dim, spark, [(1, "drinks", "low")], "2024-01-01")
    _apply(dim, spark, [(1, "drinks", "mid")], "2024-02-01")
    _apply(dim, spark, [(1, "snacks", "mid")], "2024-03-01")
    full = dim.read()
    for ts, want in [
        ("2024-01-15", ("drinks", "low")),
        ("2024-02-01", ("drinks", "mid")),  # boundary: new version wins
        ("2024-02-15", ("drinks", "mid")),
        ("2024-05-01", ("snacks", "mid")),
    ]:
        got = scd2_snapshot_at(full, ts).collect()
        assert len(got) == 1
        assert (got[0]["category"], got[0]["price_band"]) == want
    # every key has exactly one current version and gapless intervals
    versions = sorted(
        (str(r["valid_from"]), str(r["valid_to"])) for r in full.collect()
    )
    assert [v[1] for v in versions[:-1]] == [v[0] for v in versions[1:]]
    assert versions[-1][1] == OPEN_END


def test_scd2_null_attribute_transitions(spark, dim):
    _apply(dim, spark, [(1, None, "low")], "2024-01-01")
    v1 = dim.current_version()
    # NULL -> NULL is unchanged (eqNullSafe), not a new version
    assert _apply(dim, spark, [(1, None, "low")], "2024-02-01") == v1
    # NULL -> value IS a change
    _apply(dim, spark, [(1, "drinks", "low")], "2024-03-01")
    cur = dim.read(filters=[("is_current", "=", True)]).collect()
    assert len(cur) == 1 and cur[0]["category"] == "drinks"
    assert dim.read().count() == 2


def test_scd2_replay_idempotent_via_batch_id(spark, dim):
    _apply(dim, spark, [(1, "drinks", "low")], "2024-01-01", batch_id=1)
    v = _apply(dim, spark, [(1, "drinks", "high")], "2024-02-01", batch_id=2)
    # foreachBatch crash-replay: same batch_id applies exactly once
    assert _apply(dim, spark, [(1, "drinks", "high")], "2024-02-01", batch_id=2) == v
    assert dim.read().count() == 2
    assert (
        dim.read().filter(F.col("is_current")).collect()[0]["price_band"] == "high"
    )


def test_scd2_rejects_duplicate_keys_in_one_batch(spark, dim):
    """Two rows for one key in a batch would create two versions with
    the same (key, valid_from) identity — fail loudly, never pick a
    nondeterministic survivor."""
    with pytest.raises(ValueError, match="multiple rows"):
        _apply(
            dim, spark,
            [(1, "drinks", "low"), (1, "snacks", "high")],
            "2024-01-01",
        )


def test_scd2_random_sequence_matches_sequential_model(spark, dim):
    """Model check: after a deterministic pseudo-random batch
    sequence, the current slice equals the last-written value per key
    and every historical snapshot matches the model's state then."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest(), 16)

    model: dict[int, tuple] = {}
    states = []
    for b in range(6):
        ts = f"2024-0{b + 1}-01"
        rows = []
        for k in range(5):
            if h(f"{b}:{k}") % 3 == 0:
                attrs = (f"cat{h(f'c{b}{k}') % 3}", f"band{h(f'p{b}{k}') % 2}")
                rows.append((k, *attrs))
                model[k] = attrs
        if rows:
            _apply(dim, spark, rows, ts)
        states.append((f"2024-0{b + 1}-15", dict(model)))
    full = dim.read()
    cur = {
        r["item_id"]: (r["category"], r["price_band"])
        for r in full.filter(F.col("is_current")).collect()
    }
    assert cur == model
    for ts, snap in states:
        got = {
            r["item_id"]: (r["category"], r["price_band"])
            for r in scd2_snapshot_at(full, ts).collect()
        }
        assert got == snap, ts


def test_scd2_rejects_non_increasing_effective(spark, dim):
    """ADVICE r3: a changed key whose current version has valid_from >=
    effective would make the closing row and the prior version share
    one (key, valid_from) merge identity — guard loudly at runtime."""
    _apply(dim, spark, [(1, "drinks", "low")], "2024-01-01")
    # same effective as the current version's valid_from → reject
    with pytest.raises(ValueError, match="strictly after"):
        _apply(dim, spark, [(1, "drinks", "high")], "2024-01-01")
    # earlier effective → reject
    with pytest.raises(ValueError, match="strictly after"):
        _apply(dim, spark, [(1, "drinks", "high")], "2023-12-01")
    # the failed batches must not have committed anything
    assert dim.read().count() == 1
    # an UNCHANGED batch at the same effective is a no-op, not an error
    v = _apply(dim, spark, [(1, "drinks", "low")], "2024-01-01")
    assert v == dim.current_version()
    # and a strictly later effective still applies cleanly
    _apply(dim, spark, [(1, "drinks", "high")], "2024-02-01")
    assert dim.read().count() == 2
