"""Data-quality expectations: planted violations of every check kind,
clean pass on real TPC-H integrity (lineitem→orders referential,
unique order keys), and the violations payload for quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.expectations import (
    accepted_values,
    in_range,
    matches,
    not_null,
    references,
    run_suite,
    unique,
    violations,
)


def _fixture(spark):
    rows = [
        (1, "A", 10.0, "a@x.io"),
        (2, "B", -5.0, "bad-email"),   # range + matches violations
        (3, None, 3.0, "c@y.io"),      # not_null violation
        (4, "Z", 7.0, None),           # accepted_values violation; null email OK
        (4, "A", 1.0, "d@z.io"),       # unique violation (id 4 twice)
    ]
    return spark.createDataFrame(rows, "id long, status string, amt double, email string")


def _suite(dim):
    return [
        not_null("status"),
        accepted_values("status", ["A", "B", "C"]),
        in_range("amt", lo=0.0),
        matches("email", r"^[^@]+@[^@]+\.[^@]+$"),
        unique("id"),
        references("id", dim, "ref_id"),
    ]


def test_planted_violations_all_kinds(spark):
    df = _fixture(spark)
    dim = spark.createDataFrame([(1,), (2,), (3,), (4,)], "ref_id long")
    summary = {r["expectation"]: r for r in run_suite(df, _suite(dim)).collect()}
    assert summary["not_null_status"]["n_violations"] == 1
    assert summary["accepted_values_status"]["n_violations"] == 1  # only 'Z'; null passes
    assert summary["in_range_amt"]["n_violations"] == 1
    assert summary["matches_email"]["n_violations"] == 1  # null email passes
    assert summary["unique_id"]["n_violations"] == 2  # both copies of id 4
    assert summary["references_id"]["n_violations"] == 0
    assert all(r["n_rows"] == 5 for r in summary.values())
    assert not summary["unique_id"]["passed"] and summary["references_id"]["passed"]

    bad = {
        (r["id"], tuple(sorted(r["failed_expectations"])))
        for r in violations(df, _suite(dim)).collect()
    }
    assert (3, ("not_null_status",)) in bad
    assert (2, ("in_range_amt", "matches_email")) in bad
    ids4 = [t for i, t in bad if i == 4]
    assert ("accepted_values_status", "unique_id") in ids4 and ("unique_id",) in ids4
    # row 1 is clean
    assert 1 not in {i for i, _ in bad}


def test_referential_violation_and_null_fk_pass(spark):
    df = spark.createDataFrame([(1,), (99,), (None,)], "id long")
    dim = spark.createDataFrame([(1,), (2,)], "ref_id long")
    s = [references("id", dim, "ref_id")]
    got = run_suite(df, s).collect()[0]
    assert got["n_violations"] == 1  # 99 dangles; NULL FK passes (SQL)
    assert {r["id"] for r in violations(df, s).collect()} == {99}


def test_real_tpch_integrity_passes(spark, sf_dir):
    li = catalog.table(spark, sf_dir, "lineitem")
    orders = catalog.table(spark, sf_dir, "orders")
    suite = [
        not_null("l_orderkey"),
        in_range("l_quantity", lo=0),
        references("l_orderkey", orders, "o_orderkey"),
    ]
    assert all(r["passed"] for r in run_suite(li, suite).collect())
    o_suite = [unique("o_orderkey"), accepted_values("o_orderstatus", ["O", "F", "P"])]
    assert all(r["passed"] for r in run_suite(orders, o_suite).collect())


def test_violations_compose_with_quarantine_shape(spark):
    """The violations frame is the quarantine payload: routing it and
    the clean remainder covers the whole input exactly once."""
    df = _fixture(spark)
    dim = spark.createDataFrame([(i,) for i in range(1, 5)], "ref_id long")
    bad_rows = [
        tuple(r)[:4] for r in violations(df, _suite(dim)).collect()
    ]
    all_rows = [tuple(r) for r in df.collect()]
    clean_rows = list(all_rows)
    for b in bad_rows:
        clean_rows.remove(b)  # exact multiset split (null-safe)
    assert len(bad_rows) + len(clean_rows) == len(all_rows)
    assert clean_rows == [(1, "A", 10.0, "a@x.io")]
