"""Self-tests for the differential harness's hardening layers.

Round 3's only red driver row (`pack_sequence_chunks`) was invisible
to the local differential for two stacked reasons: DuckDB's
``SUM(...) OVER`` yields HUGEINT which ``fetchall()`` hands back as a
plain Python int (value-identical), and the old ``_norm`` mapped
Decimal→float so ``5.0 == 5`` hid any int-vs-float divergence. These
tests plant both hazards and assert the hardened harness now
catches them — the class of bug can't hide again.
"""

from __future__ import annotations

import pytest

from .oracle_harness import _canon, _norm, audit_oracle_types, duck_connection

SF_DIR = "/root/testdata/sf0.01"


def test_uncast_sum_over_oracle_is_caught():
    """An oracle using SUM(...) OVER on BIGINT without a CAST emits
    HUGEINT — the exact shape of the r02/r03 red row — and must fail
    the type audit."""
    con = duck_connection(SF_DIR)
    planted = """
        SELECT doc_id,
               SUM(doc_id) OVER (ORDER BY doc_id) AS running
        FROM documents LIMIT 5
    """
    with pytest.raises(AssertionError, match="HUGEINT"):
        audit_oracle_types(con, planted, "planted_sum_over")
    con.close()


def test_uncast_plain_sum_oracle_is_caught():
    con = duck_connection(SF_DIR)
    with pytest.raises(AssertionError, match="HUGEINT"):
        audit_oracle_types(con, "SELECT SUM(doc_id) AS s FROM documents", "planted_sum")
    con.close()


def test_decimal_oracle_is_caught():
    con = duck_connection(SF_DIR)
    with pytest.raises(AssertionError, match="DECIMAL"):
        audit_oracle_types(
            con, "SELECT 1.5::DECIMAL(10,2) AS d FROM documents LIMIT 1", "planted_dec"
        )
    con.close()


def test_cast_oracle_passes():
    con = duck_connection(SF_DIR)
    audit_oracle_types(
        con,
        """SELECT doc_id,
                  CAST(SUM(doc_id) OVER (ORDER BY doc_id) AS BIGINT) AS running
           FROM documents LIMIT 5""",
        "cast_ok",
    )
    con.close()


def test_canon_is_int_float_strict():
    """5.0 must NOT equal 5 in the differential — pandas materializes
    HUGEINT as float64 while Spark emits int64, and the driver hashes
    the typed values."""
    assert _norm(5) != _norm(5.0)
    assert _norm(5) == _norm(5)
    assert _norm(5.0) == _norm(5.0)
    # bool is a Python int subclass but a distinct driver type
    assert _norm(True) != _norm(1)
    # nested containers inherit strictness
    assert _norm([1, 2]) != _norm([1.0, 2.0])
    s = _canon([(5,)], ["x"])
    d = _canon([(5.0,)], ["x"])
    assert s != d


def test_canon_sort_is_stable_across_types():
    """Mixed-type columns (after tagging) still sort deterministically
    on both sides so row alignment in compare() is meaningful."""
    rows = [(3,), (1.5,), (None,), (2,)]
    a = _canon(rows, ["x"])
    b = _canon(list(reversed(rows)), ["x"])
    assert a == b
