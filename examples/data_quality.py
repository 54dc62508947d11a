"""Data-quality run over a committed table — expectations, quarantine,
and in-place remediation with the table format's DML:

    python examples/data_quality.py [workdir]

1. Commit a deliberately-dirty orders table (nulls, out-of-range
   amounts, dangling FKs, duplicate keys).
2. Run the declarative expectation suite (one aggregation pass) and
   print the dbt-style summary.
3. Route the violating rows to a quarantine table (P7 generalized:
   every row labeled with the checks it broke).
4. Remediate in place: UPDATE WHERE fixes the fixable (negative
   amounts clamped), DELETE WHERE purges the unfixable (dangling
   FKs), each a snapshot-isolated commit; re-run the suite and show
   the before/after, plus the change feed of what remediation did.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.expectations import (
    accepted_values,
    in_range,
    not_null,
    references,
    run_suite,
    unique,
    violations,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)


def main(workdir: str) -> None:
    spark = get_spark("data-quality")
    rows = [
        (1, "A", 120.0, 10),
        (2, "B", -40.0, 11),   # fixable: negative amount
        (3, None, 75.0, 10),   # unfixable here: null status (left quarantined)
        (4, "A", 15.0, 99),    # unfixable: dangling customer FK
        (5, "C", 60.0, 12),
        (5, "A", 10.0, 12),    # duplicate key
    ]
    customers = spark.createDataFrame([(10,), (11,), (12,)], "cust_id long")
    table = ParquetTable(spark, os.path.join(workdir, "orders"))
    table.append(
        spark.createDataFrame(rows, "order_id long, status string, amount double, cust_id long")
    )

    suite = [
        not_null("status"),
        accepted_values("status", ["A", "B", "C"]),
        in_range("amount", lo=0.0),
        unique("order_id"),
        references("cust_id", customers, "cust_id"),
    ]

    def report(tag):
        print(f"== expectations: {tag} ==")
        for r in run_suite(table.read(), suite).collect():
            mark = "PASS" if r["passed"] else f"{r['n_violations']} violation(s)"
            print(f"  {r['expectation']:<28} {mark}")

    report("before")
    quarantine = ParquetTable(spark, os.path.join(workdir, "quarantine"))
    quarantine.append(violations(table.read(), suite))
    print(f"quarantined {quarantine.read().count()} rows with failure labels")

    v0 = table.current_version()
    table.update_where([("amount", "<", 0.0)], {"amount": 0.0})
    table.delete_where([("cust_id", "=", 99)])
    report("after remediation")

    print("== change feed of remediation (unkeyed: the table holds a ==")
    print("== duplicate key, so the keyed feed's precondition fails) ==")
    feed = table.changes(v0).orderBy("order_id", "_change_type").collect()
    for r in feed:
        print(f"  {r['_change_type']:<8} order {r['order_id']} amount={r['amount']}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="dq_"))
