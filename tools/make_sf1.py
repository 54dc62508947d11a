"""Synthesize a 10× scale factor (sf1) from the read-only sf0.1
testdata for the scale soak (VERDICT r3 "Next round" #6): every fact
table replicated 10 ways with copy-shifted keys, so joins fan out to
10× the rows against 10× the dimension keys — the partition/shuffle
behavior of a genuine scale-up, without touching /root/testdata.

    python tools/make_sf1.py [out_dir]     # default /tmp/sf1

Key shifting keeps referential integrity per copy (copy i's lineitem
joins copy i's orders/part/supplier; copy i's events share copy i's
users). Documents get a per-copy suffix token — each source doc
becomes a 10-way NEAR-dup group, deliberately the worst case for the
dedup/LSH family. Embeddings are perturbed per copy by a small
deterministic offset so ANN clusters keep their structure at 10×
density. region/nation are constant-size dims and copy through
unchanged (their scale never grows with data volume).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW c AS SELECT i AS cp FROM range({COPIES}) t(i)")

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    write("customer", f"""
        SELECT c_custkey + cp*15000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', c""")
    write("supplier", f"""
        SELECT s_suppkey + cp*1000 AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', c""")
    write("part", f"""
        SELECT p_partkey + cp*20000 AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet', c""")
    write("orders", f"""
        SELECT o_orderkey + cp*150000 AS o_orderkey,
               o_custkey + cp*15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', c""")
    write("lineitem", f"""
        SELECT l_orderkey + cp*150000 AS l_orderkey,
               l_partkey + cp*20000 AS l_partkey,
               l_suppkey + cp*1000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', c""")
    write("events", f"""
        SELECT event_id + cp*100000 AS event_id, ts,
               user_id + cp*1500 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', c""")
    write("documents", f"""
        SELECT doc_id + cp*5000 AS doc_id,
               CASE WHEN cp = 0 THEN text
                    ELSE text || ' c' || CAST(cp AS VARCHAR) END AS text,
               lang, source,
               CASE WHEN cp = 0 THEN n_chars
                    ELSE n_chars + 3 END AS n_chars
        FROM '{SRC}/documents.parquet', c""")
    write("embeddings", f"""
        SELECT vec_id + cp*2000 AS vec_id,
               list_transform(embedding,
                   x -> CAST(x + cp * 0.003 AS FLOAT)) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', c""")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
