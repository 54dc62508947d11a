"""Registry queries for the ELT layer: star resolution, keyed upsert,
canonical-row dedup (SURVEY.md S5-S8, J2/J3).

Surrogate key *values* (xxhash64) are engine-specific, so the
differential queries check the relational effect of the star merge —
row routing, counts, survivorship — while surrogate determinism and
join-back integrity are pinned by unit tests (tests/test_elt.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.star import build_dim, resolve_star
from ..operators.upsert import dedup_latest, merge_upsert
from ..registry import register
from . import pos_fixture
from ._common import dec
from .pos_kernel import transform_pos
from .pos_kernel_query import _kernel_cte


@register(
    "star_resolve_routing",
    oracle=_kernel_cte()
    + """
    , dim_known AS (
        SELECT DISTINCT sub_category FROM fact WHERE sub_category <> 'Uncategorized'
    )
    SELECT CASE WHEN d.sub_category IS NULL THEN 'quarantine' ELSE 'resolved' END AS route,
           COUNT(*) AS n_rows
    FROM fact f LEFT JOIN dim_known d ON f.sub_category = d.sub_category
    GROUP BY 1 ORDER BY route
    """,
)
def star_resolve_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 + ELT-stage quarantine (ref README.md:91,119): resolve the
    POS fact against a sub_category dimension that lacks
    'Uncategorized' → unmatched rows route to quarantine exactly like
    the reference's "missing dimension data" path."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    dim = build_dim(
        fact.filter(F.col("sub_category") != "Uncategorized"),
        "sub_category",
        "sub_category_key",
    )
    resolved, quarantine = resolve_star(fact, {"sub_category": dim})
    return (
        resolved.select(F.lit("resolved").alias("route"))
        .unionByName(quarantine.select(F.lit("quarantine").alias("route")))
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("route")
    )


@register(
    "upsert_merge_orders",
    oracle="""
    WITH source AS (
        SELECT o_orderkey, 'RESTATED' AS o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = o.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM source
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(o_totalprice) AS DOUBLE) AS total_amount
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def upsert_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/S5 MERGE semantics (ref main.py:50 upsert): a restatement
    batch wins on key conflict; untouched rows survive. Anti-join +
    union — the parquet-native MERGE plan."""
    o = catalog.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec(F.col("o_totalprice")).alias("o_totalprice")
    )
    source = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("RESTATED").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    merged = merge_upsert(o, source, ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("total_amount"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "dedup_latest_lineitem",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_orderkey
            ORDER BY l_shipdate DESC, l_linenumber DESC,
                     l_partkey DESC, l_suppkey DESC,
                     l_quantity DESC, l_extendedprice DESC
        ) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def dedup_latest_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-row-per-key dedup with deterministic tie-break (the
    engine's pre-upsert dedup, README.md:109 intent).

    The tie-break must be a TOTAL order: the test data has duplicate
    (orderkey, shipdate, linenumber) triples, and any residual tie
    lets each engine/run pick a different winner — so the ordering
    extends through the remaining identifying columns."""
    li = catalog.table(spark, sf_dir, "lineitem")
    latest = dedup_latest(
        li,
        ["l_orderkey"],
        ["l_shipdate", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )
    return (
        latest.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("total_price"),
        )
        .orderBy("l_returnflag")
    )
