"""Registry queries for the POS transform kernel + validation split.

The oracle SQL is *generated* from the same constants the Spark
kernel uses (fixture rows, regex vocabulary, dim data) — so the whole
reference-parity kernel (E1-E2, P1-P6, F1-F18, M1-M2, P7) is
differentially checked end-to-end by the driver's DuckDB harness,
not just unit-tested.

DuckDB-vs-Spark function mapping pinned here:
- ``initcap`` ≡ split-on-space + per-word upper(first)||rest (DuckDB
  1.0 has no initcap).
- ``regexp_replace`` needs the ``'g'`` flag in DuckDB (Spark/pandas
  replace all occurrences by default).
- ``try_cast`` ≡ ``TRY_CAST`` (pandas ``errors='coerce'``).
- pandas ``+`` string concat ≡ ``||`` (null-propagating); NOT the
  ``concat()`` function, which skips nulls in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.validate import validation_split
from ..registry import register
from . import dims, pos_fixture
from ._common import dec
from .pos_kernel import (
    FF_FLAVOR_PATTERN,
    FF_TARGET_PATTERN,
    QTY_PATTERN,
    SIZE_PATTERN,
    SPICE_PATTERN,
    SUGAR_PATTERN,
    TARGET_FLAVOR_PATTERN,
    TARGET_MASK_PATTERN,
    VARIATION_PATTERN,
    transform_pos,
)


def _title(expr: str) -> str:
    """DuckDB equivalent of Spark initcap."""
    return (
        f"array_to_string(list_transform(string_split(lower({expr}), ' '), "
        "w -> upper(w[1]) || w[2:]), ' ')"
    )


def _xn(expr: str, pattern: str) -> str:
    """regexp_extract with pandas null-on-miss semantics."""
    return f"NULLIF(regexp_extract({expr}, '{pattern}', 1), '')"


def _kernel_cte() -> str:
    """The full kernel as a DuckDB CTE chain ending in view ``fact``."""
    tok = "product_token"
    clean_target = (
        f"(CASE WHEN {_title(_xn(tok, TARGET_MASK_PATTERN))} = 'Cookie' THEN 'Cookies' "
        f"ELSE {_title(_xn(tok, TARGET_MASK_PATTERN))} END) || ' - ' || "
        f"trim(regexp_replace({_xn(tok, TARGET_FLAVOR_PATTERN)}, '(?i)\\s*Cookie', '', 'g'))"
    )
    clean_nontarget = (
        f"trim(regexp_replace(regexp_replace({tok}, '{QTY_PATTERN.replace('(', '').replace(')', '')}', '', 'g'),"
        " '\\s*\\(.*\\)', '', 'g'))"
    )
    clean_item = (
        f"CASE WHEN regexp_matches({tok}, '{TARGET_MASK_PATTERN}') "
        f"THEN {clean_target} ELSE {clean_nontarget} END"
    )
    corrections = clean_item
    for wrong, right in dims.CORRECTIONS:
        w = wrong.replace("'", "''")
        r = right.replace("'", "''")
        corrections = f"CASE WHEN ({corrections}) = '{w}' THEN '{r}' ELSE ({corrections}) END"

    return f"""
WITH raw_rows AS (SELECT * FROM {pos_fixture.values_sql()}),
tokens AS (
    SELECT *, unnest(string_split(products, ',')) AS product_token
    FROM raw_rows WHERE order_id IS NOT NULL
),
tokens_ne AS (SELECT * FROM tokens WHERE product_token <> ''),
extracted AS (
    SELECT *,
        {_title(_xn(tok, SIZE_PATTERN))} AS size,
        {_title(_xn(tok, VARIATION_PATTERN))} AS variation,
        CASE WHEN regexp_matches({tok}, '{FF_TARGET_PATTERN}')
             THEN {_title(_xn(tok, FF_FLAVOR_PATTERN))} END AS flavor,
        {_title(_xn(tok, SUGAR_PATTERN))} AS sugar_level,
        {_title(_xn(tok, SPICE_PATTERN))} AS spice_level,
        COALESCE(TRY_CAST({_xn(tok, QTY_PATTERN)} AS DOUBLE), 1.0) AS quantity,
        {corrections} AS clean_item,
        CASE WHEN COALESCE(cash, '-') IN ('0.00', '0') THEN 'Free/Voucher/Discounted'
             WHEN COALESCE(cash, '-') <> '-' THEN 'Cash'
             WHEN COALESCE(gcash, '-') <> '-' THEN 'Gcash'
             ELSE 'Credit / Debit' END AS payment_type
    FROM tokens_ne
),
dim_product AS (SELECT * FROM (VALUES {dims.values_clause(dims.PRODUCT_SUBCATEGORY)})
                AS d(item, dim_sub_category)),
dim_subcat AS (SELECT * FROM (VALUES {dims.values_clause(dims.SUBCATEGORY_CATEGORY)})
               AS d(sc, dim_category)),
fact AS (
    SELECT e.order_id,
           {_title("e.clean_item")} AS items,
           COALESCE(d1.dim_sub_category, 'Uncategorized') AS sub_category,
           COALESCE(d2.dim_category, 'Uncategorized') AS category,
           e.flavor, e.variation, e.size, e.quantity, e.spice_level, e.sugar_level,
           TRY_CAST(replace(e.product_amount, ',', '') AS DOUBLE) AS total_order_amount,
           TRY_CAST(replace(e.received_amount, ',', '') AS DOUBLE) AS received_amount,
           e.payment_time, e.payment_type,
           e.order_type
    FROM extracted e
    LEFT JOIN dim_product d1 ON e.clean_item = d1.item
    LEFT JOIN dim_subcat d2 ON d1.dim_sub_category = d2.sc
    WHERE e.clean_item IS NOT NULL
)
"""


VALID_SQL = (
    "items IS NOT NULL AND (quantity IS NULL OR quantity >= 0) "
    "AND (total_order_amount IS NULL OR total_order_amount >= 0) "
    "AND (received_amount IS NULL OR received_amount >= 0)"
)


@register(
    "pos_kernel_fact",
    oracle=_kernel_cte()
    + """
    SELECT *,
           '{"order_id":"' || order_id || '","items":"' || items
             || '","category":"' || category
             || '","quantity":' || CAST(CAST(quantity AS DECIMAL(18,1)) AS VARCHAR)
             || ',"payment_type":"' || payment_type || '"}' AS record_json
    FROM fact
    """,
)
def pos_kernel_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entire reference transform kernel on the branch-coverage
    fixture, plus S5's record-batch JSON load shape (ref main.py:33
    ``to_dict(records)``) as a ``record_json`` column: built by
    explicit concatenation with a fixed key order so both engines
    emit byte-identical strings (F.to_json's float formatting is
    engine-specific; the POS vocabulary has no JSON-special chars — a
    production sink would use to_json). sf_dir unused — the kernel's
    input is the POS sheet, not the TPC-H proxies."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    return fact.select(
        "*",
        F.concat(
            F.lit('{"order_id":"'), F.col("order_id"),
            F.lit('","items":"'), F.col("items"),
            F.lit('","category":"'), F.col("category"),
            F.lit('","quantity":'), F.col("quantity").cast("decimal(18,1)").cast("string"),
            F.lit(',"payment_type":"'), F.col("payment_type"), F.lit('"}'),
        ).alias("record_json"),
    )


_LINEITEM_VALID = "l_quantity <= 45 AND l_discount <= 0.08"


@register(
    "validation_routing",
    oracle=_kernel_cte()
    + f"""
    SELECT 'pos' AS dataset,
           CASE WHEN {VALID_SQL} THEN 'clean' ELSE 'quarantine' END AS route,
           category AS grp_key, COUNT(*) AS n_rows,
           CAST(SUM(CAST(quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM fact GROUP BY 2, 3
    UNION ALL
    SELECT 'lineitem' AS dataset,
           CASE WHEN {_LINEITEM_VALID} THEN 'clean' ELSE 'quarantine' END AS route,
           l_returnflag AS grp_key, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY 2, 3
    ORDER BY dataset, route, grp_key
    """,
)
def validation_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 validation split on BOTH surfaces in one labeled result
    (ref README.md:113-119):

    - ``pos`` leg: the actual ``validation_split`` operator on the
      kernel fixture — two frames from one null-safe predicate, each
      row landing on exactly one side (per-column values are already
      hash-checked by ``pos_kernel_fact``).
    - ``lineitem`` leg: the same split as a single-scan routed
      aggregation at fact scale — the predicate is evaluated ONCE and
      every row routed to clean or quarantine (two filtered scans
      would read a 100 TB fact twice). Null-safe: a null in a
      predicate column routes to quarantine, never silently drops.
    """
    clean, quarantine = validation_split(transform_pos(pos_fixture.raw_pos_df(spark), spark))
    pos = (
        clean.select(F.lit("clean").alias("route"), "category", "quantity")
        .unionByName(
            quarantine.select(F.lit("quarantine").alias("route"), "category", "quantity")
        )
        .groupBy("route", F.col("category").alias("grp_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec(F.col("quantity"))).cast("double").alias("total_qty"),
        )
        .select(F.lit("pos").alias("dataset"), "route", "grp_key", "n_rows", "total_qty")
    )
    li = catalog.table(spark, sf_dir, "lineitem")
    ok = (F.col("l_quantity") <= 45) & (F.col("l_discount") <= 0.08)
    route = F.when(ok, F.lit("clean")).otherwise(F.lit("quarantine"))
    fact_scale = (
        li.groupBy(route.alias("route"), F.col("l_returnflag").alias("grp_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # r13 (guide §2.3 narrower types): accumulate quantity as
            # cents-LONGS, not decimals — the fact-scale agg was the
            # row's dominant stage and decimal sums box per row. Exact
            # and overflow-safe at any scale for THIS measure:
            # l_quantity ≤ 50 → ≤ 5,000 cents/row → ~2e15 over a
            # 100 TB lineitem, 4,000x inside long range (money columns
            # do NOT get this treatment — their global cent-sums
            # approach long range). Reconstruction long/100 at the
            # tiny group level is exact; the driver hash is unchanged
            # (oracle-verified at sf0.01 + sf0.1).
            F.sum((dec(F.col("l_quantity")) * 100).cast("long")).alias("qty_c"),
        )
        .select(
            F.lit("lineitem").alias("dataset"),
            "route",
            "grp_key",
            "n_rows",
            (F.col("qty_c").cast("decimal(38,2)") / 100)
            .cast("double")
            .alias("total_qty"),
        )
    )
    return pos.unionByName(fact_scale).orderBy("dataset", "route", "grp_key")
