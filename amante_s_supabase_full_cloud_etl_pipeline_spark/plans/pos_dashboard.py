"""Dashboard KPIs computed directly on the POS kernel's fact output
(the reference's actual serving layer: Power BI over
``final_fact_sales``, ref README.md:93) — complementing
plans/dashboard.py's at-scale proxies. Oracles reuse the generated
kernel CTE, so these differential-test the kernel → analytics path
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from . import pos_fixture
from .pos_kernel import transform_pos
from .pos_kernel_query import _kernel_cte


@register(
    "pos_dashboard_kpis",
    oracle=_kernel_cte()
    + """
    SELECT 'category' AS kpi, category AS grp_key,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(total_order_amount AS DECIMAL(18,2))
                    * CAST(quantity AS DECIMAL(18,2))) AS DOUBLE) AS amount
    FROM fact GROUP BY category
    UNION ALL
    SELECT 'payment_mix' AS kpi, payment_type || '/' || order_type AS grp_key,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(total_order_amount AS DECIMAL(18,2))) AS DOUBLE) AS amount
    FROM fact GROUP BY payment_type, order_type
    UNION ALL
    SELECT 'hour' AS kpi, lpad(CAST(hour(payment_time) AS VARCHAR), 2, '0') AS grp_key,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(total_order_amount AS DECIMAL(18,2))) AS DOUBLE) AS amount
    FROM fact GROUP BY hour(payment_time)
    ORDER BY kpi, grp_key
    """,
)
def pos_dashboard_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's serving-layer KPIs on the real POS fact, in one
    long-format result: A4/A11 net sales by category (quantity-
    weighted), A8/A12 payment-method × channel mix, and A9 sales by
    hour of payment_time (F19 bucketing) — the SURVEY.md §7 'minimum
    end-to-end slice' (read → explode+extract → dim join → agg)
    checked through three different grains of the same fact."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    amount_dec = F.col("total_order_amount").cast("decimal(18,2)")
    by_category = (
        fact.groupBy(F.col("category").alias("grp_key"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(amount_dec * F.col("quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("amount"),
        )
        .select(F.lit("category").alias("kpi"), "grp_key", "n_items", "amount")
    )
    by_payment = (
        fact.groupBy(
            F.concat(F.col("payment_type"), F.lit("/"), F.col("order_type")).alias("grp_key")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(amount_dec).cast("double").alias("amount"),
        )
        .select(F.lit("payment_mix").alias("kpi"), "grp_key", "n_items", "amount")
    )
    by_hour = (
        fact.groupBy(
            F.lpad(F.hour("payment_time").cast("string"), 2, "0").alias("grp_key")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(amount_dec).cast("double").alias("amount"),
        )
        .select(F.lit("hour").alias("kpi"), "grp_key", "n_items", "amount")
    )
    return by_category.unionByName(by_payment).unionByName(by_hour).orderBy("kpi", "grp_key")


# S5's record-batch JSON load shape now rides on pos_kernel_fact as
# its record_json column (plans/pos_kernel_query.py) — one registry
# slot instead of two for the same kernel scan.
