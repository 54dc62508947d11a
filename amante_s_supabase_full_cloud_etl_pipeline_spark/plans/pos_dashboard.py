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
    "pos_net_sales_by_category",
    oracle=_kernel_cte()
    + """
    SELECT category,
           CAST(SUM(CAST(total_order_amount AS DECIMAL(18,2))
                    * CAST(quantity AS DECIMAL(18,2))) AS DOUBLE) AS weighted_amount,
           CAST(SUM(CAST(quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity,
           COUNT(*) AS line_items
    FROM fact GROUP BY category ORDER BY category
    """,
)
def pos_net_sales_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A11 on the real POS fact: the SURVEY.md §7 'minimum
    end-to-end slice' (read → explode+extract → dim join → agg)."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    return (
        fact.groupBy("category")
        .agg(
            F.sum(
                F.col("total_order_amount").cast("decimal(18,2)")
                * F.col("quantity").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("weighted_amount"),
            F.sum(F.col("quantity").cast("decimal(18,2)")).cast("double").alias("total_quantity"),
            F.count(F.lit(1)).alias("line_items"),
        )
        .orderBy("category")
    )


@register(
    "pos_payment_mix",
    oracle=_kernel_cte()
    + """
    SELECT payment_type, order_type, COUNT(*) AS n_items
    FROM fact GROUP BY payment_type, order_type
    ORDER BY payment_type, order_type
    """,
)
def pos_payment_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A12 on the POS fact: payment-method × channel mix."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    return (
        fact.groupBy("payment_type", "order_type")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy("payment_type", "order_type")
    )


@register(
    "pos_json_records",
    oracle=_kernel_cte()
    + """
    SELECT order_id,
           '{"order_id":"' || order_id || '","items":"' || items
             || '","category":"' || category
             || '","quantity":' || CAST(CAST(quantity AS DECIMAL(18,1)) AS VARCHAR)
             || ',"payment_type":"' || payment_type || '"}' AS record_json
    FROM fact ORDER BY order_id, items
    """,
)
def pos_json_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5's record-batch JSON shape (ref main.py:33 to_dict(records)):
    built by explicit concatenation with a fixed key order so both
    engines emit byte-identical strings (F.to_json's float formatting
    is engine-specific). The POS vocabulary has no JSON-special chars;
    a production sink would use to_json."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    return fact.select(
        "order_id",
        F.concat(
            F.lit('{"order_id":"'), F.col("order_id"),
            F.lit('","items":"'), F.col("items"),
            F.lit('","category":"'), F.col("category"),
            F.lit('","quantity":'), F.col("quantity").cast("decimal(18,1)").cast("string"),
            F.lit(',"payment_type":"'), F.col("payment_type"), F.lit('"}'),
        ).alias("record_json"),
    ).orderBy("order_id", "items")


@register(
    "pos_sales_by_hour",
    oracle=_kernel_cte()
    + """
    SELECT CAST(hour(payment_time) AS INTEGER) AS hour_of_day, COUNT(*) AS n_items,
           CAST(SUM(CAST(total_order_amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM fact GROUP BY 1 ORDER BY hour_of_day
    """,
)
def pos_sales_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 ('Store Performance by Hour') on the POS fact's real
    payment_time column (F19 bucketing)."""
    fact = transform_pos(pos_fixture.raw_pos_df(spark), spark)
    return (
        fact.groupBy(F.hour("payment_time").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("total_order_amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .orderBy("hour_of_day")
    )
