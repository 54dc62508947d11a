"""Star-schema ELT: staging → dimension-resolved final fact (SURVEY.md
S7/J2/S8).

The reference delegates this to an opaque PostgreSQL stored procedure
(``update_final_fact_sales``, ref main.py:479; behavior per
README.md:91: "map the staging data against Dimension tables and
insert the final integers"). Here it is a native Spark plan:

1. Dimensions get stable integer surrogate keys derived from their
   natural key (hash-based — deterministic and parallel; a sequence
   would serialize on the driver).
2. The staging fact broadcast-joins each dimension to swap text
   attributes for surrogate keys.
3. Rows with unmatched dimension keys (README.md:119 "missing
   dimension data") route to quarantine — the ELT-stage half of the
   two-stage quarantine story (the kernel-stage half is
   operators.validate).

At 100 TB: dims stay broadcast-sized; the fact never shuffles for
key resolution. The final fact would be written partitioned by date
(payment_time) so dashboard slicers partition-prune.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surrogate_key(natural_key: Column) -> Column:
    """Deterministic 64-bit surrogate from a natural key.

    xxhash64 is stable across runs/executors — no driver-side
    sequence bottleneck and no shuffle; collision odds at dimension
    cardinalities (≤ millions) are negligible."""
    return F.xxhash64(natural_key)


def build_dim(df: DataFrame, natural_key: str, key_name: str) -> DataFrame:
    """Distinct natural keys + surrogate key column."""
    return (
        df.select(natural_key)
        .where(F.col(natural_key).isNotNull())
        .distinct()
        .withColumn(key_name, surrogate_key(F.col(natural_key)))
    )


def resolve_star(
    staging: DataFrame,
    dims: dict[str, DataFrame],
) -> tuple[DataFrame, DataFrame]:
    """J2: replace each text attribute with its dimension surrogate key.

    ``dims`` maps attribute column name → dim DataFrame with columns
    ``(attr, attr_key)``. Returns ``(resolved, quarantine)`` where
    quarantine rows failed at least one dimension lookup.
    """
    out = staging
    miss = F.lit(False)
    for attr, dim in dims.items():
        key_col = f"{attr}_key"
        out = out.join(F.broadcast(dim), attr, "left")
        miss = miss | (F.col(attr).isNotNull() & F.col(key_col).isNull())
    out = out.withColumn("_dim_miss", miss)
    resolved = out.filter(~F.col("_dim_miss")).drop("_dim_miss")
    quarantine = out.filter(F.col("_dim_miss")).drop("_dim_miss")
    # Final fact keeps surrogate keys + measures, drops resolved text.
    resolved = resolved.drop(*dims.keys())
    return resolved, quarantine


def pos_dims_from_fact(fact: DataFrame) -> dict[str, DataFrame]:
    """Build the POS star's dimensions from the cleaned fact columns
    (items / sub_category / category / payment_type / order_type) —
    the same five the reference's Supabase schema normalizes."""
    return {
        attr: build_dim(fact, attr, f"{attr}_key")
        for attr in ("items", "sub_category", "category", "payment_type", "order_type")
    }
