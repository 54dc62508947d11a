"""POS transform kernel — the reference's `raw_report_transform`
(ref main.py:95-407) re-expressed as ONE lazy Catalyst plan.

The reference materializes ~25 intermediate pandas frames per file;
here every step is a column expression on a single DataFrame, so
whole-stage codegen collapses the entire kernel into one generated
function over the scan — zero Python UDFs (SURVEY.md §2.9), zero
extra materializations, and the only exchanges in the plan are the
two broadcast dim joins (which ship KBs).

Operator map (SURVEY.md §2 ids → here):
- P1 strip headers, P6 footer drop (predicate form), E1/E2 explode,
  P3 empty-token filter
- F1-F6 attribute extracts, F7-F10 target-item rewrite, F11 cleanup,
  F12 corrections, F13 title, F14 payment CASE, F15 coercion,
  F17 fillna, F18/P2 renames
- M1/M2 dict-map lookups as broadcast joins against plans.dims

Documented deviations from the reference (SURVEY.md §7 risk
register):
- Footer drop is a *predicate* (null order id), not positional
  ``iloc[:-1]`` — positional row identity doesn't exist in a
  distributed table.
- Payment sentinels: a NULL ``Cash`` cell is treated as ``'-'``
  (not used). pandas stringifies NaN to ``'nan'`` which would fall
  into the ``Cash`` branch — a latent reference bug.
- ``str.title`` ≡ ``initcap`` (see functions.cleaning.title_case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    extract_or_null,
    sanitize_name,
    strip_columns,
    strip_thousands_and_coerce,
    title_case,
)
from . import dims

# Regex vocabulary (ref main.py:112-153). Alternation order is
# first-match in both engines — 'Chip and Chunk Walnut' must precede
# 'Chip and Chunk' (ref main.py:147-151).
SIZE_PATTERN = r"(?i)(Solo|Duo|Medio|Familia)"
VARIATION_PATTERN = r"(?i)(Hot|Cold)"
FF_TARGET_PATTERN = r"(?i)(Fries|Lemonade)"
FF_FLAVOR_PATTERN = r"(?i)(Cheese|BBQ|Sour Cream|Plain|Mango)"
SUGAR_PATTERN = r"(?i)(Sugar 20%|Sugar 50%|Sugar 75%|Sugar 100%)"
SPICE_PATTERN = r"(?i)(Mild \(1/4\)|Regular \(2/4\)|Spicy \(3/4\))"
QTY_PATTERN = r"x\s*(\d+)"
TARGET_CATEGORIES = ("Croissant", "Croffle", "Cookies", "Cookie")
TARGET_MASK_PATTERN = "(?i)(" + "|".join(TARGET_CATEGORIES) + ")"
TARGET_FLAVORS = (
    "Chip and Chunk Walnut",
    "Nutella Pecan Cookie",
    "Red Velvet Cookie",
    "Smores Cookie",
    "Almond Nutella",
    "Biscoff Cookie",
    "Strawberry Cream",
    "Spam and Egg",
    "Chip and Chunk",
    "Biscoff",
    "Caramel",
    "Chocolate",
    "Matcha",
    "Oreo",
    "Plain",
    "Smores",
    "Red Velvet",
    "Dubai",
)
TARGET_FLAVOR_PATTERN = "(?i)(" + "|".join(TARGET_FLAVORS) + ")"

#: raw sheet column names (ref assets/Raw POS Data.jpg, main.py:374-382)
RAW_COLUMNS = (
    "Order ID",
    "Type/Channel",
    "Products",
    "Product amount",
    "Received amount",
    "Cash",
    "Gcash",
    "Payment time",
)

#: final fact column names after rename+sanitize (ref main.py:30,395-399,
#: assets/Transformed and Loaded to Supabase.jpg)
FACT_COLUMNS = (
    "order_id",
    "items",
    "sub_category",
    "category",
    "flavor",
    "variation",
    "size",
    "quantity",
    "spice_level",
    "sugar_level",
    "total_order_amount",
    "received_amount",
    "payment_time",
    "payment_type",
    "order_type",
)


def clean_item_expr(tok: Column) -> Column:
    """F7-F12: canonical item name from one product token."""
    is_target = tok.rlike(TARGET_MASK_PATTERN)
    temp_flavor = F.trim(
        F.regexp_replace(extract_or_null(tok, TARGET_FLAVOR_PATTERN), r"(?i)\s*Cookie", "")
    )
    cat_name = title_case(extract_or_null(tok, TARGET_MASK_PATTERN))
    cat_name = F.when(cat_name == "Cookie", F.lit("Cookies")).otherwise(cat_name)
    # F10: pandas `+` null-propagates — F.concat does too (NOT concat_ws).
    target_item = F.concat(cat_name, F.lit(" - "), temp_flavor)
    # F11: strip qty token and trailing parenthetical.
    nontarget_item = F.trim(
        F.regexp_replace(F.regexp_replace(tok, QTY_PATTERN, ""), r"\s*\(.*\)", "")
    )
    item = F.when(is_target, target_item).otherwise(nontarget_item)
    # F12: corrections map (1 entry today; chain scales to dozens —
    # beyond that, make it a broadcast-joined dim).
    for wrong, right in dims.CORRECTIONS:
        item = F.when(item == wrong, F.lit(right)).otherwise(item)
    return item


def payment_type_expr(cash: Column, gcash: Column) -> Column:
    """F14 (ref main.py:358-371) as a pure CASE chain — the
    reference's only row-wise Python function, vectorized away."""
    cash_s = F.coalesce(cash.cast("string"), F.lit("-"))
    gcash_s = F.coalesce(gcash.cast("string"), F.lit("-"))
    return (
        F.when(cash_s.isin("0.00", "0"), F.lit("Free/Voucher/Discounted"))
        .when(cash_s != "-", F.lit("Cash"))
        .when(gcash_s != "-", F.lit("Gcash"))
        .otherwise(F.lit("Credit / Debit"))
    )


def explode_products(raw: DataFrame) -> DataFrame:
    """P1 + P6 + E1/E2 + P3: header strip, predicate footer drop,
    split the packed order string and explode to line items."""
    df = strip_columns(raw)
    df = df.filter(F.col("Order ID").isNotNull())  # P6 (predicate form)
    df = df.withColumn(
        "product_token", F.explode(F.split(F.col("Products").cast("string"), ","))
    )
    return df.filter(F.col("product_token") != "")


def transform_pos(raw: DataFrame, spark: SparkSession) -> DataFrame:
    """Full kernel: raw POS sheet → exploded, cleaned, dim-resolved
    fact rows (columns = :data:`FACT_COLUMNS`). Validation split is a
    separate operator (operators.validate) so fact/quarantine share
    one evaluation."""
    # r14 (optimization round; guide §8 "decide with small rows" /
    # §2.3): every F1-F12 extraction column AND the P4 keep-predicate
    # is a pure function of product_token, and POS tokens are MENU
    # items — cardinality is the menu (tens to thousands), not the
    # order count (millions to billions at 100 TB). The ~15-regex
    # chain therefore runs once per DISTINCT token (a map-side-
    # partial distinct that shuffles only the tiny token set) and
    # re-attaches by an equi-join that AQE broadcasts at any
    # realistic menu size — 15 M Java-regex executions at 1 M orders
    # collapse to one per distinct token. Values are bit-identical:
    # the expressions are unchanged, merely evaluated once per
    # distinct input (they are deterministic per token — pinned by
    # the pos_kernel_fact / validation_routing oracle rows).
    tok = F.col("product_token")
    exploded = explode_products(raw).withColumn(
        "payment_type",
        payment_type_expr(F.col("Cash"), F.col("Gcash")),  # F14
    )
    tok_dim = exploded.select("product_token").distinct().withColumns(
        {
            "size": title_case(extract_or_null(tok, SIZE_PATTERN)),  # F1
            "variation": title_case(extract_or_null(tok, VARIATION_PATTERN)),  # F2
            "flavor": F.when(  # F3 (conditional extract)
                tok.rlike(FF_TARGET_PATTERN),
                title_case(extract_or_null(tok, FF_FLAVOR_PATTERN)),
            ),
            "sugar_level": title_case(extract_or_null(tok, SUGAR_PATTERN)),  # F4
            "spice_level": title_case(extract_or_null(tok, SPICE_PATTERN)),  # F5
            "quantity": F.coalesce(  # F6 (default qty 1)
                extract_or_null(tok, QTY_PATTERN).try_cast("double"), F.lit(1.0)
            ),
            "clean_item": clean_item_expr(tok),  # F7-F12
            # P4 null-item filter, as its cheap equivalent predicate:
            # clean_item is null ⇔ target item whose flavor
            # alternation missed (F10 null-propagating concat);
            # non-targets always yield a string. The flavor-miss test
            # is a pure rlike: extract_or_null(tok, P).isNull() ⇔
            # NOT tok.rlike(P) because every alternation branch
            # captures a non-empty string.
            "__tok_keep": ~(
                tok.rlike(TARGET_MASK_PATTERN)
                & ~tok.rlike(TARGET_FLAVOR_PATTERN)
            ),
        }
    )
    # the token dim is menu-sized by domain semantics (see above) —
    # hint it explicitly: its size ESTIMATE after a distinct over an
    # unknown-cardinality column is garbage, and a sort-merge join
    # here would shuffle the whole wide fact (measured 8x the kernel)
    df = (
        exploded.join(F.broadcast(tok_dim), "product_token", "left")
        .filter(F.col("__tok_keep"))
        .drop("__tok_keep")
    )

    # M1/M2: dict-map lookups as broadcast left joins (SURVEY.md §2.5).
    df = df.join(
        F.broadcast(dims.dim_product(spark).withColumnRenamed("item", "clean_item")),
        "clean_item",
        "left",
    )
    df = df.join(F.broadcast(dims.dim_subcategory(spark)), "sub_category", "left")

    # F13 title-case (post-join: dim keys matched on the raw item).
    df = df.withColumn("clean_item", title_case(F.col("clean_item")))

    # F15 numeric coercion, F18+P2 renames, F17 category fillna.
    return df.select(
        F.col("Order ID").alias("order_id"),
        F.col("clean_item").alias("items"),
        F.coalesce(F.col("sub_category"), F.lit("Uncategorized")).alias("sub_category"),
        F.coalesce(F.col("category"), F.lit("Uncategorized")).alias("category"),
        "flavor",
        "variation",
        "size",
        "quantity",
        "spice_level",
        "sugar_level",
        strip_thousands_and_coerce(F.col("Product amount")).alias("total_order_amount"),
        strip_thousands_and_coerce(F.col("Received amount")).alias("received_amount"),
        F.col("Payment time").alias("payment_time"),
        "payment_type",
        F.col("Type/Channel").alias("order_type"),
    )


def select_existing(df: DataFrame, wanted: tuple[str, ...]) -> DataFrame:
    """P5 helper (ref main.py:380-382): tolerate drifting export
    formats by projecting only the columns that exist."""
    have = set(df.columns)
    return df.select(*[c for c in wanted if c in have])
