"""POS fixture rows (FIXTURES.md §A1) covering every kernel branch.

One definition, two renderers: a Spark DataFrame and a SQL VALUES
clause — so the Spark kernel and the generated DuckDB oracle consume
byte-identical input.

Branch coverage map (FIXTURES.md A1 / SURVEY.md §2):
- O1: variation extract (F2), target 'Cookies - Chip and Chunk' with
  alternation-order sensitivity (F8), leading-space token.
- O2: size extract (F1), thousands-comma amounts (F15), Gcash (F14).
- O3: conditional fries-flavor extract (F3), qty x2 (F6).
- O4: sugar level (F4), corrections map (F12), Credit/Debit fallthrough.
- O5: spice level with escaped parens (F5), '0.00' → Free/Voucher.
- O6: target rewrites incl. 'Cookie'→'Cookies' singular fix (F9).
- O7: missing qty token → default 1 (F6).
- O8: unmapped item → Uncategorized (F17); target with unknown
  flavor → null-propagating concat (F10) drops the row (P4);
  trailing empty token (P3).
- O9: negative amounts → quarantine (P7).
- footer: null order id → predicate footer drop (P6).
- O10: longest-alternation-first flavor (F8) + 'Spam and Egg'.
- O11: flavor 'Smores Cookie' → trailing-'Cookie' strip (F8).
- O12: non-target cleanup without parenthetical (F11).
- O13: lowercase dim key matched pre-title-case (F13 ordering), '0'
  cash sentinel (F14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (order_id, order_type, products, product_amount, received_amount,
#  cash, gcash, payment_time)
POS_ROWS: tuple[tuple, ...] = (
    ("O1", "Dine-in", "Matcha Espresso(Hot) x 1, Cookies(Chip and Chunk) x 1",
     "275.00", "275.00", "275.00", "-", "2026-02-14 08:15:00"),
    ("O2", "Takeaway", "Signature Chocolate(Duo) x 1",
     "1,192.00", "1,192.00", "-", "1192.00", "2026-02-14 12:30:00"),
    ("O3", "Dine-in", "French Fries(Default/Cheese) x 2",
     "180.00", "200.00", "200.00", "-", "2026-02-14 18:05:00"),
    ("O4", "Takeaway", "Fruit Lemonade w/Popping Pearls(Sugar 50%) x 2",
     "190.00", "190.00", "-", "-", "2026-02-14 09:45:00"),
    ("O5", "Dine-in", "Pad Kra Pao(Mild (1/4)) x 1",
     "210.00", "210.00", "0.00", "-", "2026-02-14 11:20:00"),
    ("O6", "Dine-in", "Croffle(Almond Nutella) x 1,Dubai Cookie(Default) x 1",
     "350.00", "350.00", "350.00", "-", "2026-02-14 15:10:00"),
    ("O7", "Takeaway", "Cappuccino(Cold)",
     "140.00", "140.00", "140.00", "-", "2026-02-14 07:55:00"),
    ("O8", "Dine-in", "Mystery Item(Default) x 1,Croffle(Unicorn) x 1,",
     "95.00", "95.00", "95.00", "-", "2026-02-14 19:40:00"),
    ("O9", "Dine-in", "Nachos x 1",
     "-95.00", "-95.00", "95.00", "-", "2026-02-14 20:00:00"),
    (None, None, None, "12,345.00", None, None, None, None),  # totals footer
    ("O10", "Takeaway", "Cookies(Chip and Chunk Walnut) x 1,Croissant(Spam and Egg) x 1",
     "420.00", "420.00", "-", "420.00", "2026-02-15 10:05:00"),
    ("O11", "Dine-in", "Croffle(Smores Cookie) x 1",
     "145.00", "145.00", "145.00", "-", "2026-02-15 13:25:00"),
    ("O12", "Takeaway", "Chicken Salpicao x 1,Coke in Can x 2",
     "285.00", "300.00", "300.00", "-", "2026-02-15 12:00:00"),
    ("O13", "Dine-in", "Biscoff tiramisu x 1",
     "260.00", "260.00", "0", "-", "2026-02-15 16:45:00"),
)

RAW_SCHEMA = (
    "`Order ID` string, `Type/Channel` string, Products string, "
    "`Product amount` string, `Received amount` string, "
    "Cash string, Gcash string, `Payment time` string"
)


def raw_pos_df(spark: SparkSession) -> DataFrame:
    """Fixture as a raw-sheet-shaped DataFrame (Payment time cast)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(POS_ROWS), RAW_SCHEMA)
    return df.withColumn("Payment time", F.col("`Payment time`").cast("timestamp"))


def _lit(v) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def values_sql() -> str:
    """Fixture as a DuckDB VALUES subquery with the same column names
    the kernel sees after header-strip (P1)."""
    rows = ", ".join(
        "(" + ", ".join(_lit(v) for v in row[:7])
        + f", CAST({_lit(row[7])} AS TIMESTAMP))"
        for row in POS_ROWS
    )
    return (
        f"(VALUES {rows}) AS raw_pos(order_id, order_type, products, "
        "product_amount, received_amount, cash, gcash, payment_time)"
    )
