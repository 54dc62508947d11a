"""Star-schema dimension data for the POS domain.

The reference hard-codes its category hierarchy as Python dict
literals inside the transform (product→sub-category ~130 entries,
ref main.py:186-328; sub-category→category 17 entries, ref
main.py:333-351; corrections, ref main.py:178-182). In this engine
they are *data*: small dimension tables broadcast-joined against the
fact stream (SURVEY.md §2.5 M1/M2 — "joins in disguise"), which is
also what the reference's own ELT star schema does server-side
(ref README.md:91). At scale these stay KB-sized → always broadcast,
never shuffled, and editable without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: item → sub-category (dim_product). Source: ref main.py:186-328.
PRODUCT_SUBCATEGORY: tuple[tuple[str, str], ...] = (
    # Add-Ons
    ("Candle - Big", "Add-Ons (Cake)"),
    ("Candle", "Add-Ons (Cake)"),
    ("Candle - Small", "Add-Ons (Cake)"),
    ("Candle + Topper Set", "Add-Ons (Cake)"),
    ("Candle + Topper Set - Big Candle + Big Bday T.", "Add-Ons (Cake)"),
    ("Candle + Topper Set - Small Candle+ Small Bday T.", "Add-Ons (Cake)"),
    ("Extra Aioli Dip", "Food Add-Ons"),
    ("Extra Cheese Sauce", "Food Add-Ons"),
    ("Extra Egg", "Food Add-Ons"),
    ("Extra Rice", "Food Add-Ons"),
    # Food
    ("Bacon with Rice and Egg", "All Day Breakfast"),
    ("Corned Beef with Rice and Egg", "All Day Breakfast"),
    ("Spam with Rice and Egg", "All Day Breakfast"),
    ("Sunrise Breakfast Plate", "All Day Breakfast"),
    ("Cheese Sticks", "Appetizers"),
    ("Chicken Fingers", "Appetizers"),
    ("French Fries", "Appetizers"),
    ("French Fries Overload", "Appetizers"),
    ("French Fries Platter", "Appetizers"),
    ("Mojos", "Appetizers"),
    ("Nachos", "Appetizers"),
    ("Spring Rolls", "Appetizers"),
    ("Carbonara", "Pasta"),
    ("Chicken Aglio Olio", "Pasta"),
    ("Chicken Pesto", "Pasta"),
    ("Creamy Lasagna", "Pasta"),
    ("Shrimp Aglio Olio", "Pasta"),
    ("Spaghetti Meatballs", "Pasta"),
    ("Spicy Tuna Pasta", "Pasta"),
    ("Chicken Salpicao", "Rice Meals"),
    ("Pad Kra Pao", "Rice Meals"),
    ("Spicy Pork Stir Fry", "Rice Meals"),
    ("Bacon and Egg Sandwich", "Sandwiches"),
    ("Clubhouse", "Sandwiches"),
    ("Crispy Chicken Sandwich", "Sandwiches"),
    ("Spam and Egg Sandwich", "Sandwiches"),
    # Beverages
    ("Coffee Jelly Blended", "Blended Coffee"),
    ("Hazelnut Blended", "Blended Coffee"),
    ("Java Chip Blended", "Blended Coffee"),
    ("Mocha Blended", "Blended Coffee"),
    ("White Mocha Blended", "Blended Coffee"),
    ("Biscoff Blended", "Blended Cream"),
    ("Biscoff Cream", "Blended Cream"),
    ("Caramel Blended", "Blended Cream"),
    ("Caramel Cream", "Blended Cream"),
    ("Chocolate Chip Cream", "Blended Cream"),
    ("Chocolate Cream", "Blended Cream"),
    ("Matcha Cream", "Blended Cream"),
    ("Nutella Blended", "Blended Cream"),
    ("Nutella Cream", "Blended Cream"),
    ("Oreo Cream", "Blended Cream"),
    ("Strawberry Cream", "Blended Cream"),
    ("Vanilla Cream", "Blended Cream"),
    ("White Chocolate Cream", "Blended Cream"),
    ("Amantes", "Coffee Based"),
    ("Americano", "Coffee Based"),
    ("Biscoff Latte", "Coffee Based"),
    ("Cappuccino", "Coffee Based"),
    ("Caramel Macchiato", "Coffee Based"),
    ("Flavored Latte", "Coffee Based"),
    ("Latte", "Coffee Based"),
    ("Matcha Espresso", "Coffee Based"),
    ("Mocha", "Coffee Based"),
    ("Nutella Latte", "Coffee Based"),
    ("Salted Caramel Latte", "Coffee Based"),
    ("Spanish Latte", "Coffee Based"),
    ("Vietnamese", "Coffee Based"),
    ("White Mocha", "Coffee Based"),
    ("White Mocha Hazelnut", "Coffee Based"),
    ("Blueberry Yakult", "Fruit Based"),
    ("Fruit Lemonade w/ Popping Pearls", "Fruit Based"),
    ("Green Apple Fruit Tea", "Fruit Based"),
    ("Mango Yakult", "Fruit Based"),
    ("Passion Fruit", "Fruit Based"),
    ("Passion Fruit Cooler", "Fruit Based"),
    ("Strawberry Yakult", "Fruit Based"),
    ("Chamomile", "Hot Tea"),
    ("Peppermint", "Hot Tea"),
    ("Biscoff Milk", "Milk Based"),
    ("Blueberry Milk", "Milk Based"),
    ("Chocolate", "Milk Based"),
    ("Matcha", "Milk Based"),
    ("Nutella Milk", "Milk Based"),
    ("Oreo Matcha", "Milk Based"),
    ("Oreo Milk", "Milk Based"),
    ("Strawberry Matcha", "Milk Based"),
    ("Strawberry Milk", "Milk Based"),
    ("White Chocolate", "Milk Based"),
    ("White Chocolate Chip", "Pastries"),
    # Desserts
    ("Biscoff Cheesecake", "Cheesecakes"),
    ("Blueberry Cheesecake", "Cheesecakes"),
    ("Mango Cheesecake", "Cheesecakes"),
    ("New York Cheesecake", "Cheesecakes"),
    ("Nutella Cheesecake", "Cheesecakes"),
    ("Oreo Cheesecake", "Cheesecakes"),
    ("Strawberry Cheesecake", "Cheesecakes"),
    ("Ube Cheesecake", "Cheesecakes"),
    ("Biscoff tiramisu", "Cheesecakes"),
    ("Choco Almond", "Moist Cakes"),
    ("Choco Caramel", "Moist Cakes"),
    ("Garnet Velvet", "Moist Cakes"),
    ("Pecan Walnut Carrot", "Moist Cakes"),
    ("Signature Chocolate", "Moist Cakes"),
    ("Banana Bread", "Pastries"),
    ("Crookie", "Pastries"),
    ("Cookies - Biscoff", "Pastries"),
    ("Cookies - Chip and Chunk", "Pastries"),
    ("Cookies - Chip and Chunk Walnut", "Pastries"),
    ("Cookies - Nutella Pecan", "Pastries"),
    ("Cookies - Red Velvet", "Pastries"),
    ("Cookies - Smores", "Pastries"),
    ("Cookies - Dubai", "Pastries"),
    ("Crinkles", "Pastries"),
    ("Croffle - Almond Nutella", "Pastries"),
    ("Croffle - Biscoff", "Pastries"),
    ("Croffle - Caramel", "Pastries"),
    ("Croffle - Chocolate", "Pastries"),
    ("Croffle - Matcha", "Pastries"),
    ("Croffle - Oreo", "Pastries"),
    ("Croffle - Plain", "Pastries"),
    ("Croffle - Smores", "Pastries"),
    ("Croffle - Strawberry Cream", "Pastries"),
    ("Croissant - Almond Nutella", "Pastries"),
    ("Croissant - Biscoff", "Pastries"),
    ("Croissant - Caramel", "Pastries"),
    ("Croissant - Chocolate", "Pastries"),
    ("Croissant - Oreo", "Pastries"),
    ("Croissant - Plain", "Pastries"),
    ("Croissant - Spam and Egg", "Pastries"),
    # Others
    ("Bottled Water", "Others"),
    ("Coke in Can", "Others"),
)

#: sub-category → category (dim_subcategory). Source: ref main.py:333-351.
SUBCATEGORY_CATEGORY: tuple[tuple[str, str], ...] = (
    ("Add-Ons (Cake)", "Add-Ons"),
    ("Food Add-Ons", "Add-Ons"),
    ("All Day Breakfast", "Food"),
    ("Appetizers", "Food"),
    ("Pasta", "Food"),
    ("Rice Meals", "Food"),
    ("Sandwiches", "Food"),
    ("Blended Coffee", "Beverages"),
    ("Blended Cream", "Beverages"),
    ("Coffee Based", "Beverages"),
    ("Fruit Based", "Beverages"),
    ("Hot Tea", "Beverages"),
    ("Milk Based", "Beverages"),
    ("Pastries", "Desserts"),
    ("Cheesecakes", "Desserts"),
    ("Moist Cakes", "Desserts"),
    ("Others", "Others"),
)

#: item-name corrections (ref main.py:178-182).
CORRECTIONS: tuple[tuple[str, str], ...] = (
    ("Fruit Lemonade w/Popping Pearls", "Fruit Lemonade w/ Popping Pearls"),
)


def dim_product(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(PRODUCT_SUBCATEGORY), "item string, sub_category string")


def dim_subcategory(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(SUBCATEGORY_CATEGORY), "sub_category string, category string")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def values_clause(pairs: tuple[tuple[str, str], ...]) -> str:
    """Render a dim as a SQL VALUES list (for oracle generation)."""
    return ", ".join(f"({_sql_quote(a)}, {_sql_quote(b)})" for a, b in pairs)
