"""Static schemas for every table the engine touches.

The reference pins schemas only for its MySQL DDL and infers everything else
(Mongo inference: reference src/data_processor.py:206-212; createDataFrame
inference: :331, :349, :586-588) — which is how its money columns drift to
decimal(38,18). This engine declares every schema statically so scans never
pay an inference pass (at 100 TB an inference pass is a full extra read) and
money stays DecimalType(10,2) end-to-end.

Schema sources: reference candy_store.sql:25-33 (customers), :52-62
(products); transactions shape from data/dataset_15/transactions_*.json;
output contracts from data/output/*.csv (see FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# money policy: DecimalType(10,2) — exact, order-independent sums, no
# (38,18) noise. Reference prices are decimal(3,2) (candy_store.sql:58-59);
# (10,2) leaves headroom for line/order totals.
MONEY = T.DecimalType(10, 2)

CUSTOMERS = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.IntegerType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("product_category", T.StringType(), True),
        T.StructField("product_subcategory", T.StringType(), True),
        T.StructField("product_shape", T.StringType(), True),
        T.StructField("sales_price", MONEY, True),
        T.StructField("cost_to_make", MONEY, True),
        T.StructField("stock", T.IntegerType(), True),
    ]
)

# Raw transaction document: one JSON doc per transaction with a nested
# items array (1-5 entries, qty nullable ~7.5% of lines).
TRANSACTION_ITEM = T.StructType(
    [
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("qty", T.IntegerType(), True),
    ]
)

TRANSACTIONS_RAW = T.StructType(
    [
        T.StructField("transaction_id", T.LongType(), False),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("timestamp", T.StringType(), True),  # ISO-8601 micros
        T.StructField("items", T.ArrayType(TRANSACTION_ITEM), True),
    ]
)

# Exploded line grain (one row per (transaction, item position)).
TRANSACTION_LINES = T.StructType(
    [
        T.StructField("transaction_id", T.LongType(), False),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("line_pos", T.IntegerType(), False),
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("qty", T.IntegerType(), True),
    ]
)

# ---- output contracts (FIXTURES.md) ----

ORDERS_OUT = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("order_datetime", T.StringType(), True),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("total_amount", MONEY, True),
        T.StructField("num_items", T.LongType(), True),
    ]
)

ORDER_LINE_ITEMS_OUT = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("product_id", T.IntegerType(), False),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("unit_price", MONEY, True),
        T.StructField("line_total", MONEY, True),
    ]
)

DAILY_SUMMARY_OUT = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("num_orders", T.LongType(), True),
        T.StructField("total_sales", MONEY, True),
        T.StructField("total_profit", T.DoubleType(), True),
    ]
)

PRODUCTS_UPDATED_OUT = T.StructType(
    [
        T.StructField("product_id", T.IntegerType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("current_stock", T.IntegerType(), True),
    ]
)

FORECAST_OUT = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("forecasted_sales", T.DoubleType(), True),
        T.StructField("forecasted_profit", T.DoubleType(), True),
    ]
)
