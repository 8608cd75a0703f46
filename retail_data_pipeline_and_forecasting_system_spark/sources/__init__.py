from .readers import (  # noqa: F401
    read_customers_csv,
    read_products_csv,
    read_table_jdbc,
    read_transactions_json,
)
from .writers import write_single_csv, write_partitioned_parquet  # noqa: F401
