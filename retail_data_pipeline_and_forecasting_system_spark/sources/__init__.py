from .readers import (  # noqa: F401
    read_customers_csv,
    read_json_robust,
    read_parquet_evolving,
    read_products_csv,
    read_table_jdbc,
    read_transactions_json,
    with_lineage,
)
from .writers import (  # noqa: F401
    compact_partition,
    read_orc,
    write_bucketed_table,
    write_orc,
    write_partitioned_parquet,
    write_single_csv,
    write_table_jdbc,
    write_with_metrics,
)
from .synthetic_source import SyntheticEventsDataSource  # noqa: F401
from .versioned import (  # noqa: F401
    current_version,
    list_versions,
    read_version,
    vacuum_versions,
    write_version,
)
