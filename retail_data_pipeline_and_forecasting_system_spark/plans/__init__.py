from .retail import (  # noqa: F401
    build_daily_summary,
    build_order_line_items,
    build_orders,
    build_products_updated,
    explode_transactions,
    processing_metrics,
    release_retail_pipeline,
    run_retail_pipeline,
)
from .incremental import refresh_daily_summary, summarize_slice  # noqa: F401
