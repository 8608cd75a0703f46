"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``retail_data_pipeline_and_forecasting_system_spark.plans.analytics`` — one
entry per SURVEY.md §2 operator plus the large-scale data-pipeline
extensions, each with an exact DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for EVERY query — even the greedy inventory fold has a
    recursive-CTE oracle. One entry per queries() entry, no exceptions
    (asserted in tests/test_oracle_parity.py)."""
    return {name: spec.sql for name, spec in QUERIES.items()}
