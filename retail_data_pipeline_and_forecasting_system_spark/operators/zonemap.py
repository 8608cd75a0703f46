"""Zone-map state: per-partition column stats + predicate-pruning
audit counts over month-partitioned orders.

Shared by the batch registry entry ``ops8_zone_map``
(plans/analytics.py) and the incremental maintenance service
``streaming/zonemap_stream.py``: every state column is algebraic —
row/match counts SUM, stat spans take MIN/MAX — so draining the same
orders through ANY epoch slicing yields the identical manifest a
single batch pass computes. The skip/false-scan VERDICT columns are
derived from the state at read time (``finalize_zone_map``), never
stored: a verdict is a pure function of the stats, so deriving late
keeps the state merge-closed.

This is the operational shape of a real lakehouse: Delta/Iceberg
update per-file stats ON WRITE (delta-proportional cost), and query
planners read the manifest — the full-table stats scan is paid never,
not once. All columns are integer cents / dates / counts; no doubles
anywhere, so cross-engine and cross-slicing results are exact by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: audit predicates (must match the ops8_zone_map oracle SQL literals)
DATE_CUTOFF = "1997-06-01"
PRICE_LO = 45000000  # $450,000.00 in cents
PRICE_HI = 45010000  # $450,100.00 in cents


def zone_rows(
    orders: DataFrame,
    cutoff: str = DATE_CUTOFF,
    lo: int = PRICE_LO,
    hi: int = PRICE_HI,
) -> DataFrame:
    """Row-local zone-map terms: (month, cents, day, match flags)."""
    return orders.select(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("month"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).select(
        "month",
        "cents",
        "day",
        F.when(F.col("day") >= F.lit(cutoff).cast("date"), 1)
        .otherwise(0)
        .alias("m_date"),
        F.when(F.col("cents").between(lo, hi), 1).otherwise(0).alias(
            "m_price"
        ),
    )


def zone_state(orders: DataFrame, **kwargs) -> DataFrame:
    """Per-month zone-map state: ONE map-side-combined agg; every
    column is algebraic (sum or min/max)."""
    return (
        zone_rows(orders, **kwargs)
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
            F.sum("m_date").cast("bigint").alias("n_match_date"),
            F.sum("m_price").cast("bigint").alias("n_match_price"),
        )
    )


def merge_zone_states(cur: DataFrame, delta: DataFrame) -> DataFrame:
    """Algebraic merge of two per-month states (full outer on month):
    counts add, spans take min/max — the manifest/rollup merge
    contract, so epoch slicing cannot change the result."""
    c = cur.select(*[F.col(x).alias(f"a_{x}") for x in cur.columns])
    d = delta.select(*[F.col(x).alias(f"b_{x}") for x in delta.columns])
    j = c.join(d, c.a_month == d.b_month, "full_outer")

    def add(x):
        return (
            F.coalesce(F.col(f"a_{x}"), F.lit(0))
            + F.coalesce(F.col(f"b_{x}"), F.lit(0))
        ).cast("bigint")

    return j.select(
        F.coalesce("a_month", "b_month").alias("month"),
        add("n_rows").alias("n_rows"),
        F.least("a_min_cents", "b_min_cents").alias("min_cents"),
        F.greatest("a_max_cents", "b_max_cents").alias("max_cents"),
        F.least("a_min_day", "b_min_day").alias("min_day"),
        F.greatest("a_max_day", "b_max_day").alias("max_day"),
        add("n_match_date").alias("n_match_date"),
        add("n_match_price").alias("n_match_price"),
    )


def finalize_zone_map(
    state: DataFrame,
    cutoff: str = DATE_CUTOFF,
    lo: int = PRICE_LO,
    hi: int = PRICE_HI,
) -> DataFrame:
    """Derive the skip / false-scan verdicts from the stats — shaped
    exactly like ops8_zone_map's batch output."""
    skip_price = (F.col("max_cents") < lo) | (F.col("min_cents") > hi)
    return state.select(
        "month",
        "n_rows",
        "min_cents",
        "max_cents",
        "min_day",
        "max_day",
        (F.col("max_day") < F.lit(cutoff).cast("date")).alias("skip_date"),
        "n_match_date",
        skip_price.alias("skip_price"),
        "n_match_price",
        (~skip_price & (F.col("n_match_price") == 0)).alias(
            "false_scan_price"
        ),
    )
