"""OHLC (candlestick) aggregation spec, shared by the batch registry
query (``plans.analytics.h7_ohlc_bars``) and the streaming twin
(``streaming.aggregates.streaming_ohlc_bars``).

The whole design is "open/close as algebraic aggregates": ``min_by`` /
``max_by`` over a total order key make the first/last observation a
map-side-combinable state (value-at-min-key, value-at-max-key), so

- batch pays ONE hash aggregate — no sort, no window, only O(buckets)
  partial states on the shuffle (a first/last-over-window formulation
  shuffles and sorts every raw row instead), and
- streaming can maintain the state incrementally per live window,
  which a sort-based formulation cannot do at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ohlc_order_key(t_us: Column, event_id: Column) -> Column:
    """Zero-padded ``t_us|event_id`` string (FULL epoch microseconds —
    truncating to ms would silently tie sub-ms observations and hand
    the open/close pick to the event_id tiebreak): lexicographic order
    equals
    numeric order for non-negative fixed-width ints, and Spark and
    DuckDB compare it identically bytewise — the portable min_by /
    max_by ordering key (DuckDB's ``arg_min`` accepts VARCHAR but not
    STRUCT keys, so a struct key would leave the oracle inexpressible).

    Preconditions: both inputs non-negative (epoch-us timestamps and
    id sequences are; a negative value would sort before all positives
    as text and break the equivalence) and at most 20 digits (lpad
    TRUNCATES wider input), and the VALUE column fed to ``ohlc_aggs``
    must be non-null — Spark's min_by returns a NULL value landing
    first in key order while DuckDB's arg_min skips NULL arguments, so
    callers filter NULL values before aggregating (both h7 and the
    streaming twin do). The first two preconditions are ENFORCED: a
    violating row raises via ``assert_true`` instead of silently
    mis-ordering the open/close picks (round-7 ADVICE); NULL inputs
    pass through as NULL keys unchanged.
    """
    key = F.concat(
        F.lpad(t_us.cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(event_id.cast("string"), 20, "0"),
    )
    violation = (
        (t_us < 0)
        | (event_id < 0)
        | (F.length(t_us.cast("string")) > 20)
        | (F.length(event_id.cast("string")) > 20)
    )
    # three-valued logic: NULL inputs make `violation` NULL, coalesce
    # keeps them non-raising (concat already yields a NULL key)
    guard = F.assert_true(
        ~F.coalesce(violation, F.lit(False)),
        F.lit("ohlc_order_key: negative or >20-digit input"),
    )
    return F.when(guard.isNull(), key)


def ohlc_aggs(v: Column, okey: Column) -> list[Column]:
    """count / open / high / low / close aggregate columns over a
    decimal value and its order key — all algebraic, so they combine
    map-side in batch and maintain incrementally in streaming state."""
    return [
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min_by(v, okey).cast("double").alias("open_v"),
        F.max(v).cast("double").alias("high_v"),
        F.min(v).cast("double").alias("low_v"),
        F.max_by(v, okey).cast("double").alias("close_v"),
    ]
