"""Algebraic rollup state: build and merge, shared by batch and streaming.

The one agg spec behind ``ops6_incremental_agg`` (batch: base + delta
merged, proven equal to recompute by the DuckDB oracle) and
``streaming/rollup_stream.py`` (the same merge applied once per
micro-batch epoch) — the ohlc.py play: define the algebraic state once
so the batch proof carries to the stream.

State columns per key: ``n_orders`` (bigint count), ``total_spent``
(DECIMAL(28,2) — exact, order-independent, associative), ``first_order``
/ ``last_order`` (min/max timestamps). Every column is ALGEBRAIC:
merge(state(A), state(B)) == state(A ∪ B) exactly, which is what lets
the base state persist while only deltas aggregate fresh.
``total_spent`` is cast back to DECIMAL(28,2) after every merge so the
state schema is a fixed point under repeated merging (decimal addition
otherwise widens precision each epoch until Spark's 38-digit cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_TOTAL_TYPE = "decimal(28,2)"


def rollup_state(
    df: DataFrame,
    key_col: str = "o_custkey",
    value_col: str = "o_totalprice",
    ts_col: str = "o_orderdate",
) -> DataFrame:
    """Aggregate raw rows to per-key algebraic state (one hash agg,
    map-side combined). The money column is cast to DECIMAL(18,2)
    FIRST (exactness rule 1 in plans/analytics.py) so sums are exact
    and order-independent at any parallelism."""
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast(STATE_TOTAL_TYPE)
        .alias("total_spent"),
        F.min(ts_col).alias("first_order"),
        F.max(ts_col).alias("last_order"),
    )


def merge_rollup_states(
    a: DataFrame,
    b: DataFrame,
    key_col: str = "o_custkey",
    keys_nullable: bool = True,
) -> DataFrame:
    """Merge two state frames: count+count, exact decimal sum+sum,
    least/greatest of min/max (Spark's least/greatest skip NULLs, so
    one-sided keys pass through). ONE key-partitioned full-outer join.

    The key join is NULL-SAFE by default (a groupBy keeps a NULL-key
    group; an equi join would leave two un-merged NULL rows that
    compound every epoch in the streaming sink) — but Spark plans a
    null-safe join by re-partitioning both sides on a coalesce wrapper
    of the key, which costs two extra state-sized exchanges on top of
    the agg exchanges it would otherwise reuse. Callers whose key is
    non-null BY CONTRACT (a foreign key, ops6's o_custkey) pass
    ``keys_nullable=False`` to keep the plain equi join: the agg
    exchanges then double as the join partitioning, and with both
    states bucketed by key the merge is shuffle-free."""
    zero = F.lit("0").cast(STATE_TOTAL_TYPE)
    aa, bb = a.alias("a"), b.alias("b")
    if keys_nullable:
        cond = F.col(f"a.{key_col}").eqNullSafe(F.col(f"b.{key_col}"))
        joined = aa.join(bb, cond, "full_outer")
    else:
        joined = aa.join(bb, key_col, "full_outer")
    return joined.select(
        F.coalesce(F.col(f"a.{key_col}"), F.col(f"b.{key_col}")).alias(
            key_col
        )
        if keys_nullable
        else F.col(key_col),
        (
            F.coalesce(F.col("a.n_orders"), F.lit(0))
            + F.coalesce(F.col("b.n_orders"), F.lit(0))
        ).cast("bigint").alias("n_orders"),
        (
            F.coalesce(F.col("a.total_spent"), zero)
            + F.coalesce(F.col("b.total_spent"), zero)
        ).cast(STATE_TOTAL_TYPE).alias("total_spent"),
        F.least(F.col("a.first_order"), F.col("b.first_order")).alias(
            "first_order"
        ),
        F.greatest(F.col("a.last_order"), F.col("b.last_order")).alias(
            "last_order"
        ),
    )
