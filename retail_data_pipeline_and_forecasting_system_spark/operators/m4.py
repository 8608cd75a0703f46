"""M4 downsample state: per (series, day-bucket) argmin/argmax structs.

Shared by the batch registry entry ``h15_m4_downsample``
(plans/analytics.py) and the incremental maintenance service
``streaming/m4_stream.py``. The state is four lexicographic-extreme
STRUCTS per (event_type, bucket):

- ``s_first``/``s_last`` — min/max of (ts, event_id, value)
- ``s_min``/``s_max``   — min/max of (value, ts, event_id)

Extremes are not merely algebraic, they are IDEMPOTENT: min/max of a
multiset ignores multiplicity, so re-applying an epoch (or any subset
of already-seen rows) can NEVER change the state. This puts m4_stream
in the naturally-convergent class with cdc_stream's upsert — no epoch
guard needed — in contrast to the counted manifests
(manifest/zonemap/rollup/scrub), whose SUM columns double-apply under
replay and need the last-epoch guard. The class distinction is pinned
by ``tests/test_m4_stream.py`` (replay double-apply == no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_state(events: DataFrame) -> DataFrame:
    """Per (event_type, day-bucket) extreme structs: ONE
    map-side-combined agg; every partition shrinks to <= 4 candidate
    structs per group before the shuffle."""
    e = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("bucket"),
        "ts",
        "value",
        "event_id",
    )
    return e.groupBy("event_type", "bucket").agg(
        F.min(F.struct("ts", "event_id", "value")).alias("s_first"),
        F.max(F.struct("ts", "event_id", "value")).alias("s_last"),
        F.min(F.struct("value", "ts", "event_id")).alias("s_min"),
        F.max(F.struct("value", "ts", "event_id")).alias("s_max"),
    )


def merge_m4_states(cur: DataFrame, delta: DataFrame) -> DataFrame:
    """Idempotent merge (full outer on the group key): each struct
    takes the lexicographic extreme of the two sides. F.least/
    F.greatest skip NULL sides, so a group present in only one input
    passes through unchanged."""
    c = cur.select(*[F.col(x).alias(f"a_{x}") for x in cur.columns])
    d = delta.select(*[F.col(x).alias(f"b_{x}") for x in delta.columns])
    j = c.join(
        d,
        (c.a_event_type == d.b_event_type) & (c.a_bucket == d.b_bucket),
        "full_outer",
    )
    return j.select(
        F.coalesce("a_event_type", "b_event_type").alias("event_type"),
        F.coalesce("a_bucket", "b_bucket").alias("bucket"),
        F.least("a_s_first", "b_s_first").alias("s_first"),
        F.greatest("a_s_last", "b_s_last").alias("s_last"),
        F.least("a_s_min", "b_s_min").alias("s_min"),
        F.greatest("a_s_max", "b_s_max").alias("s_max"),
    )


def finalize_m4(state: DataFrame) -> DataFrame:
    """Explode the four role structs to point rows — shaped exactly
    like h15_m4_downsample's batch output (ts as epoch-micros BIGINT,
    h5's convention)."""
    roles = F.array(
        *[
            F.struct(
                F.lit(role).alias("role"),
                F.col(f"{src}.ts").alias("ts"),
                F.col(f"{src}.value").alias("value"),
                F.col(f"{src}.event_id").alias("event_id"),
            )
            for role, src in [
                ("first", "s_first"),
                ("last", "s_last"),
                ("min", "s_min"),
                ("max", "s_max"),
            ]
        ]
    )
    return state.select(
        "event_type", "bucket", F.explode(roles).alias("r")
    ).select(
        "event_type",
        "bucket",
        F.col("r.role").alias("role"),
        F.unix_micros(F.col("r.ts")).alias("ts_us"),
        F.col("r.value").alias("value"),
        F.col("r.event_id").alias("event_id"),
    )
