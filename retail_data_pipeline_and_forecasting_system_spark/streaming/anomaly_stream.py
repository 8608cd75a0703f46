"""Streaming anomaly detection: h10's rolling z-score, live.

The fifth leg of the ingest-service family (dedup_stream gates
documents, semantic_stream gates embeddings, cdc_stream maintains
dimension state, rollup_stream maintains per-customer rollups): an
orders stream maintains the DAILY REVENUE table incrementally — each
micro-batch aggregates to per-day cent deltas
(``plans.analytics.daily_revenue_cents``) and merges them into the
stored day table by exact bigint addition — and the anomaly scores are
recomputed over that DAY-SIZED table with the very same
``zscore_flags`` the batch query ``h10_anomaly_zscore`` runs, so the
drained service output EQUALS the batch query on the same rows
(``tests/test_anomaly_stream.py`` asserts it under arbitrary epoch
slicing).

Why recompute the scores instead of maintaining them: the day table is
thousands of rows at ANY corpus size (the fact stream collapses at the
map-side combine), so re-running the trailing window per epoch costs
milliseconds — and unlike incremental z-score state it is trivially
correct under late data: an order arriving for a PAST day updates that
day's cents, and every window that contains the day re-scores
automatically on the next read.

Replay safety — same epoch-guard contract as rollup_stream: a cents
merge double-counts if an epoch re-fires, so the sink stores the last
applied epoch id in the state table and skips batch_id == last
(Structured Streaming's crash-replay), failing loudly on batch_id <
last (a fresh checkpoint pointed at an old table is operator error).

Scale: state is day-cardinality-sized; each epoch aggregates only its
delta (map-side combined) and merges with one day-keyed union-agg over
(stored ∪ delta) — both day-sized. The per-epoch state rewrite is the
versioned-table O(state) write (the honest format-free cost).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.analytics import daily_revenue_cents, zscore_flags
from ..sources.versioned import current_version, read_version, write_version


def anomaly_state_sink(table_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining the (day, revenue_cents)
    state table from a stream of order rows.

    Use::

        stream.writeStream.foreachBatch(
            anomaly_state_sink(table_dir)
        ).option("checkpointLocation", ckpt).start()
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # no rows -> no new (identical) version committed
        spark = batch_df.sparkSession
        delta = daily_revenue_cents(batch_df)
        if current_version(table_dir) is None:
            out = delta
        else:
            cur = read_version(spark, table_dir)
            # EPOCH GUARD: cent merges double-count under replay (see
            # rollup_stream for the full contract discussion)
            last = cur.agg(F.max("__epoch")).first()[0]
            if last is not None and batch_id == last:
                return  # crash-replayed epoch, already applied
            if last is not None and batch_id < last:
                raise ValueError(
                    f"anomaly_state_sink: batch_id {batch_id} is "
                    f"behind the table's last applied epoch {last} — "
                    "a new checkpoint lineage is pointed at an "
                    "existing state table; use a fresh table_dir (or "
                    "resume the original checkpoint)"
                )
            out = (
                cur.select("day", "revenue_cents")
                .union(delta)
                .groupBy("day")
                .agg(
                    F.sum("revenue_cents").cast("bigint").alias(
                        "revenue_cents"
                    )
                )
            )
        write_version(
            out.withColumn("__epoch", F.lit(batch_id).cast("bigint")),
            table_dir,
        )

    return apply


def read_anomaly_scores(
    spark, table_dir: str, version: int | None = None
) -> DataFrame:
    """z-scores + anomaly flags over the maintained day table — the
    EXACT ``zscore_flags`` plan the batch h10 query runs, so the
    service output is the batch output on the drained rows (late rows
    for past days re-score every affected window automatically)."""
    return zscore_flags(
        read_version(spark, table_dir, version).select(
            "day", "revenue_cents"
        )
    )


def run_anomaly_ingest(
    spark,
    input_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp"
    ),
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a parquet drop-dir of order rows into the anomaly state
    with ``Trigger.AvailableNow`` (one epoch per file at
    ``max_files_per_trigger=1``), blocking until caught up."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    (
        stream.writeStream.foreachBatch(anomaly_state_sink(table_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
