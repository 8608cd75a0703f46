"""Streaming anomaly service (anomaly_stream.py): the drained scores
must EQUAL batch h10 on the same rows under arbitrary epoch slicing
(cents merge is associative), a replayed epoch must apply exactly once
(the epoch guard), and a late order for a PAST day must re-score every
window containing that day."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)
from retail_data_pipeline_and_forecasting_system_spark.sources.versioned import (
    current_version,
    read_version,
)
from retail_data_pipeline_and_forecasting_system_spark.streaming.anomaly_stream import (  # noqa: E501
    anomaly_state_sink,
    read_anomaly_scores,
    run_anomaly_ingest,
)

SF = "/root/testdata/sf0.001"
ORDER_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]


def _rows(df):
    return {
        (str(r["day"]), r["revenue_cents"], r["n_win"],
         None if r["z"] is None else round(r["z"], 9), r["is_anomaly"])
        for r in df.collect()
    }


def _drop_slices(spark, tmp_path, orders, n=3):
    drop = tmp_path / "drop"
    for i in range(n):
        (
            orders.filter(F.col("o_orderkey") % n == i)
            .coalesce(1)
            .write.parquet(str(drop / f"slice={i}"), mode="overwrite")
        )
    drop2 = tmp_path / "in"
    drop2.mkdir()
    for j, f in enumerate(sorted(glob.glob(str(drop / "*" / "*.parquet")))):
        shutil.copy(f, drop2 / f"part-{j}.parquet")
    return str(drop2)


def test_stream_equals_batch_h10(spark, tmp_path):
    """Drain sf0.001 orders through 3 arbitrary epoch slices; the
    service scores must equal the batch h10 query EXACTLY (integer
    cents merge is slicing-independent; the scorer is the same plan)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(ORDER_COLS)
    in_dir = _drop_slices(spark, tmp_path, orders)
    table = str(tmp_path / "state")
    run_anomaly_ingest(spark, in_dir, table, str(tmp_path / "ckpt"))
    assert current_version(table) == 3  # one committed version per epoch

    got = read_anomaly_scores(spark, table)
    want = QUERIES["h10_anomaly_zscore"].fn(spark, SF)
    assert _rows(got) == _rows(want)


def test_epoch_guard_and_late_data(spark, tmp_path):
    """Replaying an epoch must not double-count; a late order landing
    on a PAST day updates that day's cents and re-scores the windows
    that contain it."""
    table = str(tmp_path / "state")
    sink = anomaly_state_sink(table)

    def orders_df(rows):
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderdate string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))

    base = [
        (i, 1, 100.0 + (i % 5), f"1995-01-{i + 1:02d} 00:00:00")
        for i in range(10)
    ]
    sink(orders_df(base), 0)
    before = {
        str(r.day): r for r in read_anomaly_scores(spark, table).collect()
    }

    # exact replay of epoch 0 -> skipped, state byte-identical
    sink(orders_df(base), 0)
    assert current_version(table) == 1
    replay = {
        str(r.day): r for r in read_anomaly_scores(spark, table).collect()
    }
    assert {k: (v.revenue_cents, v.z) for k, v in replay.items()} == {
        k: (v.revenue_cents, v.z) for k, v in before.items()
    }

    # late order for day 3 (already past) in a NEW epoch
    sink(orders_df([(99, 1, 50.0, "1995-01-03 00:00:00")]), 1)
    after = {
        str(r.day): r for r in read_anomaly_scores(spark, table).collect()
    }
    assert (
        after["1995-01-03"].revenue_cents
        == before["1995-01-03"].revenue_cents + 5000
    )
    # every later day's window contains day 3 -> its z re-scores
    changed = [
        k for k in sorted(after)
        if k > "1995-01-03" and after[k].z != before[k].z
    ]
    assert changed, "late data must re-score downstream windows"
    # and the state equals a from-scratch batch recompute on all rows
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (  # noqa: E501
        daily_revenue_cents,
        zscore_flags,
    )

    want = zscore_flags(
        daily_revenue_cents(
            orders_df(base + [(99, 1, 50.0, "1995-01-03 00:00:00")])
        )
    )
    assert _rows(read_anomaly_scores(spark, table)) == _rows(want)

    # an epoch BEHIND the applied head is a lineage error, not a skip
    import pytest

    with pytest.raises(ValueError, match="behind"):
        sink(orders_df([(100, 1, 10.0, "1995-01-05 00:00:00")]), 0)
