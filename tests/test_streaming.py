"""Streaming rendition agrees with the batch pipeline.

Replays dataset_15 through Structured Streaming (one micro-batch per day
file via maxFilesPerTrigger=1 with ascending mtimes, Trigger.AvailableNow)
and asserts the stateful depletion produces exactly the batch engine's
fulfilled quantities in timestamp order — i.e. cross-micro-batch state
carryover == cross-day carryover.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.retail import (
    explode_transactions,
    process_lines,
)
from retail_data_pipeline_and_forecasting_system_spark.sources import (
    read_products_csv,
    read_transactions_json,
)
from retail_data_pipeline_and_forecasting_system_spark.streaming import (
    run_available_now,
)

DATASET = Path("/root/reference/data/dataset_15")


def test_streaming_matches_batch(spark, tmp_path):
    # stage input files with ascending mtimes so the file source's
    # modification-time ordering == business-day ordering
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, f in enumerate(sorted(DATASET.glob("transactions_*.json"))):
        dst = in_dir / f.name
        shutil.copy(f, dst)
        ts = time.time() - 1000 + i
        os.utime(dst, (ts, ts))

    products = read_products_csv(spark, str(DATASET / "products.csv"))
    stock = {
        r["product_id"]: r["stock"]
        for r in products.select("product_id", "stock").collect()
    }

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(spark, str(in_dir / "*.json"), stock, ckpt, out_dir)

    streamed = (
        spark.read.parquet(out_dir)
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )

    raw = read_transactions_json(spark, str(DATASET / "transactions_*.json"))
    batch = (
        process_lines(
            explode_transactions(raw), products, process_order="timestamp"
        )
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )

    assert len(streamed) == len(batch) == 27652
    diffs = {k for k in batch if streamed.get(k) != batch[k]}
    assert not diffs, f"{len(diffs)} mismatching lines, e.g. {sorted(diffs)[:5]}"
