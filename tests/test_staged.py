"""Staged (DAG-shaped) pipeline: 3 stages with date-partitioned parquet
handoff must reproduce the same golden outputs as the single-pass plan."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from retail_data_pipeline_and_forecasting_system_spark.plans.staged import (
    run_staged_pipeline,
)

DATASET = Path("/root/reference/data/dataset_15")
GOLDEN = Path("/root/reference/data/output")
MONEY = {"total_amount", "line_total", "total_sales", "total_profit", "unit_price"}


def test_staged_pipeline_golden(spark, tmp_path):
    out = run_staged_pipeline(
        spark,
        str(DATASET / "customers.csv"),
        str(DATASET / "products.csv"),
        str(DATASET / "transactions_*.json"),
        str(tmp_path),
    )
    for name in ("orders", "order_line_items", "daily_summary", "products_updated"):
        mine = pd.read_csv(f"{out}/{name}.csv")
        gold = pd.read_csv(GOLDEN / f"{name}.csv")
        assert mine.shape == gold.shape, name
        for c in gold.columns:
            if c in MONEY:
                assert np.allclose(
                    mine[c].astype(float), gold[c].astype(float),
                    rtol=1e-2, atol=0.01,
                ), (name, c)
            elif c == "order_datetime":
                assert (
                    pd.to_datetime(mine[c]) == pd.to_datetime(gold[c])
                ).all(), (name, c)
            else:
                assert (mine[c].values == gold[c].values).all(), (name, c)
    # forecast exists with the contract schema
    fc = pd.read_csv(f"{out}/sales_profit_forecast.csv")
    assert list(fc.columns) == ["date", "forecasted_sales", "forecasted_profit"]
    assert len(fc) == 1
