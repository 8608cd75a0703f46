"""Pooled MLlib forecaster: exact recovery on data inside the model class."""

from __future__ import annotations

import datetime as dt

import pytest

from retail_data_pipeline_and_forecasting_system_spark.forecast.mllib_model import (
    fit_global_forecaster,
    forecast_next_days,
)

D0 = dt.date(2024, 1, 1)

# shared slope/weekly pattern, per-series intercept — exactly the model class
SLOPE = 2.5
DOW = [0.0, 3.0, -1.0, 4.0, 0.5, -2.0, 1.0]  # offset by (dayofweek-1)
BASE = {"store_a": 100.0, "store_b": 250.0}


def _value(series: str, day: int) -> float:
    d = D0 + dt.timedelta(days=day)
    t = (d - dt.date(1970, 1, 1)).days
    dow = d.isoweekday() % 7  # == Spark dayofweek-1 (0=Sunday)
    return BASE[series] + SLOPE * t + DOW[dow]


@pytest.fixture(scope="module")
def daily(spark):
    rows = [
        (s, D0 + dt.timedelta(days=i), _value(s, i))
        for s in BASE
        for i in range(28)
    ]
    return spark.createDataFrame(rows, "series string, d date, sales double")


def test_recovers_generating_process(spark, daily):
    model = fit_global_forecaster(daily, "series", "d", "sales")
    out = forecast_next_days(model, daily, "series", "d", horizon=3)
    got = {(r["series"], r["d"]): r["forecast"] for r in out.collect()}
    assert len(got) == 6  # 2 series x 3 days
    for s in BASE:
        for i in range(28, 31):
            d = D0 + dt.timedelta(days=i)
            assert got[(s, d)] == pytest.approx(_value(s, i), abs=1e-4)


def test_future_grid_starts_after_last_observation(spark, daily):
    model = fit_global_forecaster(daily, "series", "d", "sales")
    out = forecast_next_days(model, daily, "series", "d", horizon=2)
    dates = sorted(r["d"] for r in out.filter("series = 'store_a'").collect())
    assert dates == [D0 + dt.timedelta(days=28), D0 + dt.timedelta(days=29)]
