"""Grouped per-series forecasting equals the driver-path model per series."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.forecast.univariate import (
    UnivariateForecaster,
    forecast_many,
)


def test_forecast_many_matches_per_series_driver_fit(spark):
    # daily revenue per order priority = a handful of real series
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("series_id"),
            F.to_date("o_orderdate").alias("date"),
        )
        .agg(F.sum("o_totalprice").alias("value"))
    )
    got = {
        (r["series_id"], r["date"].isoformat()): r["forecast"]
        for r in forecast_many(daily, horizon=2).collect()
    }

    pdf = daily.toPandas()
    import datetime as dt

    want = {}
    for key, grp in pdf.groupby("series_id"):
        grp = grp.sort_values("date")
        m = UnivariateForecaster()
        m.fit(grp["value"].to_numpy(dtype="float64"))
        preds = m.predict(2)
        last = grp["date"].iloc[-1]
        for i, yhat in enumerate(preds, start=1):
            want[(key, (last + dt.timedelta(days=i)).isoformat())] = yhat

    assert set(got) == set(want)
    for k in want:
        assert np.isclose(got[k], want[k], rtol=0, atol=1e-9), k
    # horizon rows per series
    assert len(got) == 2 * pdf["series_id"].nunique()
