"""Bucketed co-located join: same-key/same-count bucketed tables must join
with NO shuffle exchange — the pay-once partitioning strategy for repeated
large joins."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.sources.writers import (
    write_bucketed_table,
)

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{tmp_path}/wh'"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed_table(li, "bucketdemo.li_b", "l_orderkey", 8)
    write_bucketed_table(orders, "bucketdemo.ord_b", "o_orderkey", 8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bucketdemo.li_b")
        b = spark.table("bucketdemo.ord_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = _explain(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == li.count()  # every line has its order

        # same join on raw parquet DOES shuffle — the bucketing earned it
        raw = spark.read.parquet(f"{SF}/lineitem.parquet").join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert "Exchange" in _explain(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
