"""Skew helpers must be result-identical to their plain equivalents."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.operators.skew import (
    replicated_skew_join,
    salted_agg,
)

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = {
        r["l_partkey"]: (r["qty"], r["n"])
        for r in li.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("int")).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    li_int = li.withColumn("l_quantity", F.col("l_quantity").cast("int"))
    salted = {
        r["l_partkey"]: (r["qty"], r["n"])
        for r in salted_agg(
            li_int,
            ["l_partkey"],
            {"qty": ("l_quantity", "sum"), "n": ("l_quantity", "count")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_replicated_skew_join_equals_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, on="l_partkey").count()
    # pick the two hottest part keys as "skewed"
    hot = [
        r["l_partkey"]
        for r in li.groupBy("l_partkey").count().orderBy(F.desc("count")).limit(2).collect()
    ]
    skewed = replicated_skew_join(li, part, on="l_partkey", hot_keys=hot, n_salts=4)
    assert skewed.count() == plain
    # spot-check row-level equality for one hot key
    a = set(
        tuple(r)
        for r in li.join(part, on="l_partkey")
        .filter(F.col("l_partkey") == hot[0])
        .collect()
    )
    b = set(
        tuple(r)
        for r in skewed.filter(F.col("l_partkey") == hot[0]).collect()
    )
    assert a == b


def test_replicated_skew_join_rejects_outer_modes(spark):
    left = spark.createDataFrame([(1, "x")], "k long, v string")
    right = spark.createDataFrame([(1, "y")], "k long, w string")
    with pytest.raises(ValueError, match="right/full outer"):
        replicated_skew_join(left, right, on="k", hot_keys=[1], how="full")


def test_aqe_splits_skewed_join_partitions(spark):
    """With skew thresholds lowered, AQE's OptimizeSkewedJoin must mark the
    hot partition as skewed (plan shows 'skew=true') — the runtime re-plan
    we rely on at 100 TB when static salting isn't wired in."""
    import io
    import contextlib

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        # the skew geometry below (hot/median ratio vs factor 2) was
        # calibrated for 8 reduce partitions; pin it so the fixture
        # session's partition count (4 since r15) can't flatten the
        # ratio under the detection threshold
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # key 0 carries 50x the rows of every other key
        left = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 4 = 0 THEN 0 ELSE id END AS k", "id AS payload"
        )
        right = spark.range(0, 500).selectExpr("id AS k", "id * 2 AS w")
        joined = left.join(right, "k")
        joined.collect()  # materialize THIS plan so AQE finalizes it
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
