"""Skew helpers must be result-identical to their plain equivalents."""

from __future__ import annotations

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
