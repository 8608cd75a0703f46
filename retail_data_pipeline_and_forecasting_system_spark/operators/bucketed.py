"""The hash-bucketed sequential-fold scaffold, shared.

Several operators run a per-key sequential fold that is independent
across keys (inventory depletion, sequence packing, per-series model
fits, Holt-Winters): the distributed shape is always the same — bucket
the keys with ``pmod(hash(key), B)`` so one Arrow batch carries MANY
whole key-groups, then ``groupBy(bucket).applyInPandas(kernel)`` where
the kernel walks its batch's groups sequentially. Bucketing (instead of
grouping by the raw key) keeps the task count bounded at ``B`` while a
raw-key groupBy would schedule one task per key (~0.2 ms x millions of
products, measured in depletion's docstring).

This module is that scaffold, extracted once (round-9 review: four
copies had drifted on whether the kernel saw the bucket column).

Contract: the kernel receives each bucket's rows WITHOUT the bucket
column, must handle multiple key-groups per batch (sort + segment, or
pandas groupby), and returns rows matching ``out_schema``.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bucketed_fold(
    df: DataFrame,
    key_col: str,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: T.StructType,
    num_buckets: int = 64,
) -> DataFrame:
    """One hash-bucketed ``applyInPandas`` pass over ``df``, keyed by
    ``key_col``. Parallelism = min(num_buckets, distinct keys); state
    is whatever the kernel keeps per group. NULL keys hash to a bucket
    like any other value (Spark ``hash(NULL)`` is a constant seed), so
    NULL-keyed groups reach the kernel — each kernel decides their
    semantics."""
    bucketed = df.withColumn(
        "__bucket", F.pmod(F.hash(key_col), F.lit(num_buckets))
    )
    return bucketed.groupBy("__bucket").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns="__bucket")),
        schema=out_schema,
    )
