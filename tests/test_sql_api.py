"""spark.sql over registered views == the DataFrame plans.

Catalyst compiles both surfaces to the same logical plans; these tests
pin that equivalence (results AND physical plan properties) so the SQL
entry point can't drift from the DataFrame registry.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.sql_api import (
    register_views,
    sql,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_agg_matches_dataframe_plan(spark):
    register_views(spark, SF)
    got = sql(
        spark,
        """
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderstatus
        """,
    )
    want = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
    assert _rows(got) == _rows(want)


def test_sql_join_still_broadcasts_and_pushes_filters(spark):
    register_views(spark, SF)
    q = sql(
        spark,
        """
        SELECT n.n_name, c.c_custkey
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0
        """,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the SQL surface inherits the same physical strategy: dimension
    # broadcast + predicate pushed into the parquet scan
    assert "BroadcastHashJoin" in plan
    assert "GreaterThan(c_acctbal,0" in plan


def test_sql_view_layer_adds_no_plan_nodes(spark):
    register_views(spark, SF)
    via_view = sql(spark, "SELECT l_orderkey FROM lineitem WHERE l_orderkey = 1")
    direct = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_orderkey") == 1)
        .select("l_orderkey")
    )
    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # strip plan ids, which differ run to run
        return [
            line.split("(")[0]
            for line in buf.getvalue().splitlines()
            if line.startswith(("*", "+-", "   +-"))
        ]
    assert plan_of(via_view) == plan_of(direct)
    assert _rows(via_view) == _rows(direct)
