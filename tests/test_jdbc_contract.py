"""JDBC source/sink contract test against embedded Derby (ships with Spark).

The reference's production path is MySQL (src/data_processor.py:98-222);
no database service exists in this container, but the JDBC code path —
DataFrameWriter.jdbc batching, type mapping, overwrite semantics,
partitioned reads — is database-agnostic, so an embedded Derby round trip
exercises the same reader/writer code the MySQL deployment would run.
"""

from __future__ import annotations

import pytest

from retail_data_pipeline_and_forecasting_system_spark.sources.readers import (
    read_table_jdbc,
)
from retail_data_pipeline_and_forecasting_system_spark.sources.writers import (
    write_table_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "contractdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_round_trip_preserves_rows_and_types(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id bigint, name string, score double",
    )
    write_table_jdbc(
        df, derby_url, "t_contract", user="app", password="", driver=DRIVER
    )
    back = read_table_jdbc(
        spark, derby_url, "t_contract", user="app", password="", driver=DRIVER
    )
    got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
    assert got == [(i, f"name_{i}", i * 1.5) for i in range(100)]
    assert dict(back.dtypes) == {
        "id": "bigint", "name": "string", "score": "double"
    }


def test_jdbc_overwrite_replaces_not_appends(spark, derby_url):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    df2 = spark.createDataFrame([(3, "c")], "id bigint, v string")
    for df in (df1, df2):
        write_table_jdbc(
            df, derby_url, "t_overwrite", user="app", password="", driver=DRIVER
        )
    back = read_table_jdbc(
        spark, derby_url, "t_overwrite", user="app", password="", driver=DRIVER
    )
    assert [(r["id"], r["v"]) for r in back.collect()] == [(3, "c")]


def test_jdbc_partitioned_read_covers_all_rows(spark, derby_url):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], "id bigint, bucket int"
    )
    write_table_jdbc(
        df, derby_url, "t_part", user="app", password="", driver=DRIVER
    )
    back = read_table_jdbc(
        spark,
        derby_url,
        "t_part",
        user="app",
        password="",
        driver=DRIVER,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1000,
    )
    # 4 parallel range partitions, together exactly the full table
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(1000))
