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


def test_streaming_jdbc_sink_is_replay_idempotent(spark, derby_url, tmp_path):
    """The foreachBatch JDBC sink converges under micro-batch replay:
    running a rate-limited file stream, then re-invoking the sink with
    the SAME epoch (what Structured Streaming does after a crash before
    checkpoint commit) leaves the table unchanged."""
    from pyspark.sql import functions as F

    from retail_data_pipeline_and_forecasting_system_spark.streaming.sinks import (
        idempotent_jdbc_sink,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1).write.mode("overwrite").parquet(
            str(in_dir / f"f{i}.parquet")
        )

    sink = idempotent_jdbc_sink(
        derby_url, "t_stream", user="app", password="", driver=DRIVER
    )
    schema = "id bigint, v bigint"
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(in_dir / "*.parquet"))
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = read_table_jdbc(
        spark, derby_url, "t_stream", user="app", password="", driver=DRIVER
    )
    first = sorted((r["id"], r["v"], r["batch_id"]) for r in back.collect())
    assert len(first) == 30
    n_epochs = len({r[2] for r in first})
    assert n_epochs >= 2  # maxFilesPerTrigger=1 -> one epoch per file

    # simulate the crash-replay: re-deliver one epoch's exact batch
    replay_epoch = first[0][2]
    replay_rows = [(i, v) for i, v, b in first if b == replay_epoch]
    replay_df = spark.createDataFrame(replay_rows, schema)
    sink(replay_df, replay_epoch)
    again = sorted(
        (r["id"], r["v"], r["batch_id"])
        for r in read_table_jdbc(
            spark, derby_url, "t_stream", user="app", password="",
            driver=DRIVER,
        ).collect()
    )
    assert again == first  # converged, no duplicates
