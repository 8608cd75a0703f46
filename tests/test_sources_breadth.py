"""Source/sink breadth: ORC round-trip with pushdown, robust JSON split."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_data_pipeline_and_forecasting_system_spark.sources.readers import (
    read_json_robust,
)
from retail_data_pipeline_and_forecasting_system_spark.sources.writers import (
    read_orc,
    write_orc,
)


def test_orc_roundtrip_preserves_data_and_pushes_filters(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.count() == li.count()
    assert back.schema == li.schema

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("l_orderkey") == 7).select("l_partkey").explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,7)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_robust_json_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.json").write_text('{"a": 1}\n{"a": 2\n{"a": 3}\nnot json at all\n')
    schema = T.StructType([T.StructField("a", T.IntegerType(), True)])
    good, corrupt = read_json_robust(spark, str(p), schema)
    assert sorted(r["a"] for r in good.collect()) == [1, 3]
    raws = [r["raw"] for r in corrupt.collect()]
    assert len(raws) == 2 and '{"a": 2' in raws


def test_partitioned_parquet_scan_prunes_partitions(spark, tmp_path):
    """A date filter over partitionBy('d') parquet must become a partition
    filter — the scan lists one directory, not all of them."""
    from retail_data_pipeline_and_forecasting_system_spark.sources.writers import (
        write_partitioned_parquet,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df = orders.withColumn("d", F.to_date("o_orderdate"))
    path = str(tmp_path / "orders_by_day")
    write_partitioned_parquet(df, path, partition_by=["d"])

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("d") == "1996-03-04")

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "1996-03-04" in plan
    # pruned read touches exactly the one day's rows
    want = df.filter(F.col("d") == "1996-03-04").count()
    assert one_day.count() == want > 0


def test_evolving_schema_parquet_merges_columns(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        read_parquet_evolving,
    )

    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    old.write.parquet(str(tmp_path / "evo" / "d=2024-01-01"))
    new.write.parquet(str(tmp_path / "evo" / "d=2024-01-02"))

    got = read_parquet_evolving(spark, str(tmp_path / "evo"))
    assert set(got.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["score"] is None  # old file: added column nulls
    assert rows[2]["score"] == 9.5


def test_compact_partition_collapses_small_files(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        compact_partition,
    )

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(24).write.parquet(path)  # the small-files problem
    import glob as _g

    assert len(_g.glob(path + "/part-*.parquet")) == 24
    n_files = compact_partition(spark, path, target_files=2)
    assert n_files == 2
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))


def test_with_lineage_attaches_source_file(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        with_lineage,
    )

    for d in ("a", "b"):
        spark.range(5).coalesce(1).write.parquet(str(tmp_path / "lin" / d))
    got = with_lineage(spark.read.parquet(str(tmp_path / "lin" / "*")))
    per_file = {
        r["_source_file"]: r["n"]
        for r in got.groupBy("_source_file").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_file) == 2 and all(v == 5 for v in per_file.values())
    assert got.schema["_source_mtime"].dataType.typeName() == "timestamp"


def test_python_datasource_generator_is_deterministic_and_parallel(spark):
    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    read = (
        lambda parts: spark.read.format("synthetic_events")
        .option("num_partitions", parts)
        .option("rows_per_partition", 500)
        .load()
    )
    df = read(4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 2000
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, read(4).collect()))
    assert a == b  # rerun-identical
    # content is a function of global row id — invariant to partitioning
    half = sorted(map(tuple, read(2).collect()))
    assert half == [t for t in a if t[0] < 1000]
    types = {r["event_type"] for r in df.collect()}
    assert types <= {"view", "click", "purchase", "signup", "error"}


def test_zorder_layout_tightens_per_file_bounds(spark, tmp_path):
    """write_zordered gives each file a small bounding box in BOTH
    cluster dimensions (the data-skipping property), vs a naive write
    whose files span ~the full range of the non-leading column."""
    from retail_data_pipeline_and_forecasting_system_spark.sources.writers import (
        write_zordered,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    naive, zord = str(tmp_path / "naive"), str(tmp_path / "zord")
    li.repartition(8).write.parquet(naive)
    write_zordered(li, zord, ("l_partkey", "l_suppkey"), num_files=8)

    def mean_box_area(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("sa"),
                (F.max("l_suppkey") - F.min("l_suppkey")).alias("sb"),
            )
        )
        rows = per_file.collect()
        return sum(r["sa"] * r["sb"] for r in rows) / len(rows)

    back = spark.read.parquet(zord)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    # z-ordered files cover small squares; naive files cover ~everything
    assert mean_box_area(zord) < 0.5 * mean_box_area(naive)


def test_versioned_table_snapshot_isolation(spark, tmp_path):
    """Time travel + snapshot pinning: a reader resolved before a commit
    keeps its exact snapshot; version numbers never get reused."""
    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        current_version,
        list_versions,
        read_version,
        write_version,
    )

    tdir = str(tmp_path / "corpus")
    v1 = write_version(spark.range(0, 100).withColumnRenamed("id", "doc"), tdir)
    assert (v1, current_version(tdir)) == (1, 1)

    pinned = read_version(spark, tdir)  # resolves _latest ONCE -> v1
    v2 = write_version(spark.range(0, 250).withColumnRenamed("id", "doc"), tdir)
    assert (v2, current_version(tdir)) == (2, 2)

    # the pre-commit reader still sees v1 even though latest moved on
    assert pinned.count() == 100
    assert read_version(spark, tdir).count() == 250
    assert read_version(spark, tdir, version=1).count() == 100
    assert list_versions(tdir) == [1, 2]

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_version(spark, tdir, version=99)


def test_versioned_table_crash_recovery_and_vacuum(spark, tmp_path):
    """A stranded staging dir is invisible to readers, never reuses a
    version number, and vacuum clears it while keeping current."""
    import os

    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        current_version,
        list_versions,
        read_version,
        vacuum_versions,
        write_version,
    )

    tdir = str(tmp_path / "corpus")
    write_version(spark.range(10).withColumnRenamed("id", "doc"), tdir)
    write_version(spark.range(20).withColumnRenamed("id", "doc"), tdir)

    # simulate a crashed writer: staging dir exists, _latest untouched
    os.makedirs(os.path.join(tdir, "_staging_v=3"))
    assert current_version(tdir) == 2
    assert list_versions(tdir) == [1, 2]
    assert read_version(spark, tdir).count() == 20

    # next commit skips past the orphan (no version reuse)
    v = write_version(spark.range(30).withColumnRenamed("id", "doc"), tdir)
    assert v == 4 and read_version(spark, tdir).count() == 30

    dropped = vacuum_versions(tdir, keep=1)
    assert dropped == [1, 2]
    assert list_versions(tdir) == [4]
    assert not any(n.startswith("_staging") for n in os.listdir(tdir))
    assert read_version(spark, tdir).count() == 30


def test_vacuum_never_drops_the_version_latest_points_to(spark, tmp_path):
    """Crash between the v-dir rename and the manifest flip leaves a
    committed-looking dir NEWER than _latest; vacuum's newest-N window
    must still keep the version _latest resolves to."""
    import os
    import shutil as sh

    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        current_version,
        read_version,
        vacuum_versions,
        write_version,
    )

    tdir = str(tmp_path / "corpus")
    write_version(spark.range(10).withColumnRenamed("id", "doc"), tdir)
    write_version(spark.range(20).withColumnRenamed("id", "doc"), tdir)
    # simulate the crash: v=3 exists on disk but _latest still says 2
    sh.copytree(os.path.join(tdir, "v=2"), os.path.join(tdir, "v=3"))
    assert current_version(tdir) == 2

    dropped = vacuum_versions(tdir, keep=1)
    assert dropped == [1]  # current kept; orphan not counted in window
    assert read_version(spark, tdir).count() == 20
    # the uncommitted orphan is left alone (write_version skips past it)
    assert os.path.isdir(os.path.join(tdir, "v=3"))


def test_write_with_metrics_observes_the_write_pass(spark, tmp_path):
    """Dataset.observe rides the write job: the returned metrics must
    equal an independent aggregation of what landed on disk — computed
    WITHOUT a second scan of the input."""
    from pyspark.sql import functions as F

    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        write_with_metrics,
    )

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("v"),
    )
    out = str(tmp_path / "observed")
    got = write_with_metrics(
        df,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.lit(1)) - F.count("v"),
            "sum_id": F.sum("id"),
        },
    )
    back = spark.read.parquet(out)
    assert got["n_rows"] == back.count() == 1000
    assert got["n_null_v"] == back.filter(F.col("v").isNull()).count() == 100
    assert got["sum_id"] == 999 * 1000 // 2


def test_write_with_metrics_rejects_empty_metrics(spark, tmp_path):
    """An empty metrics dict is a caller bug (use a plain write) — the
    error must be a clear ValueError, not a bare IndexError from
    named[0]."""
    import pytest

    from retail_data_pipeline_and_forecasting_system_spark.sources import (
        write_with_metrics,
    )

    with pytest.raises(ValueError, match="metrics must be non-empty"):
        write_with_metrics(spark.range(3), str(tmp_path / "nope"), {})
