"""Streaming rendition agrees with the batch pipeline.

Replays dataset_15 through Structured Streaming (one micro-batch per day
file via maxFilesPerTrigger=1 with ascending mtimes, Trigger.AvailableNow)
and asserts the stateful depletion produces exactly the batch engine's
fulfilled quantities in timestamp order — i.e. cross-micro-batch state
carryover == cross-day carryover.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.retail import (
    explode_transactions,
    process_lines,
)
from retail_data_pipeline_and_forecasting_system_spark.sources import (
    read_products_csv,
    read_transactions_json,
)
from retail_data_pipeline_and_forecasting_system_spark.streaming import (
    run_available_now,
)

DATASET = Path("/root/reference/data/dataset_15")


def test_streaming_matches_batch(spark, tmp_path):
    # stage input files with ascending mtimes so the file source's
    # modification-time ordering == business-day ordering
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, f in enumerate(sorted(DATASET.glob("transactions_*.json"))):
        dst = in_dir / f.name
        shutil.copy(f, dst)
        ts = time.time() - 1000 + i
        os.utime(dst, (ts, ts))

    products = read_products_csv(spark, str(DATASET / "products.csv"))
    stock = {
        r["product_id"]: r["stock"]
        for r in products.select("product_id", "stock").collect()
    }

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(spark, str(in_dir / "*.json"), stock, ckpt, out_dir)

    streamed = (
        spark.read.parquet(out_dir)
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )

    raw = read_transactions_json(spark, str(DATASET / "transactions_*.json"))
    batch = (
        process_lines(
            explode_transactions(raw), products, process_order="timestamp"
        )
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )

    assert len(streamed) == len(batch) == 27652
    diffs = {k for k in batch if streamed.get(k) != batch[k]}
    assert not diffs, f"{len(diffs)} mismatching lines, e.g. {sorted(diffs)[:5]}"


def test_transform_with_state_matches_batch(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas rendition (typed state
    handles + DISTRIBUTED initial state) produces exactly the batch
    engine's fulfilled quantities — state-v2 twin of
    test_streaming_matches_batch, on a 3-day replay.

    Requires protobuf (the state-v2 Python worker speaks proto to the
    JVM state server); absent from this container, so the test skips —
    the applyInPandasWithState twin above carries the parity proof."""
    pytest.importorskip(
        "google.protobuf", reason="transformWithState needs protobuf"
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming.inventory_stream import (
        read_transaction_stream,
        streaming_depletion_tws,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    days = sorted(DATASET.glob("transactions_*.json"))[:3]
    for i, f in enumerate(days):
        dst = in_dir / f.name
        shutil.copy(f, dst)
        ts = time.time() - 1000 + i
        os.utime(dst, (ts, ts))

    products = read_products_csv(spark, str(DATASET / "products.csv"))
    initial = products.select(
        "product_id", F.col("stock").cast("int").alias("stock")
    )

    lines = read_transaction_stream(
        spark, str(in_dir / "*.json"), max_files_per_trigger=1
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # transformWithState requires the RocksDB state store
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            streaming_depletion_tws(lines, initial)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )

    streamed = (
        spark.read.parquet(out_dir)
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )

    names = " ".join(f.name for f in days)
    raw = read_transactions_json(
        spark, str(in_dir / "*.json")
    )
    batch = (
        process_lines(
            explode_transactions(raw), products, process_order="timestamp"
        )
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )
    assert len(streamed) == len(batch) > 0, names
    diffs = {k for k in batch if streamed.get(k) != batch[k]}
    assert not diffs, f"{len(diffs)} mismatching lines, e.g. {sorted(diffs)[:5]}"


def test_streaming_matches_batch_when_groups_span_arrow_chunks(
    spark, tmp_path
):
    """Regression: Spark hands applyInPandasWithState one group as MULTIPLE
    Arrow chunks (default ~10k rows). The fold must concat + sort the whole
    group before folding — sorting each chunk independently silently breaks
    batch/stream parity. Force multi-chunk delivery with a tiny Arrow batch
    size (each product has ~80 lines/day -> ~6 chunks at 16 rows)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    day = sorted(DATASET.glob("transactions_*.json"))[0]
    shutil.copy(day, in_dir / day.name)

    products = read_products_csv(spark, str(DATASET / "products.csv"))
    stock = {
        r["product_id"]: r["stock"]
        for r in products.select("product_id", "stock").collect()
    }

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        run_available_now(spark, str(in_dir / "*.json"), stock, ckpt, out_dir)
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    streamed = (
        spark.read.parquet(out_dir)
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )
    raw = read_transactions_json(spark, str(in_dir / "*.json"))
    batch = (
        process_lines(
            explode_transactions(raw), products, process_order="timestamp"
        )
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )
    assert len(streamed) == len(batch) > 0
    diffs = {k for k in batch if streamed.get(k) != batch[k]}
    assert not diffs, f"{len(diffs)} mismatching lines, e.g. {sorted(diffs)[:5]}"


def test_streaming_daily_summary_matches_batch(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        read_transaction_stream,
        streaming_daily_summary,
    )

    in_dir = tmp_path / "agg_in"
    in_dir.mkdir()
    for f in sorted(DATASET.glob("transactions_*.json")):
        shutil.copy(f, in_dir / f.name)

    lines = read_transaction_stream(spark, str(in_dir / "*.json"))
    q = (
        streaming_daily_summary(lines)
        .writeStream.format("memory")
        .queryName("daily_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["date"].isoformat(): (r["units"], r["n_lines"])
        for r in spark.sql("SELECT * FROM daily_mem").collect()
    }

    batch = (
        explode_transactions(read_transactions_json(spark, str(in_dir / "*.json")))
        .filter(F.col("qty").isNotNull())
        .groupBy(F.to_date("timestamp").alias("date"))
        .agg(F.sum("qty").alias("units"), F.count(F.lit(1)).alias("n_lines"))
    )
    want = {
        r["date"].isoformat(): (r["units"], r["n_lines"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 10  # one window per business day


def test_streaming_dedup_drops_replayed_file(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        read_transaction_stream,
        streaming_dedup,
    )

    in_dir = tmp_path / "dedup_in"
    in_dir.mkdir()
    src = sorted(DATASET.glob("transactions_*.json"))[0]
    # the same day's data arrives twice (a replayed ingest)
    shutil.copy(src, in_dir / "a.json")
    shutil.copy(src, in_dir / "b.json")

    lines = read_transaction_stream(spark, str(in_dir / "*.json"))
    deduped = streaming_dedup(
        lines, keys=["transaction_id", "line_pos"], watermark="2 days"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_dedup = spark.sql("SELECT count(*) AS n FROM dedup_mem").head()["n"]

    one_file = (
        explode_transactions(
            read_transactions_json(spark, str(in_dir / "a.json"))
        )
        .filter(F.col("qty").isNotNull())
        .count()
    )
    assert n_dedup == one_file  # duplicates from the replay are gone


def test_streaming_sessionize_matches_batch_gap_sessions(spark, tmp_path):
    """session_window sessions == batch lag/cumsum sessions per user."""
    from retail_data_pipeline_and_forecasting_system_spark.streaming.aggregates import (
        streaming_sessionize,
    )

    # events table via a file stream (parquet source, single batch)
    src = "/root/testdata/sf0.001/events.parquet"
    ev_dir = tmp_path / "ev"
    ev_dir.mkdir()
    shutil.copy(
        sorted(Path(src).glob("*") if Path(src).is_dir() else [Path(src)])[0],
        ev_dir / "events.parquet",
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_df = spark.read.parquet(str(ev_dir / "events.parquet"))
    # ts is int64-nanos in some testdata generations, TIMESTAMP(MICROS)
    # in others — normalize exactly like plans.analytics._t
    if dict(batch_df.dtypes)["ts"] == "bigint":
        # `ts div 1000` exactly like _t: float division of epoch nanos
        # loses microseconds above 2^53
        ts_norm = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts_norm = F.col("ts").cast("timestamp")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(str(ev_dir))
        .withColumn("ts", ts_norm)
    )
    q = (
        streaming_sessionize(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"],): r["n"]
        for r in spark.sql(
            "SELECT user_id, count(*) AS n FROM sess_mem GROUP BY user_id"
        ).collect()
    }

    # batch twin: count 30-min-gap sessions per user
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
    )

    batch = QUERIES["e2_sessionize"].fn(spark, "/root/testdata/sf0.001")
    want = {(r["user_id"],): r["n_sessions"] for r in batch.collect()}
    assert got == want


def test_stream_static_enrichment_matches_batch_join(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        read_transaction_stream,
        streaming_enrich_static,
    )

    in_dir = tmp_path / "enrich_in"
    in_dir.mkdir()
    for f in sorted(DATASET.glob("transactions_*.json")):
        shutil.copy(f, in_dir / f.name)
    products = read_products_csv(spark, str(DATASET / "products.csv")).select(
        "product_id", "sales_price"
    )

    lines = read_transaction_stream(spark, str(in_dir / "*.json")).filter(
        F.col("qty").isNotNull()
    )
    q = (
        streaming_enrich_static(lines, products, key="product_id")
        .writeStream.format("memory")
        .queryName("enrich_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        """SELECT product_id, count(*) AS n,
           CAST(SUM(CAST(sales_price AS DECIMAL(18,2)) * qty) AS DOUBLE) AS rev
           FROM enrich_mem GROUP BY product_id"""
    ).collect()

    batch = (
        explode_transactions(read_transactions_json(spark, str(in_dir / "*.json")))
        .filter(F.col("qty").isNotNull())
        .join(products, "product_id")
        .groupBy("product_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("sales_price").cast("decimal(18,2)") * F.col("qty"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    )
    as_map = lambda rows: {r["product_id"]: (r["n"], r["rev"]) for r in rows}
    assert as_map(got) == as_map(batch)
    assert len(got) == 36  # every product enriched


def test_restart_from_checkpoint_resumes_state_and_skips_processed(
    spark, tmp_path
):
    """Two runs against one checkpoint: days 1-5, stop, days 6-10 arrive,
    restart. The second run must (a) NOT reprocess days 1-5 — their
    output rows are already committed — and (b) resume depletion state,
    so the union of both runs' output equals the one-shot batch result."""
    files = sorted(DATASET.glob("transactions_*.json"))
    in_dir = tmp_path / "rs_in"
    in_dir.mkdir()
    out_dir, ckpt = str(tmp_path / "rs_out"), str(tmp_path / "rs_ckpt")

    products = read_products_csv(spark, str(DATASET / "products.csv"))
    stock = {
        r["product_id"]: r["stock"]
        for r in products.select("product_id", "stock").collect()
    }

    def stage(batch_files, t0):
        for i, f in enumerate(batch_files):
            dst = in_dir / f.name
            shutil.copy(f, dst)
            ts = t0 + i
            os.utime(dst, (ts, ts))

    stage(files[:5], time.time() - 2000)
    run_available_now(spark, str(in_dir / "*.json"), stock, ckpt, out_dir)
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    first_days = {
        r["d"] for r in first.select(F.to_date("timestamp").alias("d")).distinct().collect()
    }
    assert len(first_days) == 5  # only the staged days

    stage(files[5:], time.time() - 1000)
    run_available_now(spark, str(in_dir / "*.json"), stock, ckpt, out_dir)

    streamed = (
        spark.read.parquet(out_dir)
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )
    raw = read_transactions_json(spark, str(DATASET / "transactions_*.json"))
    batch = (
        process_lines(
            explode_transactions(raw), products, process_order="timestamp"
        )
        .select("transaction_id", "product_id", "line_pos", "quantity")
        .toPandas()
        .set_index(["transaction_id", "product_id", "line_pos"])["quantity"]
        .to_dict()
    )
    assert len(streamed) == len(batch) == 27652
    # no reprocessing: RAW output row count (before key collapse) equals
    # the batch line count — replayed days would appear as extra rows
    assert spark.read.parquet(out_dir).count() == 27652
    assert 0 < n_first < 27652
    diffs = {k for k in batch if streamed.get(k) != batch[k]}
    assert not diffs, f"{len(diffs)} mismatching lines, e.g. {sorted(diffs)[:5]}"


def test_stream_stream_funnel_matches_batch(spark, tmp_path):
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
        _t,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        streaming_funnel_join,
    )

    sf = "/root/testdata/sf0.001"
    # stage the (micro-)event log as a file stream source
    ev_dir = str(tmp_path / "ev_stream")
    _t(spark, sf, "events").write.parquet(ev_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(ev_dir).schema
    ).parquet(ev_dir)

    q = (
        streaming_funnel_join(stream)
        .writeStream.format("memory")
        .queryName("funnel_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_conversions"])
        for r in spark.sql(
            "SELECT user_id, count(*) AS n_conversions FROM funnel_mem "
            "GROUP BY user_id"
        ).collect()
    }
    want = {
        (r["user_id"], r["n_conversions"])
        for r in QUERIES["j7_funnel"].fn(spark, sf).collect()
    }
    assert got == want and len(got) > 0


def test_idempotent_sink_replay_does_not_duplicate(spark, tmp_path):
    """Simulate the crash-replay an at-least-once checkpoint produces: run
    the same stream TWICE against the same output dir with a FRESH
    checkpoint (so every epoch replays). The per-epoch dynamic partition
    overwrite must converge to the same rows, not append duplicates."""
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        idempotent_parquet_sink,
        read_transaction_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for day in sorted(DATASET.glob("transactions_*.json"))[:2]:
        shutil.copy(day, in_dir / day.name)
    out_dir = str(tmp_path / "out")

    def run(ckpt: str) -> None:
        lines = read_transaction_stream(spark, str(in_dir / "*.json")).select(
            "transaction_id", "product_id", "line_pos", "qty"
        )
        (
            lines.writeStream.foreachBatch(idempotent_parquet_sink(out_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run(str(tmp_path / "ckpt1"))
    # materialize eagerly: the replay below rewrites the same files
    a = {
        tuple(r)
        for r in spark.read.parquet(out_dir).drop("batch_id").collect()
    }
    assert len(a) > 0
    # replay everything: fresh checkpoint, same sink dir
    run(str(tmp_path / "ckpt2"))
    second = spark.read.parquet(out_dir)
    b = {tuple(r) for r in second.drop("batch_id").collect()}
    assert second.count() == len(a)
    assert a == b


def test_streaming_quarantine_routes_and_converges(spark, tmp_path):
    """The streaming data-quality gate: clean/quarantine routing must (a)
    partition every arriving row exactly once, (b) equal the batch-mode
    split over the same data, and (c) converge — not duplicate — when
    every epoch replays against a fresh checkpoint."""
    from retail_data_pipeline_and_forecasting_system_spark.operators import (
        quality as Q,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        quarantine_parquet_sink,
        read_transaction_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for day in sorted(DATASET.glob("transactions_*.json"))[:2]:
        shutil.copy(day, in_dir / day.name)
    clean_dir, bad_dir = str(tmp_path / "clean"), str(tmp_path / "bad")

    # qty range chosen to actually reject rows in this dataset
    rules = [
        Q.not_null("qty"),
        Q.in_range("qty", 1, 3),
    ]

    def run(ckpt: str) -> None:
        lines = read_transaction_stream(spark, str(in_dir / "*.json")).select(
            "transaction_id", "product_id", "line_pos", "qty"
        )
        (
            lines.writeStream.foreachBatch(
                quarantine_parquet_sink(clean_dir, bad_dir, rules)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run(str(tmp_path / "ckpt1"))
    clean = spark.read.parquet(clean_dir).drop("batch_id")
    bad = spark.read.parquet(bad_dir).drop("batch_id")
    n_clean, n_bad = clean.count(), bad.count()
    assert n_bad > 0, "rules must reject something for this test to bite"
    assert "violated" in bad.columns and "violated" not in clean.columns

    # equals the batch-mode split of the same files
    batch = read_transactions_json(spark, str(in_dir / "*.json"))
    from retail_data_pipeline_and_forecasting_system_spark.plans.retail import (
        explode_transactions,
    )

    batch_lines = (
        explode_transactions(batch)
        .select("transaction_id", "product_id", "line_pos", "qty")
        # read_transaction_stream drops cancelled (null-qty) lines at the
        # source; mirror it so the splits compare over the same rows
        .filter(F.col("qty").isNotNull())
    )
    b_clean, b_bad = Q.split_by_expectations(batch_lines, rules)
    assert n_clean + n_bad == batch_lines.count()
    assert n_clean == b_clean.count() and n_bad == b_bad.count()
    assert {tuple(r) for r in bad.collect()} == {
        tuple(r) for r in b_bad.collect()
    }

    # full replay with a fresh checkpoint: both sides converge
    run(str(tmp_path / "ckpt2"))
    assert spark.read.parquet(clean_dir).count() == n_clean
    assert spark.read.parquet(bad_dir).count() == n_bad

    # round-3 ADVICE: the sink must not leave the session pinned to
    # 'dynamic' when partitionOverwriteMode was UNSET before the batch
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        is None
    ), "sink leaked partitionOverwriteMode=dynamic into the session"


def test_streaming_transitions_match_batch_markov(spark, tmp_path):
    """Per-user transition extraction with cross-micro-batch state: a
    3-slice time-ordered replay of the events table yields exactly the
    batch e8 lead-window's transition counts — the boundary transition
    between slices comes from carried state."""
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
        _t,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming.aggregates import (
        streaming_transitions,
    )

    ev = _t(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    # 3 time slices with ascending mtimes -> 3 micro-batches in order
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    bounds = ev.selectExpr(
        "percentile(cast(ts as long), array(0.33, 0.66)) AS b"
    ).head()["b"]
    slices = [
        ev.filter(F.col("ts").cast("long") <= bounds[0]),
        ev.filter(
            (F.col("ts").cast("long") > bounds[0])
            & (F.col("ts").cast("long") <= bounds[1])
        ),
        ev.filter(F.col("ts").cast("long") > bounds[1]),
    ]
    for i, sl in enumerate(slices):
        p = in_dir / f"slice_{i}.parquet"
        sl.coalesce(1).write.mode("overwrite").parquet(str(p))
        ts = time.time() - 100 + i
        os.utime(p, (ts, ts))
        for f in Path(p).glob("*"):
            os.utime(f, (ts, ts))

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(in_dir / "*.parquet"))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_transitions(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()

    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.read.parquet(out_dir)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in QUERIES["e8_markov_transitions"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want


def test_streaming_ohlc_matches_batch(spark, tmp_path):
    """streaming_ohlc_bars over the real events table (replayed as a
    file stream) produces exactly the batch h7_ohlc_bars rows — the
    algebraic min_by/max_by state must survive micro-batch merging,
    including the open-tie broken by event_id."""
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
        _t,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        streaming_ohlc_bars,
    )

    # normalize the driver testdata's ts encoding (nanos vs micros)
    # through the batch loader, then restage as a clean parquet dir
    in_dir = tmp_path / "events.parquet"
    ev = _t(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.parquet(str(in_dir))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(str(in_dir))
    )
    q = (
        streaming_ohlc_bars(stream)
        .writeStream.format("memory")
        .queryName("ohlc_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    key = ["event_type", "bucket_start"]
    got = {
        tuple(str(r[k]) for k in key): (
            r["n_points"], r["open_v"], r["high_v"], r["low_v"], r["close_v"]
        )
        for r in spark.sql("SELECT * FROM ohlc_mem").collect()
    }
    want = {
        tuple(str(r[k]) for k in key): (
            r["n_points"], r["open_v"], r["high_v"], r["low_v"], r["close_v"]
        )
        for r in QUERIES["h7_ohlc_bars"].fn(spark, str(tmp_path)).collect()
    }
    assert got == want and len(got) > 50


def test_streaming_attribution_matches_batch_e9(spark, tmp_path):
    """Last-touch attribution with cross-micro-batch state: a 3-slice
    time-ordered replay of the events table yields exactly the batch
    e9 window pair's output — carried state supplies the cross-slice
    last touch AND the range-frame touch count (ties never split
    slices: the percentile bounds cut between distinct timestamps)."""
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
        _t,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming.aggregates import (
        streaming_attribution,
    )

    ev = _t(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    bounds = ev.selectExpr(
        "percentile(cast(ts as long), array(0.33, 0.66)) AS b"
    ).head()["b"]
    slices = [
        ev.filter(F.col("ts").cast("long") <= bounds[0]),
        ev.filter(
            (F.col("ts").cast("long") > bounds[0])
            & (F.col("ts").cast("long") <= bounds[1])
        ),
        ev.filter(F.col("ts").cast("long") > bounds[1]),
    ]
    for i, sl in enumerate(slices):
        p = in_dir / f"slice_{i}.parquet"
        sl.coalesce(1).write.mode("overwrite").parquet(str(p))
        ts = time.time() - 100 + i
        os.utime(p, (ts, ts))
        for f in Path(p).glob("*"):
            os.utime(f, (ts, ts))

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(in_dir / "*.parquet"))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_attribution(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()

    cols = ["last_touch_type", "last_touch_id", "us_since_touch",
            "n_touches_7d"]
    got = {
        r["event_id"]: tuple(r[c] for c in cols)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["event_id"]: tuple(r[c] for c in cols)
        for r in QUERIES["e9_attribution"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert got == want
