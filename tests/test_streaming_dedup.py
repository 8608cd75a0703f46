"""Streaming corpus ingestion through the incremental dedup gate.

Replays a 3-file document feed one epoch per file and asserts the gate's
verdicts and the accepted corpus match the sequential incremental-dedup
semantics (each epoch checked against everything previously accepted,
never corpus x corpus); then re-runs an epoch's foreachBatch function
directly to prove crash-replay convergence (same verdicts, same corpus,
no duplicate admissions).
"""

from __future__ import annotations

import json
import os
import time

import pytest

from retail_data_pipeline_and_forecasting_system_spark.streaming import (
    incremental_dedup_sink,
    run_dedup_ingest,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy cat again and again today"
FAR = "completely different words appear within this other document here now"
FAR_NEAR = "completely different words appear within this other document here soon"


def _write_feed(in_dir):
    in_dir.mkdir()
    days = [
        [(1, BASE), (2, FAR)],
        [(3, BASE), (4, NEAR), (5, "unrelated fresh content sits in this entirely new fifth document body")],
        [(6, "unrelated fresh content sits in this entirely new fifth document frame")],
    ]
    for i, docs in enumerate(days):
        p = in_dir / f"day_{i}.json"
        p.write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in docs)
        )
        ts = time.time() - 1000 + i
        os.utime(p, (ts, ts))


def test_dedup_ingest_gates_stream(spark, tmp_path):
    _write_feed(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    run_dedup_ingest(
        spark,
        str(tmp_path / "in" / "*.json"),
        corpus_dir,
        verdicts_dir,
        str(tmp_path / "ckpt"),
        threshold=0.2,
    )

    verdicts = {
        r["doc_id"]: (r["status"], r["match_id"], r["batch_id"])
        for r in spark.read.parquet(verdicts_dir).collect()
    }
    assert verdicts[1] == ("unique", None, 0)
    assert verdicts[2] == ("unique", None, 0)
    assert verdicts[3] == ("exact", 1, 1)  # byte-identical to accepted 1
    assert verdicts[4] == ("near", 1, 1)  # near-dup of accepted 1
    assert verdicts[5][0] == "unique"
    assert verdicts[6] == ("near", 5, 2)  # near-dup of epoch-1-accepted 5
    # only unique docs joined the corpus
    corpus = {
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    }
    assert corpus == {1, 2, 5}


def test_streaming_histogram_quantiles_matches_reference(spark, tmp_path):
    """Windowed sketch quantiles on a stream: two micro-batches (the
    second delivers late rows into the first hour's window, inside the
    watermark) must produce per-window p50/p95 equal to a brute-force
    Python implementation of the same fixed-bucket estimator, and equal
    to the batch twin (same function over the static frame)."""
    import pandas as pd

    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        streaming_histogram_quantiles,
    )

    lo, hi, nb = 0.0, 100.0, 20
    rows1 = [
        (1, "2024-03-01T10:05:00", 7.3),
        (2, "2024-03-01T10:15:00", 55.1),
        (3, "2024-03-01T10:45:00", 98.6),
        (4, "2024-03-01T11:10:00", 22.2),
    ]
    rows2 = [
        (5, "2024-03-01T10:20:00", 41.9),  # late into the 10:00 window
        (6, "2024-03-01T11:30:00", 63.4),
        (7, "2024-03-01T12:01:00", 5.5),
    ]
    for i, rows in enumerate((rows1, rows2)):
        p = tmp_path / f"ev_{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"event_id": e, "ts": ts, "value": v})
                for e, ts, v in rows
            )
        )
        t = time.time() - 100 + i
        os.utime(p, (t, t))

    schema = "event_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "ev_*.json"))
    )
    q = streaming_histogram_quantiles(
        stream, "value", lo, hi, n_buckets=nb, quantiles=(0.5, 0.95),
        window="1 hour",
    )
    (
        q.writeStream.format("memory")
        .queryName("shq")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        str(r["window_start"]): (r["n"], r["p50"], r["p95"])
        for r in spark.sql("SELECT * FROM shq").collect()
    }

    def ref_est(vals, frac):
        width = (hi - lo) / nb
        hist = [0] * nb
        for v in vals:
            hist[min(max(int((v - lo) // width), 0), nb - 1)] += 1
        rank, cum = frac * len(vals), 0
        for b, c in enumerate(hist):
            if c and cum + c >= rank:
                return lo + width * (b + (rank - cum) / c)
            cum += c

    by_hour = {}
    for _, ts, v in rows1 + rows2:
        by_hour.setdefault(ts[:13], []).append(v)
    assert len(got) == len(by_hour) == 3
    for hour, vals in by_hour.items():
        start = f"{hour.replace('T', ' ')}:00:00"
        n, p50, p95 = got[start]
        assert n == len(vals)
        assert p50 == pytest.approx(ref_est(vals, 0.5), rel=1e-9)
        assert p95 == pytest.approx(ref_est(vals, 0.95), rel=1e-9)

    # batch twin: the same function over the static frame (the watermark
    # is a no-op in batch) must produce identical rows
    static = spark.read.schema(schema).json(str(tmp_path / "ev_*.json"))
    batch = {
        str(r["window_start"]): (r["n"], r["p50"], r["p95"])
        for r in streaming_histogram_quantiles(
            static, "value", lo, hi, n_buckets=nb, quantiles=(0.5, 0.95),
            window="1 hour",
        ).collect()
    }
    assert batch == got


def test_dedup_ingest_restart_processes_only_new_files(spark, tmp_path):
    """Checkpoint restart: a second AvailableNow run with the same
    checkpoint must process only files that arrived since — the already-
    ingested epochs keep their batch ids and verdicts, and a new near-dup
    of an accepted doc is caught against the restored corpus."""
    _write_feed(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    args = (str(tmp_path / "in" / "*.json"), corpus_dir, verdicts_dir, ckpt)
    run_dedup_ingest(spark, *args, threshold=0.2)
    first = {
        r["doc_id"]: r["batch_id"]
        for r in spark.read.parquet(verdicts_dir).collect()
    }

    # a fourth file lands: one exact dup of accepted doc 2, one fresh doc
    p = tmp_path / "in" / "day_3.json"
    p.write_text(
        "\n".join(
            json.dumps({"doc_id": d, "text": t})
            for d, t in [(7, FAR), (8, "genuinely new final document text")]
        )
    )
    os.utime(p, (time.time(), time.time()))
    run_dedup_ingest(spark, *args, threshold=0.2)

    after = {
        r["doc_id"]: (r["status"], r["match_id"], r["batch_id"])
        for r in spark.read.parquet(verdicts_dir).collect()
    }
    # old epochs untouched (same batch ids, no reprocessing)
    for d, b in first.items():
        assert after[d][2] == b
    assert after[7] == ("exact", 2, 3)  # caught vs the RESTORED corpus
    assert after[8][0] == "unique"
    corpus = {r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()}
    assert corpus == {1, 2, 5, 8}


def test_dedup_ingest_replay_converges(spark, tmp_path):
    """Re-running an epoch's foreachBatch call (the crash-replay path)
    overwrites its own verdicts/corpus partitions and must not dedup the
    batch against its own prior output."""
    _write_feed(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    # snapshot of frames persisted by OTHER suites sharing this session
    # (e.g. d3's opt-in bucket cache) — the hygiene assert below checks
    # the ingest epochs added nothing to it
    cached_before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    run_dedup_ingest(
        spark,
        str(tmp_path / "in" / "*.json"),
        corpus_dir,
        verdicts_dir,
        str(tmp_path / "ckpt"),
        threshold=0.2,
    )
    before_corpus = sorted(
        (r["doc_id"], r["batch_id"])
        for r in spark.read.parquet(corpus_dir).collect()
    )
    before_verdicts = sorted(
        tuple(r) for r in spark.read.parquet(verdicts_dir).collect()
    )

    # replay epoch 1 (docs 3/4/5; it ADMITTED doc 5 — the dangerous case:
    # without self-partition exclusion the replayed 5 would match its own
    # earlier copy and flip to 'exact')
    epoch1 = spark.createDataFrame(
        [
            (3, BASE),
            (4, NEAR),
            (5, "unrelated fresh content sits in this entirely new fifth document body"),
        ],
        "doc_id long, text string",
    )
    incremental_dedup_sink(corpus_dir, verdicts_dir, threshold=0.2)(
        epoch1, 1
    )

    after_corpus = sorted(
        (r["doc_id"], r["batch_id"])
        for r in spark.read.parquet(corpus_dir).collect()
    )
    after_verdicts = sorted(
        tuple(r) for r in spark.read.parquet(verdicts_dir).collect()
    )
    assert after_corpus == before_corpus
    assert after_verdicts == before_verdicts
    # and the epochs left nothing cached behind (service hygiene) —
    # compared against the pre-test snapshot because the shared test
    # session legitimately carries other suites' opt-in caches
    cached_after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert cached_after <= cached_before, "epoch left persisted frames behind"
