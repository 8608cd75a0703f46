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

from pyspark.sql import functions as F

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
