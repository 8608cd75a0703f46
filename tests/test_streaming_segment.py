"""Streaming segment-level dedup service (segment_stream).

A 3-epoch doc feed drives the sink; asserts (1) the concatenated
streamed outputs equal the BATCH d16 operator over the same corpus —
the streaming rendition computes the same function; (2) the seen-store
holds each segment exactly once, in the partition of its first epoch;
(3) replay convergence for the LAST epoch and for a MID-HISTORY epoch
(the store's first-seen-only layout makes any-epoch replay read exactly
the state that epoch originally saw)."""

from __future__ import annotations

import json
import os
import time

from retail_data_pipeline_and_forecasting_system_spark.operators.dedup import (
    segment_dedup,
)
from retail_data_pipeline_and_forecasting_system_spark.streaming import (
    run_segment_ingest,
    segment_dedup_sink,
)

# 3-word segments; doc_ids globally increasing across epochs so the
# batch operator's (doc_id, seg_idx) first-occurrence order equals the
# stream's (epoch, doc_id, seg_idx) order
EPOCHS = [
    [
        (1, "the cookie banner alpha beta gamma"),
        (2, "the cookie banner delta words here"),
    ],
    [
        (3, "fresh stuff now the cookie banner"),
        (4, "alpha beta gamma repeated inside doc alpha beta gamma"),
    ],
    [
        (5, "delta words here fresh stuff now entirely new tail"),
    ],
]


def _write_feed(in_dir):
    in_dir.mkdir()
    for i, docs in enumerate(EPOCHS):
        p = in_dir / f"epoch_{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": d, "text": t}) for d, t in docs
            )
        )
        ts = time.time() - 1000 + i
        os.utime(p, (ts, ts))


def _drain(spark, tmp_path):
    _write_feed(tmp_path / "in")
    segs_dir = str(tmp_path / "segs")
    docs_dir = str(tmp_path / "docs")
    run_segment_ingest(
        spark,
        str(tmp_path / "in" / "*.json"),
        segs_dir,
        docs_dir,
        str(tmp_path / "ckpt"),
        seg_words=3,
    )
    return segs_dir, docs_dir


def _docs_state(spark, docs_dir):
    return sorted(
        (r["doc_id"], r["n_segs"], r["n_kept"], r["text_dedup"], r["batch_id"])
        for r in spark.read.parquet(docs_dir).collect()
    )


def _store_state(spark, segs_dir):
    return sorted(
        (r["seg"], r["batch_id"])
        for r in spark.read.parquet(segs_dir).collect()
    )


def test_streamed_output_equals_batch_operator(spark, tmp_path):
    segs_dir, docs_dir = _drain(spark, tmp_path)

    all_docs = [d for e in EPOCHS for d in e]
    batch_df = spark.createDataFrame(all_docs, "doc_id long, text string")
    want = sorted(
        (r["doc_id"], r["n_segs"], r["n_kept"], r["text_dedup"])
        for r in segment_dedup(batch_df, seg_words=3).collect()
    )
    got = [t[:4] for t in _docs_state(spark, docs_dir)]
    assert got == want

    # the seen-store: every distinct segment exactly once, first-epoch
    # partitioned
    store = _store_state(spark, segs_dir)
    segs_only = [s for s, _ in store]
    assert len(segs_only) == len(set(segs_only))
    by_seg = dict(store)
    assert by_seg["the cookie banner"] == 0  # first seen in epoch 0
    assert by_seg["fresh stuff now"] == 1
    assert by_seg["entirely new tail"] == 2


def test_vacuum_epoch_partitions_retires_old_epochs(spark, tmp_path):
    """Retention mechanism for every epoch-partitioned store: keep the
    newest N partitions, readers see only the survivors, and the model
    store's newest-version read is unaffected."""
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        vacuum_epoch_partitions,
    )

    segs_dir, docs_dir = _drain(spark, tmp_path)  # 3 epochs
    assert vacuum_epoch_partitions(docs_dir, keep_latest=1) == [0, 1]
    left = {r["batch_id"] for r in spark.read.parquet(docs_dir).collect()}
    assert left == {2}
    # idempotent on a second pass; missing dir is a no-op
    assert vacuum_epoch_partitions(docs_dir, keep_latest=1) == []
    assert vacuum_epoch_partitions(str(tmp_path / "nope"), 1) == []
    # explicit partition column name works too (model stores use epoch=)
    mdir = tmp_path / "model"
    for e in range(3):
        (mdir / f"epoch={e}").mkdir(parents=True)
    assert vacuum_epoch_partitions(
        str(mdir), keep_latest=2, partition_col="epoch"
    ) == [0]
    assert sorted(p.name for p in mdir.iterdir()) == ["epoch=1", "epoch=2"]


def test_segment_random_replay_fuzz(spark, tmp_path):
    """Adversarial replay over a random corpus: drive 4 random epochs,
    then re-fire a random shuffle of them — docs output and seen-store
    must be byte-stable through every refire (the first-seen-partition
    layout makes each refire read exactly its original store state)."""
    import numpy as np

    rng = np.random.default_rng(17)
    vocab = ["a", "b", "c"]
    epochs = []
    next_id = 0
    for _ in range(4):
        docs = []
        for _ in range(int(rng.integers(2, 6))):
            docs.append(
                (
                    next_id,
                    " ".join(
                        rng.choice(vocab, size=int(rng.integers(3, 12)))
                    ),
                )
            )
            next_id += 1
        epochs.append(docs)

    segs_dir = str(tmp_path / "segs")
    docs_dir = str(tmp_path / "docs")
    sink = segment_dedup_sink(segs_dir, docs_dir, seg_words=3)
    for i, docs in enumerate(epochs):
        sink(spark.createDataFrame(docs, "doc_id long, text string"), i)

    before = (_docs_state(spark, docs_dir), _store_state(spark, segs_dir))
    refires = list(rng.permutation(4)) + [int(rng.integers(0, 4))]
    for e in refires:
        sink(
            spark.createDataFrame(
                epochs[int(e)], "doc_id long, text string"
            ),
            int(e),
        )
        now = (_docs_state(spark, docs_dir), _store_state(spark, segs_dir))
        assert now == before, f"refire of epoch {e} diverged"


def test_segment_empty_batch_writes_nothing(spark, tmp_path):
    """Streaming frameworks emit empty micro-batches; they must not
    commit empty partitions into either store."""
    import os

    segs_dir, docs_dir = _drain(spark, tmp_path)
    before = _store_state(spark, segs_dir)
    empty = spark.createDataFrame([], "doc_id long, text string")
    segment_dedup_sink(segs_dir, docs_dir, seg_words=3)(empty, 99)
    assert _store_state(spark, segs_dir) == before
    assert not os.path.isdir(os.path.join(docs_dir, "batch_id=99"))


def test_segment_replay_converges_last_and_midhistory(spark, tmp_path):
    segs_dir, docs_dir = _drain(spark, tmp_path)
    before_docs = _docs_state(spark, docs_dir)
    before_store = _store_state(spark, segs_dir)

    sink = segment_dedup_sink(segs_dir, docs_dir, seg_words=3)
    cached_before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )

    # last-epoch replay (Structured Streaming's contract)
    last = spark.createDataFrame(EPOCHS[2], "doc_id long, text string")
    sink(last, 2)
    assert _docs_state(spark, docs_dir) == before_docs
    assert _store_state(spark, segs_dir) == before_store

    # MID-HISTORY replay: epoch 1 of 3 — its first-seen segments live
    # only in partition 1, which the replay excludes, so it reads
    # exactly the store state it originally saw
    mid = spark.createDataFrame(EPOCHS[1], "doc_id long, text string")
    sink(mid, 1)
    assert _docs_state(spark, docs_dir) == before_docs
    assert _store_state(spark, segs_dir) == before_store

    # and epoch 0 (the other boundary)
    first = spark.createDataFrame(EPOCHS[0], "doc_id long, text string")
    sink(first, 0)
    assert _docs_state(spark, docs_dir) == before_docs
    assert _store_state(spark, segs_dir) == before_store

    # cache hygiene: the epochs left no NEW persisted frames (other
    # suite tests may legitimately hold their own on the shared session)
    cached_after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert cached_after <= cached_before, "epoch left persisted frames"


def test_md5_store_mode_matches_text_mode_docs(spark, tmp_path):
    """VERDICT r5 #4 (streaming half): the md5 store layout produces
    byte-identical per-doc output to the text layout, stores 32-hex
    hashes instead of text, and replays converge."""
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        segment_dedup_sink,
    )

    def drive(tag, **kw):
        segs_dir = str(tmp_path / f"segs_{tag}")
        docs_dir = str(tmp_path / f"docs_{tag}")
        sink = segment_dedup_sink(segs_dir, docs_dir, seg_words=3, **kw)
        for i, docs in enumerate(EPOCHS):
            sink(
                spark.createDataFrame(docs, "doc_id long, text string"), i
            )
        return sink, segs_dir, docs_dir

    _, _, docs_text = drive("text")
    sink_h, segs_h, docs_h = drive("md5", key="md5")

    assert _docs_state(spark, docs_h) == _docs_state(spark, docs_text)

    store = spark.read.parquet(segs_h)
    hashes = [r["h"] for r in store.collect()]
    assert all(len(h) == 32 for h in hashes)
    assert len(hashes) == len(set(hashes))

    before = (_docs_state(spark, docs_h), sorted(hashes))
    for epoch_id in (2, 0):  # head and mid-history replay
        sink_h(
            spark.createDataFrame(
                EPOCHS[epoch_id], "doc_id long, text string"
            ),
            epoch_id,
        )
        after = (
            _docs_state(spark, docs_h),
            sorted(r["h"] for r in spark.read.parquet(segs_h).collect()),
        )
        assert after == before, f"md5-mode replay of {epoch_id} diverged"
