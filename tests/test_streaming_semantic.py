"""Streaming embedding ingestion through the incremental SEMANTIC dedup
gate (semantic_stream) — the vector twin of test_streaming_dedup.

Replays a 3-file embedding feed one epoch per file and asserts the
verdicts/accepted corpus follow the sequential semantics (each epoch
cell-assigned and checked against everything previously accepted, plus
earlier arrivals of its own epoch); then re-runs an epoch's foreachBatch
directly to prove crash-replay convergence.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.streaming import (
    incremental_semantic_sink,
    run_semantic_ingest,
)

DIM = 16


def _vec(axis: int, bump: float = 0.0, bump_axis: int = 1) -> list[float]:
    v = [0.0] * DIM
    v[axis] = 1.0
    if bump:
        v[bump_axis] = bump
    return v


A = _vec(0)
NEAR_A = _vec(0, bump=0.2, bump_axis=3)  # cos ~0.98 to A
B = _vec(1)
C = _vec(2)
NEAR_C = _vec(2, bump=0.1, bump_axis=4)  # cos ~0.995 to C
D = _vec(5)


def _write_feed(in_dir):
    in_dir.mkdir()
    epochs = [
        [(1, A), (2, B)],
        [(3, A), (4, NEAR_A), (5, C)],
        [(6, NEAR_C), (7, D), (8, D)],
    ]
    for i, vecs in enumerate(epochs):
        p = in_dir / f"epoch_{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"vec_id": v, "embedding": e}) for v, e in vecs
            )
        )
        ts = time.time() - 1000 + i
        os.utime(p, (ts, ts))


def test_semantic_ingest_gates_stream(spark, tmp_path):
    _write_feed(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    run_semantic_ingest(
        spark,
        str(tmp_path / "in" / "*.json"),
        corpus_dir,
        verdicts_dir,
        str(tmp_path / "ckpt"),
    )
    verdicts = {
        r["vec_id"]: (r["status"], r["match_id"], r["batch_id"])
        for r in spark.read.parquet(verdicts_dir).collect()
    }
    # epoch 0: empty corpus, self-dedup only — A and B far apart
    assert verdicts[1] == ("unique", None, 0)
    assert verdicts[2] == ("unique", None, 0)
    # epoch 1: clone and near-dup of accepted 1; C is fresh
    assert verdicts[3] == ("dup_corpus", 1, 1)
    assert verdicts[4] == ("dup_corpus", 1, 1)
    assert verdicts[5] == ("unique", None, 1)
    # epoch 2: near-dup of epoch-1-accepted 5; D arrives twice in one
    # epoch — first is unique, the second is a batch dup of the first
    assert verdicts[6] == ("dup_corpus", 5, 2)
    assert verdicts[7] == ("unique", None, 2)
    assert verdicts[8] == ("dup_batch", 7, 2)
    corpus = {r["vec_id"] for r in spark.read.parquet(corpus_dir).collect()}
    assert corpus == {1, 2, 5, 7}


def test_semantic_ingest_replay_converges(spark, tmp_path):
    """Re-running epoch 1's foreachBatch (crash replay) overwrites its
    own partitions; the replayed vec 5 must NOT match its own accepted
    copy (self-partition exclusion) and the store must be unchanged."""
    _write_feed(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    run_semantic_ingest(
        spark,
        str(tmp_path / "in" / "*.json"),
        corpus_dir,
        verdicts_dir,
        str(tmp_path / "ckpt"),
    )
    before_v = sorted(
        tuple(r) for r in spark.read.parquet(verdicts_dir).collect()
    )
    before_c = sorted(
        (r["vec_id"], r["batch_id"])
        for r in spark.read.parquet(corpus_dir).collect()
    )
    cached_before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    conf_before = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None
    )

    epoch1 = spark.createDataFrame(
        [(3, A), (4, NEAR_A), (5, C)],
        "vec_id long, embedding array<double>",
    )
    incremental_semantic_sink(corpus_dir, verdicts_dir)(epoch1, 1)

    after_v = sorted(
        tuple(r) for r in spark.read.parquet(verdicts_dir).collect()
    )
    after_c = sorted(
        (r["vec_id"], r["batch_id"])
        for r in spark.read.parquet(corpus_dir).collect()
    )
    assert after_v == before_v
    assert after_c == before_c
    cached_after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert cached_after <= cached_before, "epoch left persisted frames"
    # the overwrite-mode conf did not leak out of the sink (restored to
    # its prior value, including 'unset')
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        == conf_before
    )


def test_semantic_ingest_auto_k_matches_fixed_k_verdicts(spark, tmp_path):
    """k='auto' (similarity.auto_k) flows through the sink: on this
    tiny feed auto-k resolves to 1 cell, a superset of any blocking, so
    the verdict semantics must equal the default k=4 run — and the
    service no longer needs a caller-tuned k as the corpus grows."""
    _write_feed(tmp_path / "in")
    states = {}
    for label, kw in (("fixed", {}), ("auto", {"k": "auto"})):
        cdir = str(tmp_path / f"corpus_{label}")
        vdir = str(tmp_path / f"verdicts_{label}")
        sink = incremental_semantic_sink(cdir, vdir, **kw)
        for i, epoch in enumerate(
            [[(1, A), (2, B)], [(3, A), (4, NEAR_A), (5, C)],
             [(6, NEAR_C), (7, D), (8, D)]]
        ):
            sink(
                spark.createDataFrame(
                    epoch, "vec_id long, embedding array<double>"
                ),
                i,
            )
        states[label] = (
            sorted(
                (r["vec_id"], r["status"], r["match_id"], r["batch_id"])
                for r in spark.read.parquet(vdir).collect()
            ),
            sorted(
                r["vec_id"] for r in spark.read.parquet(cdir).collect()
            ),
        )
    assert states["auto"] == states["fixed"]


def _drive_model_sink(spark, tmp_path, epochs):
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        incremental_semantic_model_sink,
    )

    dirs = (
        str(tmp_path / "corpus_m"),
        str(tmp_path / "verdicts_m"),
        str(tmp_path / "model_m"),
    )
    sink = incremental_semantic_model_sink(*dirs, k=2)
    for i, epoch in enumerate(epochs):
        sink(
            spark.createDataFrame(
                epoch, "vec_id long, embedding array<double>"
            ),
            i,
        )
    return sink, dirs


def test_semantic_model_sink_gates_and_maintains_model(spark, tmp_path):
    """The O(batch)-per-epoch rendition: verdict semantics on the
    standard feed match the refit service (strong dup signals are
    model-independent), the corpus stores admission-time cell ids, and
    the model store holds one absorbed-count-increasing version per
    epoch."""
    epochs = [
        [(1, A), (2, B)],
        [(3, A), (4, NEAR_A), (5, C)],
        [(6, NEAR_C), (7, D), (8, D)],
    ]
    _, (corpus_dir, verdicts_dir, model_dir) = _drive_model_sink(
        spark, tmp_path, epochs
    )
    verdicts = {
        r["vec_id"]: (r["status"], r["match_id"], r["batch_id"])
        for r in spark.read.parquet(verdicts_dir).collect()
    }
    assert verdicts[1] == ("unique", None, 0)
    assert verdicts[2] == ("unique", None, 0)
    assert verdicts[3] == ("dup_corpus", 1, 1)
    assert verdicts[4] == ("dup_corpus", 1, 1)
    assert verdicts[5] == ("unique", None, 1)
    assert verdicts[6] == ("dup_corpus", 5, 2)
    assert verdicts[7] == ("unique", None, 2)
    assert verdicts[8] == ("dup_batch", 7, 2)

    corpus = {
        r["vec_id"]: r["cent_id"]
        for r in spark.read.parquet(corpus_dir).collect()
    }
    assert set(corpus) == {1, 2, 5, 7}
    assert all(c is not None for c in corpus.values())  # stored cells

    model = spark.read.parquet(model_dir)
    per_epoch = {
        r["epoch"]: r["total"]
        for r in model.groupBy("epoch")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    # the model absorbs every ARRIVING vector (2, then +3, then +3)
    assert per_epoch == {0: 2, 1: 5, 2: 8}


def test_semantic_model_sink_replay_converges_any_epoch(spark, tmp_path):
    """Replay any epoch: the model read takes the newest epoch BELOW
    the batch id, so the re-fire reads exactly what it originally saw
    and rewrites byte-identical verdict/corpus/model partitions."""
    epochs = [
        [(1, A), (2, B)],
        [(3, A), (4, NEAR_A), (5, C)],
        [(6, NEAR_C), (7, D), (8, D)],
    ]
    sink, (corpus_dir, verdicts_dir, model_dir) = _drive_model_sink(
        spark, tmp_path, epochs
    )

    def state():
        return (
            sorted(
                tuple(r)
                for r in spark.read.parquet(verdicts_dir).collect()
            ),
            sorted(
                (r["vec_id"], r["cent_id"], r["batch_id"])
                for r in spark.read.parquet(corpus_dir).collect()
            ),
            sorted(
                (r["epoch"], r["cent_id"], r["n"], tuple(r["cent_vec"]))
                for r in spark.read.parquet(model_dir).collect()
            ),
        )

    before = state()
    for epoch_id in (2, 1, 0):  # last, mid-history, first
        sink(
            spark.createDataFrame(
                epochs[epoch_id], "vec_id long, embedding array<double>"
            ),
            epoch_id,
        )
        assert state() == before, f"replay of epoch {epoch_id} diverged"


def test_semantic_model_rebuild_restores_autok_and_consistency(spark, tmp_path):
    """rebuild_semantic_model: the periodic k ~ sqrt(n) restore — after
    a rebuild the model store's newest version has auto-k cells whose
    counts sum to the corpus, every stored corpus cell id equals a
    fresh assignment under the rebuilt centroids, and the NEXT epoch
    still gates correctly (a clone of an old admission is caught)."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.similarity import (
        assign_cells,
        auto_k,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        incremental_semantic_model_sink,
        rebuild_semantic_model,
    )

    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    model_dir = str(tmp_path / "model")
    sink = incremental_semantic_model_sink(
        corpus_dir, verdicts_dir, model_dir, k=2
    )
    epochs = [[(1, A), (2, B)], [(5, C), (7, D)]]
    for i, epoch in enumerate(epochs):
        sink(
            spark.createDataFrame(
                epoch, "vec_id long, embedding array<double>"
            ),
            i,
        )

    k = rebuild_semantic_model(spark, corpus_dir, model_dir, epoch=1)
    assert k == auto_k(4)  # corpus is 4 accepted vectors

    model = (
        spark.read.parquet(model_dir)
        .filter(F.col("epoch") == 1)
        .select("cent_id", "cent_vec", "n")
    )
    assert model.count() == k
    assert model.agg(F.sum("n")).collect()[0][0] == 4

    stored = {
        r["vec_id"]: r["cent_id"]
        for r in spark.read.parquet(corpus_dir).collect()
    }
    fresh = {
        r["vec_id"]: r["cent_id"]
        for r in assign_cells(
            spark.read.parquet(corpus_dir).select("vec_id", "embedding"),
            model.select("cent_id", "cent_vec"),
        ).collect()
    }
    assert stored == fresh  # rewrite is consistent with the new model

    # next epoch gates against the rebuilt index: clone of 1 caught
    sink(
        spark.createDataFrame(
            [(9, A), (10, D)], "vec_id long, embedding array<double>"
        ),
        2,
    )
    verdicts = {
        r["vec_id"]: r["status"]
        for r in spark.read.parquet(verdicts_dir)
        .filter(F.col("batch_id") == 2)
        .collect()
    }
    assert verdicts[9] == "dup_corpus"
    assert verdicts[10] == "dup_corpus"


def test_semantic_ingest_first_epoch_refire_converges(spark, tmp_path):
    """Mid-history replay from the OTHER end: re-fire epoch 0 of 3 after
    the whole feed ran. The refired batch dedups against a corpus that
    now contains LATER batches (1's and 2's admissions) but not its own
    partition; because every later vector near epoch 0's admissions was
    itself rejected at admission time (corpus-wins ordering), the
    verdict SEMANTICS (status, match_id) and both stores must converge.
    cent_id is excluded: it is model metadata, and the refit's fit set
    legitimately differs (first run fit on the batch itself — the corpus
    was empty; the refire fits on the now-populated corpus)."""
    _write_feed(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    verdicts_dir = str(tmp_path / "verdicts")
    run_semantic_ingest(
        spark,
        str(tmp_path / "in" / "*.json"),
        corpus_dir,
        verdicts_dir,
        str(tmp_path / "ckpt"),
    )
    def verdict_semantics():
        return sorted(
            (r["vec_id"], r["status"], r["match_id"], r["batch_id"])
            for r in spark.read.parquet(verdicts_dir).collect()
        )

    before_v = verdict_semantics()
    before_c = sorted(
        (r["vec_id"], r["batch_id"])
        for r in spark.read.parquet(corpus_dir).collect()
    )

    epoch0 = spark.createDataFrame(
        [(1, A), (2, B)], "vec_id long, embedding array<double>"
    )
    incremental_semantic_sink(corpus_dir, verdicts_dir)(epoch0, 0)

    after_v = verdict_semantics()
    after_c = sorted(
        (r["vec_id"], r["batch_id"])
        for r in spark.read.parquet(corpus_dir).collect()
    )
    assert after_v == before_v
    assert after_c == before_c


def test_minibatch_update_drops_null_and_ragged_vectors(spark):
    """ADVICE r5 (low): a NULL element or ragged vector in the batch
    must not crash the decimal-sum aggregation (TypeError on float(None))
    or silently mix mismatched per-dim counts — such rows are dropped at
    the model-sink boundary and the surviving rows update the model
    exactly as if the hostile rows never arrived."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.similarity import (
        kmeans_minibatch_update,
    )

    model = spark.createDataFrame(
        [(0, A, 1), (1, C, 1)],
        "cent_id INT, cent_vec ARRAY<DOUBLE>, n BIGINT",
    )
    hostile = spark.createDataFrame(
        [
            (10, NEAR_A),                    # clean: joins cell 0
            (11, None),                      # null vector
            (12, [1.0, 0.0]),                # ragged (dim 2, model dim 16)
            (13, [None] + [0.0] * (DIM - 1)),  # null element, right size
            (14, NEAR_C),                    # clean: joins cell 1
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    clean_only = hostile.filter(F.col("vec_id").isin(10, 14))
    got = {
        r["cent_id"]: (r["cent_vec"], r["n"])
        for r in kmeans_minibatch_update(model, hostile).collect()
    }
    want = {
        r["cent_id"]: (r["cent_vec"], r["n"])
        for r in kmeans_minibatch_update(model, clean_only).collect()
    }
    assert got == want
    assert got[0][1] == 2 and got[1][1] == 2  # one clean row absorbed each


def test_semantic_model_sink_auto_rebuild_self_heals(spark, tmp_path):
    """VERDICT r5 #3: the auto-trigger. A long-lived feed through the
    model sink with ``auto_rebuild`` on regrows k as the corpus grows
    (no operator call needed) and lands on the exact model/corpus state
    of a manually-rebuilt twin; replaying the triggering epoch
    converges; and a replayed OLD epoch never fires the rebuild."""
    import numpy as np

    from retail_data_pipeline_and_forecasting_system_spark.operators.similarity import (
        auto_k,
    )
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        incremental_semantic_model_sink,
    )

    rng = np.random.default_rng(11)
    epochs = []
    next_id = 0
    for _ in range(4):
        vecs = rng.normal(size=(12, DIM))
        epochs.append(
            [(next_id + i, [float(x) for x in vecs[i]]) for i in range(12)]
        )
        next_id += 12

    def drive(tag, **kw):
        dirs = tuple(
            str(tmp_path / f"{d}_{tag}") for d in ("corpus", "verd", "model")
        )
        sink = incremental_semantic_model_sink(
            *dirs, k="auto", salt=None, target_cell_size=2, **kw
        )
        for i, rows in enumerate(epochs):
            sink(
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<double>"
                ),
                i,
            )
        return sink, dirs

    sink_a, (cdir, vdir, mdir) = drive("auto", auto_rebuild=2.0)
    _, (_, _, mdir_off) = drive("off", auto_rebuild=None)

    def model_k(mdir, epoch):
        return (
            spark.read.parquet(mdir)
            .filter(F.col("epoch") == epoch)
            .count()
        )

    # frozen-k arm keeps the epoch-0 k forever; the auto arm regrew it
    k0 = model_k(mdir_off, 0)
    assert model_k(mdir_off, 3) == k0
    n_corpus = spark.read.parquet(cdir).count()
    k_auto = model_k(mdir, 3)
    assert k_auto > k0
    # after the last fired rebuild, k tracks auto_k of the corpus then
    assert k_auto < 2.0 * auto_k(n_corpus, 2)

    def state():
        return (
            sorted(tuple(r) for r in spark.read.parquet(vdir).collect()),
            sorted(
                (r["vec_id"], r["cent_id"], r["batch_id"])
                for r in spark.read.parquet(cdir).collect()
            ),
            sorted(
                (r["epoch"], r["cent_id"], r["n"], tuple(r["cent_vec"]))
                for r in spark.read.parquet(mdir).collect()
            ),
        )

    before = state()
    # replay the head epoch (which fired a rebuild): must converge
    sink_a(
        spark.createDataFrame(
            epochs[3], "vec_id long, embedding array<double>"
        ),
        3,
    )
    assert state() == before, "head-epoch replay with auto-rebuild diverged"

    # replay an OLD epoch: the head guard must keep the rebuild from
    # rewriting the store under an old epoch id (model store unchanged
    # at the head epoch)
    head_model = sorted(
        (r["cent_id"], tuple(r["cent_vec"]), r["n"])
        for r in spark.read.parquet(mdir)
        .filter(F.col("epoch") == 3)
        .collect()
    )
    sink_a(
        spark.createDataFrame(
            epochs[1], "vec_id long, embedding array<double>"
        ),
        1,
    )
    after_model = sorted(
        (r["cent_id"], tuple(r["cent_vec"]), r["n"])
        for r in spark.read.parquet(mdir)
        .filter(F.col("epoch") == 3)
        .collect()
    )
    assert after_model == head_model
