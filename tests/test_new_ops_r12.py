"""Round-12 regressions for the round-11 ADVICE items: corpus
fingerprint mid-walk error propagation, pr1 edge-frame persistence,
n17 ragged-embedding grace, croston NULL-qty tolerance — plus the
round-12 registrations' hand tests further down."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
    _corpus_fingerprint,
)


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ----------------------------------------------- ADVICE regressions


def test_corpus_fingerprint_midwalk_stat_error_propagates(
    tmp_path, monkeypatch
):
    """A transient stat failure DURING the walk (file deleted under a
    concurrent corpus rewrite) must raise, not silently degrade to the
    rewrite-blind path-only key that would serve a stale memoized BPE
    table (round-11 ADVICE). The path-only fallback stays scoped to
    the initial existence probe (the non-POSIX s3a/hdfs case)."""
    corpus = tmp_path / "documents.parquet"
    corpus.mkdir()
    (corpus / "part-0.parquet").write_bytes(b"x" * 10)
    (corpus / "part-1.parquet").write_bytes(b"y" * 20)

    # healthy walk: full signature, not the path-only key
    sig = _corpus_fingerprint(str(corpus))
    assert len(sig) == 2 and len(sig[1]) == 2

    real_stat = os.stat

    def flaky_stat(p, *a, **kw):
        if str(p).endswith("part-1.parquet"):
            raise OSError("stat raced a concurrent delete")
        return real_stat(p, *a, **kw)

    monkeypatch.setattr(os, "stat", flaky_stat)
    with pytest.raises(OSError):
        _corpus_fingerprint(str(corpus))
    monkeypatch.undo()

    # the initial probe still degrades gracefully for unseeable paths
    assert _corpus_fingerprint("s3a://bucket/corpus") == (
        "s3a://bucket/corpus",
    )


def test_pr1_edge_frame_persisted(spark):
    """pr1's shared co-purchase edge frame is persist_tracked (as
    pr6/pr7 already were), so the lineitem self-join + distinct is
    paid once, not once per unrolled PageRank iteration (round-11
    ADVICE). The persist shows up as InMemoryRelation in the plan."""
    df = QUERIES["pr1_copurchase_pagerank"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert "InMemoryRelation" in _plan(df)


def test_n17_ragged_embedding_no_crash(spark, tmp_path):
    """A short (ragged) embedding row must not blow up the whole scan
    with INVALID_ARRAY_INDEX under ANSI mode (round-11 ADVICE): the
    short row contributes its dims only — exactly what the oracle's
    unnest computes — and full-length rows are unaffected."""
    import random

    rng = random.Random(7)
    full = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], 0) for i in range(4)
    ]
    rows = full + [(99, [0.5, -0.5], 0)]  # the ragged row
    d = tmp_path / "sfr"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))

    got = QUERIES["n17_minmax_normalize"].fn(spark, str(d)).toPandas()
    # ragged row emits exactly its 2 dims; full rows all 64
    assert (got.vec_id == 99).sum() == 2
    assert got.shape[0] == 4 * 64 + 2
    # and the ragged row's values joined the per-dim stats: dim-1 span
    # includes 0.5, so its normalized value is in (0, 1]
    v = got[(got.vec_id == 99) & (got.dim == 1)].x_norm.iloc[0]
    assert 0.0 <= v <= 1.0


def test_croston_null_qty_rows_dropped(spark):
    """NULL qty rows in a raw (un-pre-aggregated) feed are dropped as
    non-events instead of crashing the Arrow task on int(NaN)
    (round-11 ADVICE); the fit equals the null-free feed's fit."""
    from retail_data_pipeline_and_forecasting_system_spark.forecast.univariate import (  # noqa: E501
        croston_forecast,
    )

    base = [
        ("p1", "2024-01-01", 4),
        ("p1", "2024-01-08", 2),
        ("p1", "2024-01-22", 6),
    ]
    with_nulls = base + [("p1", "2024-01-05", None), ("p1", "2024-01-30", None)]

    def fit(rows):
        df = spark.createDataFrame(
            rows, "key string, day string, qty int"
        ).select("key", F.col("day").cast("date"), "qty")
        out = croston_forecast(
            df, key_col="key", date_col="day", qty_col="qty"
        ).collect()
        assert len(out) == 1
        r = out[0]
        return (r.n_events, r.z, r.p, r.croston, r.sba)

    assert fit(with_nulls) == fit(base)
