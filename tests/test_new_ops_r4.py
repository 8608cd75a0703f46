"""Edge/property tests for the round-4 additions: salted blocked pair
join (d14/d6), SemDeDup on a degenerate corpus, Gopher-gate rule
boundaries, compaction-plan invariants, and the truncated EWMA vs a
straight numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.operators import (
    similarity as SIM,
)
from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)


def _pairs_set(df):
    return {(r.vec_a, r.vec_b) for r in df.collect()}


def test_salted_pairs_equal_unsalted(spark):
    """Salting is pure parallelism: the pair set must be identical.
    One dominant block (the shape salt exists for) + two small ones."""
    rows = []
    rng = np.random.default_rng(7)
    for i in range(60):
        blk = "hot" if i < 40 else ("a" if i % 2 else "b")
        rows.append((i, blk, [float(x) for x in rng.normal(size=8)]))
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    plain = SIM.cosine_pairs_blocked(emb, threshold=-1.0, block_col="label")
    salted = SIM.cosine_pairs_blocked(
        emb, threshold=-1.0, block_col="label", salt=16
    )
    assert _pairs_set(plain) == _pairs_set(salted)
    assert len(_pairs_set(plain)) == 40 * 39 // 2 + 2 * (10 * 9 // 2)


def test_semantic_dedup_identical_vectors_keep_one(spark, tmp_path):
    """Hostile corpus: 40 bit-identical vectors + 8 scattered ones. The
    identical clones all land in one cell at cosine 1.0, so the one-pass
    dominated-by-smaller-id policy must keep EXACTLY the smallest clone
    id and drop the other 39."""
    rng = np.random.default_rng(3)
    rows = [(i, 0, [1.0] * 16) for i in range(40)]
    for i in range(40, 48):
        rows.append((i, 0, [float(x) for x in rng.normal(size=16)]))
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QUERIES["d14_semantic_dedup"].fn(spark, str(tmp_path)).collect()
    clones = {r.vec_id: r.kept for r in out if r.vec_id < 40}
    assert clones[0] is True
    assert sum(clones.values()) == 1  # only the smallest clone survives


def test_gopher_gate_rule_boundaries(spark, tmp_path):
    """Each rule checked at its boundary with crafted docs."""
    docs = [
        # 49 words -> fails r_words; 50 -> passes
        (1, " ".join(["the"] * 49)),
        (2, " ".join(["the"] * 50)),
        # mean word length 2 (<3) -> fails r_mwl (pad to 50 words)
        (3, " ".join(["ab the"] * 25)),
        # symbol ratio: 50 words, 6 hashes -> 0.12 > 0.1 -> fails r_symbol
        (4, " ".join(["the"] * 49) + " ######"),
        # no function words -> fails r_stop
        (5, " ".join(["zq"] * 50)),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           QUERIES["x24_gopher_gate"].fn(spark, str(tmp_path)).collect()}
    assert not out[1].r_words and out[2].r_words
    assert out[2].passes
    assert not out[3].r_mwl and out[3].r_words
    assert not out[4].r_symbol and out[4].r_words
    assert not out[5].r_stop and not out[5].passes


def test_compaction_plan_invariants(spark, sf_dir):
    """Bins partition the manifest: per-source bytes and file counts are
    conserved, ranges are non-overlapping and ordered with bin_id."""
    out = QUERIES["ops5_compaction_plan"].fn(spark, sf_dir).toPandas()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("bytes"))
        .toPandas()
        .set_index("source")
    )
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("bin_id")
        assert grp["n_files"].sum() == docs.loc[src, "n"]
        assert grp["bin_bytes"].sum() == docs.loc[src, "bytes"]
        assert grp["bin_id"].iloc[0] == 0
        # contiguous, ordered, non-overlapping id ranges
        prev_last = None
        for _, r in grp.iterrows():
            assert r.first_file <= r.last_file
            if prev_last is not None:
                assert r.first_file > prev_last
            prev_last = r.last_file


def test_ewma_matches_numpy_reference(spark, sf_dir):
    """h3's windowed fold == the definitional truncated EWMA computed
    row-by-row in numpy for one key."""
    out = (
        QUERIES["h3_ewma"].fn(spark, sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("d")
        .toPandas()
    )
    x = out["total"].values
    for i in range(len(x)):
        lo = max(0, i - 9)
        w = 0.5 ** np.arange(i - lo, -1, -1)
        want = float(np.dot(x[lo : i + 1], w) / w.sum())
        assert out["ewma10"].iloc[i] == pytest.approx(want, rel=1e-12)


def test_incremental_semantic_precedence(spark, tmp_path):
    """A new vector near BOTH a corpus vector and a smaller-id new
    vector must report dup_corpus with the lowest CORPUS match id —
    corpus always outranks batch."""
    rng = np.random.default_rng(11)
    rows = [(i, 0, [1.0] * 16) for i in range(40)]  # identical clones
    for i in range(40, 48):  # scattered, unique-ish
        rows.append((i, 0, [float(x) for x in rng.normal(size=16)]))
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r.vec_id: r
        for r in QUERIES["d15_incremental_semantic"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # new ids are multiples of 5; clone news (0..35) all match corpus
    for vid in range(0, 40, 5):
        assert out[vid].status == "dup_corpus"
        assert out[vid].match_id == 1  # lowest corpus clone id
    assert out[45].status in ("unique", "dup_corpus")  # scattered


def test_seasonal_decompose_identity_and_edges(spark, sf_dir):
    """m9: trend exists exactly where a full centered 7-day window
    exists (never on the first/last 3 dates); wherever trend exists,
    y == trend + seasonal + resid to the last bit (resid is defined as
    the closure); seasonal is constant per day-of-week."""
    out = (
        QUERIES["m9_seasonal_decompose"].fn(spark, sf_dir)
        .orderBy("d")
        .toPandas()
    )
    n = len(out)
    assert out["trend"].isna().tolist() == [
        i < 3 or i >= n - 3 for i in range(n)
    ]
    mid = out[out["trend"].notna()]
    assert (
        (mid["y"] - mid["trend"] - mid["seasonal"]) == mid["resid"]
    ).all()
    import pandas as pd

    dows = pd.to_datetime(out["d"]).dt.dayofweek
    assert out.groupby(dows)["seasonal"].nunique().le(1).all()


def test_nb_classifier_beats_chance_and_covers_corpus(spark, sf_dir):
    """x25: one verdict per document; train accuracy must beat the
    5-class chance baseline (the synthetic labels are weakly but
    genuinely token-separable)."""
    out = QUERIES["x25_nb_classifier"].fn(spark, sf_dir).toPandas()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    assert out["correct"].mean() > 0.3  # chance = 0.2


def test_knn_join_k_larger_than_corpus(spark, tmp_path):
    """Queries with a corpus smaller than k emit one row per corpus
    vector (rnk never pads) — no error, no duplicate ranks."""
    rows = [(i, 0, [float(i + 1), 0.0]) for i in range(12)]
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QUERIES["n7_knn_join"].fn(spark, str(tmp_path)).toPandas()
    # 10 queries x 2 corpus vectors (ids 10, 11)
    assert len(out) == 20
    assert set(out["rnk"]) == {1, 2}
    assert out.groupby("query_id")["rnk"].count().eq(2).all()
