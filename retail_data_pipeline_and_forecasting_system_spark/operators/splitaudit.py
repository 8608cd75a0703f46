"""Train/eval split-integrity overlap audit — the leakage-audit
artifact an LLM data release publishes before a corpus ships.

For every (train-shard, eval-set) pair, reports how much of the eval
set leaks into that train shard at three severity tiers:

- ``exact``   — identical content (md5(text) equality), d1's key;
- ``near_dup``— MinHash-band candidates verified at exact word-shingle
                Jaccard >= threshold, d3's exact machinery;
- ``ngram``   — at least one shared RARE k-word shingle (document
                frequency <= max_df over the full corpus), the
                x13-style n-gram collision at PAIR grain.

Tiers are INCLUSIVE (an exact dup is normally also a near-dup and an
n-gram hit) — consumers pick their severity bar; the per-tier example
pair (min train id, min eval id) gives an auditor a concrete document
pair to eyeball per cell.

Splits and shards are the house content-hash convention (x6 split /
x32 shard layout): nibble = first hex digit of md5(doc_id) — train is
nibble 0..11, 'val' 12..13, 'test' 14..15, and the train SHARD is the
nibble itself, so every (shard, eval-set) cell is a deterministic,
restart-stable partition of the audit. Rows with NULL doc_id have no
nibble and are excluded from the audit (they cannot be addressed by a
release manifest either).

Scale: the side restriction (train vs eval) happens BEFORE each pair
join, so train x train and eval x eval pairs are never formed — at
100 TB the eval side is a held-out set orders of magnitude smaller
than the corpus, and each tier's join is keyed (content key / band
bucket / rare shingle) with the d2/d3 fanout bounds: the rare-shingle
cap bounds n-gram fanout at max_df^2 per shingle key, band buckets
keep near-dup candidate generation sub-quadratic, and the final
aggregate is at (shard, eval_set, tier) grain — at most
12 x 2 x 3 = 72 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import word_shingles
from .dedup import _band_buckets, _rare_shingles, _verify_candidates


def split_nibble(c: Column) -> Column:
    """First hex digit of md5(id) as 0..15 — the x6/x32 convention.
    NULL id -> NULL nibble (the row belongs to no split or shard)."""
    return (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(c.cast("string")), 1, 1),
        )
        - 1
    ).cast("int")


def split_overlap_audit(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    near_threshold: float = 0.35,
    k: int = 3,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (train_shard, eval_set, tier): distinct leaked-into train
    docs, distinct (train, eval) pairs, and the (min train id, min
    eval id) example pair. Output columns: train_shard, eval_set,
    tier, n_train_docs, n_pairs, example_train_id, example_eval_id."""
    from pyspark import StorageLevel

    from ..caching import track

    nib = split_nibble(F.col(id_col))
    # side restriction is a pure map-side filter on the id hash — no
    # label table, no join; NULL nibbles fail both predicates
    train = docs.filter(nib < 12)
    evals = docs.filter(nib >= 12)

    # ---- exact tier: content-key equi-join, train side x eval side
    def keyed(side: DataFrame, out: str) -> DataFrame:
        return side.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias(out), F.md5(F.col(text_col)).alias("__ck")
        )

    ex = (
        keyed(train, "train_id")
        .join(keyed(evals, "eval_id"), "__ck")
        .select("train_id", "eval_id")
    )

    # ---- near-dup tier: d3's band buckets, sides restricted BEFORE
    # the bucket join, then d3's row-local exact-Jaccard verification
    buckets = track(
        _band_buckets(
            docs, num_hashes, bands, k=k, id_col=id_col, text_col=text_col
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    bnib = split_nibble(F.col(id_col))
    ba = buckets.filter(bnib < 12).select(
        F.col(id_col).alias("train_id"), "band", "bucket"
    )
    bb = buckets.filter(bnib >= 12).select(
        F.col(id_col).alias("eval_id"), "band", "bucket"
    )
    cand = (
        ba.join(bb, ["band", "bucket"])
        .select("train_id", "eval_id")
        .distinct()
    )
    near = _verify_candidates(
        cand, docs, k, near_threshold, id_col, text_col,
        "train_id", "eval_id",
    ).select("train_id", "eval_id")

    # ---- n-gram tier: >= 1 shared rare shingle (df-capped inverted
    # index, the d2 fanout bound), sides restricted before the join
    sh = track(
        _rare_shingles(
            word_shingles(docs, k=k, id_col=id_col, text_col=text_col),
            max_df,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    snib = split_nibble(F.col(id_col))
    sa = sh.filter(snib < 12).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    sb = sh.filter(snib >= 12).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    ng = sa.join(sb, "shingle").select("train_id", "eval_id").distinct()

    tiers = (
        ex.select(F.lit("exact").alias("tier"), "train_id", "eval_id")
        .unionByName(
            near.select(
                F.lit("near_dup").alias("tier"), "train_id", "eval_id"
            )
        )
        .unionByName(
            ng.select(F.lit("ngram").alias("tier"), "train_id", "eval_id")
        )
    )
    # shard and eval_set recomputed map-side from the pair ids — the
    # split is a pure function of the id, so no label join is needed
    out = tiers.select(
        "tier",
        "train_id",
        "eval_id",
        split_nibble(F.col("train_id")).alias("train_shard"),
        F.when(split_nibble(F.col("eval_id")) < 14, "val")
        .otherwise("test")
        .alias("eval_set"),
    )
    return out.groupBy("train_shard", "eval_set", "tier").agg(
        F.countDistinct("train_id").cast("bigint").alias("n_train_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("train_id").cast("bigint").alias("example_train_id"),
        F.min("eval_id").cast("bigint").alias("example_eval_id"),
    )
