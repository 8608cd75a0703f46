"""Similarity search over embedding columns (array<float>).

Vector math is pure column expressions — ``zip_with`` + a sequential
``aggregate`` fold, evaluated JVM-side. The fold order is left-to-right and
deterministic, which makes results bit-identical across engines (the DuckDB
oracles use the same sequential fold) and across cluster sizes.

Scale paths:
- ``cosine_topk``      : brute force — one broadcast of the query vector,
                         one pass, one top-k. The exact baseline.
- ``lsh_bucket_topk``  : sign-LSH (axis hyperplanes) buckets candidates
                         first; the scan then touches only the query's
                         bucket — the sublinear path. Bucketing is a plain
                         column expression, so the bucket id can be a
                         partition/cluster key for 100 TB corpora.
- ``cosine_pairs_blocked``: near-dup pairs with block-local self-join
                         (block key = label or LSH bucket) instead of n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    The query is a literal array column (broadcast by constant folding, no
    join); ties broken by id for total determinism. Output: (id, cos_sim).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        id_col, cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def sign_lsh_bucket(vec_col: Column | str, n_bits: int = 8) -> Column:
    """Sign-random-projection LSH with axis-aligned hyperplanes: bit i =
    (vec[i] > 0). Deterministic, engine-portable, and a valid (if weak)
    cosine LSH; swap in seeded random hyperplanes for production skew."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    b = None
    for i in range(n_bits):
        term = F.when(F.element_at(col, i + 1) > 0, F.lit(1 << i)).otherwise(0)
        b = term if b is None else b + term
    return b.cast("int")


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only the query's sign-LSH bucket.

    Recall is bucket-limited (single probe); production would multi-probe
    neighboring buckets. Output: (id, cos_sim) from within the bucket.
    """
    qbucket = sum((1 << i) for i, v in enumerate(query_vec[:n_bits]) if v > 0)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = embeddings.withColumn("__bucket", sign_lsh_bucket(vec_col, n_bits))
    return (
        bucketed.filter(F.col("__bucket") == qbucket)
        .select(id_col, cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_blocked(
    embeddings: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine >= threshold, comparing only
    within blocks (a label, cluster id, or LSH bucket).

    The block-equi-join replaces the n² cross join with Σ block² work —
    the embedding-space analogue of LSH banding. Output:
    (vec_a, vec_b, cos_sim).
    """
    a = embeddings.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("emb_a"),
    )
    b = embeddings.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("emb_b"),
    )
    return (
        a.join(b, on="__blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cosine("emb_a", "emb_b"))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )
