"""Probabilistic-membership sketch: a hand-rolled, engine-portable Bloom
filter.

Spark ships a native Bloom filter (``bloom_filter_agg`` / the DataFrame
``stat.bloomFilter``), but its bit layout is JVM-specific — results can
never be checked against another engine. This one derives every bit
position from md5 hex nibbles, exactly like the registry's MinHash and HLL
sketches, so a SQL engine computes the identical filter and the identical
membership verdicts (the a13 oracle does).

At 100 TB the use case is join pre-filtering: build the filter over the
small side's keys (one shuffle-free aggregate into ``m`` bits), broadcast
it, and drop non-member fact rows BEFORE the join shuffle — the classic
semi-join reduction. False positives only cost wasted shuffle rows, never
correctness, and the fp rate is (1 - e^(-k*n/m))^k, tuned by m.

Reference parity: the reference prunes with driver-side Python sets
(src/data_processor.py product-id lookups); this is the distributed,
bounded-memory rendition of the same membership question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-hex-nibble arithmetic shared with the HLL sketch: nibble value of
#: hex char at 1-based position `pos` of column `__h`.
_NIB = "(instr('0123456789abcdef', substring(__h, {pos}, 1)) - 1)"


def _position_expr(n_hashes: int, m_bits: int, ctor: str = "array") -> str:
    """SQL array of ``n_hashes`` bit positions for the key hash ``__h``.

    Hash i reads 8 hex nibbles starting at nibble 8*i+1 (md5 has 32 —
    supports up to 4 independent 32-bit hashes) as a 32-bit integer, mod
    ``m_bits``. The nibble arithmetic is identical in Spark SQL and
    DuckDB; only the list constructor differs (``array`` vs
    ``list_value``), hence ``ctor``.
    """
    assert 1 <= n_hashes <= 4, "md5 yields 4 independent 32-bit lanes"
    lanes = []
    for i in range(n_hashes):
        nibs = " + ".join(
            f"CAST({_NIB.format(pos=8 * i + 1 + j)} AS BIGINT) * {16 ** (7 - j)}"
            for j in range(8)
        )
        lanes.append(f"CAST(({nibs}) % {m_bits} AS INT)")
    return f"{ctor}(" + ", ".join(lanes) + ")"


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Aggregate a key column into a one-row Bloom filter.

    The filter is materialized as a SORTED array of set bit positions
    (not a packed bitmap): portable across engines, and at most
    ``m_bits`` ints — for the broadcast use case the array form joins
    exactly like the bitmap would. Output: one row
    (bloom_bits array<int>, n_keys bigint).
    """
    pos = _position_expr(n_hashes, m_bits)
    return (
        keys.select(F.md5(F.col(key_col).cast("string")).alias("__h"))
        .select(F.explode(F.expr(pos)).alias("bit"))
        .agg(
            F.array_sort(F.collect_set("bit")).alias("bloom_bits"),
        )
    )


def bloom_member(
    md5_col: str, bloom_bits: Column | str, m_bits: int = 4096, n_hashes: int = 3
) -> Column:
    """Membership predicate: ALL hash positions of the key are set.

    ``md5_col`` names a column already holding ``md5(cast(key as string))``
    — project it once per row first; inlining the md5 here would
    recompute it per nibble (24x). Row-local once the filter is in scope
    (broadcast join or literal): no shuffle, codegen-friendly — the
    shape you put IN FRONT of a big join to cut its shuffle volume.
    """
    bits = (
        F.col(bloom_bits) if isinstance(bloom_bits, str) else bloom_bits
    )
    pos = _position_expr(n_hashes, m_bits).replace("__h", f"`{md5_col}`")
    return F.forall(
        F.expr(pos), lambda p: F.array_contains(bits, p)
    )


def cms_build(
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Count-Min sketch over a key column: (lane, pos, cnt) counter cells.

    Each input row increments one counter per lane (depth md5-derived
    hash lanes, ``pos = lane_hash(key) % width``); the estimate for a
    key is the MIN of its depth counters — an overestimate bounded by
    collision mass, never an undercount. Built with one posexplode +
    one aggregate: at most ``depth * width`` cells come out regardless
    of input size, so the sketch always broadcasts.

    At 100 TB this answers per-key frequency questions (heavy hitters,
    skew detection for salting decisions) in one pass with fixed memory,
    where an exact groupBy on a high-cardinality key would shuffle the
    corpus. Same portability contract as the Bloom/HLL sketches: pure
    md5 nibble arithmetic, so a SQL engine builds the identical sketch.
    """
    pos = _position_expr(depth, width)
    return (
        keys.select(F.md5(F.col(key_col).cast("string")).alias("__h"))
        .select(F.posexplode(F.expr(pos)).alias("lane", "pos"))
        .groupBy("lane", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    probe: DataFrame,
    cms: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Per-key Count-Min estimates: input rows + ``est_count``.

    The probe side explodes its depth positions and joins the (tiny,
    broadcast) sketch; the min over lanes is the estimate. Keys absent
    from the sketch estimate as the collision mass at their cells (>= 0),
    never null — the classic CMS contract.
    """
    pos = _position_expr(depth, width)
    exploded = probe.select(
        "*", F.md5(F.col(key_col).cast("string")).alias("__h")
    ).select("*", F.posexplode(F.expr(pos)).alias("lane", "pos"))
    others = [c for c in probe.columns]
    return (
        exploded.join(F.broadcast(cms), ["lane", "pos"], "left")
        .groupBy(*others)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
