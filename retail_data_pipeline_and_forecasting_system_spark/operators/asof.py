"""As-of (temporal nearest) join — the time-series operator Spark lacks.

``asof_join(left, right, ...)`` attaches, to every left row, the latest
right row with the same key whose timestamp is at-or-before the left row's
timestamp (``direction='backward'``; ``'forward'`` mirrors it). The classic
uses: trade->latest-quote, purchase->latest-click attribution, reading->
latest-calibration.

Scale shape (the reason this is NOT a range join): union the two sides,
hash-partition by key, sort each partition by time, and carry the most
recent right row forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. ONE shuffle on the key, zero join fanout —
a range join ``r.ts <= l.ts`` explodes to Σ(per-key |L|·|R|) candidate
rows before its top-1 filter, which at 100 TB is the difference between
a linear sort-merge pass and a quadratic blow-up. Tie semantics are
pinned: at equal timestamps the right row is visible to the left row
(at-or-*before* is inclusive), and among right rows sharing a timestamp
the greatest tiebreaker wins going backward, the least going forward —
deterministic on any executor count.

Reference anchor: generalizes the reference's per-day sequential scans
(src/data_processor.py:258-300 walks transactions in timestamp order) to
a distributed temporal join; SURVEY.md §2 J-family extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row + the temporally nearest right row.

    Parameters
    ----------
    on : equi-key present in both frames (e.g. ``user_id``).
    left_ts / right_ts : event-time columns. ``right_ts`` must not collide
        with a left column name (rename upstream if it does).
    right_tiebreak : right column that breaks equal-timestamp ties
        (greatest wins backward, least forward) — REQUIRED, and must be
        unique within (key, timestamp) for the result to be fully
        deterministic (a unique row id qualifies).
    direction : ``'backward'`` (latest right at-or-before left) or
        ``'forward'`` (earliest right at-or-after left).
    strict : exclude equal timestamps (strictly before / strictly after).

    Returns all left columns plus the matched right columns (NULL when no
    right row qualifies). Distributed shape: one hash partitioning on
    ``on``, one per-partition sort — no join, no candidate explosion.

    NULL-timestamp policy (matches the SQL comparison semantics of the
    j9 oracle, where ``r.ts <= l.ts`` is never true for NULL): a right
    row with NULL ``right_ts`` never matches any left row and is dropped
    before the union; a left row with NULL ``left_ts`` is preserved in
    the output with NULL right payload (no right row is at-or-before /
    at-or-after an unknown time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    left_cols = left.columns
    right_payload = [c for c in right.columns if c != on]
    overlap = set(left_cols) & set(right_payload)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")

    # one unioned frame: __t is the sort time, __side orders right rows
    # before (backward) / after (forward) left rows at equal timestamps so
    # inclusive matches are visible exactly when semantics say they are;
    # `strict` flips that order instead of adding a second filter pass.
    # At equal timestamps the right row must sort before the left row in
    # the carry-forward order exactly when the match is inclusive — true
    # for both directions (forward reverses the TIME order, not the
    # side order).
    inclusive = not strict
    right_first = inclusive

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1 if right_first else 0).alias("__side"),
        F.struct(*left_cols).alias("__l"),
        F.lit(None)
        .cast(right.select(F.struct(*right_payload)).schema[0].dataType)
        .alias("__r"),
        F.lit(None).cast(dict(right.dtypes)[right_tiebreak]).alias("__tb"),
    )
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0 if right_first else 1).alias("__side"),
        F.lit(None)
        .cast(left.select(F.struct(*left_cols)).schema[0].dataType)
        .alias("__l"),
        F.struct(*right_payload).alias("__r"),
        F.col(right_tiebreak).alias("__tb"),
    )
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # carry the latest right row seen so far; greatest tiebreaker is
        # sorted last among equal (__t, __side) so last() picks it.
        # NULL-ts left rows sort FIRST (explicitly) so nothing has been
        # carried when they are evaluated -> NULL match, per the policy.
        order: list[Column] = [
            F.col("__t").asc_nulls_first(),
            F.col("__side"),
            F.col("__tb"),
        ]
        frame = W.partitionBy("__k").orderBy(*order).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    else:
        # forward = backward over reversed time; smallest tiebreaker wins
        # among equal timestamps, so sort it descending (last() picks min).
        # desc_nulls_first keeps NULL-ts left rows ahead of every carried
        # right row (plain desc would sort them LAST and hand them the
        # final right row — the divergence flagged in round-3 ADVICE).
        order = [
            F.col("__t").desc_nulls_first(),
            F.col("__side"),
            F.col("__tb").desc(),
        ]
        frame = W.partitionBy("__k").orderBy(*order).rowsBetween(
            W.unboundedPreceding, W.currentRow
        )

    carried = u.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(frame)
    ).filter(F.col("__l").isNotNull())

    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )
