"""Skew-mitigation primitives for hot-key aggregations and joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these helpers cover the two cases AQE can't fix:

- ``salted_agg``: a hot grouping key that overwhelms one reducer. Salting
  splits each key into ``n_salts`` subkeys for the partial aggregate, then
  merges — two small shuffles instead of one skewed one. Correct for any
  algebraic aggregate (sum/count/min/max; avg = sum+count then divide).
- ``replicated_skew_join``: a fact⋈fact equi-join where one side has hot
  keys and neither fits in a broadcast. The hot side is salted, the other
  side replicated across the salt space for those keys only.

Both are pure DataFrame compositions: no partitioner surgery, Catalyst still
plans each phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {"sum", "count", "min", "max"}. Example::

        salted_agg(li, ["l_partkey"], {"qty": ("l_quantity", "sum"),
                                       "n":   ("l_quantity", "count")})
    """
    partial_aggs, final_aggs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_aggs.append(F.count(col).alias(f"__p_{out}"))
            final_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{out}"))
            final_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"__p_{out}"))
            final_aggs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"__p_{out}"))
            final_aggs.append(F.max(f"__p_{out}").alias(out))
        else:  # pragma: no cover
            raise ValueError(f"non-algebraic aggregate: {fn}")
    partial = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    ).groupBy(*group_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def replicated_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit hot-key replication.

    Rows of ``left`` with ``on`` in ``hot_keys`` get a random salt in
    [0, n_salts); the matching ``right`` rows are replicated once per salt.
    Non-hot keys join normally (salt 0 on both sides). Result is identical
    to ``left.join(right, on, how)`` for ``how`` in {'inner', 'left',
    'left_semi'} ONLY — under right/full outer an unmatched hot-key right
    row exists once per salt and would be emitted ``n_salts`` times, so
    those modes are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi"}
    if how not in allowed:
        raise ValueError(
            f"replicated_skew_join supports how in {sorted(allowed)}; "
            f"got {how!r} (right/full outer would duplicate unmatched "
            f"hot-key right rows once per salt)"
        )
    hot = F.col(on).isin(hot_keys)
    l_salted = left.withColumn(
        "__salt",
        F.when(hot, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    r_replicated = (
        right.withColumn(
            "__salts", F.when(hot, salts).otherwise(F.array(F.lit(0)))
        )
        .withColumn("__salt", F.explode("__salts"))
        .drop("__salts")
    )
    return l_salted.join(r_replicated, on=[on, "__salt"], how=how).drop("__salt")
