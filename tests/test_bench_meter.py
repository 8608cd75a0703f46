"""The bench meter must defeat Catalyst's count() pruning.

Discovered in round 3: timing `query.count()` measures a PRUNED plan —
aggregate value columns are dropped, and a left-join-then-group-on-
left-keys query loses the join entirely (EliminateOuterJoin), so the
"benchmark" ran a plan with no join in it. These tests pin (a) that the
pruning is real (else the fix is pointless) and (b) that bench.py's
_run_full forces the full plan.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _run_full  # noqa: E402

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    # run the plan so AQE finalizes, then read the executed plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_count_prunes_the_outer_join(spark):
    """j6 is left-join + group-on-left-keys: under count(), Catalyst
    eliminates the join — the shape that made count() a fake meter."""
    df = QUERIES["j6_range_join"].fn(spark, SF)
    counted = df.groupBy().count()
    plan = counted._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, (
        "count() no longer prunes the join; the _run_full rationale "
        "should be revisited (but keeping it stays correct)"
    )


def test_run_full_keeps_the_join_and_matches_count(spark):
    import pyspark.sql.functions as F

    df = QUERIES["j6_range_join"].fn(spark, SF)
    # the meter's row count must agree with a plain count...
    n_forced = _run_full(QUERIES["j6_range_join"].fn(spark, SF))
    n_plain = QUERIES["j6_range_join"].fn(spark, SF).count()
    assert n_forced == n_plain
    # ...and the metered plan must still contain the join
    metered = df.agg(
        F.count(F.lit(1)),
        F.max(F.xxhash64(*[F.col(c) for c in df.columns])),
    )
    plan = metered._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
