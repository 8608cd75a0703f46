"""asof_join semantics: direction, inclusivity, ties, and no-match rows.

Hand-built frames so every boundary case is explicit; the registry's
j9_asof_join carries the DuckDB cross-check at corpus scale.
"""

from __future__ import annotations

import datetime as dt

import pytest

from retail_data_pipeline_and_forecasting_system_spark.operators.asof import (
    asof_join,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(10)),  # strictly after right@5, equal to right@10
            (1, 101, _ts(3)),   # before every right row for key 1
            (2, 200, _ts(20)),  # only forward matches exist for key 2
            (3, 300, _ts(7)),   # key absent from right entirely
        ],
        "k long, left_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, _ts(5)),
            (1, 901, _ts(10)),  # equal-ts tie pair ...
            (1, 902, _ts(10)),  # ... greatest id must win backward
            (2, 910, _ts(25)),
            (2, 911, _ts(25)),  # forward tie: least id must win
        ],
        "k long, rid long, rts timestamp",
    )
    return left, right


def _rows(df):
    return {
        r["left_id"]: (r["rid"], r["rts"])
        for r in df.select("left_id", "rid", "rts").collect()
    }


def test_backward_inclusive(spark, frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  right_tiebreak="rid")
    )
    assert out[100] == (902, _ts(10))  # equal ts visible; max id tie-win
    assert out[101] == (None, None)    # nothing at-or-before
    assert out[200] == (None, None)    # right rows only in the future
    assert out[300] == (None, None)    # key has no right rows


def test_backward_strict(spark, frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  right_tiebreak="rid", strict=True)
    )
    assert out[100] == (900, _ts(5))   # equal ts excluded -> falls back


def test_forward_inclusive(spark, frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  right_tiebreak="rid", direction="forward")
    )
    assert out[100] == (901, _ts(10))  # equal ts visible; min id tie-win
    assert out[101] == (900, _ts(5))   # earliest at-or-after
    assert out[200] == (910, _ts(25))  # forward tie: least id
    assert out[300] == (None, None)


def test_forward_strict(spark, frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  right_tiebreak="rid", direction="forward", strict=True)
    )
    assert out[101] == (900, _ts(5))   # 3 < 5 strictly, unchanged
    # left@10: right@10 excluded, no later right rows for key 1
    assert out[100] == (None, None)


def test_null_timestamps_never_match(spark, frames):
    """Round-3 ADVICE: NULL-ts right rows must never match (SQL comparison
    semantics — ``r.ts <= l.ts`` is never true for NULL), and NULL-ts left
    rows must survive with NULL payload in BOTH directions."""
    left, right = frames
    left_n = left.unionByName(
        spark.createDataFrame(
            [(1, 400, None)], "k long, left_id long, ts timestamp"
        )
    )
    right_n = right.unionByName(
        spark.createDataFrame(
            [(1, 990, None), (3, 991, None)],
            "k long, rid long, rts timestamp",
        )
    )
    for direction in ("backward", "forward"):
        out = _rows(
            asof_join(left_n, right_n, on="k", left_ts="ts", right_ts="rts",
                      right_tiebreak="rid", direction=direction)
        )
        assert out[400] == (None, None), direction  # NULL left ts
        assert out[300] == (None, None), direction  # NULL right ts no match
        # non-NULL rows unaffected by the NULL injections
        ref = _rows(
            asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                      right_tiebreak="rid", direction=direction)
        )
        for lid in (100, 101, 200):
            assert out[lid] == ref[lid], (direction, lid)


def test_column_collision_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rts", "ts"), on="k",
                  left_ts="ts", right_ts="ts", right_tiebreak="rid")


def test_all_left_columns_preserved(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_tiebreak="rid")
    assert out.columns == ["k", "left_id", "ts", "rid", "rts"]
    assert out.count() == left.count()
