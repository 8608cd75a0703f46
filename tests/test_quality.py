"""check_expectations semantics: rule kinds, NULL handling, empty input."""

from __future__ import annotations

import pytest

from retail_data_pipeline_and_forecasting_system_spark.operators import (
    quality as Q,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 1, 10.0, "A"),
            (1, 2, None, "A"),     # null qty
            (2, 1, 500.0, "N"),    # out of range
            (2, 1, 20.0, "X"),     # dup key + bad flag
            (9, 1, 30.0, "R"),     # orphan order key
        ],
        "okey long, line long, qty double, flag string",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "o_key long")


def _report(df, rules):
    return {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in Q.check_expectations(df, rules).collect()
    }


def test_all_rule_kinds(spark, frame, dim):
    rep = _report(
        frame,
        [
            Q.not_null("qty"),
            Q.in_range("qty", 0, 100),
            Q.accepted_values("flag", ["A", "N", "R"]),
            Q.predicate("qty_max_1000", "qty IS NULL OR qty <= 1000"),
            Q.unique(["okey", "line"]),
            Q.foreign_key(["okey"], dim, ["o_key"]),
        ],
    )
    assert rep["not_null(qty)"] == (1, False)
    # NULL does not violate a range rule
    assert rep["in_range(qty,0,100)"] == (1, False)
    assert rep["accepted_values(flag)"] == (1, False)
    assert rep["qty_max_1000"] == (0, True)
    assert rep["unique(okey,line)"] == (1, False)
    assert rep["foreign_key(okey)"] == (1, False)


def test_unique_null_keys_match_sql_distinct(spark):
    """Round-3 ADVICE: NULL-containing key tuples must count as distinct
    groups (DuckDB's count(DISTINCT (a,b)) semantics), not as automatic
    violations. Two identical NULL-keyed rows ARE one dup violation."""
    df = spark.createDataFrame(
        [(1, 1), (1, None), (1, None), (None, None), (2, 2)],
        "a int, b int",
    )
    rep = _report(df, [Q.unique(["a", "b"])])
    # 5 rows, distinct groups: (1,1) (1,NULL) (NULL,NULL) (2,2) -> 4
    assert rep["unique(a,b)"] == (1, False)


def test_rule_name_with_quotes_safe(spark, frame):
    """Round-3 ADVICE: a rule name containing quotes/backticks must not
    break the unpivot (previously string-interpolated into stack())."""
    name = "q'ty `weird` \"name\""
    rep = _report(frame, [Q.predicate(name, "qty IS NULL OR qty <= 1000")])
    assert rep[name] == (0, True)


def test_fk_prefix_user_column_survives(spark, frame, dim):
    """Round-3 ADVICE: tag_violations must drop only its own markers, not
    a pre-existing user column that happens to start with '__fk_'."""
    df = frame.withColumn("__fk_0", frame["okey"] * 10)
    tagged = Q.tag_violations(df, [Q.foreign_key(["okey"], dim, ["o_key"])])
    assert "__fk_0" in tagged.columns
    rows = {r["okey"]: r for r in tagged.collect()}
    assert rows[9]["violated"] == "foreign_key(okey)"
    assert rows[9]["__fk_0"] == 90


def test_empty_input_all_pass(spark, frame, dim):
    empty = frame.limit(0)
    rep = _report(
        empty,
        [
            Q.not_null("qty"),
            Q.in_range("qty", 0, 100),
            Q.unique(["okey", "line"]),
            Q.foreign_key(["okey"], dim, ["o_key"]),
        ],
    )
    assert all(v == (0, True) for v in rep.values()), rep


def test_predicate_null_condition_not_counted(spark, frame):
    # qty > 0 is NULL for the null-qty row: NULL is not a violation
    # (pair with not_null to forbid NULLs) — pinned, not accidental
    rep = _report(frame, [Q.predicate("qty_positive", "qty > 0")])
    assert rep["qty_positive"] == (0, True)


def test_split_partitions_and_tags(spark, frame, dim):
    clean, bad = Q.split_by_expectations(
        frame,
        [
            Q.not_null("qty"),
            Q.in_range("qty", 0, 100),
            Q.foreign_key(["okey"], dim, ["o_key"]),
        ],
    )
    assert clean.columns == frame.columns  # tag column removed
    assert clean.count() + bad.count() == frame.count()
    tags = {
        (r["okey"], r["line"]): r["violated"] for r in bad.collect()
    }
    assert tags[(1, 2)] == "not_null(qty)"
    assert tags[(2, 1)] in (
        "in_range(qty,0,100)",  # the 500.0 row
    )
    assert tags[(9, 1)] == "foreign_key(okey)"
    # the (2,1,20.0,'X') row is clean under these rules (flag not checked)
    assert bad.count() == 3


def test_multiple_violations_joined(spark, dim):
    one = dim.sparkSession.createDataFrame(
        [(9, 1, None, "A")], "okey long, line long, qty double, flag string"
    )
    tagged = Q.tag_violations(
        one, [Q.not_null("qty"), Q.foreign_key(["okey"], dim, ["o_key"])]
    )
    assert tagged.first()["violated"] == "not_null(qty);foreign_key(okey)"


def test_unique_rule_rejected_for_tagging(spark, frame):
    with pytest.raises(ValueError, match="unique"):
        Q.tag_violations(frame, [Q.unique(["okey", "line"])])


def test_no_rules_all_clean(spark, frame):
    clean, bad = Q.split_by_expectations(frame, [])
    assert clean.count() == frame.count() and bad.count() == 0


def test_one_scan_for_rowwise_rules(spark, frame):
    plan = Q.check_expectations(
        frame,
        [Q.not_null("qty"), Q.in_range("qty", 0, 100),
         Q.accepted_values("flag", ["A"])],
    )._jdf.queryExecution().executedPlan().toString()
    # a single aggregate over one scan — rules are columns, not jobs
    assert plan.count("Scan ExistingRDD") <= 1
