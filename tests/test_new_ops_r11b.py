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


# --------------------------------------------------------------- n16


def _staged_embeddings(spark, tmp_path, rows, dim):
    d = tmp_path / "sfe"
    d.mkdir()
    spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_n16_basis_vectors_hand_math(spark, tmp_path):
    """Projecting the i-th basis vector must yield exactly
    s_j[i]/sqrt(k) in coordinate j (the sign matrix column), and the
    zero vector must project to all-zeros with a NULL norm_ratio."""
    import math

    from retail_data_pipeline_and_forecasting_system_spark.operators.similarity import (  # noqa: E501
        rp_signs,
        signed_random_projection,
    )

    dim, k = 8, 4
    signs = rp_signs(k, dim)
    rows = [(i, [1.0 if j == i else 0.0 for j in range(dim)], 0)
            for i in range(dim)]
    rows.append((100, [0.0] * dim, 0))
    sf = _staged_embeddings(spark, tmp_path, rows, dim)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = {
        r.vec_id: r
        for r in signed_random_projection(emb, out_dim=k, in_dim=dim)
        .collect()
    }
    root = math.sqrt(k)
    for i in range(dim):
        for j in range(k):
            assert got[i][f"y{j}"] == signs[j][i] / root, (i, j)
        assert abs(got[i].norm_ratio - 1.0) < 1e-12  # ±1 signs: |y|²=|x|²... per basis vector exactly k*(1/k)=1
    z = got[100]
    assert all(z[f"y{j}"] == 0.0 for j in range(k))
    assert z.norm_ratio is None


def test_n16_jl_distortion_bounds(spark):
    """On the real sf0.001 embeddings the per-vector norm distortion
    must be unbiased and bounded: mean within 10% of 1, every vector
    within [0.2, 2.6] (k=16 from d=64 — the ratio is ~chi-square_k/k,
    heavy-tailed at this k; the band is loose but the values are
    DETERMINISTIC because the matrix is fixed, so drift means breakage)."""
    rows = (
        QUERIES["n16_random_projection"]
        .fn(spark, "/root/testdata/sf0.001")
        .select("norm_ratio")
        .collect()
    )
    ratios = [r.norm_ratio for r in rows if r.norm_ratio is not None]
    assert len(ratios) == 500
    mean = sum(ratios) / len(ratios)
    assert abs(mean - 1.0) < 0.1, mean
    assert all(0.2 < r < 2.6 for r in ratios), (min(ratios), max(ratios))


def test_n16_plan_row_local(spark):
    plan = _plan(
        QUERIES["n16_random_projection"].fn(spark, "/root/testdata/sf0.001")
    )
    assert "Exchange" not in plan, plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------------------- pr6


def test_pr6_bfs_hand_graph(spark):
    """Hand graph, distances checked by eye: a chain past the hop cap,
    a two-seed tie resolved to the minimum, and an unreachable node.

        seeds = {1, 2}
        1-3, 3-4, 4-5, 5-6, 6-7, 7-8   (chain: 8 is 6 hops from 1)
        2-4                            (shortcut: 4 is 1 hop from 2)
        9-10                           (island: never reached)
    """
    from retail_data_pipeline_and_forecasting_system_spark.operators.graph import (  # noqa: E501
        bfs_hops,
    )

    und = [(1, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (2, 4), (9, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    got = {
        r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=4).collect()
    }
    assert got == {
        1: 0, 2: 0,          # seeds
        3: 1, 4: 1,          # 4 via seed 2, not 2 hops via 1-3
        5: 2, 6: 3, 7: 4,    # chain layers
        # 8 is 5 hops -> beyond max_hops; 9/10 unreachable
    }


def test_pr6_oracle_agreement_staged(spark, tmp_path):
    """Cross-engine agreement on a staged lineitem whose co-purchase
    graph has two components and a diameter beyond the hop cap."""
    d = tmp_path / "sfl"
    d.mkdir()
    # orders as baskets: parts in the same order are linked
    baskets = [
        (1, [101, 102]), (2, [102, 103]), (3, [103, 104]),
        (4, [104, 105]), (5, [105, 106]), (6, [106, 107]),
        (7, [200, 201]),  # second component, unseeded
    ]
    rows = [
        (ok, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01 00:00:00")
        for ok, parts in baskets
        for i, p in enumerate(parts)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate")).coalesce(
        1
    ).write.parquet(str(d / "lineitem.parquet"))
    sf = str(d)
    got = sorted(
        (r.l_partkey, r.hops)
        for r in QUERIES["pr6_shortest_paths"].fn(spark, sf).collect()
    )
    want = sorted(
        (int(a), int(b))
        for a, b in _oracle(
            QUERIES["pr6_shortest_paths"].sql, sf, table="lineitem"
        ).itertuples(index=False)
    )
    assert got == want
    # seeds are 101,102,103 -> 107 is 4 hops from 103; 200/201 absent
    d_got = dict(got)
    assert d_got[101] == 0 and d_got[102] == 0 and d_got[103] == 0
    assert d_got[104] == 1 and d_got[105] == 2 and d_got[106] == 3
    assert d_got[107] == 4
    assert 200 not in d_got and 201 not in d_got
