"""Round-7 closing additions: OHLC bars, item-item similarity, and the
classifier-evaluation rollup — each on a hand-built corpus where the
expected values are derivable by eye (or a short hand computation),
independently of both the engine and the DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt

import pytest

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)


def test_ohlc_hand_values(spark, tmp_path):
    """OHLC on hand-placed points, including a timestamp TIE at the
    bucket open: two points share t=0, so open must come from the lower
    event_id (the deterministic tiebreak), not from either min/max."""
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (0, base, 1, "trade", 8.0, "{}"),  # t=0, wins the open tiebreak
        (1, base, 1, "trade", 5.0, "{}"),  # t=0, same instant
        (2, base + dt.timedelta(seconds=10), 1, "trade", 9.0, "{}"),
        (3, base + dt.timedelta(seconds=20), 1, "trade", 1.0, "{}"),
        (4, base + dt.timedelta(seconds=30), 1, "trade", 3.0, "{}"),
        # a second bucket: single point -> all four prices equal it
        (5, base + dt.timedelta(hours=1), 2, "quote", 7.25, "{}"),
        # NULL value: excluded up front (Spark min_by would return it,
        # DuckDB arg_min would skip it — the one engine divergence)
        (6, base + dt.timedelta(seconds=40), 1, "trade", None, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in QUERIES["h7_ohlc_bars"].fn(spark, str(tmp_path)).collect()
    }
    trade = got["trade"]
    assert trade["n_points"] == 5  # the NULL-value row is not a point
    assert trade["open_v"] == 8.0
    assert trade["high_v"] == 9.0
    assert trade["low_v"] == 1.0
    assert trade["close_v"] == 3.0
    quote = got["quote"]
    assert (
        quote["open_v"],
        quote["high_v"],
        quote["low_v"],
        quote["close_v"],
    ) == (7.25, 7.25, 7.25, 7.25)


def test_item_similarity_hand_values(spark, tmp_path):
    """Co-order Jaccard on a 3-order basket set; the repeated (o1, p1)
    line must NOT double-count (the DISTINCT), and jaccard(1,2) =
    2 / (3 + 2 - 2) = 2/3 while jaccard(1,3) = 1 / (3 + 1 - 1) = 1/3."""
    rows = [
        (100, 1),
        (100, 1),  # duplicate line: same part twice in one order
        (100, 2),
        (200, 1),
        (200, 2),
        (300, 1),
        (300, 3),
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    out = {
        (r["pk_a"], r["pk_b"]): r
        for r in QUERIES["pr4_item_similarity"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    # p2 and p3 never share an order -> no (2, 3)/(3, 2) rows; the
    # symmetrized output gives EVERY part its list, with n_a/n_b
    # swapped on the mirrored orientation
    assert set(out) == {(1, 2), (2, 1), (1, 3), (3, 1)}
    r12 = out[(1, 2)]
    assert (r12["co"], r12["n_a"], r12["n_b"]) == (2, 3, 2)
    assert r12["jaccard"] == pytest.approx(2 / 3, abs=1e-6)
    r21 = out[(2, 1)]
    assert (r21["co"], r21["n_a"], r21["n_b"]) == (2, 2, 3)
    assert r21["jaccard"] == pytest.approx(2 / 3, abs=1e-6)
    r13 = out[(1, 3)]
    assert (r13["co"], r13["n_a"], r13["n_b"]) == (1, 3, 1)
    assert r13["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
    assert (out[(3, 1)]["n_a"], out[(3, 1)]["n_b"]) == (1, 3)


def test_classifier_eval_hand_confusion(spark, tmp_path):
    """A corpus built so the NB predictions (and hence the confusion
    matrix) are hand-derivable: d4 is labeled de but written entirely in
    en vocabulary, and with equal priors its en likelihood dominates
    (ln(4/10) per token vs ln(2/9)) -> exactly one misclassification.

    en: precision 2/3, recall 1, F1 2*2/(3+2) = 0.8
    de: precision 1, recall 1/2, F1 2*1/(1+2) = 2/3
    """
    docs = [
        (1, "apple apple banana", "en", "web", 18),
        (2, "apple banana banana", "en", "web", 19),
        (3, "zebra zebra quark", "de", "web", 17),
        (4, "apple banana", "de", "web", 12),  # mislabeled on purpose
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["lang"]: r
        for r in QUERIES["ev3_classifier_eval"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    en, de = got["en"], got["de"]
    assert (en["support_n"], en["tp"], en["pred_n"]) == (2, 2, 3)
    assert en["precision_v"] == pytest.approx(2 / 3, abs=1e-6)
    assert en["recall_v"] == 1.0
    assert en["f1_v"] == pytest.approx(0.8, abs=1e-6)
    assert (de["support_n"], de["tp"], de["pred_n"]) == (2, 1, 1)
    assert de["precision_v"] == 1.0
    assert de["recall_v"] == pytest.approx(0.5, abs=1e-6)
    assert de["f1_v"] == pytest.approx(2 / 3, abs=1e-6)


def test_ann_ndcg_hand_values(spark, tmp_path):
    """nDCG on a hand-built 4-vector corpus where the retrieval outcome
    is derivable by eye: the probe bucket (all-positive signs) holds
    only c1, the exact top-3 is c1 (cos~1), c2 (cos 0.75), c3 (cos 0),
    so DCG = rel(c1)/log2(2) = 5 and IDCG = 5 + 4/log2(3) + 3/log2(4);
    expected values recomputed with an independent math.log fold."""
    import math

    from retail_data_pipeline_and_forecasting_system_spark.operators import (
        similarity as SIM,
    )

    rows = [
        (0, [1.0] * 8, "q"),
        (1, [0.9] * 8, "a"),                                  # same bucket
        (2, [1.0] * 7 + [-1.0], "a"),                         # bkt differs
        (3, [1.0] * 4 + [-1.0] * 4, "a"),                     # bkt differs
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    [r] = SIM.ann_ndcg(emb, n_queries=1, k=5, n_bits=8).collect()

    disc = lambda p: math.log(p + 1.0) / math.log(2.0)  # noqa: E731
    idcg = 5 / disc(1) + 4 / disc(2) + 3 / disc(3)
    assert r["query_id"] == 0
    assert r["n_approx"] == 1
    assert r["dcg"] == pytest.approx(5.0, abs=1e-9)
    assert r["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert r["ndcg"] == pytest.approx(5.0 / idcg, abs=1e-6)


def test_edit_distance_dedup_hand_values(spark):
    """Levenshtein dedup on a hand-built corpus. Doc texts share a 16+
    char prefix so the block keeps the true pairs; expected distances
    are hand-countable (dog->cat = 3 substitutions, identical = 0).
    Doc 4 is identical to doc 1 AND within 3 edits of doc 2: canonical
    must be the MIN id (1) and the reported distance must belong to
    THAT canonical (0, not 3) — the min_by contract."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.dedup import (
        edit_distance_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, base),
        (2, base.replace("dog", "cat")),  # ed(1,2) = 3
        (3, "completely unrelated text about spark plans"),
        (4, base),  # exact copy of 1
        (5, "x" + base[1:]),  # first char differs -> other block, missed
        (6, base + " padded far beyond the eight-edit length band!!"),
    ]
    out = {
        r["doc_id"]: r
        for r in edit_distance_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == {2, 4}
    assert (out[2]["canonical_id"], out[2]["edit_dist"]) == (1, 3)
    assert (out[4]["canonical_id"], out[4]["edit_dist"]) == (1, 0)


def test_edit_distance_dedup_block_cap(spark):
    """max_block drops an oversized block WHOLE: three identical docs
    in one block with max_block=2 yield no pairs at all, while an
    in-cap block elsewhere still dedups."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.dedup import (
        edit_distance_dedup,
    )

    hot = "boilerplate header that repeats everywhere verbatim"
    cold = "a rare document body that appears exactly twice here"
    rows = [(1, hot), (2, hot), (3, hot), (10, cold), (11, cold)]
    out = edit_distance_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        max_block=2,
    ).collect()
    assert {(r["doc_id"], r["canonical_id"], r["edit_dist"]) for r in out} == {
        (11, 10, 0)
    }


def test_vocab_coverage_hand_values(spark, tmp_path):
    """OOV accounting on a 2-source corpus where counts are countable
    by eye: corpus counts a=4, b=1, c=1. With vocab_k=1 the vocab is
    {a}; with vocab_k=2 the b-vs-c count tie must break token-ASC
    (vocab {a, b}), leaving source A fully covered (empty top_oov)."""
    # the raw module function (the registry wrapper pins (spark, sf))
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        x33_vocab_coverage as fn,
    )

    rows = [(1, "a a a b", "A"), (2, "a c", "B")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    k1 = {r["source"]: r for r in fn(spark, str(tmp_path), vocab_k=1).collect()}
    a, b = k1["A"], k1["B"]
    assert (a["n_docs"], a["total_tokens"], a["oov_tokens"],
            a["n_oov_types"], a["top_oov_token"]) == (1, 4, 1, 1, "b")
    assert a["oov_rate"] == 0.25
    assert (b["total_tokens"], b["oov_tokens"], b["oov_rate"],
            b["top_oov_token"]) == (2, 1, 0.5, "c")

    k2 = {r["source"]: r for r in fn(spark, str(tmp_path), vocab_k=2).collect()}
    assert (k2["A"]["oov_tokens"], k2["A"]["oov_rate"],
            k2["A"]["top_oov_token"]) == (0, 0.0, "")
    assert (k2["B"]["oov_tokens"], k2["B"]["top_oov_token"]) == (1, "c")


def test_incremental_agg_merge_hand_values(spark, tmp_path):
    """ops6 merge on three customers straddling the 1999-01-01 split:
    cust 1 is base-only, cust 2 delta-only, cust 3 in both — the two
    one-sided rows exercise every null-coalesce path of the full-outer
    merge, and cust 3's fields must combine across the split
    (count 1+1, sum 10.50+2.25, min from base, max from delta)."""
    import datetime as dt

    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
    )

    rows = [
        (100, 1, 5.00, dt.datetime(1998, 3, 1)),
        (101, 1, 7.00, dt.datetime(1998, 9, 1)),
        (102, 2, 3.25, dt.datetime(2000, 1, 15)),
        (103, 3, 10.50, dt.datetime(1997, 6, 1)),
        (104, 3, 2.25, dt.datetime(1999, 6, 1)),
        # NULL order date: fails BOTH split predicates under 3-valued
        # logic — must still be counted (routed into delta) or
        # merge == recompute silently loses the row
        (105, 2, 1.00, None),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["o_custkey"]: r
        for r in QUERIES["ops6_incremental_agg"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    c1, c2, c3 = got[1], got[2], got[3]
    assert (c1["n_orders"], c1["total_spent"]) == (2, 12.0)
    assert c1["last_order"] == dt.datetime(1998, 9, 1)
    assert (c2["n_orders"], c2["total_spent"]) == (2, 4.25)
    assert c2["first_order"] == dt.datetime(2000, 1, 15)  # min skips NULL
    assert (c3["n_orders"], c3["total_spent"]) == (2, 12.75)
    assert c3["first_order"] == dt.datetime(1997, 6, 1)
    assert c3["last_order"] == dt.datetime(1999, 6, 1)


def test_cross_source_overlap_hand_values(spark, tmp_path):
    """Provenance matrix on a 3-source corpus: A={h1, h1, h2},
    B={h1, h3}, C={h4}. The within-A duplicate of h1 must NOT
    double-count (the DISTINCT), so (A, B) shares exactly 1 head of
    each side's 2 -> containment 0.5, and C shares nothing -> no row."""
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
    )

    rows = [
        (1, "h1 common head", "A"),
        (2, "h1 common head", "A"),  # same head twice in A
        (3, "h2 only in a", "A"),
        (4, "h1 common head", "B"),
        (5, "h3 only in b", "B"),
        (6, "h4 only in c", "C"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        (r["source_a"], r["source_b"]): r
        for r in QUERIES["d18_cross_source_overlap"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert (r["shared_heads"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert r["containment"] == 0.5


def test_attribution_hand_values(spark, tmp_path):
    """Last-touch attribution on a hand-built stream: an in-window
    purchase credits the latest touch THROUGH an intervening non-touch
    event (the IGNORE NULLS carry), a purchase 8 days after the last
    touch reports 'none' (7-day lookback expiry), a same-instant
    touch+purchase attributes via the (ts, event_id) tiebreak with
    zero elapsed micros, and a touchless user reports 'none'/0."""
    t0 = dt.datetime(2024, 1, 1)

    def at(days=0, secs=0):
        return t0 + dt.timedelta(days=days, seconds=secs)

    rows = [
        (1, at(0), 1, "view", 0.0, "{}"),
        (2, at(1), 1, "click", 0.0, "{}"),
        (8, at(1, 43200), 1, "error", 0.0, "{}"),  # non-touch interloper
        (3, at(2), 1, "purchase", 9.0, "{}"),
        (4, at(9, 1), 1, "purchase", 5.0, "{}"),  # 8d+1s after the click
        (5, dt.datetime(2024, 2, 1), 2, "click", 0.0, "{}"),
        (6, dt.datetime(2024, 2, 1), 2, "purchase", 7.0, "{}"),  # tie
        (7, dt.datetime(2024, 3, 1), 3, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_id"]: r
        for r in QUERIES["e9_attribution"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {3, 4, 6, 7}
    p3 = got[3]
    assert (p3["last_touch_type"], p3["last_touch_id"]) == ("click", 2)
    assert p3["us_since_touch"] == 86400 * 1_000_000
    assert p3["n_touches_7d"] == 2
    p4 = got[4]
    assert (p4["last_touch_type"], p4["last_touch_id"],
            p4["us_since_touch"], p4["n_touches_7d"]) == ("none", None, None, 0)
    p6 = got[6]
    assert (p6["last_touch_type"], p6["us_since_touch"],
            p6["n_touches_7d"]) == ("click", 0, 1)
    p7 = got[7]
    assert (p7["last_touch_type"], p7["n_touches_7d"]) == ("none", 0)


@pytest.mark.parametrize("seed", [7, 41, 1289])
def test_edit_distance_dedup_randomized_differential(spark, seed):
    """Randomized differential test for d17 (the property-test slot the
    hand cases can't fill): a seeded random corpus over a 3-letter
    alphabet, checked against an independent pure-Python implementation
    of the SAME defined semantics — prefix+length-band blocking, unit-
    cost Levenshtein DP, min-id canonical with the distance of THAT
    pair. Short strings + prefix_len=2 make blocks collide heavily, so
    the blocking, band, threshold, and min_by paths all get exercised
    far beyond the hand corpus."""
    import random

    from retail_data_pipeline_and_forecasting_system_spark.operators.dedup import (
        edit_distance_dedup,
    )

    rng = random.Random(seed)
    docs = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 10))))
        for i in range(120)
    ]
    T, P = 3, 2

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    best: dict[int, tuple[int, int]] = {}
    for ia, ta in docs:
        for ib, tb in docs:
            if ia >= ib or ta[:P] != tb[:P] or abs(len(ta) - len(tb)) > T:
                continue
            d = lev(ta, tb)
            if d <= T and (ib not in best or ia < best[ib][0]):
                best[ib] = (ia, d)

    got = {
        r["doc_id"]: (r["canonical_id"], r["edit_dist"])
        for r in edit_distance_dedup(
            spark.createDataFrame(docs, "doc_id long, text string"),
            threshold=T, prefix_len=P, max_block=None,
        ).collect()
    }
    assert got == best


@pytest.mark.parametrize("seed", [11, 503])
def test_attribution_randomized_differential(spark, tmp_path, seed):
    """Randomized differential test for e9: random event streams with
    DELIBERATE timestamp collisions (seconds drawn from a small grid
    over ~20 days) checked against an independent pure-Python forward
    pass — strictly-preceding carry in (ts, event_id) order, range-
    frame touch count order-blind, 7-day boundary inclusive. Exercises
    the tie and expiry edges far beyond the hand stream."""
    import random

    rng = random.Random(seed)
    LB = 7 * 86400 * 1_000_000
    rows = []
    eid = 0
    for user in range(1, 41):
        for _ in range(rng.randint(1, 15)):
            eid += 1
            day = rng.randint(0, 19)
            sec = rng.choice([0, 1, 30, 86399])  # heavy collisions
            ts = dt.datetime(2024, 3, 1) + dt.timedelta(
                days=day, seconds=sec
            )
            etype = rng.choice(
                ["view", "click", "purchase", "error", "signup"]
            )
            rows.append((eid, ts, user, etype, 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    # independent python oracle
    want = {}
    byuser: dict[int, list] = {}
    for eid_, ts, user, etype, _v, _p in rows:
        byuser.setdefault(user, []).append(
            (int(ts.timestamp() * 1_000_000), eid_, etype)
        )
    for user, evs in byuser.items():
        evs.sort()
        touch_pool = [u for u, _i, t in evs if t in ("view", "click")]
        last = None  # (us, id, type)
        for us, eid_, etype in evs:
            if etype == "purchase":
                n7 = sum(1 for tu in touch_pool if us - LB <= tu <= us)
                if last is not None and us - last[0] <= LB:
                    want[eid_] = ("click" if last[2] == "click" else
                                  last[2], last[1], us - last[0], n7)
                else:
                    want[eid_] = ("none", None, None, n7)
            elif etype in ("view", "click"):
                last = (us, eid_, etype)

    got = {
        r["event_id"]: (r["last_touch_type"], r["last_touch_id"],
                        r["us_since_touch"], r["n_touches_7d"])
        for r in QUERIES["e9_attribution"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == want


def test_dedup_recall_hand_values(spark, tmp_path):
    """ev5 arithmetic on a corpus with exactly one true near-dup pair
    (word-level Jaccard 1.0 after the rare-shingle cap — identical
    texts always survive banding) and two unrelated docs: every count
    is 1 and both ratios are exactly 1.0. The interesting degenerate
    paths (zero denominators -> NULL ratios) ride the EMPTY_SWEEP."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s0", 30),
        (2, "alpha beta gamma delta epsilon zeta", "en", "s1", 30),
        (3, "one two three four five six seven", "en", "s0", 30),
        (4, "red green blue cyan magenta yellow", "en", "s1", 30),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    [r] = QUERIES["ev5_dedup_recall"].fn(spark, str(tmp_path)).collect()
    assert (r["n_true"], r["n_detected"], r["n_hit"]) == (1, 1, 1)
    assert (r["recall_v"], r["precision_v"]) == (1.0, 1.0)


def test_column_profile_hand_values(spark, tmp_path):
    """dq3 on a 3-row table with a NULL in three different columns and
    a duplicated money value: per-column null counts, NULL-excluded
    distinct counts, and the portable min/max renderings (int raw,
    money as DECIMAL(18,2) string, timestamp at DATE grain) are all
    hand-checkable."""
    rows = [
        (1, 10, "O", 100.50, dt.datetime(2024, 1, 1)),
        (2, 10, None, None, dt.datetime(2024, 1, 2)),
        (3, 20, "F", 100.50, None),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["col_name"]: r
        for r in QUERIES["dq3_column_profile"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert all(r["n_rows"] == 3 for r in got.values())
    ok = got["o_orderkey"]
    assert (ok["n_nulls"], ok["n_distinct"], ok["min_s"], ok["max_s"]) == (
        0, 3, "1", "3")
    st = got["o_orderstatus"]
    assert (st["n_nulls"], st["n_distinct"], st["min_s"], st["max_s"]) == (
        1, 2, "F", "O")
    tp = got["o_totalprice"]
    assert (tp["n_nulls"], tp["n_distinct"], tp["min_s"], tp["max_s"]) == (
        1, 1, "100.50", "100.50")
    od = got["o_orderdate"]
    assert (od["n_nulls"], od["n_distinct"], od["min_s"], od["max_s"]) == (
        1, 2, "2024-01-01", "2024-01-02")


def _h8_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    [r] = QUERIES["h8_peak_concurrency"].fn(spark, str(tmp_path)).collect()
    return r


def test_peak_concurrency_hand_values(spark, tmp_path):
    """Closed-interval sweep on hand-placed sessions: u1 [10:00,10:10],
    u2 and u5 single-event at 10:05, u3 single-event at 10:10 (overlaps
    u1's endpoint under closed semantics), u4 two events 40 min apart
    = TWO sessions. Peak is 3 (u1+u2+u5 at 10:05), first reached at
    10:05; n_sessions counts u4's gap split."""
    t = lambda h, m: dt.datetime(2024, 3, 6, h, m)  # noqa: E731
    rows = [
        (1, t(10, 0), 1, "view", 0.0, "{}"),
        (2, t(10, 10), 1, "view", 0.0, "{}"),
        (3, t(10, 5), 2, "view", 0.0, "{}"),
        (4, t(10, 10), 3, "view", 0.0, "{}"),
        (5, t(12, 0), 4, "view", 0.0, "{}"),
        (6, t(12, 40), 4, "view", 0.0, "{}"),  # 40 min gap: new session
        (7, t(10, 5), 5, "view", 0.0, "{}"),
    ]
    r = _h8_events(spark, tmp_path, rows)
    assert r["n_sessions"] == 6
    assert r["peak_concurrent"] == 3
    assert r["peak_at"] == t(10, 5)


def test_peak_concurrency_carries_across_buckets(spark, tmp_path):
    """The two-pass prefix sum's carry: a session straddling the
    week-boundary bucket (Sun 23:50 -> Mon 00:10, one 20-min-gap
    session) must still be counted as active inside the next week's
    bucket — peak 2 at Mon 00:05 when the straddler overlaps a fresh
    Monday session. A broken carry would report peak 1."""
    rows = [
        (1, dt.datetime(2024, 3, 3, 23, 50), 1, "view", 0.0, "{}"),
        (2, dt.datetime(2024, 3, 4, 0, 10), 1, "view", 0.0, "{}"),
        (3, dt.datetime(2024, 3, 4, 0, 5), 2, "view", 0.0, "{}"),
        (4, dt.datetime(2024, 3, 4, 0, 8), 2, "view", 0.0, "{}"),
    ]
    r = _h8_events(spark, tmp_path, rows)
    assert r["n_sessions"] == 2
    assert r["peak_concurrent"] == 2
    assert r["peak_at"] == dt.datetime(2024, 3, 4, 0, 5)


@pytest.mark.parametrize("seed", [19, 877])
def test_peak_concurrency_randomized_differential(spark, tmp_path, seed):
    """Randomized differential for h8: random event streams with heavy
    timestamp collisions, checked against an independent pure-Python
    sessionize + closed-interval sweep (sessions ending at t overlap
    sessions starting at t; single-event sessions count at their
    instant; peak_at is the first timestamp reaching the peak)."""
    import random

    rng = random.Random(seed)
    rows = []
    eid = 0
    for user in range(1, 31):
        for _ in range(rng.randint(1, 10)):
            eid += 1
            ts = dt.datetime(2024, 3, 1) + dt.timedelta(
                minutes=rng.randint(0, 600) * 10  # 10-min grid: ties
            )
            rows.append((eid, ts, user, "view", 0.0, "{}"))
    r = _h8_events(spark, tmp_path, rows)

    # independent python oracle
    byuser = {}
    for _eid, ts, user, *_ in rows:
        byuser.setdefault(user, []).append(ts)
    sessions = []
    for user, tss in byuser.items():
        tss.sort()
        start = prev = tss[0]
        for t in tss[1:]:
            if (t - prev).total_seconds() > 1800:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    # closed-interval sweep: at tie instants +1 applies before -1
    deltas = [(s, 0, 1) for s, _ in sessions] + [
        (e, 1, -1) for _, e in sessions
    ]
    deltas.sort()  # (ts, 0/+1-first, delta)
    running = peak = 0
    peak_at = None
    for ts, _o, d in deltas:
        running += d
        if running > peak:
            peak, peak_at = running, ts
    assert r["n_sessions"] == len(sessions)
    assert r["peak_concurrent"] == peak
    assert r["peak_at"] == peak_at


def test_robust_outliers_hand_values(spark, tmp_path):
    """Median/MAD on hand values. Group A = [1,2,3,4,100,NULL]: median
    3, MAD 1, fence 4.4478 -> only 100 flagged (share 1/5; the NULL is
    neither counted nor flagged) — note a mean/std fence would MISS it
    (100 is only ~1.8 sigma in this group), the robustness this
    operator exists for. Group B = [5,5,9]: MAD degenerates to 0, so
    anything off the median is flagged (9) while the all-equal ties
    are not."""
    rows = []
    eid = 0
    for v in [1.0, 2.0, 3.0, 4.0, 100.0, None]:
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1), 1, "A", v, "{}"))
    for v in [5.0, 5.0, 9.0]:
        eid += 1
        rows.append((eid, dt.datetime(2024, 1, 1), 1, "B", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in QUERIES["dq4_robust_outliers"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    a = got["A"]
    assert (a["n_values"], a["med_v"], a["mad_v"]) == (5, 3.0, 1.0)
    assert (a["n_outliers"], a["outlier_share"]) == (1, 0.2)
    b = got["B"]
    assert (b["med_v"], b["mad_v"]) == (5.0, 0.0)
    assert b["n_outliers"] == 1  # MAD 0: anything off the median flags


def test_ngram_novelty_hand_values(spark, tmp_path):
    """3-gram novelty on a hand corpus: doc 1 'a b c d' has grams
    {abc, bcd}; doc 2 'a b c' shares abc, so doc 1's novelty is 1/2
    and doc 2's 0. Doc 3 repeats its unique gram INSIDE itself — the
    doc-distinct step must still count it novel (df counts docs, not
    occurrences). Doc 4 has fewer than 3 words -> no output row."""
    rows = [
        (1, "a b c d", "s"),
        (2, "a b c", "s"),
        (3, "x y z x y z", "s"),  # grams xyz, yzx, zxy, xyz (dup inside)
        (4, "too short", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in QUERIES["x34_ngram_novelty"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == {1, 2, 3}
    assert (got[1]["n_grams"], got[1]["n_novel"]) == (2, 1)
    assert got[1]["novelty"] == 0.5
    assert (got[2]["n_grams"], got[2]["n_novel"], got[2]["novelty"]) == (
        1, 0, 0.0)
    # doc 3: distinct grams {xyz, yzx, zxy} (xyz appears twice inside),
    # all df=1 -> fully novel
    assert (got[3]["n_grams"], got[3]["n_novel"], got[3]["novelty"]) == (
        3, 3, 1.0)


def test_quota_allocation_hand_values(spark, tmp_path):
    """Largest-remainder apportionment on counts the Hare quota makes
    interesting: sources of 5/3/2 docs over budget 100... scaled to a
    10-doc corpus so selection is checkable: A=5, B=3, C=2 -> exact
    shares 50/30/20, no remainders, quotas land exactly; then a 7/2/1
    split forces remainder distribution (70/20/10 exact again — so
    use 6/3/1: shares 60/30/10, still exact...). Counts 5/4/1 give
    (500,400,100)/10 = 50/40/10 exact. To force remainders use
    3 sources of 3/3/4 docs: base = 30/30/40, Σ=100 — exact. With 10
    docs any split is exact (B=100 divisible); so use 13 docs:
    A=6, B=4, C=3 -> base floor(600/13)=46 r2, floor(400/13)=30 r10,
    floor(300/13)=23 r1 -> Σbase=99, leftover 1 goes to B (largest
    remainder 10): quotas 46/31/23 summing to 100. n_selected is
    capped by n_docs (quota > n here), proving the cap behavior is
    visible, not hidden."""
    rows = []
    eid = 0
    for src, k in (("A", 6), ("B", 4), ("C", 3)):
        for _ in range(k):
            eid += 1
            rows.append((eid, f"doc {eid} text", src))
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: r
        for r in QUERIES["smp7_quota_allocation"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert (got["A"]["quota"], got["B"]["quota"], got["C"]["quota"]) == (
        46, 31, 23)
    assert sum(r["quota"] for r in got.values()) == 100
    # budget > corpus here, so selection saturates at n_docs
    assert all(r["n_selected"] == r["n_docs"] for r in got.values())


def test_ks_drift_hand_values(spark, tmp_path):
    """Two-sample KS by hand: type A pre=[1,2] vs post=[1,3] -> ECDF
    gap peaks at v=2 (pre 1.0 vs post 0.5): KS 0.5, with the tied
    value 1 contributing 0 under the count-<=v peers rule. Type B has
    identical halves -> KS exactly 0. A NULL value is excluded."""
    pre, post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    rows = [
        (1, pre, 1, "A", 1.0, "{}"),
        (2, pre, 1, "A", 2.0, "{}"),
        (3, post, 1, "A", 1.0, "{}"),
        (4, post, 1, "A", 3.0, "{}"),
        (5, post, 1, "A", None, "{}"),
        (6, pre, 1, "B", 5.0, "{}"),
        (7, pre, 1, "B", 6.0, "{}"),
        (8, post, 1, "B", 5.0, "{}"),
        (9, post, 1, "B", 6.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in QUERIES["dq5_ks_drift"].fn(spark, str(tmp_path)).collect()
    }
    a = got["A"]
    assert (a["n_pre"], a["n_post"]) == (2, 2)
    assert a["ks_stat"] == 0.5
    b = got["B"]
    assert b["ks_stat"] == 0.0


def test_filtered_ann_hand_values(spark):
    """Filtered ANN semantics on a hand corpus: the query's globally
    NEAREST neighbor (vec 2) carries the wrong label and must be
    excluded BEFORE scoring (pre-filter), and a right-label vector in
    the other IVF cell (vec 4) is excluded by the probe — the top-2
    is exactly the two in-class, in-cell candidates in cosine order."""
    from pyspark.sql import functions as F

    from retail_data_pipeline_and_forecasting_system_spark.operators import (
        similarity as SIM,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "A"),   # query; centroid 0
        (1, [0.0, 1.0, 0.0, 0.0], "B"),   # centroid 1
        (2, [0.99, 0.1, 0.0, 0.0], "B"),  # nearest overall, wrong label
        (3, [0.9, 0.2, 0.0, 0.0], "A"),
        (4, [0.1, 1.0, 0.0, 0.0], "A"),   # right label, other cell
        (5, [0.8, 0.3, 0.0, 0.0], "A"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_vec"),
    )
    model = (
        SIM._collect_centroids(cents),
        [1.0, 0.0, 0.0, 0.0],
    )
    got = SIM.ivf_topk(
        emb.filter(F.col("label") == "A"),
        query_id=0,
        n_centroids=2,
        k=2,
        model=model,
    ).collect()
    assert [r["vec_id"] for r in got] == [3, 5]


def test_session_gap_rule_is_microsecond_exact(spark, tmp_path):
    """A 1800.5-second gap must START A NEW SESSION: the gap rule
    compares exact microseconds in both engines (Spark's
    unix_timestamp truncates to whole seconds and read 1800 <= 1800
    here while DuckDB's fractional epoch read 1800.5 — the divergence
    the third review pass reproduced live). h8 reports 2 sessions."""
    rows = [
        (1, dt.datetime(2024, 3, 1, 10, 0, 0, 0), 1, "view", 0.0, "{}"),
        (2, dt.datetime(2024, 3, 1, 10, 30, 0, 500000), 1, "view",
         0.0, "{}"),
    ]
    r = _h8_events(spark, tmp_path, rows)
    assert r["n_sessions"] == 2
    assert r["peak_concurrent"] == 1


def test_time_to_convert_hand_values(spark, tmp_path):
    """Conversion latency by hand: u1 signs up at 10:00 and first
    purchases at 10:30 (1800s); u2's only purchase PRECEDES its signup
    and must not convert; u3 signs up twice — the FIRST signup anchors
    (latency 3600s, not 60s); u4 never signs up and stays out of the
    denominator. Rate 2/3; p50 of [1800e6, 3600e6] interpolates to
    2700e6 (a double, deliberately not cast back to bigint)."""
    t = lambda h, m: dt.datetime(2024, 3, 1, h, m)  # noqa: E731
    rows = [
        (1, t(10, 0), 1, "signup", 0.0, "{}"),
        (2, t(10, 30), 1, "purchase", 9.0, "{}"),
        (3, t(11, 0), 1, "purchase", 9.0, "{}"),   # later; ignored
        (4, t(9, 0), 2, "purchase", 5.0, "{}"),    # pre-signup
        (5, t(9, 30), 2, "signup", 0.0, "{}"),
        (6, t(8, 0), 3, "signup", 0.0, "{}"),
        (7, t(8, 59), 3, "signup", 0.0, "{}"),     # second signup
        (8, t(9, 0), 3, "purchase", 1.0, "{}"),    # 3600s after FIRST
        (9, t(12, 0), 4, "purchase", 1.0, "{}"),   # never signed up
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    [r] = QUERIES["e12_time_to_convert"].fn(spark, str(tmp_path)).collect()
    assert (r["n_signed_up"], r["n_converted"]) == (3, 2)
    assert r["conversion_rate"] == pytest.approx(2 / 3, abs=1e-9)
    assert r["p50_latency_us"] == 2700.0 * 1_000_000
    # p90 over n=2: position 0.9*(n-1) -> 1800s + 0.9*1800s
    assert r["p90_latency_us"] == pytest.approx(
        (1800 + 0.9 * 1800) * 1_000_000, abs=1.0)


def test_image_content_dedup_is_encoding_invariant(spark):
    """The core claim: one pixel buffer written as TWO different byte
    streams — zlib level 0 vs level 9, different filter bytes — must
    collapse into ONE content group (byte-hash dedup like d1 would see
    two distinct files), while a third image with different pixels
    stays its own group."""
    import struct
    import zlib

    from pyspark.sql import functions as F

    from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
        decode_media_real,
    )

    def png(pixels_rows, level, filter_byte=0):
        # 8-bit grayscale PNG; filter 0 scanlines, configurable zlib level
        h, w = len(pixels_rows), len(pixels_rows[0])

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body))
            )

        scan = b"".join(
            bytes([filter_byte]) + bytes(r) for r in pixels_rows
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan, level))
            + chunk(b"IEND", b"")
        )

    rows_a = [[10, 20, 30], [40, 50, 60]]
    rows_b = [[1, 1, 1], [2, 2, 2]]
    payloads = [
        (1, bytearray(png(rows_a, level=0))),
        (2, bytearray(png(rows_a, level=9))),  # same pixels, new bytes
        (3, bytearray(png(rows_b, level=9))),
    ]
    assert bytes(payloads[0][1]) != bytes(payloads[1][1])  # bytes differ
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = decode_media_real(df).groupBy("pixel_md5").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups == {1: 2, 3: 1}


def test_longest_streak_hand_values(spark, tmp_path):
    """Gaps-and-islands by hand: u1 active Mar 1-3, skips Mar 4,
    active Mar 5-6 (two streaks, longest 3 starting Mar 1; two events
    on Mar 2 count ONE active day); u2 has two length-2 streaks TIED —
    longest_start must be the EARLIEST start (Mar 1, not Mar 10);
    u3 is a single-day user (streak 1)."""
    def ev(eid, day, user, hour=12):
        return (eid, dt.datetime(2024, 3, day, hour), user, "view",
                0.0, "{}")

    rows = [
        ev(1, 1, 1), ev(2, 2, 1), ev(3, 2, 1, hour=18), ev(4, 3, 1),
        ev(5, 5, 1), ev(6, 6, 1),
        ev(7, 1, 2), ev(8, 2, 2), ev(9, 10, 2), ev(10, 11, 2),
        ev(11, 20, 3),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["user_id"]: r
        for r in QUERIES["w10_longest_streak"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    u1 = got[1]
    assert (u1["n_active_days"], u1["n_streaks"],
            u1["longest_streak"]) == (5, 2, 3)
    assert str(u1["longest_start"]) == "2024-03-01"
    u2 = got[2]
    assert (u2["n_streaks"], u2["longest_streak"]) == (2, 2)
    assert str(u2["longest_start"]) == "2024-03-01"  # earliest of ties
    u3 = got[3]
    assert (u3["n_active_days"], u3["longest_streak"]) == (1, 1)


def test_char_entropy_hand_values(spark, tmp_path):
    """Entropy by hand (H = ln n − Σ c·ln c / n): 'aaaa' has H = 0;
    'abab' has two chars at p=1/2 -> H = ln 2; 'abcd' four uniform
    chars -> H = ln 4; the empty doc emits no row. Checked against an
    independent math.log computation."""
    import math

    rows = [
        (1, "aaaa", "s"),
        (2, "abab", "s"),
        (3, "abcd", "s"),
        (4, "", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in QUERIES["x38_char_entropy"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == {1, 2, 3}
    assert (got[1]["n_distinct_chars"], got[1]["entropy_nats"]) == (1, 0.0)
    assert got[2]["entropy_nats"] == pytest.approx(math.log(2), abs=1e-6)
    assert got[3]["entropy_nats"] == pytest.approx(math.log(4), abs=1e-6)
    assert got[3]["n_chars_counted"] == 4


def test_exact_mode_hand_values(spark, tmp_path):
    """Mode with the deterministic tie rule: group A has 7 twice and 9
    twice — the mode must be 7 (count tie -> smallest value), never a
    nondeterministic pick; group B's clear winner is 3."""
    rows = [
        ("A", 7), ("A", 7), ("A", 9), ("A", 9), ("A", 1),
        ("B", 3), ("B", 3), ("B", 3), ("B", 5),
    ]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["a19_exact_mode"].fn(spark, str(tmp_path)).collect()
    }
    assert (got["A"]["mode_qty"], got["A"]["mode_count"]) == (7, 2)
    assert (got["B"]["mode_qty"], got["B"]["mode_count"]) == (3, 3)
