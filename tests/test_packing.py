"""Sequence packing: kernel vs pure-Python oracle + invariants."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from retail_data_pipeline_and_forecasting_system_spark.operators.packing import (
    pack_oracle,
    pack_sequences,
)


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=400), max_size=60),
    capacity=st.integers(min_value=1, max_value=300),
)
@settings(max_examples=200, deadline=None)
def test_oracle_invariants(tokens, capacity):
    seqs = pack_oracle(tokens, capacity)
    assert len(seqs) == len(tokens)
    if not tokens:
        return
    # seq ids start at 0 and advance by at most 1
    assert seqs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
    # every multi-doc sequence respects the capacity
    fills: dict[int, list[int]] = {}
    for s, n in zip(seqs, tokens):
        fills.setdefault(s, []).append(n)
    for members in fills.values():
        if len(members) > 1:
            assert sum(members) <= capacity
    # greedy = maximal prefixes: the first doc of a new sequence would
    # NOT have fit in the previous one
    for i in range(1, len(tokens)):
        if seqs[i] != seqs[i - 1]:
            prev_fill = sum(
                n for s, n in zip(seqs[:i], tokens[:i]) if s == seqs[i - 1]
            )
            assert prev_fill + tokens[i] > capacity


def test_spark_matches_python_oracle(spark):
    import random

    rng = random.Random(7)
    rows = [
        (gi * 1000 + i, f"g{gi}", "w " * rng.randint(1, 40))
        for gi in range(5)
        for i in range(rng.randint(0, 30))
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.doc_id): (r.n_tokens, r.seq_id)
        for r in pack_sequences(df, capacity=64).collect()
    }
    assert len(got) == len(rows)
    for gi in range(5):
        grp = sorted(
            (doc_id, text) for doc_id, src, text in rows if src == f"g{gi}"
        )
        toks = [len(t.split(" ")) for _, t in grp]
        want = pack_oracle(toks, 64)
        for (doc_id, _), n, s in zip(grp, toks, want):
            assert got[doc_id] == (n, s), (gi, doc_id)


def test_overlong_doc_gets_own_sequence(spark):
    df = spark.createDataFrame(
        [(0, "g", "w " * 9), (1, "g", "w " * 499), (2, "g", "w " * 9)],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r.seq_id
        for r in pack_sequences(df, capacity=100).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2}


def test_pack_counts_nan_group_key_packs_as_one_group(spark):
    """Round-10 ADVICE: pack_counts is generic over group_col — a FLOAT
    group column delivers missing keys to the kernel as NaN, and
    NaN != NaN would fire the group-reset branch on EVERY row of the
    missing group (sequence counter stuck at 0, capacity never
    enforced). The kernel now normalizes missing keys to None before
    the fold, so the NaN group packs like any other group."""
    from retail_data_pipeline_and_forecasting_system_spark.operators.packing import (
        pack_counts,
    )

    df = spark.createDataFrame(
        [(0, None, 6), (1, None, 6), (2, None, 6), (3, 1.5, 6)],
        "doc_id long, grp double, n int",
    )
    out = {
        r.doc_id: (r.grp, r.seq_id)
        for r in pack_counts(
            df, capacity=10, group_col="grp", id_col="doc_id",
            count_col="n",
        ).collect()
    }
    assert len(out) == 4
    # the NULL group is ONE group under the greedy rule: 6, then 6
    # overflows (6+6>10) into seq 1, then seq 2 — the pre-fix kernel
    # reset per row and left every NULL doc at seq 0
    assert out[0] == (None, 0)
    assert out[1] == (None, 1)
    assert out[2] == (None, 2)
    assert out[3] == (1.5, 0)
