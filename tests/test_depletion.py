"""Unit + property tests for the greedy inventory depletion operator."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from retail_data_pipeline_and_forecasting_system_spark.operators.depletion import (
    _fulfilled_qty,
    greedy_inventory_depletion,
)


def _mk_lines(spark, rows):
    """rows: (transaction_id, product_id, qty) in intended time order."""
    base = dt.datetime(2024, 2, 1)
    data = [
        (tid, 1, base + dt.timedelta(seconds=i), 0, pid, qty)
        for i, (tid, pid, qty) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "transaction_id long, customer_id int, timestamp timestamp, "
        "line_pos int, product_id int, qty int",
    )


def _mk_products(spark, stocks: dict[int, int]):
    return spark.createDataFrame(
        [(pid, s) for pid, s in stocks.items()], "product_id int, stock int"
    )


def test_greedy_with_skip_litmus(spark):
    """FIXTURES.md invariant 6: stock 5, demands [3,3,2] -> [3,0,2].

    This is the case separating the correct greedy fold from a window
    cumulative sum (which would yield [3,0,0])."""
    lines = _mk_lines(spark, [(1, 7, 3), (2, 7, 3), (3, 7, 2)])
    products = _mk_products(spark, {7: 5})
    out = greedy_inventory_depletion(lines, products)
    got = {r["transaction_id"]: r["quantity"] for r in out.collect()}
    assert got == {1: 3, 2: 0, 3: 2}


def test_independent_products_dont_interact(spark):
    lines = _mk_lines(spark, [(1, 1, 5), (2, 2, 5), (3, 1, 5), (4, 2, 1)])
    products = _mk_products(spark, {1: 5, 2: 5})
    out = greedy_inventory_depletion(lines, products)
    got = {r["transaction_id"]: r["quantity"] for r in out.collect()}
    assert got == {1: 5, 2: 5, 3: 0, 4: 0}


def test_order_is_timestamp_then_transaction_id(spark):
    # same timestamp -> transaction_id breaks the tie
    base = dt.datetime(2024, 2, 1)
    data = [
        (20, 1, base, 0, 9, 4),
        (10, 1, base, 0, 9, 4),  # lower id processed first
    ]
    lines = spark.createDataFrame(
        data,
        "transaction_id long, customer_id int, timestamp timestamp, "
        "line_pos int, product_id int, qty int",
    )
    out = greedy_inventory_depletion(lines, _mk_products(spark, {9: 5}))
    got = {r["transaction_id"]: r["quantity"] for r in out.collect()}
    assert got == {10: 4, 20: 0}


def test_python_oracle_matches_spark(spark):
    """Randomized-ish small case: Spark kernel == pure-Python oracle."""
    demands = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    lines = _mk_lines(spark, [(i, 3, q) for i, q in enumerate(demands)])
    out = greedy_inventory_depletion(lines, _mk_products(spark, {3: 20}))
    got = [
        r["quantity"]
        for r in sorted(out.collect(), key=lambda r: r["transaction_id"])
    ]
    assert got == _fulfilled_qty(20, demands)


@given(
    stock=st.integers(min_value=0, max_value=30),
    demands=st.lists(st.integers(min_value=1, max_value=8), max_size=20),
)
@settings(max_examples=200, deadline=None)
def test_oracle_invariants(stock, demands):
    out = _fulfilled_qty(stock, demands)
    assert len(out) == len(demands)
    assert sum(out) <= stock  # never oversell
    for got, want in zip(out, demands):
        assert got in (0, want)  # all-or-nothing per line
    # greedy: a line is cancelled only if remaining stock was insufficient
    remaining = stock
    for got, want in zip(out, demands):
        if got:
            remaining -= got
        else:
            assert want > remaining
