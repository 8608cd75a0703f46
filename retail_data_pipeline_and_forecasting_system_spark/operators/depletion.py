"""Greedy sequential inventory depletion — the one non-relational operator.

Semantics (reference src/data_processor.py:288-331, verified against the
golden outputs): walk each product's demand lines in time order; if the
remaining stock covers the line's qty, fulfill it and decrement, otherwise
cancel the line (fulfilled qty = 0) and LEAVE STOCK UNTOUCHED so a later,
smaller order can still succeed. Greedy-with-skip is deliberately NOT a
window cumulative sum: with stock 5 and demand sequence [3, 3, 2] the result
is [3, 0, 2], where a cumsum would give [3, 0, 0] (FIXTURES.md invariant 6).

Spark-first design
------------------
The fold is sequential *per product* but independent *across products*, so it
maps exactly onto a grouped-map: hash-repartition on ``product_id``, then one
Arrow-batched pandas kernel per product group. On a 1000-executor cluster
each product's timeline is processed by one task while thousands of products
run in parallel — the reference instead collect()s every joined line to a
single driver loop (src/data_processor.py:289,293), its scalability cliff.

Determinism: the reference relies on the accidental row order surviving an
``orderBy`` *before* a join (src/data_processor.py:280-286) — joins do not
preserve order, so its depletion order is only stable at small scale. This
kernel sorts *inside* the group by (timestamp, transaction_id, line_pos),
making the fold order total and reproducible at any parallelism.

Scale notes
-----------
- Parallelism = number of distinct products. A single ultra-hot product is an
  irreducibly sequential timeline (the fold's output for line i depends on
  all lines < i), so no salting can split it without changing semantics; what
  CAN be bounded is memory — ``applyInPandas`` materializes one group per
  task, so for a product whose timeline exceeds executor memory, pre-split
  the timeline into epochs, run the kernel per epoch, and chain closing stock
  into the next epoch's opening stock (same fold, staged).
- Cross-day carryover is free: state is per-product and days are concatenated
  in time order, so one multi-day pass ≡ the reference's day loop feeding
  closing stock into the next day (SURVEY.md A5).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fulfilled_qty(
    stock: int, demands: Iterable[int]
) -> list[int]:
    """Pure-Python greedy-with-skip fold; also serves as the test oracle."""
    out = []
    remaining = stock
    for qty in demands:
        if qty is not None and 0 <= qty <= remaining:
            out.append(qty)
            remaining -= qty
        else:
            out.append(0)
    return out


def greedy_inventory_depletion(
    lines: DataFrame,
    products: DataFrame,
    qty_col: str = "qty",
    stock_col: str = "stock",
    order_cols: tuple[str, ...] = ("timestamp", "transaction_id", "line_pos"),
    num_buckets: int = 128,
    reset_col: str | None = None,
) -> DataFrame:
    """Apply greedy depletion to demand ``lines`` against initial ``products``
    stock.

    Parameters
    ----------
    lines : demand rows; must contain ``product_id``, ``qty_col`` and the
        ``order_cols`` that define the (total) processing order.
    products : one row per product with ``product_id`` and ``stock_col``.
    num_buckets : parallelism of the grouped-map stage. Products are
        hash-bucketed so each Arrow batch carries MANY product timelines —
        per-group pandas/Arrow overhead is amortized (one group per product
        would pay ~0.2 ms × millions of products), while state stays strictly
        per-product inside the kernel. Size it ≈ a few × total cores.
    reset_col : optional column name; when set, stock resets to the initial
        value at every distinct value of this column (the reference's
        RELOAD_INVENTORY_DAILY mode, src/data_processor.py:53-59: pass the
        batch-date column). The fold key becomes (product, reset value).

    Returns the input rows plus a ``quantity`` column (fulfilled qty, 0 when
    cancelled). Null-qty lines must be filtered by the caller (reference
    filters them before depletion, src/data_processor.py:278).
    """
    # Attach the per-product opening stock. products is a dim table (36 rows
    # in the reference; dims are small by definition) -> broadcast join, no
    # shuffle of the fact side for the join itself.
    stocked = lines.join(
        F.broadcast(products.select("product_id", F.col(stock_col).alias("__stock"))),
        on="product_id",
        how="inner",
    ).withColumn("__bucket", F.pmod(F.hash("product_id"), F.lit(num_buckets)))

    out_schema = T.StructType(
        [f for f in stocked.schema.fields if f.name not in ("__stock", "__bucket")]
        + [T.StructField("quantity", T.IntegerType(), True)]
    )
    out_cols = [f.name for f in out_schema.fields]
    key_cols = ["product_id"] + ([reset_col] if reset_col else [])
    sort_cols = [*key_cols, *order_cols]

    def deplete(pdf: pd.DataFrame) -> pd.DataFrame:
        # one pass over the bucket: rows sorted by (fold key, time); per-key
        # remaining stock lives in a dict, so a bucket of thousands of
        # products costs one sort + one linear walk.
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        remaining: dict = {}
        out = []
        keys = list(zip(*(pdf[c].tolist() for c in key_cols)))
        qtys = pdf[qty_col].tolist()
        stocks = pdf["__stock"].tolist()
        for key, qty, stock in zip(keys, qtys, stocks):
            rem = remaining.get(key)
            if rem is None:
                rem = int(stock)
            if qty is not None and 0 <= qty <= rem:
                out.append(qty)
                remaining[key] = rem - qty
            else:
                out.append(0)
                remaining[key] = rem
        pdf["quantity"] = out
        return pdf[out_cols]

    # groupBy().applyInPandas hash-partitions on the product bucket; inside
    # each bucket every product's timeline is processed sequentially and
    # independently — semantics identical to one-group-per-product.
    return stocked.groupBy("__bucket").applyInPandas(deplete, schema=out_schema)
