"""3x scale-up check for the round-4 operators (SCALE.md protocol).

Builds pseudo-sf0.3 corpora from sf0.1 for the tables the new operators
read:

- documents "wide": 3x copies with doc_id offsets AND fresh source names
  per copy — 3x partitions, same files-per-partition (ops5's partition
  axis; x24 is map-only so either axis is the same workload).
- documents "deep": 3x copies with doc_id offsets, SAME sources — 3x
  files per partition (ops5's window-length axis).
- embeddings "wide": 3x copies with vec_id offsets; copy 0 keeps ids
  0..n so the k-means first-k init (d14) and the query set vec_id < 10
  (n7) are unchanged while the corpus triples.
- orders: key-offset copies (h3 groups by date, so the daily rollup
  keeps its row count — the sweep prices the 3x scan under the fixed
  window).

d14 is additionally run at k=12 on the tripled corpus: the pair join is
cell-blocked (sum cell^2), so FIXED k under 3x data grows ~9x while
raising k with the corpus restores ~linear growth — the documented
100 TB mitigation, measured.

Usage: python tools/scale_check_r4.py   (writes nothing; prints a table)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from retail_data_pipeline_and_forecasting_system_spark.operators import (  # noqa: E402
    similarity as SIM,
)
from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (  # noqa: E402
    QUERIES,
    _t,
)
from retail_data_pipeline_and_forecasting_system_spark.session import (  # noqa: E402
    get_session,
)

SF = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
NEW_QUERIES = ["d14_semantic_dedup", "d15_incremental_semantic",
               "n7_knn_join", "x24_gopher_gate",
               "ops5_compaction_plan", "h3_ewma",
               "sq2_relational_division", "m9_seasonal_decompose",
               "x25_nb_classifier"]


def _triple_documents(spark, out: Path, deep: bool) -> None:
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    copies = []
    for i in range(3):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        if not deep:
            c = c.withColumn(
                "source", F.concat(F.col("source"), F.lit(f"_c{i}"))
            )
        copies.append(c)
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(str(out / "documents.parquet"))


def _triple_embeddings(spark, out: Path) -> None:
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    copies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        for i in range(3)
    ]
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))


def _triple_orders(spark, out: Path) -> None:
    od = spark.read.parquet(f"{SF}/orders.parquet")
    copies = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
        for i in range(3)
    ]
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(str(out / "orders.parquet"))


def _stage(spark, out: Path, deep_docs: bool) -> None:
    out.mkdir(parents=True, exist_ok=True)
    _triple_documents(spark, out, deep=deep_docs)
    _triple_embeddings(spark, out)
    _triple_orders(spark, out)
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if not dst.exists():
            dst.symlink_to(f"{SF}/{t}.parquet")


def _force(df) -> int:
    n, _ = df.agg(
        F.count(F.lit(1)),
        F.max(F.xxhash64(*[F.col(c) for c in df.columns])),
    ).collect()[0]
    return n


def _time(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _d14_at_k(spark, sf_dir: str, k: int):
    """d14's composition with a configurable cell count (the registry
    entry pins k=4 for the oracle; the 100 TB shape raises k with n)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = SIM.kmeans_lloyd(emb, k=k, n_iter=2, exact_mean=True)
    cells = SIM.assign_cells(emb, cents)
    pairs = SIM.cosine_pairs_blocked(
        cells, threshold=0.35, block_col="cent_id", salt=32
    )
    dropped = (
        pairs.select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return cells.join(dropped, "vec_id", "left").select(
        "vec_id",
        F.col("cent_id").cast("int").alias("cent_id"),
        F.col("__dropped").isNull().alias("kept"),
    )


def main() -> None:
    spark = get_session("scale_check_r4")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="scale3x_r4_"))
    wide, deep = tmp / "wide", tmp / "deep"
    _stage(spark, wide, deep_docs=False)
    _stage(spark, deep, deep_docs=True)

    print(f"{'query':26s}{'sf0.1':>9s}{'3x wide':>9s}{'3x deep':>9s}")
    for name in NEW_QUERIES:
        fn = QUERIES[name].fn
        base = _time(lambda: _force(fn(spark, SF)))
        tw = _time(lambda: _force(fn(spark, str(wide))))
        td = _time(lambda: _force(fn(spark, str(deep))))
        print(f"{name:26s}{base:9.2f}{tw:9.2f}{td:9.2f}")

    # d14's k-scaling law: fixed k under 3x corpus vs k raised with it
    b4 = _time(lambda: _force(_d14_at_k(spark, SF, 4)))
    w4 = _time(lambda: _force(_d14_at_k(spark, str(wide), 4)))
    w12 = _time(lambda: _force(_d14_at_k(spark, str(wide), 12)))
    print(f"{'d14 k=4 (fixed)':26s}{b4:9.2f}{w4:9.2f}{'':>9s}")
    print(f"{'d14 k=12 (k ~ n)':26s}{'':>9s}{w12:9.2f}{'':>9s}")

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
