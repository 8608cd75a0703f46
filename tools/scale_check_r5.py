"""Round-5 scale sweeps (SCALE.md protocol).

Three jobs (the third: 3x rows for every round-5 operator — d16 / n8 /
x26 / m10 / x27 / n9 — under duplicated docs, tripled embeddings and
tripled lineitem). The first two:

1. **Auto-k law, no caller input** (round-4 verdict item 3): run d14 /
   d15 at sf0.1 and at a 3x corpus with k="auto" doing the choosing
   (k = ceil(sqrt(n/32))). The check is per-CELL work staying flat:
   with k ~ sqrt(n), expected pairs-per-cell grow ~linearly in n (not
   n^2/k-with-fixed-k), so total wall should grow ~n^1.5/n = sublinear
   vs the fixed-k 9x blowup measured in scale_check_r4.

2. **One decade of evidence** (verdict item 6): the two priced families
   at 10x —
   - d14 with auto-k on a 10x embeddings corpus (k rises 8 -> 25);
   - a5's greedy depletion fold on 10x lineitem against the SAME part
     dim ("deep": per-product sequences grow 10x — the fold's serial
     axis, its worst case; task count is unchanged so this isolates
     the vectorized-kernel scan cost).

Copies offset ids; embeddings copy 0 keeps ids 0..n so first-k init
stays in-corpus. Best-of-2, full-evaluation forcing (count + xxhash64
over all columns) — same meter as bench.py.

Usage: python tools/scale_check_r5.py  (prints a table; writes nothing)
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


def _stage(spark, out: Path, mult: int) -> None:
    """mult-x embeddings (vec_id offsets) + mult-x lineitem (l_orderkey
    offsets, same parts) + mult-x documents (doc_id offsets); everything
    else symlinked."""
    out.mkdir(parents=True, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    u = docs
    for i in range(1, mult):
        u = u.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        )
    u.write.mode("overwrite").parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    u = emb
    for i in range(1, mult):
        u = u.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        )
    u.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    u = li
    for i in range(1, mult):
        u = u.unionByName(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
            )
        )
    u.write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

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


def main() -> None:
    spark = get_session("scale_check_r5")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="scale_r5_"))
    x3, x10 = tmp / "x3", tmp / "x10"
    _stage(spark, x3, 3)
    _stage(spark, x10, 10)

    for d, m in ((SF, 1), (str(x3), 3), (str(x10), 10)):
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        print(f"embeddings {m:2d}x: n={n:6d}  auto_k={SIM.auto_k(n)}")

    print(f"\n{'query':28s}{'sf0.1':>9s}{'3x':>9s}{'10x':>9s}")
    # auto-k semantic dedup: k self-scales 8 -> 14 -> 25
    for name in ("d14_semantic_dedup", "d15_incremental_semantic"):
        fn = QUERIES[name].fn
        base = _time(lambda: _force(fn(spark, SF)))
        t3 = _time(lambda: _force(fn(spark, str(x3))))
        t10 = _time(lambda: _force(fn(spark, str(x10))))
        print(f"{name + ' (auto-k)':28s}{base:9.2f}{t3:9.2f}{t10:9.2f}")

    # a5 deep decade: 10x-long per-product sequences, same task count
    fn = QUERIES["a5_inventory_depletion"].fn
    base = _time(lambda: _force(fn(spark, SF)))
    t3 = _time(lambda: _force(fn(spark, str(x3))))
    t10 = _time(lambda: _force(fn(spark, str(x10))))
    print(f"{'a5_inventory_depletion':28s}{base:9.2f}{t3:9.2f}{t10:9.2f}")

    # round-5 NEW operators, 3x protocol (duplicated docs triple the
    # dup density for d16 — its window's worst direction — and n8's
    # corpus triples the probed buckets' population)
    for name in ("d16_segment_dedup", "n8_ann_multiprobe",
                 "x26_ngram_repetition", "m10_real_image_decode",
                 "x27_bpe_pair_counts", "n9_knn_join_ivf"):
        fn = QUERIES[name].fn
        base = _time(lambda: _force(fn(spark, SF)))
        t3 = _time(lambda: _force(fn(spark, str(x3))))
        print(f"{name:28s}{base:9.2f}{t3:9.2f}")

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
