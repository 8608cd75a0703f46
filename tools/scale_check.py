"""3x scale-up check for the round-3 operators (SCALE.md protocol).

Builds two pseudo-sf0.3 corpora from sf0.1:

- variant A ("wide"): 3x users/orders — event_id/user_id (and order/line
  keys) offset per copy. More keys, same per-key density.
- variant B ("deep"): 3x per-user HISTORY — same users, copies shifted
  +40/+80 days. Per-(user, hour) density unchanged, timeline 3x longer.

Variant B is the one that separates the interval-bucketed range join
from the bare equi-join formulation: bucketed candidates grow ~3x
(linear in history), bare per-user candidates grow ~9x (quadratic).
Both are timed side by side on the same data.

Usage: python tools/scale_check.py   (writes nothing; prints a table)
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
NEW_QUERIES = [
    "j6_range_join",
    "j7_funnel",
    "j9_asof_join",
    "h1_hypertable_rollup",
    "dq1_expectations",
    "dq2_quarantine",
]


def _triple_events(spark, out: Path, deep: bool) -> None:
    ev = _t(spark, SF, "events")  # normalizes ts to TIMESTAMP(micros)
    n_ev = 10_000_000  # event_id offset stride, far above any real id
    copies = []
    for i in range(3):
        c = ev.withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
        if deep:
            c = c.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 40} DAYS")
            )
        else:
            c = c.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 1_000_000)
            )
        copies.append(c)
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.write.mode("overwrite").parquet(str(out / "events.parquet"))


def _triple_lineitem_orders(spark, out: Path) -> None:
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    od = spark.read.parquet(f"{SF}/orders.parquet")
    stride = 100_000_000
    lcopies, ocopies = [], []
    for i in range(3):
        lcopies.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * stride))
        )
        ocopies.append(
            od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * stride))
        )
    ul, uo = lcopies[0], ocopies[0]
    for c in lcopies[1:]:
        ul = ul.unionByName(c)
    for c in ocopies[1:]:
        uo = uo.unionByName(c)
    ul.write.mode("overwrite").parquet(str(out / "lineitem.parquet"))
    uo.write.mode("overwrite").parquet(str(out / "orders.parquet"))


def _stage(spark, out: Path, deep: bool) -> None:
    out.mkdir(parents=True, exist_ok=True)
    _triple_events(spark, out, deep)
    _triple_lineitem_orders(spark, out)
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if not dst.exists():
            # symlink untripled tables so every query resolves
            dst.symlink_to(f"{SF}/{t}.parquet")


def _bare_j6(spark, sf_dir: str):
    """The pre-round-3 j6 formulation (bare equi-join on user_id), kept
    here ONLY as the measurement baseline for the bucketed shape."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            on=(
                (F.col("user_id") == F.col("c_user"))
                & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
                & (F.col("c_ts") < F.col("p_ts"))
            ),
            how="left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.count("c_event").alias("n_clicks_1h"))
    )


def _force(df) -> int:
    """Full evaluation — bench.py's _run_full (a bare count() lets
    Catalyst prune agg columns and even eliminate outer joins)."""
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
    spark = get_session("scale_check")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="scale3x_"))
    wide, deep = tmp / "wide", tmp / "deep"
    _stage(spark, wide, deep=False)
    _stage(spark, deep, deep=True)

    print(f"{'query':28s}{'sf0.1':>9s}{'3x wide':>9s}{'3x deep':>9s}")
    for name in NEW_QUERIES:
        spec = QUERIES[name]
        t1 = _time(lambda: _force(spec.fn(spark, SF)))
        t3w = _time(lambda: _force(spec.fn(spark, str(wide))))
        t3d = _time(lambda: _force(spec.fn(spark, str(deep))))
        print(f"{name:28s}{t1:9.2f}{t3w:9.2f}{t3d:9.2f}")

    # bucketed vs bare range join under 3x-deep history
    t_bare_1 = _time(lambda: _force(_bare_j6(spark, SF)))
    t_bare_3 = _time(lambda: _force(_bare_j6(spark, str(deep))))
    print(f"{'j6 BARE equi-join (baseline)':28s}{t_bare_1:9.2f}"
          f"{'':>9s}{t_bare_3:9.2f}")

    # dense-history micro-bench: few users x long histories — the regime
    # the bucketed shape exists for. Bare candidates = users x |p_u| x
    # |c_u| (quadratic in per-user history); bucketed candidates track
    # per-(user, hour) density instead (~1.1/hr here).
    dense = tmp / "dense"
    dense.mkdir(exist_ok=True)
    year_us = 365 * 24 * 3600 * 1_000_000
    n = 100_000  # 10 users x 5k/5k: bare = 10 x 5k x 5k = 250M candidates
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)
            + (F.xxhash64("id") % F.lit(year_us) + F.lit(year_us))
            % F.lit(year_us)
        ).alias("ts"),
        F.when(F.col("id") % 2 == 0, "click")
        .otherwise("purchase")
        .alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    base.write.mode("overwrite").parquet(str(dense / "events.parquet"))
    t_bkt = _time(
        lambda: _force(QUERIES["j6_range_join"].fn(spark, str(dense))), 1
    )
    t_bare = _time(lambda: _force(_bare_j6(spark, str(dense))), 1)
    print(f"dense (10 users x 5k/5k): bucketed {t_bkt:.2f}s, "
          f"bare {t_bare:.2f}s")

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
