"""Round-7 post-close scale sweep: decade cell for d17_edit_distance_dedup.

Claim under test: the prefix-16 block key is the one shuffle and cost
is Σ block-pairs, NOT corpus². The _stage 10x staging (doc_id offsets,
SAME texts) is deliberately adversarial for a pair operator: every
document gains 9 identical copies, so each prefix block grows 10x and
within-block pair volume grows ~100x (until the max_block=50 cap would
drop a block whole). A near-100x wall growth here is the operator
telling the truth about quadratic within-block cost — the cap and the
block key are what keep that quadratic LOCAL (per block, bounded)
instead of global (corpus²).

Same staging and meter as tools/scale_check_r5.py (imported):
best-of-2, full-evaluation forcing (count + xxhash64 over all columns).

Usage: python tools/scale_check_r7c.py  (prints a table; writes nothing)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scale_check_r5 import SF, _force, _stage, _time  # noqa: E402
from scale_check_r7 import _last_job_id, _shuffle_write_bytes  # noqa: E402

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (  # noqa: E402
    QUERIES,
)
from retail_data_pipeline_and_forecasting_system_spark.session import (  # noqa: E402
    get_session,
)


def main() -> None:
    spark = get_session(
        "scale_check_r7c", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    tmp = Path(tempfile.mkdtemp(prefix="scale_r7c_"))
    x10 = tmp / "x10"
    _stage(spark, x10, 10)

    # ops6 reads orders, which _stage symlinks — replace with a 10x
    # copy (o_orderkey offsets, SAME custkeys: per-key state depth x10,
    # the merge join's worst axis)
    from pyspark.sql import functions as FF

    ord_link = x10 / "orders.parquet"
    if ord_link.is_symlink():
        ord_link.unlink()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    u = orders
    for i in range(1, 10):
        u = u.unionByName(
            orders.withColumn(
                "o_orderkey", FF.col("o_orderkey") + FF.lit(i * 100_000_000)
            )
        )
    u.write.mode("overwrite").parquet(str(ord_link))

    # e9 reads events — 10x copy (event_id offsets, same timestamps and
    # user_ids: per-user window depth x10, both frames' worst axis)
    ev_link = x10 / "events.parquet"
    if ev_link.is_symlink():
        ev_link.unlink()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    u = ev
    for i in range(1, 10):
        u = u.unionByName(
            ev.withColumn(
                "event_id", FF.col("event_id") + FF.lit(i * 100_000_000)
            )
        )
    u.write.mode("overwrite").parquet(str(ev_link))

    names = sys.argv[1:] or [
        "d17_edit_distance_dedup", "x33_vocab_coverage",
        "ops6_incremental_agg", "d18_cross_source_overlap",
        "e9_attribution",
    ]
    print(f"{'query':26s} {'scale':5s} {'rows':>9s} {'sec':>7s} "
          f"{'rows/s':>9s} {'shufW':>10s}")
    for name in names:
        fn = QUERIES[name].fn
        for label, sf_dir in (("1x", SF), ("10x", str(x10))):
            rows = _force(fn(spark, sf_dir))  # codegen warm
            mark = _last_job_id(app_id)
            sec = _time(lambda: _force(fn(spark, sf_dir)))
            shuf = _shuffle_write_bytes(app_id, mark)
            print(
                f"{name:26s} {label:5s} {rows:9d} "
                f"{sec:7.2f} {rows / sec:9.0f} {shuf:10d}"
            )

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
