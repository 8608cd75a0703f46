"""Round-7 closing scale sweeps (SCALE.md protocol): decade cells for
h7_ohlc_bars, pr4_item_similarity, ev3_classifier_eval.

Claims under test:

- **h7**: ONE two-phase hash aggregate — NO window (the window
  formulation was the rejected A/B arm; min_by/max_by over the
  't_us|event_id' key make open/close algebraic). The 10x events copy
  keeps timestamps, so per-bucket depth grows 10x; wall should stay
  near-flat and shuffle-write should carry only O(buckets) partial
  states, never raw rows — the exact property
  test_ohlc_partials_combine_before_exchange asserts.
- **pr4**: 10x lineitem under OFFSET orderkeys (same parts) repeats
  every basket 10x — pair volume grows 10x (linearly, because pairs
  are per-basket and baskets are bounded), co-counts combine map-side,
  and n_ord grows only in count value, not cardinality. Wall ~linear.
- **ev3**: rides x25's NB scoring over 10x documents; training aggs
  and scoring join both grow ~linearly (Zipf vocab sublinear), and the
  evaluation adds two map-side-combined aggs over the 10x prediction
  table. Wall should track x25's near-linear posture.

Same staging and meter as tools/scale_check_r5.py (imported): copies
offset ids, best-of-2, full-evaluation forcing (count + xxhash64 over
all columns).

Usage: python tools/scale_check_r7b.py  (prints a table; writes nothing)
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
    _t,
)
from retail_data_pipeline_and_forecasting_system_spark.session import (  # noqa: E402
    get_session,
)


def main() -> None:
    spark = get_session(
        "scale_check_r7b", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    tmp = Path(tempfile.mkdtemp(prefix="scale_r7b_"))
    x10 = tmp / "x10"
    _stage(spark, x10, 10)
    # h7 reads events, which _stage symlinks — replace with a 10x copy
    # (event_id offsets, same timestamps: per-bucket depth x10)
    from pyspark.sql import functions as FF

    ev_link = x10 / "events.parquet"
    if ev_link.is_symlink():
        ev_link.unlink()
    ev = _t(spark, SF, "events")
    u = ev
    for i in range(1, 10):
        u = u.unionByName(
            ev.withColumn(
                "event_id", FF.col("event_id") + FF.lit(i * 100_000_000)
            )
        )
    u.write.mode("overwrite").parquet(str(ev_link))

    print(f"{'query':24s} {'scale':5s} {'rows':>9s} {'sec':>7s} "
          f"{'rows/s':>9s} {'shufW':>10s}")
    for name in ("h7_ohlc_bars", "pr4_item_similarity",
                 "ev3_classifier_eval"):
        fn = QUERIES[name].fn
        for label, sf_dir in (("1x", SF), ("10x", str(x10))):
            rows = _force(fn(spark, sf_dir))  # codegen warm
            mark = _last_job_id(app_id)
            sec = _time(lambda: _force(fn(spark, sf_dir)))
            shuf = _shuffle_write_bytes(app_id, mark)
            print(
                f"{name:24s} {label:5s} {rows:9d} {sec:7.2f} "
                f"{rows / sec:9.0f} {shuf:10d}"
            )

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
