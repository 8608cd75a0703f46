"""Round-7 scale sweeps (SCALE.md protocol).

One job: decade cells for the two round-7 registrations — m11 (real WAV
decode) and m12 (real Y4M frame sampling) at 10x documents (offset
doc_ids). Both are synthesize->decode chains of partition-local
mapInPandas stages, so the claims under test are:

- **zero shuffle**: total shuffle-write bytes for the query stay at 0
  at both scales (Spark UI REST, localhost) — the only exchange Spark
  may add is the final 1-row agg of the forcing meter;
- **linear per-row CPU**: wall grows ~rows (decode is per-row work with
  no cross-row dependency), i.e. a 10x decade costs ~10x CPU on fixed
  cores — the scale-out axis is executors, not a smarter plan, which
  is exactly the posture a real codec (PIL/ffmpeg) inherits by
  replacing the decode body.

Same staging and meter as tools/scale_check_r5.py (imported): copies
offset ids, best-of-2, full-evaluation forcing (count + xxhash64 over
all columns).

Usage: python tools/scale_check_r7.py  (prints a table; writes nothing)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scale_check_r5 import SF, _force, _stage, _time  # noqa: E402

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (  # noqa: E402
    QUERIES,
)
from retail_data_pipeline_and_forecasting_system_spark.session import (  # noqa: E402
    get_session,
)

UI = "http://localhost:4040/api/v1"


def _shuffle_write_bytes(app_id: str, after_job: int) -> int:
    """Sum shuffle-write bytes over all stages of jobs > after_job."""
    jobs = json.load(
        urllib.request.urlopen(f"{UI}/applications/{app_id}/jobs")
    )
    total = 0
    seen_stages: set[int] = set()
    for j in jobs:
        if j["jobId"] <= after_job:
            continue
        for sid in j["stageIds"]:
            if sid in seen_stages:
                continue
            seen_stages.add(sid)
            try:
                stages = json.load(
                    urllib.request.urlopen(
                        f"{UI}/applications/{app_id}/stages/{sid}"
                    )
                )
            except Exception:
                continue
            for att in stages:
                total += att.get("shuffleWriteBytes", 0)
    return total


def _last_job_id(app_id: str) -> int:
    jobs = json.load(
        urllib.request.urlopen(f"{UI}/applications/{app_id}/jobs")
    )
    return max((j["jobId"] for j in jobs), default=-1)


def main() -> None:
    spark = get_session(
        "scale_check_r7", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    tmp = Path(tempfile.mkdtemp(prefix="scale_r7_"))
    x10 = tmp / "x10"
    _stage(spark, x10, 10)
    # h5/h6 read events, which _stage symlinks — replace the symlink
    # with a 10x copy (event_id offsets; same timestamps, so per-bucket
    # point counts grow 10x: the window's serial axis, its worst case)
    ev_link = x10 / "events.parquet"
    if ev_link.is_symlink():
        ev_link.unlink()
    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        _t as _t_ev,
    )
    ev = _t_ev(spark, SF, "events")
    from pyspark.sql import functions as FF
    u = ev
    for i in range(1, 10):
        u = u.unionByName(
            ev.withColumn(
                "event_id", FF.col("event_id") + FF.lit(i * 100_000_000)
            )
        )
    u.write.mode("overwrite").parquet(str(ev_link))

    print(f"{'query':24s} {'scale':5s} {'rows':>9s} {'sec':>7s} "
          f"{'rows/s':>9s} {'shufW':>8s}")
    # n12: anchors FIXED (vec_id < 20), corpus 10x -> the |A| x |C|
    # scored product grows 10x; the decade question is whether the
    # band filter + broadcast pos keep the extra volume off the window
    # shuffle (they should: shufW grows with band survivors, not |C|).
    # n13: the whole corpus is both sides — at 10x the seed join grows
    # ~(n/256)^2 per bucket and the descent rounds grow O(n k^2); the
    # decade question is the wall ratio staying far under the 100x an
    # n^2 method would pay.
    for name in ("m11_real_audio_decode", "m12_real_frame_sample",
                 "n12_hard_negatives", "n13_nn_descent_graph",
                 "h5_time_weighted_avg", "h6_counter_increase",
                 "ev1_ann_recall", "ev2_partition_purity"):
        fn = QUERIES[name].fn
        for label, sf_dir in (("1x", SF), ("10x", str(x10))):
            rows = _force(fn(spark, sf_dir))  # codegen warm
            mark = _last_job_id(app_id)
            sec = _time(lambda: _force(fn(spark, sf_dir)))
            shuf = _shuffle_write_bytes(app_id, mark)
            print(
                f"{name:24s} {label:5s} {rows:9d} {sec:7.2f} "
                f"{rows / sec:9.0f} {shuf:8d}"
            )

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
