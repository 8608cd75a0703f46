"""Round-6 scale sweeps (SCALE.md protocol).

Two jobs:

1. **Decade cells for the retrieval family** (round-5 verdict item 6):
   n8 / n9 / n10 / m10 at 10x (offset vec_ids / doc_ids, auto-k doing
   the choosing where applicable) — the kNN join is the at-scale
   flagship and gets the same one-decade evidence d14 got in round 5.

2. **d16 md5-key shuffle-bytes delta** (verdict item 4): run
   segment_dedup in both key modes on the sf0.1 corpus and the 10x
   corpus, recording wall time AND total shuffle-write bytes (Spark UI
   REST, localhost) — the md5 path's claim is that no shuffle carries
   segment text, so its shuffle volume should be a small fraction of
   the text-keyed window's and grow with row count only.

Same staging and meter as tools/scale_check_r5.py (imported): copies
offset ids, best-of-2, full-evaluation forcing (count + xxhash64 over
all columns).

Usage: python tools/scale_check_r6.py  (prints tables; writes nothing)
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

from retail_data_pipeline_and_forecasting_system_spark.operators import (  # noqa: E402
    dedup as D,
)
from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (  # noqa: E402
    QUERIES,
    _t,
)
from retail_data_pipeline_and_forecasting_system_spark.session import (  # noqa: E402
    get_session,
)

UI = "http://localhost:4040/api/v1"


def _app_id() -> str:
    with urllib.request.urlopen(f"{UI}/applications") as r:
        return json.load(r)[0]["id"]


def _stages(app: str) -> dict[int, int]:
    """stageId -> shuffleWriteBytes for all completed stages so far."""
    with urllib.request.urlopen(
        f"{UI}/applications/{app}/stages?status=complete"
    ) as r:
        return {
            s["stageId"]: s.get("shuffleWriteBytes", 0) for s in json.load(r)
        }


def _shuffle_bytes(app: str, fn) -> tuple[float, int, int]:
    """(wall_s, shuffle_write_bytes, rows) for one run of fn."""
    before = set(_stages(app))
    import time as _time_mod

    t0 = _time_mod.perf_counter()
    n = _force(fn())
    wall = _time_mod.perf_counter() - t0
    after = _stages(app)
    new = {sid: b for sid, b in after.items() if sid not in before}
    return wall, sum(new.values()), n


def main() -> None:
    spark = get_session(
        "scale_check_r6", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="scale_r6_"))
    x3, x10 = tmp / "x3", tmp / "x10"
    _stage(spark, x3, 3)
    _stage(spark, x10, 10)

    queries = (
        "n8_ann_multiprobe",
        "n9_knn_join_ivf",
        "n10_knn_join_multiprobe",
        "m10_real_image_decode",
    )
    if "--new-ops" in sys.argv:
        # round-6's own additions, same decade protocol
        queries = (
            "n11_knn_join_ivfpq",
            "x30_dsir_selection",
            "x31_duplicate_spans",
        )
    print(f"{'query':28s}{'sf0.1':>9s}{'3x':>9s}{'10x':>9s}")
    for name in queries:
        fn = QUERIES[name].fn
        base = _time(lambda: _force(fn(spark, SF)))
        t3 = _time(lambda: _force(fn(spark, str(x3))))
        t10 = _time(lambda: _force(fn(spark, str(x10))))
        print(f"{name:28s}{base:9.2f}{t3:9.2f}{t10:9.2f}")

    if "--new-ops" in sys.argv:
        shutil.rmtree(tmp, ignore_errors=True)
        return

    app = _app_id()
    print(
        f"\nd16 segment_dedup key=text vs key=md5 "
        f"(wall best-of-2 / shuffle-write MB single run):"
    )
    print(f"{'corpus':8s}{'mode':6s}{'wall_s':>9s}{'shufMB':>9s}{'rows':>9s}")
    for label, d in (("sf0.1", SF), ("10x", str(x10))):
        for mode in ("text", "md5"):

            def run(d=d, mode=mode):
                return D.segment_dedup(
                    _t(spark, d, "documents"), seg_words=10, key=mode
                )

            wall = _time(lambda: _force(run()))
            _, sbytes, rows = _shuffle_bytes(app, run)
            print(
                f"{label:8s}{mode:6s}{wall:9.2f}"
                f"{sbytes / 1e6:9.1f}{rows:9d}"
            )

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
