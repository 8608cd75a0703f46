"""Unified decade/3x scale-check harness (SCALE.md protocol).

Consolidates the per-round scripts (scale_check_r4..r7c — deleted,
round-8 verdict item 5); their recorded numbers live in SCALE.md. This
harness covers the common id-offset staging those scripts shared; two
one-off experiments are NOT reproducible here and stand in SCALE.md as
recorded by the deleted scripts (in git history): the round-3 "deep"
events variant (timestamp-shifted copies — 3x longer per-user
timelines) and the bare-j6 baseline A/B. Events staging here offsets
event_id (same users, same instants); read each SCALE.md cell's
staging note for what its copies meant.

Protocol:

- **Staging**: a pseudo-(mult)x corpus is built from sf0.1 by unioning
  ``mult`` id-offset copies of the tables named in ``--stage``;
  everything else is symlinked. Offsets multiply KEYS; timestamps,
  user ids, texts and payload-generating ids keep their residue
  classes — the per-operator staging notes in SCALE.md interpret what
  each copy means for that operator (more keys vs deeper history).
- **Meter**: full-evaluation forcing (count + max xxhash64 over all
  columns — every cell is computed and hashed), one untimed warm pass,
  then best-of-``--reps`` wall seconds.
- **Shuffle**: total shuffle-write bytes for the timed jobs via the
  Spark UI REST API (localhost:4040) — the scale column that separates
  "map-only as claimed" from "quietly reshuffling the corpus".

Usage:
    python tools/scale_check.py --ops m15_real_resize,m16_visual_features
    python tools/scale_check.py --ops e9_attribution --stage events
    python tools/scale_check.py --ops a5_inventory_depletion \
        --stage lineitem --mult 3 --scales 1,3

Writes nothing; prints one table row per (op, scale).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
import urllib.request
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
# table -> (id column, offset stride). Copies offset the KEY so joins /
# groups / windows see mult-x distinct keys; every other column repeats,
# which each operator's SCALE.md note interprets (dup density, per-key
# depth, residue classes of synthesized payloads).
STAGE_KEYS = {
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "events": ("event_id", 100_000_000),
    "customer": ("c_custkey", 10_000_000),
    "part": ("p_partkey", 10_000_000),
    "supplier": ("s_suppkey", 10_000_000),
}
UI = "http://localhost:4040/api/v1"


def _stage(spark, out: Path, mult: int, tables: list[str]) -> None:
    out.mkdir(parents=True, exist_ok=True)
    for t in tables:
        key, stride = STAGE_KEYS[t]
        # _t normalizes types (e.g. events.ts to TIMESTAMP) exactly as
        # the registry queries will read them
        base = _t(spark, SF, t)
        u = base
        for i in range(1, mult):
            u = u.unionByName(
                base.withColumn(key, F.col(key) + F.lit(i * stride))
            )
        u.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
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


def _jobs(app_id: str) -> list[dict]:
    return json.load(
        urllib.request.urlopen(f"{UI}/applications/{app_id}/jobs")
    )


def _last_job_id(app_id: str) -> int:
    return max((j["jobId"] for j in _jobs(app_id)), default=-1)


def _shuffle_write_bytes(app_id: str, after_job: int) -> int:
    """Sum shuffle-write bytes over all stages of jobs > after_job."""
    total = 0
    seen: set[int] = set()
    for j in _jobs(app_id):
        if j["jobId"] <= after_job:
            continue
        for sid in j["stageIds"]:
            if sid in seen:
                continue
            seen.add(sid)
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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--ops", required=True,
        help="comma-separated registry query names",
    )
    ap.add_argument(
        "--stage", default="documents,embeddings,lineitem",
        help=f"tables to id-offset copy (choices: {sorted(STAGE_KEYS)})",
    )
    ap.add_argument("--mult", type=int, default=10,
                    help="staged corpus multiplier (default 10)")
    ap.add_argument("--scales", default="1,10",
                    help="scales to run, e.g. 1,10 (non-1 uses --mult dir)")
    ap.add_argument("--reps", type=int, default=2,
                    help="timed reps, best-of (default 2)")
    args = ap.parse_args()

    ops = [o for o in args.ops.split(",") if o]
    unknown = [o for o in ops if o not in QUERIES]
    if unknown:
        sys.exit(f"unknown ops: {unknown}")
    stage_tables = [t for t in args.stage.split(",") if t]
    bad = [t for t in stage_tables if t not in STAGE_KEYS]
    if bad:
        sys.exit(f"no stage key for: {bad} (choices: {sorted(STAGE_KEYS)})")

    spark = get_session(
        "scale_check", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    tmp = Path(tempfile.mkdtemp(prefix="scale_check_"))
    staged = tmp / f"x{args.mult}"
    _stage(spark, staged, args.mult, stage_tables)

    scales = []
    for s in args.scales.split(","):
        s = int(s)
        if s != 1 and s != args.mult:
            # the tool stages exactly ONE multiplied corpus; silently
            # mapping e.g. --scales 1,3 onto a 10x directory would
            # record a mislabeled row (round-8 review finding)
            sys.exit(f"--scales {s} has no staged dir (--mult {args.mult})")
        scales.append(("1x", SF) if s == 1 else (f"{s}x", str(staged)))

    print(f"staged {args.mult}x: {','.join(stage_tables)}  "
          f"(meter: warm + best-of-{args.reps} full-evaluation)")
    print(f"{'query':28s} {'scale':5s} {'rows':>9s} {'sec':>7s} "
          f"{'rows/s':>9s} {'shufW':>10s}")
    for name in ops:
        fn = QUERIES[name].fn
        for label, sf_dir in scales:
            rows = _force(fn(spark, sf_dir))  # codegen/JIT warm, untimed
            # shuffle-write is metered over exactly ONE timed rep —
            # summing all reps inflated shufW by the rep count in the
            # r4-r7 per-round scripts AND the first round-8 cells
            # (round-8 review finding; ratios were unaffected)
            mark = _last_job_id(app_id)
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            best = time.perf_counter() - t0
            shuf = _shuffle_write_bytes(app_id, mark)
            if args.reps > 1:
                best = min(
                    best,
                    _time(lambda: _force(fn(spark, sf_dir)),
                          reps=args.reps - 1),
                )
            sec = best
            print(f"{name:28s} {label:5s} {rows:9d} {sec:7.2f} "
                  f"{rows / sec:9.0f} {shuf:10d}")

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
