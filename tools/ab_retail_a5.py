"""One fresh-JVM arm of the retail/a5 interleaved A/B (SCALE.md protocol).

Usage: python tools/ab_retail_a5.py <repo_dir> [reps]

Times, in THIS process's single fresh Spark session:
  - a5_inventory_depletion at $SPARK_GRAFT_SF_DIR (default sf0.1)
  - retail_pipeline_dataset15 (reference dataset_15 end-to-end)
with bench.py's exact semantics (full-evaluation forcing, one untimed
warm pass, then `reps` timed reps each). Prints ONE JSON line with ALL
rep times (not just the min) so the A/B record can show the spread.

The caller alternates arms across fresh JVMs (one variant per session —
CacheManager same-plan reuse makes two-variants-in-one-JVM lie; see
SCALE.md "A measured rejection (round 4)").
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

repo = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from retail_data_pipeline_and_forecasting_system_spark import caching  # noqa: E402
from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (  # noqa: E402
    QUERIES,
)
from retail_data_pipeline_and_forecasting_system_spark.plans.retail import (  # noqa: E402
    release_retail_pipeline,
    run_retail_pipeline,
)
from retail_data_pipeline_and_forecasting_system_spark.session import (  # noqa: E402
    get_session,
)
from retail_data_pipeline_and_forecasting_system_spark.sources import (  # noqa: E402
    read_products_csv,
    read_transactions_json,
)


def _run_full(df):
    n, _ = df.agg(
        F.count(F.lit(1)),
        F.max(F.xxhash64(*[F.col(c) for c in df.columns])),
    ).collect()[0]
    return n


def main() -> None:
    caching.KEEP_SESSION_CACHES = True
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-retail-a5")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for t in ("lineitem", "orders", "part"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    a5 = QUERIES["a5_inventory_depletion"].fn
    a5_times = []
    for rep in range(reps + 1):  # rep 0 untimed warm pass
        t0 = time.perf_counter()
        _run_full(a5(spark, sf_dir))
        if rep > 0:
            a5_times.append(round(time.perf_counter() - t0, 4))

    # retail: bench.py's exact block, including the cache release
    ds = Path("/root/reference/data/dataset_15")
    caching.KEEP_SESSION_CACHES = False
    caching.drop_stale()
    retail_times = []
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        products = read_products_csv(spark, str(ds / "products.csv"))
        raw = read_transactions_json(spark, str(ds / "transactions_*.json"))
        outs = run_retail_pipeline(raw, products)
        for name in ("orders", "order_line_items", "daily_summary",
                     "products_updated"):
            _run_full(outs[name])
        if rep > 0:
            retail_times.append(round(time.perf_counter() - t0, 4))
        release_retail_pipeline(outs)

    print(json.dumps({
        "repo": repo,
        "a5": a5_times,
        "retail": retail_times,
        "a5_min": min(a5_times),
        "retail_min": min(retail_times),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
