"""Seeded randomized differentials for the round-8 pair operators
(the d17/e9 pattern): ONE Spark run per seed over a collision-heavy
random corpus, compared against an independent pure-Python
implementation of the defined semantics. These catch blocking/tie/
boundary bugs the hand corpora cannot reach — here specifically the
m18 pigeonhole banding (is it really recall-lossless?) and the j10
claim rule (does every overlapping pair appear exactly once?)."""

from __future__ import annotations

import random

import pytest

from retail_data_pipeline_and_forecasting_system_spark.operators.imagecodec import (
    encode_png,
)
from retail_data_pipeline_and_forecasting_system_spark.operators.multimodal import (
    dhash_neardup_pairs,
    perceptual_hash,
)


def _py_dhash(w: int, h: int, px: list[int]) -> tuple[int, int]:
    """Independent dHash: 9x8 floor-NN grid, bit (i,j) iff right > left."""
    sy = [(i * h) // 8 for i in range(8)]
    sx = [(j * w) // 9 for j in range(9)]
    hi = lo = 0
    for i in range(8):
        for j in range(8):
            a = px[sy[i] * w + sx[j]]
            b = px[sy[i] * w + sx[j + 1]]
            if b > a:
                if i < 4:
                    hi |= 1 << (i * 8 + j)
                else:
                    lo |= 1 << ((i - 4) * 8 + j)
    return hi, lo


@pytest.mark.parametrize("seed", [7, 901])
def test_m18_banding_matches_bruteforce(spark, seed):
    """80 random small images drawn from a TINY pixel alphabet (heavy
    fingerprint collisions): the banded Spark pair set must equal the
    brute-force all-pairs hamming<=3 set from an independent Python
    dHash — banding recall-losslessness under adversarial density."""
    rng = random.Random(seed)
    imgs = {}
    rows = []
    for doc_id in range(80):
        w, h = rng.randint(1, 6), rng.randint(1, 5)
        # alphabet of 3 values -> many near-identical structures
        px = [rng.choice([10, 60, 110]) for _ in range(w * h)]
        imgs[doc_id] = _py_dhash(w, h, px)
        rows.append(
            (doc_id, bytearray(encode_png(w, h, 1, bytes(px))))
        )
    want = set()
    for a in imgs:
        for b in imgs:
            if a < b:
                da, db = imgs[a], imgs[b]
                ham = bin(da[0] ^ db[0]).count("1") + bin(
                    da[1] ^ db[1]
                ).count("1")
                if ham <= 3:
                    want.add((a, b, ham))

    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = perceptual_hash(df).select("doc_id", "dhash_hi", "dhash_lo")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dhash_neardup_pairs(hashed, max_hamming=3).collect()
    }
    assert got == want and len(want) > 0


@pytest.mark.parametrize("seed", [13, 4242])
def test_j10_claim_rule_matches_bruteforce(spark, seed, tmp_path):
    """300 random purchase instants drawn from a 2-hour range at
    second granularity (dense overlaps, exact ties, bucket-boundary
    hits): the bucketed+claimed Spark pair set must equal brute-force
    half-open interval overlap, each pair EXACTLY once."""
    from datetime import datetime, timezone

    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
    )

    rng = random.Random(seed)
    L = 1800  # the registry entry's 30-min window, in seconds
    starts = {eid: rng.randint(0, 7200) for eid in range(300)}
    rows = [
        (eid, datetime.fromtimestamp(s, tz=timezone.utc), 1, "purchase")
        for eid, s in starts.items()
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(str(sf / "events.parquet"))

    want = {}
    for a in starts:
        for b in starts:
            if a < b:
                lo = max(starts[a], starts[b])
                hi = min(starts[a] + L, starts[b] + L)
                if lo < hi:
                    want[(a, b)] = (hi - lo) * 1_000_000
    rows_out = (
        QUERIES["j10_interval_overlap_join"].fn(spark, str(sf)).collect()
    )
    got = {}
    for r in rows_out:
        key = (r["id_a"], r["id_b"])
        assert key not in got, f"pair {key} emitted twice"
        got[key] = r["overlap_us"]
    assert got == want and len(want) > 1000


@pytest.mark.parametrize("seed", [31, 777])
def test_e14_cdf_scores_match_pure_python(spark, seed, tmp_path):
    """40 customers with colliding order counts/spends/dates (draws
    from tiny ranges) and a few NULL spends: Spark's alphabet-CDF
    scoring must equal an independent Python ceil(5*CDF) — tie
    groups share scores, NULL-monetary customers drop."""
    import math
    from datetime import datetime, timezone

    from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
        QUERIES,
    )

    rng = random.Random(seed)
    rows = []
    ok = 0
    for cust in range(40):
        for _ in range(rng.randint(1, 4)):
            ok += 1
            spend = (
                None if rng.random() < 0.08
                else float(rng.choice([20, 20, 50, 50, 99, 180]))
            )
            day = rng.randint(1, 25)
            rows.append(
                (ok, cust, spend,
                 datetime(2024, 3, day, tzinfo=timezone.utc))
            )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.parquet(str(sf / "orders.parquet"))

    # independent python oracle
    per = {}
    for _okey, cust, spend, od in rows:
        d = per.setdefault(cust, {"last": None, "n": 0, "spend": None})
        d["n"] += 1
        d["last"] = od.date() if d["last"] is None else max(
            d["last"], od.date()
        )
        if spend is not None:
            d["spend"] = (d["spend"] or 0.0) + spend
    maxd = max(d["last"] for d in per.values())
    cust_rows = {
        c: (
            (maxd - d["last"]).days,
            d["n"],
            None if d["spend"] is None else math.floor(d["spend"]),
        )
        for c, d in per.items()
    }
    N = len(cust_rows)

    def score(vals, v, desc):
        c = sum(
            1 for x in vals
            if x is not None and (x >= v if desc else x <= v)
        )
        return (5 * c + N - 1) // N

    rvals = [r for r, _, _ in cust_rows.values()]
    fvals = [f for _, f, _ in cust_rows.values()]
    mvals = [m for _, _, m in cust_rows.values()]
    want = {}
    for c, (r, f, m) in cust_rows.items():
        if m is None:
            continue  # NULL monetary never equi-joins its score map
        rs, fs, ms = (
            score(rvals, r, True), score(fvals, f, False),
            score(mvals, m, False),
        )
        want[c] = (r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms)

    got = {
        r["customer_id"]: (
            r["recency_days"], r["n_orders"], r["monetary"],
            r["r_score"], r["f_score"], r["m_score"], r["rfm"],
        )
        for r in QUERIES["e14_rfm_segmentation"].fn(spark, str(sf)).collect()
    }
    assert got == want
