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
