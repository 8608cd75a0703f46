"""Seeded randomized differentials for the round-14 split-integrity
family (the m18/j10 pattern): ONE Spark run per seed over a
collision-heavy random corpus, compared against an INDEPENDENT pure-
Python implementation of the defined semantics — md5-sliced minhash,
banding, rarity cap, nibble splits and the u64 digest all re-derived
from the spec, not from the engine or the DuckDB oracle. These reach
the tie/boundary/collision states the hand corpora cannot: a 4-word
vocabulary makes exact dups, near-dups and shared-shingle pairs dense
across every split boundary."""

from __future__ import annotations

import hashlib
import random

import pytest

from retail_data_pipeline_and_forecasting_system_spark.plans.analytics import (
    QUERIES,
)

K = 3
NUM_HASHES, BANDS, THR, MAX_DF = 8, 4, 0.35, 50


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _nib(doc_id) -> int | None:
    if doc_id is None:
        return None
    return int(_md5(str(doc_id))[0], 16)


def _shingles(text: str | None) -> set[str]:
    if text is None:
        return set()
    toks = text.split(" ")
    if len(toks) < K:
        return set()
    return {" ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)}


def _minhash_bucket_keys(sh: set[str]) -> set[tuple[int, str]]:
    """Band bucket keys per the sliced-md5 scheme: hash i is the 8-hex
    slice (i % 4) of md5(f'{i // 4}:{shingle}'); bucket = md5 of the
    band's row hashes joined with '|'."""
    if not sh:
        return set()
    mh = []
    for i in range(NUM_HASHES):
        lo = (i % 4) * 8
        mh.append(min(_md5(f"{i // 4}:{s}")[lo : lo + 8] for s in sh))
    rows = NUM_HASHES // BANDS
    return {
        (b, _md5("|".join(mh[b * rows + r] for r in range(rows))))
        for b in range(BANDS)
    }


def _h64(doc_id, text) -> int:
    h = _md5(f"{'' if doc_id is None else doc_id}:{text or ''}")
    return int(h[:16], 16)


def _py_family(rows):
    """Independent reference: returns (x59 cell dict, x60 shard dict)."""
    docs = {i: t for i, t in rows if i is not None}
    train = {i for i in docs if _nib(i) < 12}
    evals = {i for i in docs if _nib(i) >= 12}
    sh = {i: _shingles(t) for i, t in docs.items()}
    # tier pair sets (train_id, eval_id)
    ex = {
        (a, b)
        for a in train
        for b in evals
        if docs[a] is not None
        and docs[b] is not None
        and _md5(docs[a]) == _md5(docs[b])
    }
    bk = {i: _minhash_bucket_keys(sh[i]) for i in docs}
    near = set()
    for a in train:
        for b in evals:
            if bk[a] & bk[b]:
                inter = len(sh[a] & sh[b])
                union = len(sh[a]) + len(sh[b]) - inter
                if union and inter / union >= THR:
                    near.add((a, b))
    df = {}
    for i in docs:
        for s in sh[i]:
            df[s] = df.get(s, 0) + 1
    rare = {s for s, n in df.items() if n <= MAX_DF}
    ng = {
        (a, b)
        for a in train
        for b in evals
        if (sh[a] & sh[b]) & rare
    }
    cells = {}
    for tier, pairs in (("exact", ex), ("near_dup", near), ("ngram", ng)):
        for a, b in pairs:
            key = (_nib(a), "val" if _nib(b) < 14 else "test", tier)
            c = cells.setdefault(key, [set(), 0, None, None])
            c[0].add(a)
            c[1] += 1
            c[2] = a if c[2] is None else min(c[2], a)
            c[3] = b if c[3] is None else min(c[3], b)
    x59 = {
        k: (len(v[0]), v[1], v[2], v[3]) for k, v in cells.items()
    }
    # x60: drop exact+near, flag ngram-only, digest over kept
    dropped = {a for a, _ in ex} | {a for a, _ in near}
    flagged = {a for a, _ in ng}
    shards = {}
    for a in train:
        s = shards.setdefault(_nib(a), [0, 0, 0, 0, None, 0])
        s[0] += 1
        if a in dropped:
            s[1] += 1
        else:
            s[3] += 1
            if a in flagged:
                s[2] += 1
            if docs[a] is not None:
                nt = len(docs[a].split(" "))
                s[4] = nt if s[4] is None else s[4] + nt
            s[5] = (s[5] + _h64(a, docs[a])) % (2**64)
    x60 = {k: tuple(v[:5]) + (str(v[5]),) for k, v in shards.items()}
    return x59, x60


def _corpus(seed: int):
    """Collision-dense corpus: 4-word vocabulary, lengths 0-6, some
    NULL texts, one NULL doc_id — every split boundary gets exact
    dups, near-dups and shared shingles."""
    rng = random.Random(seed)
    vocab = ["red", "blue", "deep", "sea"]
    rows = []
    for doc_id in range(70):
        roll = rng.random()
        if roll < 0.06:
            rows.append((doc_id, None))
        else:
            n = rng.randint(0, 6)
            rows.append(
                (doc_id, " ".join(rng.choice(vocab) for _ in range(n)))
            )
    rows.append((None, rows[3][1]))  # NULL id with duplicated content
    return rows


@pytest.mark.parametrize("seed", [11, 2026])
def test_x59_matches_pure_python_spec(spark, tmp_path, seed):
    rows = _corpus(seed)
    want59, _ = _py_family(rows)
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    got = {
        (r["train_shard"], r["eval_set"], r["tier"]): (
            r["n_train_docs"], r["n_pairs"],
            r["example_train_id"], r["example_eval_id"],
        )
        for r in QUERIES["x59_split_overlap"].fn(spark, str(d)).collect()
    }
    assert got == want59 and len(want59) > 4


@pytest.mark.parametrize("seed", [11, 2026])
def test_x60_matches_pure_python_spec(spark, tmp_path, seed):
    rows = _corpus(seed)
    _, want60 = _py_family(rows)
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "documents.parquet"))
    got = {
        r["train_shard"]: (
            r["n_docs"], r["n_dropped"], r["n_flagged_kept"],
            r["n_kept"], r["kept_tokens"], r["kept_digest"],
        )
        for r in QUERIES["x60_leakage_scrub"].fn(spark, str(d)).collect()
    }
    assert got == want60 and len(want60) > 4
