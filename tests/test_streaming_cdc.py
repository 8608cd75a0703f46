"""Streaming CDC apply onto a versioned snapshot table (cdc_stream).

A 3-epoch change feed drives the sink; asserts the final snapshot, the
per-epoch time-travel states, intra-epoch upsert+delete netting, and
crash-replay convergence (re-applying an epoch commits a new version
with IDENTICAL content)."""

from __future__ import annotations

import json
import os
import time

from retail_data_pipeline_and_forecasting_system_spark.sources.versioned import (
    current_version,
    list_versions,
    read_version,
)
from retail_data_pipeline_and_forecasting_system_spark.streaming import (
    cdc_apply_sink,
    run_cdc_apply,
)


def _write_feed(in_dir):
    in_dir.mkdir()
    epochs = [
        # epoch 0: two inserts
        [
            {"k": 1, "op": "upsert", "seq": 1, "val": "a"},
            {"k": 2, "op": "upsert", "seq": 2, "val": "b"},
        ],
        # epoch 1: update 1, insert 3, delete 2; key 4 is upserted then
        # deleted WITHIN the epoch (must net to absent)
        [
            {"k": 1, "op": "upsert", "seq": 3, "val": "a2"},
            {"k": 3, "op": "upsert", "seq": 4, "val": "c"},
            {"k": 2, "op": "delete", "seq": 5, "val": None},
            {"k": 4, "op": "upsert", "seq": 6, "val": "ghost"},
            {"k": 4, "op": "delete", "seq": 7, "val": None},
        ],
        # epoch 2: delete a never-present key (no-op), re-insert 2
        [
            {"k": 9, "op": "delete", "seq": 8, "val": None},
            {"k": 2, "op": "upsert", "seq": 9, "val": "b2"},
        ],
    ]
    for i, rows in enumerate(epochs):
        p = in_dir / f"feed_{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        ts = time.time() - 1000 + i
        os.utime(p, (ts, ts))


def _snapshot(spark, table_dir, version=None):
    return {
        r["k"]: (r["val"], r["seq"])
        for r in read_version(spark, table_dir, version).collect()
    }


def test_cdc_apply_maintains_versioned_snapshot(spark, tmp_path):
    _write_feed(tmp_path / "in")
    table = str(tmp_path / "table")
    run_cdc_apply(
        spark,
        str(tmp_path / "in" / "*.json"),
        table,
        str(tmp_path / "ckpt"),
    )
    assert list_versions(table) == [1, 2, 3]
    # time travel: one version per epoch
    assert _snapshot(spark, table, 1) == {1: ("a", 1), 2: ("b", 2)}
    assert _snapshot(spark, table, 2) == {1: ("a2", 3), 3: ("c", 4)}
    assert _snapshot(spark, table) == {
        1: ("a2", 3),
        3: ("c", 4),
        2: ("b2", 9),
    }


def test_cdc_random_feed_matches_dict_oracle(spark, tmp_path):
    """Randomized feeds vs a sequential Python dict: after every epoch
    the committed version must equal replaying the raw changes in seq
    order into a dict (latest-wins upserts, deletes remove)."""
    import numpy as np

    rng = np.random.default_rng(42)
    table = str(tmp_path / "table")
    sink = cdc_apply_sink(table, "k")
    oracle: dict[int, tuple] = {}
    seq = 0
    for epoch in range(4):
        rows = []
        for _ in range(int(rng.integers(1, 12))):
            k = int(rng.integers(0, 8))
            seq += 1
            if rng.random() < 0.3:
                rows.append((k, "delete", seq, None))
            else:
                rows.append((k, "upsert", seq, f"v{seq}"))
        batch = spark.createDataFrame(
            rows, "k long, op string, seq long, val string"
        )
        sink(batch, epoch)
        for k, op, s, v in rows:  # seq order == list order here
            if op == "delete":
                oracle.pop(k, None)
            else:
                oracle[k] = (v, s)
        assert _snapshot(spark, table) == oracle, f"epoch {epoch}"


def test_cdc_duplicate_seq_collapses_deterministically(spark, tmp_path):
    """The contract says seq is monotone per key, but nothing enforces
    uniqueness — a tie must collapse to a DETERMINISTIC winner:
    delete-before-upsert ('delete' < 'upsert'), then payload order for
    same-seq upserts. Apply the same ambiguous batch to two fresh
    tables and assert identical (and specifically-predicted) state."""
    rows = [
        # key 1: upsert and delete share seq 5 -> delete wins (op asc)
        (1, "upsert", 5, "alive"),
        (1, "delete", 5, None),
        # key 2: two upserts share seq 7 -> lowest payload wins (val asc)
        (2, "upsert", 7, "zzz"),
        (2, "upsert", 7, "aaa"),
    ]
    batch = spark.createDataFrame(
        rows, "k long, op string, seq long, val string"
    )
    states = []
    for name in ("t_a", "t_b"):
        table = str(tmp_path / name)
        cdc_apply_sink(table, "k")(batch, 0)
        states.append(_snapshot(spark, table))
    assert states[0] == states[1] == {2: ("aaa", 7)}


def test_cdc_empty_batch_commits_no_version(spark, tmp_path):
    """An empty micro-batch (streaming frameworks emit them) must not
    commit a new identical version — version history stays one entry
    per EFFECTIVE epoch."""
    table = str(tmp_path / "table")
    sink = cdc_apply_sink(table, "k")
    schema = "k long, op string, seq long, val string"
    sink(spark.createDataFrame([(1, "upsert", 1, "a")], schema), 0)
    v = current_version(table)
    sink(spark.createDataFrame([], schema), 1)
    assert current_version(table) == v
    assert _snapshot(spark, table) == {1: ("a", 1)}


def test_cdc_midhistory_replay_is_sequence_guarded(spark, tmp_path):
    """Re-firing epoch 1 of 3 AFTER the full feed ran (lost checkpoint /
    feed re-drain — beyond Structured Streaming's last-epoch contract):
    the seq guard must drop every stale change, so the snapshot content
    is unchanged. Without the guard, epoch 1's `delete k=2 (seq 5)`
    would clobber epoch 2's newer `upsert k=2 -> b2 (seq 9)`."""
    _write_feed(tmp_path / "in")
    table = str(tmp_path / "table")
    run_cdc_apply(
        spark,
        str(tmp_path / "in" / "*.json"),
        table,
        str(tmp_path / "ckpt"),
    )
    final = _snapshot(spark, table)
    assert final[2] == ("b2", 9)  # epoch 2's upsert, newer than the delete

    epoch1 = spark.createDataFrame(
        [
            (1, "upsert", 3, "a2"),
            (3, "upsert", 4, "c"),
            (2, "delete", 5, None),
            (4, "upsert", 6, "ghost"),
            (4, "delete", 7, None),
        ],
        "k long, op string, seq long, val string",
    )
    cdc_apply_sink(table, "k")(epoch1, 1)
    assert _snapshot(spark, table) == final
    # and a mid-history refire composed with a LIVE later change still
    # orders correctly: a fresh upsert (max seq) applies while the stale
    # delete from the same batch is guarded out
    mixed = spark.createDataFrame(
        [(2, "delete", 5, None), (3, "upsert", 100, "c9")],
        "k long, op string, seq long, val string",
    )
    cdc_apply_sink(table, "k")(mixed, 99)
    want = dict(final)
    want[3] = ("c9", 100)
    assert _snapshot(spark, table) == want


def test_cdc_tombstones_block_delete_resurrection(spark, tmp_path):
    """The replay shape the plain seq guard cannot catch: key 1 is
    upserted (seq 1) then deleted (seq 5); a mid-history refire replays
    the stale upsert. Without tombstones the deleted key has no seq
    watermark and the upsert RESURRECTS it; with tombstones=True the
    watermark survives deletion and the stale upsert is guarded out."""
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        read_cdc_snapshot,
    )

    schema = "k long, op string, seq long, val string"
    up1 = spark.createDataFrame([(1, "upsert", 1, "a")], schema)
    del5 = spark.createDataFrame([(1, "delete", 5, None)], schema)

    # plain mode: resurrection happens (the documented limitation)
    plain = str(tmp_path / "plain")
    sink = cdc_apply_sink(plain, "k")
    sink(up1, 0)
    sink(del5, 1)
    sink(up1, 0)  # stale refire
    assert _snapshot(spark, plain) == {1: ("a", 1)}  # resurrected

    # tombstone mode: converges
    ts = str(tmp_path / "ts")
    sink = cdc_apply_sink(ts, "k", tombstones=True)
    sink(up1, 0)
    sink(del5, 1)
    assert read_cdc_snapshot(spark, ts).count() == 0  # live view empty
    assert (
        read_cdc_snapshot(spark, ts, include_tombstones=True).count() == 1
    )
    sink(up1, 0)  # stale refire — guarded by the tombstone's seq 5
    assert read_cdc_snapshot(spark, ts).count() == 0
    # and a GENUINELY new upsert (seq > tombstone) re-creates the key
    sink(spark.createDataFrame([(1, "upsert", 9, "z")], schema), 3)
    live = read_cdc_snapshot(spark, ts).collect()
    assert [(r["k"], r["val"], r["seq"]) for r in live] == [(1, "z", 9)]


def test_cdc_tombstone_feed_matches_dict_oracle(spark, tmp_path):
    """The randomized-feed oracle holds in tombstone mode too (live view
    == sequential dict replay)."""
    import numpy as np

    rng = np.random.default_rng(43)
    table = str(tmp_path / "table")
    sink = cdc_apply_sink(table, "k", tombstones=True)
    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        read_cdc_snapshot,
    )

    oracle: dict[int, tuple] = {}
    seq = 0
    for epoch in range(4):
        rows = []
        for _ in range(int(rng.integers(1, 12))):
            k = int(rng.integers(0, 8))
            seq += 1
            if rng.random() < 0.3:
                rows.append((k, "delete", seq, None))
            else:
                rows.append((k, "upsert", seq, f"v{seq}"))
        batch = spark.createDataFrame(
            rows, "k long, op string, seq long, val string"
        )
        sink(batch, epoch)
        for k, op, s, v in rows:
            if op == "delete":
                oracle.pop(k, None)
            else:
                oracle[k] = (v, s)
        live = {
            r["k"]: (r["val"], r["seq"])
            for r in read_cdc_snapshot(spark, table).collect()
        }
        assert live == oracle, f"epoch {epoch}"


def test_cdc_tombstone_random_replay_fuzz(spark, tmp_path):
    """Adversarial replay: after a 5-epoch random feed (tombstone mode),
    re-fire a random shuffle of past epochs — the live view must stay
    pinned to the sequential dict oracle through every refire. This is
    the seq-guard + tombstone contract under arbitrary re-delivery."""
    import numpy as np

    from retail_data_pipeline_and_forecasting_system_spark.streaming import (
        read_cdc_snapshot,
    )

    rng = np.random.default_rng(99)
    table = str(tmp_path / "table")
    sink = cdc_apply_sink(table, "k", tombstones=True)
    schema = "k long, op string, seq long, val string"

    epochs = []
    oracle: dict[int, tuple] = {}
    seq = 0
    for epoch in range(5):
        rows = []
        for _ in range(int(rng.integers(2, 10))):
            k = int(rng.integers(0, 6))
            seq += 1
            if rng.random() < 0.35:
                rows.append((k, "delete", seq, None))
            else:
                rows.append((k, "upsert", seq, f"v{seq}"))
        epochs.append(rows)
        sink(spark.createDataFrame(rows, schema), epoch)
        for k, op, s, v in rows:
            if op == "delete":
                oracle.pop(k, None)
            else:
                oracle[k] = (v, s)

    def live():
        return {
            r["k"]: (r["val"], r["seq"])
            for r in read_cdc_snapshot(spark, table).collect()
        }

    assert live() == oracle
    refires = list(rng.permutation(5)) + [int(rng.integers(0, 5))]
    for e in refires:
        sink(spark.createDataFrame(epochs[int(e)], schema), int(e))
        assert live() == oracle, f"refire of epoch {e} diverged"


def test_cdc_replay_of_last_epoch_converges(spark, tmp_path):
    """Crash replay re-runs only the LAST uncommitted epoch (Structured
    Streaming's contract): re-applying the final batch against its own
    committed output must produce a new version with IDENTICAL content
    — same-value upserts and deletes of absent keys are no-ops."""
    _write_feed(tmp_path / "in")
    table = str(tmp_path / "table")
    run_cdc_apply(
        spark,
        str(tmp_path / "in" / "*.json"),
        table,
        str(tmp_path / "ckpt"),
    )
    before = _snapshot(spark, table)
    v_before = current_version(table)

    epoch2 = spark.createDataFrame(
        [(9, "delete", 8, None), (2, "upsert", 9, "b2")],
        "k long, op string, seq long, val string",
    )
    cdc_apply_sink(table, "k")(epoch2, 2)

    assert current_version(table) == v_before + 1
    assert _snapshot(spark, table) == before
