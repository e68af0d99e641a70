"""Snapshot-merge (upsert / delete / CDC) operator semantics."""

from __future__ import annotations

from etl_tools_rs_spark.operators.merge import (
    apply_deletes,
    merge_changes,
    upsert_snapshot,
)


def test_upsert_replace_insert_keep(spark):
    base = spark.createDataFrame(
        [(1, "old-1"), (2, "old-2"), (3, "old-3")], "k int, v string"
    )
    updates = spark.createDataFrame(
        [(2, "new-2"), (4, "new-4")], "k int, v string"
    )
    got = {r.k: r.v for r in upsert_snapshot(base, updates, ["k"]).collect()}
    # 1,3 kept; 2 replaced; 4 inserted
    assert got == {1: "old-1", 2: "new-2", 3: "old-3", 4: "new-4"}


def test_upsert_version_wins_and_update_breaks_ties(spark):
    base = spark.createDataFrame([(1, 5, "base-v5")], "k int, ver int, v string")
    updates = spark.createDataFrame(
        [(1, 3, "upd-v3"), (1, 5, "upd-v5")], "k int, ver int, v string"
    )
    # greatest version wins; at equal version the update side wins
    [r] = upsert_snapshot(base, updates, ["k"], version_col="ver").collect()
    assert (r.ver, r.v) == (5, "upd-v5")
    # a strictly newer base row survives a stale update
    base2 = spark.createDataFrame([(1, 9, "base-v9")], "k int, ver int, v string")
    upd2 = spark.createDataFrame([(1, 3, "upd-v3")], "k int, ver int, v string")
    [r2] = upsert_snapshot(base2, upd2, ["k"], version_col="ver").collect()
    assert (r2.ver, r2.v) == (9, "base-v9")


def test_apply_deletes(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    dels = spark.createDataFrame([(2,), (99,)], "k int")
    got = {r.k for r in apply_deletes(base, dels, ["k"]).collect()}
    assert got == {1}


def test_merge_changes_delete_beats_upsert(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    changes = spark.createDataFrame(
        [("upsert", 2, "b2"), ("upsert", 3, "c"), ("delete", 3, None), ("delete", 1, None)],
        "op string, k int, v string",
    )
    got = {r.k: r.v for r in merge_changes(base, changes, ["k"]).collect()}
    # 1 deleted, 2 updated, 3 upserted-then-tombstoned in the same batch
    assert got == {2: "b2"}
