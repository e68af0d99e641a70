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


class TestSnapshotDiff:
    def test_all_change_types(self, spark):
        from etl_tools_rs_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
            "k int, s string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "B", 20.0), (3, "c", None), (5, "e", 50.0)],
            "k int, s string, v double",
        )
        got = {r["k"]: r["change_type"] for r in
               snapshot_diff(old, new, ["k"]).collect()}
        # 1 unchanged (excluded), 3 unchanged with NULL==NULL (excluded)
        assert got == {2: "changed", 4: "removed", 5: "added"}

    def test_include_unchanged_and_null_vs_value(self, spark):
        from etl_tools_rs_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame([(1, None), (2, 5.0)], "k int, v double")
        new = spark.createDataFrame([(1, 0.0), (2, 5.0)], "k int, v double")
        got = {r["k"]: r["change_type"] for r in
               snapshot_diff(old, new, ["k"], include_unchanged=True).collect()}
        assert got == {1: "changed", 2: "unchanged"}  # NULL -> 0.0 is a change

    def test_compare_cols_subset(self, spark):
        from etl_tools_rs_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame([(1, "x", 1.0)], "k int, s string, v double")
        new = spark.createDataFrame([(1, "y", 1.0)], "k int, s string, v double")
        assert snapshot_diff(old, new, ["k"], compare_cols=["v"]).count() == 0

    def test_rejects_bad_args(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.merge import snapshot_diff

        df = spark.createDataFrame([(1, 2.0)], "k int, v double")
        with pytest.raises(ValueError, match="at least one key"):
            snapshot_diff(df, df, [])
        with pytest.raises(ValueError, match="not present"):
            snapshot_diff(df, df, ["k"], compare_cols=["zz"])


class TestScd2History:
    def _hist(self, spark, rows):
        from etl_tools_rs_spark.operators.merge import scd2_history

        df = spark.createDataFrame(rows, "k int, v string, ts int, id int")
        return scd2_history(
            df, keys=["k"], value_cols=["v"], ts_col="ts", tiebreak=["id"]
        )

    def test_runs_collapse_and_intervals_chain(self, spark):
        rows = [
            (1, "A", 10, 1),
            (1, "A", 20, 2),  # same value -> same version
            (1, "B", 30, 3),
            (1, "A", 40, 4),  # back to A -> NEW version (not merged with v1)
        ]
        got = sorted(
            self._hist(spark, rows).collect(), key=lambda r: r.version
        )
        assert [(r.version, r.v, r.valid_from, r.valid_to, r.is_current,
                 r.n_observations) for r in got] == [
            (1, "A", 10, 30, False, 2),
            (2, "B", 30, 40, False, 1),
            (3, "A", 40, None, True, 1),
        ]

    def test_null_transitions_open_versions(self, spark):
        rows = [(1, None, 10, 1), (1, "A", 20, 2), (1, None, 30, 3)]
        got = sorted(
            self._hist(spark, rows).collect(), key=lambda r: r.version
        )
        assert [r.v for r in got] == [None, "A", None]
        assert [r.is_current for r in got] == [False, False, True]

    def test_timestamp_ties_broken_by_id(self, spark):
        rows = [(1, "B", 10, 2), (1, "A", 10, 1)]  # same ts: id orders A first
        got = sorted(
            self._hist(spark, rows).collect(), key=lambda r: r.version
        )
        assert [r.v for r in got] == ["A", "B"]

    def test_keys_independent(self, spark):
        rows = [(1, "A", 10, 1), (2, "A", 10, 1)]
        got = self._hist(spark, rows).collect()
        assert len(got) == 2 and all(r.is_current for r in got)

    def test_requires_keys_and_values(self, spark):
        from etl_tools_rs_spark.operators.merge import scd2_history

        df = spark.createDataFrame([(1, "A", 10)], "k int, v string, ts int")
        import pytest

        with pytest.raises(ValueError):
            scd2_history(df, keys=[], value_cols=["v"], ts_col="ts")
