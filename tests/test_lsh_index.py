"""Incremental LSH index: equivalence with the batch run, delta laws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.dedup import dedup_minhash_lsh
from etl_tools_rs_spark.operators.lsh_index import (
    incremental_near_dup,
    minhash_band_index,
)

KW = dict(num_hashes=16, bands=4, shingle_n=3, hash_family="md5")

OLD = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "entirely different words about spark query planning engines"),
    (4, "short doc"),
]
NEW = [
    (11, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
    (12, "entirely different words about spark query planning engines"),  # dup of 3
    (13, "the quick brown fox jumps over the lazy dog tonight"),  # near 1/11
    (14, "brand new unseen content with no relatives anywhere at all"),
]


def _norm(rows):
    return sorted(
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]), r["jaccard"])
        for r in rows
    )


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame(OLD, ["doc_id", "text"])
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    return old, new


class TestIncrementalNearDup:
    def test_matches_batch_rebuild(self, frames):
        """Incremental pairs == batch pairs over old∪new restricted to
        pairs touching a new doc; updated index == rebuilt index."""
        old, new = frames
        idx = minhash_band_index(old, **KW)
        pairs, updated = incremental_near_dup(
            idx, old, new, threshold=0.5, **KW
        )
        batch = dedup_minhash_lsh(old.unionAll(new), threshold=0.5, **KW)
        new_ids = {d for d, _ in NEW}
        want = _norm(
            r
            for r in batch.collect()
            if r["id_a"] in new_ids or r["id_b"] in new_ids
        )
        assert _norm(pairs.collect()) == want
        rebuilt = minhash_band_index(old.unionAll(new), **KW)
        assert sorted(map(tuple, updated.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_finds_exact_and_near_dups(self, frames):
        old, new = frames
        idx = minhash_band_index(old, **KW)
        pairs, _ = incremental_near_dup(idx, old, new, threshold=0.5, **KW)
        got = {(min(a, b), max(a, b)) for a, b, _ in _norm(pairs.collect())}
        assert (1, 11) in got  # new exact dup of old
        assert (3, 12) in got  # second exact dup
        assert not any(a not in {1, 2, 3, 4} and a < 11 for a, _ in got)

    def test_exact_dup_scores_one(self, frames):
        old, new = frames
        idx = minhash_band_index(old, **KW)
        pairs, _ = incremental_near_dup(idx, old, new, threshold=0.5, **KW)
        j = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])): r["jaccard"]
            for r in pairs.collect()
        }
        assert j[(1, 11)] == 1.0 and j[(3, 12)] == 1.0

    def test_chained_deltas_equal_batch(self, spark, frames):
        """Two successive deltas through the updated index == one batch
        run — the induction step of the incremental law."""
        old, new = frames
        second = spark.createDataFrame(
            [(21, "the quick brown fox jumps over the lazy cat today")],
            ["doc_id", "text"],
        )
        idx = minhash_band_index(old, **KW)
        p1, idx1 = incremental_near_dup(idx, old, new, threshold=0.5, **KW)
        p2, _ = incremental_near_dup(
            idx1, old.unionAll(new), second, threshold=0.5, **KW
        )
        batch = dedup_minhash_lsh(
            old.unionAll(new).unionAll(second), threshold=0.5, **KW
        )
        old_ids = {d for d, _ in OLD}
        batch_touching_delta = _norm(
            r
            for r in batch.collect()
            if not (r["id_a"] in old_ids and r["id_b"] in old_ids)
        )
        assert (
            sorted(_norm(p1.collect()) + _norm(p2.collect()))
            == batch_touching_delta
        )

    def test_no_old_reshingle_in_plan(self, frames):
        """The verify must semi-filter the corpus store by candidate id
        BEFORE shingling — the old corpus text never shingles wholesale."""
        old, new = frames
        idx = minhash_band_index(old, **KW)
        pairs, _ = incremental_near_dup(idx, old, new, threshold=0.5, **KW)
        plan = pairs._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" in plan

    def test_rejects_bad_index_schema(self, frames):
        old, new = frames
        with pytest.raises(ValueError, match="index must have"):
            incremental_near_dup(old, old, new, **KW)


class TestIndexEviction:
    """r7: remove_from_index / expire_index — the O(delta) eviction half
    of the lifecycle. Core law: evicting R from build(C) yields
    build(C − R) ROW FOR ROW, under any interleaving with add deltas."""

    def test_eviction_equals_rebuild(self, frames):
        from etl_tools_rs_spark.operators.lsh_index import remove_from_index

        old, _ = frames
        idx = minhash_band_index(old, **KW)
        removed = old.filter(F.col("doc_id").isin(1, 3)).select("doc_id")
        evicted = remove_from_index(idx, removed)
        rebuilt = minhash_band_index(
            old.filter(~F.col("doc_id").isin(1, 3)), **KW
        )
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731
        assert sorted(map(key, evicted.collect())) == sorted(
            map(key, rebuilt.collect())
        )

    def test_eviction_is_idempotent_and_ignores_unknown_ids(self, spark, frames):
        from etl_tools_rs_spark.operators.lsh_index import remove_from_index

        old, _ = frames
        idx = minhash_band_index(old, **KW)
        removed = spark.createDataFrame([(2,), (999,)], ["doc_id"])
        once = remove_from_index(idx, removed)
        twice = remove_from_index(once, removed)
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731
        assert sorted(map(key, once.collect())) == sorted(
            map(key, twice.collect())
        )
        # doc 4 ("short doc", < shingle_n tokens) never had band rows
        assert {r["doc_id"] for r in once.collect()} == {1, 3}

    def test_two_delta_add_remove_induction(self, spark, frames):
        """add delta1 → evict R → add delta2 == from-scratch index of the
        surviving corpus, and scoring after the eviction never surfaces
        an evicted id."""
        from etl_tools_rs_spark.operators.lsh_index import remove_from_index

        old, new = frames
        d1 = new.filter(F.col("doc_id").isin(11, 12))
        d2 = new.filter(~F.col("doc_id").isin(11, 12))
        idx = minhash_band_index(old, **KW)
        _, idx1 = incremental_near_dup(idx, old, d1, threshold=0.5, **KW)
        removed = spark.createDataFrame([(1,), (11,)], ["doc_id"])
        idx1e = remove_from_index(idx1, removed)
        corpus1 = old.unionAll(d1).join(removed, "doc_id", "left_anti")
        pairs2, idx2 = incremental_near_dup(
            idx1e, corpus1, d2, threshold=0.5, **KW
        )
        surviving = old.unionAll(new).join(removed, "doc_id", "left_anti")
        rebuilt = minhash_band_index(surviving, **KW)
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731
        assert sorted(map(key, idx2.collect())) == sorted(
            map(key, rebuilt.collect())
        )
        hit_ids = {
            i for r in pairs2.collect() for i in (r["id_a"], r["id_b"])
        }
        assert hit_ids.isdisjoint({1, 11})
        # doc 13 (near-dup of the EVICTED 1/11) must still pair with
        # nothing old — its only relatives were erased
        assert all(
            r["id_b"] not in (1, 11) for r in pairs2.collect()
        )

    def test_autosized_removal_join_both_arms(self, spark, frames):
        """r9 (VERDICT r8 #4): the default auto-sizes the anti-join —
        broadcast when the removal set fits ``broadcast_max_ids``,
        shuffled anti above it — and BOTH arms produce the identical
        evicted index. Plan pin: the small arm shows a broadcast
        exchange; the big arm must NOT (a 100 TB retention sweep that
        expires half the corpus cannot be driver-collected)."""
        from etl_tools_rs_spark.operators.lsh_index import remove_from_index

        old, _ = frames
        idx = minhash_band_index(old, **KW)
        removed = old.filter(F.col("doc_id").isin(1, 3)).select("doc_id")
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731

        small = remove_from_index(idx, removed)  # auto: 2 <= default cap
        big = remove_from_index(idx, removed, broadcast_max_ids=1)  # auto: over
        assert sorted(map(key, small.collect())) == sorted(
            map(key, big.collect())
        )
        small_plan = small._jdf.queryExecution().executedPlan().toString()
        big_plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in small_plan
        assert "BroadcastExchange" not in big_plan
        # the shuffle arm still builds on the (smaller) removal side
        assert "ShuffledHashJoin" in big_plan

    def test_explicit_broadcast_flag_skips_the_count_job(self, spark, frames):
        """broadcast_removals=True/False must not run the sizing count:
        the arm is chosen eagerly and the plan stays action-free."""
        from unittest.mock import patch

        from etl_tools_rs_spark.operators.lsh_index import remove_from_index

        old, _ = frames
        idx = minhash_band_index(old, **KW)
        removed = old.filter(F.col("doc_id").isin(1,)).select("doc_id")
        with patch(
            "pyspark.sql.DataFrame.count",
            side_effect=AssertionError("sizing count ran under explicit flag"),
        ):
            forced_b = remove_from_index(idx, removed, broadcast_removals=True)
            forced_s = remove_from_index(idx, removed, broadcast_removals=False)
        assert "BroadcastExchange" in (
            forced_b._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastExchange" not in (
            forced_s._jdf.queryExecution().executedPlan().toString()
        )

    def test_expire_index_by_timestamp(self, spark):
        import datetime as dt

        from etl_tools_rs_spark.operators.lsh_index import expire_index

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, f"document number {i} with some shared words here", 
             t0 + dt.timedelta(days=i))
            for i in range(6)
        ]
        corpus = spark.createDataFrame(rows, ["doc_id", "text", "ts"])
        idx = minhash_band_index(corpus, **KW)
        cutoff = t0 + dt.timedelta(days=3)
        updated, expired = expire_index(idx, corpus, cutoff)
        assert {r["doc_id"] for r in expired.collect()} == {0, 1, 2}
        rebuilt = minhash_band_index(
            corpus.filter(F.col("ts") >= cutoff), **KW
        )
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731
        assert sorted(map(key, updated.collect())) == sorted(
            map(key, rebuilt.collect())
        )

    def test_expiry_then_add_composes_to_rebuild(self, spark):
        """r8 (VERDICT r7 #7): the crawl-freshness lifecycle — expire a
        retention window, then ingest today's delta — must leave the
        index identical to a from-scratch build of (surviving ∪ delta),
        and post-expiry scoring must never surface an expired id."""
        import datetime as dt

        from etl_tools_rs_spark.operators.lsh_index import expire_index

        t0 = dt.datetime(2024, 1, 1)
        corpus = spark.createDataFrame(
            [
                (i, f"shared crawl words plus marker {i % 3} end",
                 t0 + dt.timedelta(days=i))
                for i in range(8)
            ],
            ["doc_id", "text", "ts"],
        )
        delta = spark.createDataFrame(
            [
                (21, "shared crawl words plus marker 1 end"),  # dup family
                (22, "totally unrelated delta content nothing shared"),
            ],
            ["doc_id", "text"],
        )
        cutoff = t0 + dt.timedelta(days=4)  # days 0-3 expire
        idx = minhash_band_index(corpus, **KW)
        expired_idx, expired = expire_index(idx, corpus, cutoff)
        assert {r["doc_id"] for r in expired.collect()} == {0, 1, 2, 3}
        surviving = corpus.filter(F.col("ts") >= cutoff).select(
            "doc_id", "text"
        )
        pairs, idx_after = incremental_near_dup(
            expired_idx, surviving, delta, threshold=0.5, **KW
        )
        rebuilt = minhash_band_index(
            surviving.unionAll(delta), **KW
        )
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731
        assert sorted(map(key, idx_after.collect())) == sorted(
            map(key, rebuilt.collect())
        )
        hits = pairs.collect()
        assert {i for r in hits for i in (r["id_a"], r["id_b"])}.isdisjoint(
            {0, 1, 2, 3}
        )
        # delta doc 21's dup family members 4 and 7 (marker 1) survived —
        # at least one must surface as an old-side match
        assert any(r["id_b"] in (4, 7) for r in hits)

    def test_composes_with_rtbf_cascade(self, spark, frames):
        """privacy.propagate_deletes → remove_from_index: the cascade's
        per-table deleted-key frame feeds eviction directly, so an RTBF
        request erases both the store rows AND the index's memory of
        them in one O(delta) pass."""
        from etl_tools_rs_spark.operators.lsh_index import remove_from_index
        from etl_tools_rs_spark.operators.privacy import propagate_deletes

        old, _ = frames
        users = spark.createDataFrame([(100,), (200,)], ["user_id"])
        docs = old.withColumn(
            "owner", F.when(F.col("doc_id") <= 2, 100).otherwise(200)
        )
        seed = spark.createDataFrame([(100,)], ["user_id"])
        cascade = propagate_deletes(
            {"users": users, "docs": docs},
            {"users": "user_id", "docs": "doc_id"},
            "users",
            seed,
            [("docs", "owner", "users")],
        )
        doomed = cascade.deleted_keys["docs"]
        assert {r[0] for r in doomed.collect()} == {1, 2}
        idx = minhash_band_index(old, **KW)
        evicted = remove_from_index(idx, doomed)
        rebuilt = minhash_band_index(old.filter(F.col("doc_id") > 2), **KW)
        key = lambda r: (r["doc_id"], r["band"], r["bucket"])  # noqa: E731
        assert sorted(map(key, evicted.collect())) == sorted(
            map(key, rebuilt.collect())
        )
