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
