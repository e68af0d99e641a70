"""Sequence packing: distributed prefix sum, stream packing, FFD bins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_tools_rs_spark.operators.packing import (
    pack_concat,
    pack_first_fit,
    scalable_cumsum,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(1, 2001).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(97)) + 1).alias("n_tok"),
    )


class TestScalableCumsum:
    def test_matches_global_window(self, spark, docs):
        got = {
            r["doc_id"]: r["cumsum"]
            for r in scalable_cumsum(docs, "doc_id", "n_tok").collect()
        }
        w = Window.orderBy("doc_id")
        want = {
            r["doc_id"]: r["c"]
            for r in docs.withColumn("c", F.sum("n_tok").over(w)).collect()
        }
        assert got == want

    def test_no_single_partition_exchange(self, spark, docs):
        from etl_tools_rs_spark.plans.inspect import plan_report

        rep = plan_report(scalable_cumsum(docs, "doc_id", "n_tok"))
        assert "SinglePartition" not in rep.text, "global-order window leaked in"

    def test_single_bucket_degenerate(self, spark):
        df = spark.range(1, 6).select(F.col("id").alias("k"), F.lit(10).alias("v"))
        got = sorted(
            (r["k"], r["cumsum"])
            for r in scalable_cumsum(df, "k", "v", num_buckets=1).collect()
        )
        assert got == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]


class TestPackConcat:
    def test_offsets_and_pack_ids(self, spark):
        rows = [(1, 30), (2, 50), (3, 40), (4, 10), (5, 100)]
        df = spark.createDataFrame(rows, "doc_id: long, n_tok: long")
        out = {
            r["doc_id"]: (r["start_off"], r["pack_first"], r["pack_last"], r["n_packs"])
            for r in pack_concat(df, "doc_id", "n_tok", budget=64).collect()
        }
        # stream offsets: 0, 30, 80, 120, 130 ; cuts at 64, 128, 192, 256
        assert out[1] == (0, 0, 0, 1)
        assert out[2] == (30, 0, 1, 2)   # straddles the 64 cut
        assert out[3] == (80, 1, 1, 1)
        assert out[4] == (120, 1, 2, 2)  # 120..129 straddles the 128 cut
        assert out[5] == (130, 2, 3, 2)  # 130..229 straddles 192
        with pytest.raises(ValueError):
            pack_concat(df, "doc_id", "n_tok", budget=0)

    def test_total_stream_conserved(self, spark, docs):
        out = pack_concat(docs, "doc_id", "n_tok", budget=512)
        total = docs.agg(F.sum("n_tok")).first()[0]
        last = out.orderBy(F.col("start_off").desc()).first()
        assert last["start_off"] + last["n_tok"] == total


class TestPackFirstFit:
    def test_invariants(self, spark, docs):
        budget = 128
        out = pack_first_fit(docs, "doc_id", "n_tok", budget, num_shards=8)
        rows = out.collect()
        assert len(rows) == 2000  # every doc exactly once
        assert len({r["doc_id"] for r in rows}) == 2000
        fill: dict[str, int] = {}
        for r in rows:
            fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["n_tok"]
        over = {b: t for b, t in fill.items() if t > budget}
        assert not over, f"overfull bins: {over}"
        # FFD should waste little: average fill of non-tail bins is high
        avg_fill = sum(fill.values()) / len(fill)
        assert avg_fill > 0.7 * budget

    def test_oversize_doc_gets_singleton_bin(self, spark):
        df = spark.createDataFrame(
            [(1, 500), (2, 20), (3, 20)], "doc_id: long, n_tok: long"
        )
        out = pack_first_fit(df, "doc_id", "n_tok", budget=64, num_shards=1)
        by_bin: dict[str, list[int]] = {}
        for r in out.collect():
            by_bin.setdefault(r["bin_id"], []).append(r["doc_id"])
        singleton = [b for b, ids in by_bin.items() if ids == [1]]
        assert singleton, "oversize doc must sit alone"

    def test_deterministic(self, spark, docs):
        a = {(r["doc_id"], r["bin_id"]) for r in pack_first_fit(docs, "doc_id", "n_tok", 128, num_shards=8).collect()}
        b = {(r["doc_id"], r["bin_id"]) for r in pack_first_fit(docs, "doc_id", "n_tok", 128, num_shards=8).collect()}
        assert a == b


class TestLengthBucketStats:
    def test_padding_math(self, spark):
        from etl_tools_rs_spark.operators.packing import length_bucket_stats

        # lengths: 1,1,2,3,10 → 2 buckets at group granularity:
        # endr: len1→2, len2→3, len3→4, len10→5 (tot 5)
        # bucket = floor((endr-1)*2/5): len1→0, len2→0, len3→1, len10→1
        df = spark.createDataFrame([(1,), (1,), (2,), (3,), (10,)], "n int")
        rows = {
            r["bucket"]: r
            for r in length_bucket_stats(df, "n", n_buckets=2).collect()
        }
        b0, b1 = rows[0], rows[1]
        assert (b0["n_docs"], b0["len_min"], b0["len_max"]) == (3, 1, 2)
        assert b0["tokens"] == 4 and b0["padded_tokens"] == 6
        assert b0["waste_share"] == int(1e6 * 2 / 6) / 1e6
        assert (b1["n_docs"], b1["len_max"], b1["tokens"]) == (2, 10, 13)
        assert b1["padded_tokens"] == 20

    def test_equal_lengths_share_bucket(self, spark):
        from etl_tools_rs_spark.operators.packing import length_bucket_stats

        df = spark.createDataFrame([(5,)] * 100, "n int")
        rows = length_bucket_stats(df, "n", n_buckets=8).collect()
        assert len(rows) == 1 and rows[0]["n_docs"] == 100
        assert rows[0]["waste_share"] == 0.0

    def test_more_buckets_less_waste(self, spark):
        from etl_tools_rs_spark.operators.packing import length_bucket_stats
        from pyspark.sql import functions as F

        df = spark.range(1000).select((F.col("id") % 97 + 1).alias("n"))

        def waste(k):
            rows = length_bucket_stats(df, "n", n_buckets=k).collect()
            return sum(r["padded_tokens"] - r["tokens"] for r in rows)

        assert waste(8) < waste(2) < waste(1)
