"""Small-file compaction, sort-clustering, and the HLL sketch surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.maintenance import cluster_by, compact_files
from etl_tools_rs_spark.operators.sketch import hll_estimate, hll_sketch, merge_hll


class TestCompaction:
    def test_compacts_many_small_files(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(
            40
        ).write.parquet(path)

        stats = compact_files(spark, path, target_file_bytes=1 << 30)
        assert stats.files_before == 40
        assert stats.files_after == 1

        out = spark.read.parquet(path)
        assert out.count() == 10_000
        assert out.agg(F.sum("v")).first()[0] == 10_000 * 9_999  # 2*sum(id)

    def test_respects_target_size(self, spark, tmp_path):
        path = str(tmp_path / "t2")
        spark.range(20_000).withColumn(
            "pad", F.sha2(F.col("id").cast("string"), 256)
        ).repartition(30).write.parquet(path)
        before = compact_files(spark, path, target_file_bytes=1 << 40)
        # re-split the single file by a small target: ceil(total/target) files
        small_target = max(1, before.bytes_total // 3)
        stats = compact_files(spark, path, target_file_bytes=small_target)
        assert stats.files_before == 1
        assert 2 <= stats.files_after <= 5
        assert spark.read.parquet(path).count() == 20_000

    def test_failed_write_leaves_original_readable(self, spark, tmp_path):
        path = str(tmp_path / "t3")
        spark.range(100).write.parquet(path)
        with pytest.raises(Exception):
            compact_files(spark, path, target_file_bytes=0)  # ceil div by 0
        assert spark.read.parquet(path).count() == 100


class TestClusterBy:
    def test_files_are_range_disjoint(self, spark, tmp_path):
        path = str(tmp_path / "c")
        df = spark.range(10_000).select(
            (F.col("id") * 7919 % 1000).alias("k"), F.col("id").alias("v")
        )
        cluster_by(df, ["k"], num_partitions=4).write.parquet(path)
        # per-file min/max of k must not overlap → a filter on k prunes files
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
            .collect()
        )
        assert len(per_file) == 4
        ranges = sorted((r["lo"], r["hi"]) for r in per_file)
        for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
            assert hi_prev <= lo_next

    def test_row_preservation(self, spark):
        df = spark.range(1000).select((F.col("id") % 13).alias("k"), "id")
        out = cluster_by(df, ["k"], num_partitions=3)
        assert out.count() == 1000
        assert out.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


class TestHll:
    def test_estimate_close_to_exact(self, spark):
        df = spark.range(50_000).select(
            (F.col("id") % 5).alias("g"), (F.col("id") % 7000).alias("u")
        )
        est = {
            r["g"]: r["est_distinct"]
            for r in hll_estimate(hll_sketch(df, "u", by=["g"])).collect()
        }
        exact = {
            r["g"]: r["n"]
            for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
        }
        for g, n in exact.items():
            assert abs(est[g] - n) / n < 0.05  # lg_k=12 → ~1.6% rse

    def test_shard_merge_matches_whole(self, spark):
        df = spark.range(30_000).select(
            (F.col("id") % 3).alias("g"), (F.col("id") % 4000).alias("u")
        )
        a = hll_sketch(df.filter(F.col("id") < 15_000), "u", by=["g"])
        b = hll_sketch(df.filter(F.col("id") >= 15_000), "u", by=["g"])
        merged = {
            r["g"]: r["est_distinct"]
            for r in hll_estimate(merge_hll(a, b, by=["g"])).collect()
        }
        whole = {
            r["g"]: r["est_distinct"]
            for r in hll_estimate(hll_sketch(df, "u", by=["g"])).collect()
        }
        for g in whole:
            # same sketch family and lg_k: union of shards ≈ whole-set sketch
            assert abs(merged[g] - whole[g]) <= max(1, 0.02 * whole[g])

    def test_map_side_partial_agg(self, spark):
        from etl_tools_rs_spark.plans.inspect import plan_report

        df = spark.range(10_000).select((F.col("id") % 10).alias("g"), "id")
        rep = plan_report(hll_sketch(df, "id", by=["g"]))
        # partial sketch agg below the exchange: only sketches shuffle
        assert rep.num_exchanges == 1
        assert rep.text.count("hll_sketch_agg") >= 2  # partial + final


class TestZorder:
    def test_both_dims_prune(self, spark, tmp_path):
        from etl_tools_rs_spark.operators.maintenance import zorder_by

        path = str(tmp_path / "z")
        n = 40_000
        df = spark.range(n).select(
            (F.col("id") % 200).alias("x"),
            ((F.col("id") * 7919) % 200).alias("y"),
        )
        zorder_by(df, ["x", "y"], num_partitions=16, bits_per_col=8).write.parquet(
            path
        )
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("x").alias("xlo"), F.max("x").alias("xhi"),
                F.min("y").alias("ylo"), F.max("y").alias("yhi"),
            )
            .collect()
        )
        assert len(per_file) == 16
        # a point filter on EITHER column must prune most files: count files
        # whose [min,max] straddles the midpoint of each dimension
        x_hit = sum(1 for r in per_file if r["xlo"] <= 100 <= r["xhi"])
        y_hit = sum(1 for r in per_file if r["ylo"] <= 100 <= r["yhi"])
        assert x_hit <= 8, f"x=100 touches {x_hit}/16 files"
        assert y_hit <= 8, f"y=100 touches {y_hit}/16 files"
        # and nothing was lost
        assert spark.read.parquet(path).count() == n

    def test_zorder_key_bucket_rectangles(self, spark):
        """zorder_key's top-bit buckets confine each bucket to a small
        hyper-rectangle: mean normalized (x-extent * y-extent) over 64
        buckets is far below the full domain's area of 1.0."""
        from etl_tools_rs_spark.operators.maintenance import zorder_key

        n = 40_000
        df = spark.range(n).select(
            (F.col("id") % 997).alias("x"),
            ((F.col("id") * 7919) % 997).alias("y"),
        )
        z = zorder_key(df, ["x", "y"], bits_per_col=8)
        rows = (
            df.groupBy(
                F.call_function("shiftright", z, F.lit(10)).alias("b")
            )
            .agg(
                F.min("x").alias("xlo"), F.max("x").alias("xhi"),
                F.min("y").alias("ylo"), F.max("y").alias("yhi"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        assert sum(r["n"] for r in rows) == n
        areas = [
            ((r["xhi"] - r["xlo"]) / 996.0) * ((r["yhi"] - r["ylo"]) / 996.0)
            for r in rows
        ]
        assert sum(areas) / len(areas) < 0.1, sum(areas) / len(areas)

    def test_rejects_too_many_bits(self, spark):
        from etl_tools_rs_spark.operators.maintenance import zorder_by

        df = spark.range(10).select(F.col("id").alias("a"), F.col("id").alias("b"))
        with pytest.raises(ValueError):
            zorder_by(df, ["a", "b"], bits_per_col=32)

    def test_constant_and_timestamp_cols(self, spark):
        from etl_tools_rs_spark.operators.maintenance import zorder_by

        df = spark.range(1000).select(
            F.lit(5).alias("c"),
            (F.lit("2024-01-01").cast("timestamp") + F.make_interval(secs=F.col("id"))).alias("ts"),
            F.col("id"),
        )
        out = zorder_by(df, ["c", "ts"], num_partitions=4)
        assert out.count() == 1000
        assert out.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark):
        from etl_tools_rs_spark.operators.maintenance import write_bucketed
        from etl_tools_rs_spark.plans.inspect import plan_report

        a = spark.range(5_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(5_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        try:
            write_bucketed(a, "t_bkt_a", ["k"], 8, sort_cols=["k"])
            write_bucketed(b, "t_bkt_b", ["k"], 8, sort_cols=["k"])
            ta, tb = spark.table("t_bkt_a"), spark.table("t_bkt_b")
            joined = ta.join(tb, "k")
            rep = plan_report(joined)
            assert rep.num_exchanges == 0, rep.text  # bucket-to-bucket join
            assert joined.count() == 5_000
            # groupBy on the bucket key is shuffle-free too
            rep2 = plan_report(ta.groupBy("k").agg(F.sum("va").alias("s")))
            assert rep2.num_exchanges == 0, rep2.text
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bkt_a")
            spark.sql("DROP TABLE IF EXISTS t_bkt_b")


class TestPartitionedWrite:
    def test_partition_pruning_pinned(self, spark, tmp_path):
        from etl_tools_rs_spark.operators.maintenance import write_partitioned
        from etl_tools_rs_spark.plans.inspect import plan_report

        path = str(tmp_path / "p")
        df = spark.range(10_000).select(
            (F.col("id") % 7).alias("day"), F.col("id").alias("v")
        )
        write_partitioned(df, path, ["day"])
        back = spark.read.parquet(path)
        pruned = back.filter(F.col("day") == 3).select(F.sum("v").alias("s"))
        rep = plan_report(pruned)
        assert "PartitionFilters" in rep.text
        # dynamic check, not just plan text: only 1 of 7 directories is read
        n_files_total = len({r[0] for r in back.select(F.input_file_name()).distinct().collect()})
        n_files_read = len({r[0] for r in back.filter(F.col("day") == 3).select(F.input_file_name()).distinct().collect()})
        assert n_files_read < n_files_total
        assert pruned.first()["s"] == sum(v for v in range(10_000) if v % 7 == 3)

    def test_one_file_per_partition(self, spark, tmp_path):
        from etl_tools_rs_spark.operators.maintenance import write_partitioned

        path = str(tmp_path / "p2")
        df = spark.range(5_000).select((F.col("id") % 5).alias("day"), F.col("id").alias("v"))
        write_partitioned(df, path, ["day"])
        files = {}
        out = spark.read.parquet(path)
        for r in out.select("day", F.input_file_name().alias("f")).distinct().collect():
            files.setdefault(r["day"], set()).add(r["f"])
        assert all(len(fs) == 1 for fs in files.values()), {k: len(v) for k, v in files.items()}
