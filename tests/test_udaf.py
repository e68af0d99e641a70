"""Pandas-UDAF surface (operators/udaf.py) — the UDAF gap the reference
leaves open (SURVEY §2.7: no UDAF surface anywhere in etl-core/etl-job)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.udaf import trimmed_mean, weighted_mean


def test_weighted_mean_matches_manual(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "k string, v double, w double",
    )
    rows = {
        r.k: r.wm
        for r in df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert math.isclose(rows["a"], (10 * 1 + 20 * 3) / 4.0)
    assert math.isclose(rows["b"], 5.0)


def test_weighted_mean_zero_weight_is_null(spark):
    df = spark.createDataFrame([("a", 10.0, 0.0)], "k string, v double, w double")
    [r] = df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    assert r.wm is None


def test_trimmed_mean_drops_tails(spark):
    # 10 values 1..10 with 10% trim drops 1 and 10 -> mean(2..9) = 5.5
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 11)], "k string, v double"
    )
    [r] = df.groupBy("k").agg(trimmed_mean("v", 0.1).alias("tm")).collect()
    assert math.isclose(r.tm, 5.5)


def test_udafs_compose_with_each_other_not_builtins(spark):
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 1.0)], "k string, v double, w double"
    )
    # two pandas UDAFs in one agg: fine (single Arrow exchange)
    [r] = (
        df.groupBy("k")
        .agg(
            weighted_mean("v", "w").alias("wm"),
            trimmed_mean("v", 0.0).alias("tm"),
        )
        .collect()
    )
    assert math.isclose(r.wm, 2.0) and math.isclose(r.tm, 2.0)
    # mixing with JVM aggregates is rejected by Spark — callers must
    # compute built-ins in a separate agg and join on the keys
    with pytest.raises(AnalysisException):
        df.groupBy("k").agg(
            weighted_mean("v", "w").alias("wm"), F.count(F.lit(1)).alias("n")
        ).collect()


class TestExactUdafs:
    """weighted_mean_exact / trimmed_mean_exact — the order-independent
    integer-quantized forms that back the value-checked registry entry."""

    def test_weighted_mean_exact_matches_manual(self, spark):
        from etl_tools_rs_spark.operators.udaf import weighted_mean_exact

        # cents inputs: values 1.25, 3.75 with weights 1, 3
        df = spark.createDataFrame(
            [("a", 125, 1), ("a", 375, 3)], "k string, vc long, w long"
        )
        [r] = df.groupBy("k").agg(
            weighted_mean_exact("vc", "w").alias("wm")
        ).collect()
        # (125*1 + 375*3) / 4 = 312.5 cents = 3.125
        assert r["wm"] == 3.125

    def test_weighted_mean_exact_partition_invariant(self, spark):
        from etl_tools_rs_spark.operators.udaf import weighted_mean_exact

        import random

        rng = random.Random(3)
        rows = [("g", rng.randrange(1, 10**7), rng.randrange(1, 50))
                for _ in range(5000)]
        df = spark.createDataFrame(rows, "k string, vc long, w long")

        def run(d):
            [r] = d.groupBy("k").agg(
                weighted_mean_exact("vc", "w").alias("wm")
            ).collect()
            return r["wm"]

        a = run(df.repartition(1))
        b = run(df.repartition(32, "vc"))
        c = run(df.orderBy(F.col("vc").desc()))
        assert a == b == c  # bit-identical, not approx

    def test_trimmed_mean_exact_drops_tails(self, spark):
        from etl_tools_rs_spark.operators.udaf import trimmed_mean_exact

        # 10 values; 10% trim drops min and max
        vals = [100, 200, 300, 400, 500, 600, 700, 800, 900, 10**6]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "k string, vc long"
        )
        [r] = df.groupBy("k").agg(
            trimmed_mean_exact("vc", 0.1).alias("tm")
        ).collect()
        # kept = 200..900, mean = 550 cents = 5.5
        assert r["tm"] == 5.5

    def test_trimmed_mean_exact_tie_at_cut_is_stable(self, spark):
        from etl_tools_rs_spark.operators.udaf import trimmed_mean_exact

        # ties straddle the cut position: result must not depend on
        # which tied instance is dropped
        vals = [100] * 5 + [300] * 5
        df = spark.createDataFrame(
            [("g", v) for v in vals], "k string, vc long"
        )
        [r] = df.groupBy("k").agg(
            trimmed_mean_exact("vc", 0.1).alias("tm")
        ).collect()
        # k=1: kept = 4x100 + 4x300 = 1600/8 = 200 cents
        assert r["tm"] == 2.0

    def test_exact_tracks_float_form(self, spark):
        from etl_tools_rs_spark.operators.udaf import (
            weighted_mean,
            weighted_mean_exact,
        )

        rows = [("g", 1234, 2), ("g", 567, 5), ("g", 89, 1)]
        df = spark.createDataFrame(rows, "k string, vc long, w long")
        [e] = df.groupBy("k").agg(
            weighted_mean_exact("vc", "w").alias("m")
        ).collect()
        [f] = df.select(
            "k", (F.col("vc") / 100.0).alias("v"), "w"
        ).groupBy("k").agg(weighted_mean("v", "w").alias("m")).collect()
        assert abs(e["m"] - f["m"]) < 1e-6
