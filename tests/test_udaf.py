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
