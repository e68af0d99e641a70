"""Incremental aggregate-state maintenance (operators/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators import incremental as inc

MEASURES = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


@pytest.fixture(scope="module")
def rows(spark):
    data = [(i % 5, float(i * 7 % 13)) for i in range(200)]
    return spark.createDataFrame(data, "k int, v double")


def as_map(df):
    return {r["k"]: (r["n"], r["total"], r["lo"], r["hi"]) for r in df.collect()}


def test_merge_equals_full_recompute(spark, rows):
    a = rows.filter(F.col("v") < 6)
    b = rows.filter(F.col("v") >= 6)
    merged = inc.merge_agg_states(
        inc.agg_state(a, ["k"], MEASURES),
        inc.agg_state(b, ["k"], MEASURES),
        ["k"],
        MEASURES,
    )
    assert as_map(merged) == as_map(inc.agg_state(rows, ["k"], MEASURES))


def test_merge_order_irrelevant(spark, rows):
    parts = [rows.filter(F.col("v") % 3 == i) for i in range(3)]
    states = [inc.agg_state(p, ["k"], MEASURES) for p in parts]
    left = inc.merge_agg_states(
        inc.merge_agg_states(states[0], states[1], ["k"], MEASURES),
        states[2], ["k"], MEASURES,
    )
    right = inc.merge_agg_states(
        states[2],
        inc.merge_agg_states(states[1], states[0], ["k"], MEASURES),
        ["k"], MEASURES,
    )
    assert as_map(left) == as_map(right) == as_map(inc.agg_state(rows, ["k"], MEASURES))


def test_refresh_bootstrap_and_step(spark, rows):
    day1 = rows.filter(F.col("v") < 4)
    day2 = rows.filter(F.col("v") >= 4)
    state = inc.refresh(None, day1, ["k"], MEASURES)
    state = inc.refresh(state, day2, ["k"], MEASURES)
    assert as_map(state) == as_map(inc.agg_state(rows, ["k"], MEASURES))


def test_disjoint_keys_pass_through(spark):
    a = spark.createDataFrame([(1, 2.0)], "k int, v double")
    b = spark.createDataFrame([(9, 5.0)], "k int, v double")
    merged = inc.merge_agg_states(
        inc.agg_state(a, ["k"], MEASURES),
        inc.agg_state(b, ["k"], MEASURES),
        ["k"], MEASURES,
    )
    assert as_map(merged) == {1: (1, 2.0, 2.0, 2.0), 9: (1, 5.0, 5.0, 5.0)}


def test_rejects_bad_measures(spark, rows):
    with pytest.raises(ValueError, match="op must be"):
        inc.agg_state(rows, ["k"], {"x": ("avg", "v")})
    with pytest.raises(ValueError, match="at least one"):
        inc.agg_state(rows, ["k"], {})
