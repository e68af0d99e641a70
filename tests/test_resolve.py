"""Entity-resolution survivorship (operators/resolve.py): golden-record
rules, deterministic tie-breaks, and the two-source linkage pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.resolve import golden_records, resolve_entities


def test_golden_records_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "al", 10.0, "x"),
            (1, "alice", 30.0, "y"),
            (1, "bob", 20.0, "y"),
            (2, "zed", 5.0, "q"),
        ],
        "e int, name string, bal double, tag string",
    )
    out = golden_records(
        df,
        "e",
        {"name": "longest", "bal": "max", "tag": "most_frequent"},
    ).orderBy("e")
    rows = out.collect()
    assert [r["e"] for r in rows] == [1, 2]
    r1 = rows[0]
    assert r1["n_members"] == 3
    assert r1["name"] == "alice"  # longest
    assert r1["bal"] == 30.0
    assert r1["tag"] == "y"  # 2-of-3 modal
    assert rows[1]["n_members"] == 1 and rows[1]["tag"] == "q"


def test_golden_records_deterministic_ties(spark):
    # longest: equal lengths -> greater value; most_frequent: equal
    # counts -> greater value. Never "first seen".
    df = spark.createDataFrame(
        [(1, "aa", "p"), (1, "zz", "q")], "e int, name string, tag string"
    )
    out = golden_records(
        df, "e", {"name": "longest", "tag": "most_frequent"}
    ).collect()[0]
    assert out["name"] == "zz"
    assert out["tag"] == "q"


def test_golden_records_rejects_unknown_rule(spark):
    df = spark.createDataFrame([(1, "a")], "e int, name string")
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_records(df, "e", {"name": "median"})
    with pytest.raises(ValueError, match="not in DataFrame"):
        golden_records(df, "e", {"missing": "min"})


def test_resolve_entities_links_and_singletons(spark):
    left = spark.createDataFrame(
        [(1, "smith"), (2, "jones"), (3, "baker")], "id long, key string"
    )
    right = spark.createDataFrame(
        [(10, "smyth"), (11, "nomatch")], "id long, key string"
    )
    out = resolve_entities(left, right, "id", "key", max_distance=1)
    got = {r["id"]: r["entity_id"] for r in out.collect()}
    # smith(1) <-> smyth(10) merge under min id 1; everything else singleton
    assert got == {1: 1, 10: 1, 2: 2, 3: 3, 11: 11}


def test_resolve_entities_transitive_cluster(spark):
    # a-b via left-right links: both right rows within 1 edit of the
    # same left row -> one 3-member entity through connected components
    left = spark.createDataFrame([(5, "carol")], "id long, key string")
    right = spark.createDataFrame(
        [(20, "caroll"), (21, "carol")], "id long, key string"
    )
    out = resolve_entities(left, right, "id", "key")
    got = {r["id"]: r["entity_id"] for r in out.collect()}
    assert got == {5: 5, 20: 5, 21: 5}


def test_golden_records_one_aggregate_plan(spark):
    # every non-mode rule rides a single hash aggregate: no window, no
    # cartesian in the plan
    df = spark.createDataFrame([(1, "a", 1.0)], "e int, name string, bal double")
    plan = golden_records(
        df, "e", {"name": "min", "bal": "max"}
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Aggregate") == 1
