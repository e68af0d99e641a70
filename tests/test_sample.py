"""Deterministic sampling / splitting (operators/sample.py)."""

from __future__ import annotations

import pytest

from etl_tools_rs_spark.operators.sample import (
    hash_sample,
    hash_split,
    stratified_sample_exact,
)


def test_hash_sample_deterministic_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id int")
    a = {r.id for r in hash_sample(df, "id", 0.25).collect()}
    b = {r.id for r in hash_sample(df.repartition(7), "id", 0.25).collect()}
    assert a == b  # partitioning-independent
    assert 0.15 < len(a) / 2000 < 0.35
    # monotone: a smaller fraction is a subset of a larger one
    small = {r.id for r in hash_sample(df, "id", 0.10).collect()}
    assert small <= a


def test_hash_split_disjoint_exhaustive(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id int")
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    assert len(out) == 1000
    by = {}
    for r in out:
        by.setdefault(r.split, set()).add(r.id)
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 1000
    assert 0.7 < len(by["train"]) / 1000 < 0.9


def test_hash_split_membership_stable_under_growth(spark):
    small = spark.createDataFrame([(i,) for i in range(100)], "id int")
    big = spark.createDataFrame([(i,) for i in range(200)], "id int")
    w = {"train": 0.5, "test": 0.5}
    s = {(r.id, r.split) for r in hash_split(small, "id", w).collect()}
    b = {(r.id, r.split) for r in hash_split(big, "id", w).collect()}
    assert s <= b  # adding rows never reassigns existing rows


def test_hash_split_rejects_overweight(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        hash_split(df, "id", {"a": 0.7, "b": 0.7})


def test_stratified_exact_counts(spark):
    rows = [("a", i) for i in range(50)] + [("b", i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id int")
    out = stratified_sample_exact(df, ["g"], 5, "id").collect()
    per = {}
    for r in out:
        per[r.g] = per.get(r.g, 0) + 1
    assert per == {"a": 5, "b": 3}  # capped at stratum size
