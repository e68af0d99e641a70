"""Declarative validation suite (operators/validate.py)."""

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators import validate as v


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "alice", 30, "a@x.com"),
        (2, "bob", -5, "bob@x.com"),
        (3, None, 41, "not-an-email"),
        (3, "carol", 200, None),
        (4, "dave", 25, "d@x.com"),
    ]
    return spark.createDataFrame(rows, "id int, name string, age int, email string")


@pytest.fixture(scope="module")
def ref_ids(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "rid int")


def counts(df):
    return {r["rule"]: r["violations"] for r in df.collect()}


def test_row_local_rules_one_row_per_rule(spark, people):
    out = v.validate(
        people,
        [
            v.not_null("name"),
            v.in_range("age", 0, 120),
            v.matches("email", r"^[^@]+@[^@]+$"),
            v.in_set("id", [1, 2, 3], name="id_domain"),
            v.check(F.col("age") > F.lit(0), name="age_positive"),
        ],
    )
    got = counts(out)
    assert got == {
        "not_null_name": 1,
        "in_range_age": 2,  # -5 and 200
        "matches_email": 1,  # NULL email passes, bad format fails
        "id_domain": 1,  # id=4
        "age_positive": 1,  # -5; NULL would also fail closed
    }


def test_unique_counts_excess_rows(spark, people):
    got = counts(v.validate(people, [v.unique("id")]))
    assert got == {"unique_id": 1}  # id=3 twice -> one extra row


def test_foreign_key_orphans(spark, people, ref_ids):
    got = counts(
        v.validate(people, [v.foreign_key("id", ref_ids, "rid", name="fk_id")])
    )
    assert got == {"fk_id": 1}  # id=4 has no match; NULLs would pass


def test_check_fails_closed_on_null(spark):
    df = spark.createDataFrame([(None,), (1,), (2,)], "x int")
    got = counts(v.validate(df, [v.check(F.col("x") > 1, name="gt1")]))
    assert got == {"gt1": 2}  # NULL and 1


def test_row_local_rules_single_scan_plan(spark, people):
    """All row-local rules must fold into one aggregate: the physical plan
    scans the input exactly once (rule count must never multiply scans)."""
    out = v.validate(
        people,
        [v.not_null("name"), v.in_range("age", 0, 120), v.in_set("id", [1, 2])],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_assert_valid_budget(spark, people):
    v.assert_valid(people, [v.not_null("id")])  # 0 violations: passes
    with pytest.raises(ValueError, match="not_null_name=1"):
        v.assert_valid(people, [v.not_null("name")])
    v.assert_valid(people, [v.not_null("name")], max_violations=1)


def test_duplicate_rule_names_rejected(spark, people):
    with pytest.raises(ValueError, match="duplicate"):
        v.validate(people, [v.not_null("id"), v.not_null("id")])


def test_empty_rules_rejected(spark, people):
    with pytest.raises(ValueError, match="at least one"):
        v.validate(people, [])


def test_empty_input_zero_violations(spark):
    df = spark.createDataFrame([], "x int")
    got = counts(
        v.validate(df, [v.not_null("x"), v.unique("x"), v.in_range("x", 0, 1)])
    )
    assert got == {"not_null_x": 0, "unique_x": 0, "in_range_x": 0}


def test_rule_names_with_quotes_and_backticks(spark):
    """Rule names are typed literals, never SQL — hostile names work."""
    df = spark.createDataFrame([(1,), (None,)], "x int")
    out = v.validate(
        df,
        [
            v.not_null("x", name="it's a `weird` name -- DROP"),
            v.check(F.col("x") > 0, 'x > 0 "quoted"'),
        ],
    ).collect()
    got = {r.rule: r.violations for r in out}
    assert got == {"it's a `weird` name -- DROP": 1, 'x > 0 "quoted"': 1}


def test_unique_ignores_null_keys(spark):
    """SQL UNIQUE semantics: NULL keys never conflict (k NULL rows -> 0
    violations); real duplicates still counted."""
    df = spark.createDataFrame(
        [(None,), (None,), (None,), (1,), (1,), (2,)], "k int"
    )
    out = v.validate(df, [v.unique("k", name="u")]).collect()
    assert out[0].violations == 1  # only the duplicated k=1 counts
