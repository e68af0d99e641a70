

class TestKeySkewProfile:
    def test_hot_key_surfaces_with_ratio(self, spark):
        from etl_tools_rs_spark.operators.skew import key_skew_profile

        rows = [(1,)] * 90 + [(2,)] * 5 + [(3,)] * 5
        df = spark.createDataFrame(rows, "k int")
        got = key_skew_profile(df, ["k"], top_n=2).collect()
        assert [r.k for r in got] == [1, 2]
        top = got[0]
        # key 1: 90/100 share; avg per key = 100/3 -> ratio 2.7
        assert abs(top.share - 0.9) < 1e-9
        # floor-scaled: 90/(100/3) = 2.6999999... floors to 2.699999
        assert abs(top.skew_ratio - 2.7) < 2e-6

    def test_null_key_counts(self, spark):
        from etl_tools_rs_spark.operators.skew import key_skew_profile

        df = spark.createDataFrame(
            [(None,)] * 8 + [(1,)] * 2, "k string"
        )
        got = key_skew_profile(df, ["k"], top_n=1).collect()
        assert got[0].k is None and got[0].n == 8

    def test_no_global_sort(self, spark):
        from etl_tools_rs_spark.operators.skew import key_skew_profile

        df = spark.range(100).selectExpr("id % 7 k")
        plan = (
            key_skew_profile(df, ["k"], top_n=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestJoinSizeEstimate:
    def test_exact_against_real_join(self, spark):
        from etl_tools_rs_spark.operators.skew import join_size_estimate

        left = spark.createDataFrame(
            [(k,) for k in [1, 1, 1, 2, 2, 3, 5]], "k int"
        )
        right = spark.createDataFrame(
            [(k,) for k in [1, 1, 2, 3, 3, 3, 4]], "k int"
        )
        row = join_size_estimate(left, ["k"], right, ["k"], top_n=2).first()
        real = left.join(right, "k").count()
        assert row["est_rows"] == real == 3 * 2 + 2 * 1 + 1 * 3
        assert row["matched_keys"] == 3
        assert row["max_key_rows"] == 6
        # top-2 of {6, 3, 2} = 9/11
        assert row["top2_share"] == int(1e6 * 9 / 11) / 1e6

    def test_composite_keys_and_validation(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.skew import join_size_estimate

        left = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], "k int, s string")
        right = spark.createDataFrame([(1, "a"), (2, "b")], "x int, t string")
        row = join_size_estimate(left, ["k", "s"], right, ["x", "t"]).first()
        assert row["est_rows"] == 2 and row["matched_keys"] == 1
        with pytest.raises(ValueError):
            join_size_estimate(left, ["k"], right, ["x"], top_n=0)

    def test_never_shuffles_fact_rows(self, spark):
        """The estimate's join operates on per-key COUNT tables — the
        plan must aggregate each side before the join."""
        from etl_tools_rs_spark.operators.skew import join_size_estimate

        left = spark.range(10_000).selectExpr("id % 50 k")
        right = spark.range(10_000).selectExpr("id % 80 k")
        plan = (
            join_size_estimate(left, ["k"], right, ["k"])
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        # both join children are aggregates, not raw scans
        assert plan.index("Join") > 0
        import re

        joins = [m.start() for m in re.finditer(r"\bJoin\b", plan)]
        aggs = [m.start() for m in re.finditer(r"\bAggregate\b", plan)]
        assert sum(1 for a in aggs if a > joins[-1]) >= 2, plan
