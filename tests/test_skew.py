

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
