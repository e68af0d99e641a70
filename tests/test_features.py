"""Feature transforms (operators/features.py)."""

import math

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators import features as ft


class TestBucketize:
    def test_uniform_data_equal_buckets(self, spark):
        df = spark.range(1000).select((F.col("id").cast("double")).alias("x"))
        out = ft.bucketize_quantiles(df, "x", 4, 0.0, 1000.0, n_bins=1000)
        counts = {
            r["x_bucket"]: r["n"]
            for r in out.groupBy("x_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert set(counts) == {0, 1, 2, 3}
        assert all(200 <= v <= 300 for v in counts.values())  # ~250 each

    def test_null_passthrough_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (None,), (100.0,)], "x double"
        )
        key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
        out1 = ft.bucketize_quantiles(df, "x", 2, 0.0, 100.0).collect()
        out2 = ft.bucketize_quantiles(df.repartition(7), "x", 2, 0.0, 100.0).collect()
        assert sorted(map(tuple, out1), key=key) == sorted(map(tuple, out2), key=key)
        got = {r["x"]: r["x_bucket"] for r in out1}
        assert got[None] is None

    def test_rejects_single_bucket(self, spark):
        df = spark.range(5).select(F.col("id").cast("double").alias("x"))
        with pytest.raises(ValueError, match="n_buckets"):
            ft.bucketize_quantiles(df, "x", 1, 0.0, 5.0)


class TestStandardize:
    def test_hand_computed_grouped(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
            "g string, x double",
        )
        got = {}
        for r in ft.standardize(df, ["x"], by=["g"]).collect():
            got.setdefault(r["g"], []).append(r["x"])
        # group a: mean 2, sd 1 -> z = -1, 1
        assert sorted(got["a"]) == [-1.0, 1.0]
        # group b: zero variance -> NULL
        assert got["b"] == [None, None]

    def test_matches_python_global(self, spark):
        vals = [1.25, 2.5, 3.75, 10.0, 20.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = sorted(r["x"] for r in ft.standardize(df, ["x"]).collect())
        n = len(vals)
        mean = math.floor(1e6 * (sum(vals) / n)) / 1e6
        var = math.floor(1e6 * (sum(v * v for v in vals) / n - (sum(vals) / n) ** 2)) / 1e6
        sd = math.sqrt(var)
        expect = sorted(math.floor(1e6 * ((v - mean) / sd)) / 1e6 for v in vals)
        assert got == expect

    def test_other_columns_untouched(self, spark):
        df = spark.createDataFrame([(1, 4.0), (2, 8.0)], "id int, x double")
        out = ft.standardize(df, ["x"])
        assert out.columns == ["id", "x"]
        assert {r["id"] for r in out.collect()} == {1, 2}

    def test_rejects_empty_cols(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="at least one"):
            ft.standardize(df, [])


class TestMinmaxScale:
    def test_hand_computed_grouped(self, spark):
        from etl_tools_rs_spark.operators import features as ft2

        df = spark.createDataFrame(
            [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0), ("b", 7.0)],
            "g string, x double",
        )
        got = {}
        for r in ft2.minmax_scale(df, ["x"], by=["g"]).collect():
            got.setdefault(r["g"], []).append(r["x"])
        assert sorted(got["a"]) == [0.0, 0.5, 1.0]
        assert got["b"] == [None, None]  # constant column

    def test_global_and_range(self, spark):
        from etl_tools_rs_spark.operators import features as ft2

        df = spark.createDataFrame([(-5.0,), (0.0,), (5.0,)], "x double")
        vals = sorted(r["x"] for r in ft2.minmax_scale(df, ["x"]).collect())
        assert vals == [0.0, 0.5, 1.0]


class TestRobustScale:
    def test_hand_computed(self, spark):
        from etl_tools_rs_spark.operators.features import robust_scale

        # values 0..8: med=4, p25=2, p75=6, IQR=4
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(9)], "id int, x double"
        )
        got = {r.id: r.x for r in robust_scale(df, ["x"]).collect()}
        assert got[8] == 1.0 and got[0] == -1.0 and got[4] == 0.0

    def test_outlier_resistant(self, spark):
        from etl_tools_rs_spark.operators.features import robust_scale

        base = [(i, float(i)) for i in range(9)]
        df1 = spark.createDataFrame(base, "id int, x double")
        df2 = spark.createDataFrame(
            base[:-1] + [(8, 1e9)], "id int, x double"
        )
        g1 = {r.id: r.x for r in robust_scale(df1, ["x"]).collect()}
        g2 = {r.id: r.x for r in robust_scale(df2, ["x"]).collect()}
        # one corrupt value leaves the bulk's scaling unchanged
        assert g1[2] == g2[2] and g1[4] == g2[4]

    def test_zero_iqr_null(self, spark):
        from etl_tools_rs_spark.operators.features import robust_scale

        df = spark.createDataFrame(
            [(i, 5.0) for i in range(4)], "id int, x double"
        )
        assert all(r.x is None for r in robust_scale(df, ["x"]).collect())

    def test_by_group_independent(self, spark):
        from etl_tools_rs_spark.operators.features import robust_scale

        rows = [("a", float(i)) for i in range(9)] + [
            ("b", float(100 + 10 * i)) for i in range(9)
        ]
        df = spark.createDataFrame(rows, "g string, x double")
        got = robust_scale(df, ["x"], by=["g"]).collect()
        # both groups scale to the same normalized shape
        for g in ("a", "b"):
            vals = sorted(r.x for r in got if r.g == g)
            assert vals[0] == -1.0 and vals[-1] == 1.0


class TestWinsorize:
    def test_clamps_tails_keeps_bulk(self, spark):
        from etl_tools_rs_spark.operators.features import winsorize

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(101)], "id int, x double"
        )
        got = {r.id: r.x for r in winsorize(df, ["x"], 0.05, 0.95).collect()}
        assert got[0] == 5.0 and got[100] == 95.0  # clamped
        assert got[50] == 50.0  # untouched
        assert got[5] == 5.0 and got[95] == 95.0  # boundary exact

    def test_nulls_stay_null(self, spark):
        from etl_tools_rs_spark.operators.features import winsorize

        df = spark.createDataFrame(
            [(1, 1.0), (2, None), (3, 3.0)], "id int, x double"
        )
        got = {r.id: r.x for r in winsorize(df, ["x"], 0.0, 1.0).collect()}
        assert got[2] is None

    def test_validates_probs(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.features import winsorize

        df = spark.createDataFrame([(1, 1.0)], "id int, x double")
        with pytest.raises(ValueError):
            winsorize(df, ["x"], 0.9, 0.1)


class TestApproxPercentilePath:
    """exact=False swaps F.percentile (all-values state) for the GK
    sketch percentile_approx — the ungrouped-at-100TB shape."""

    def test_winsorize_approx_close_to_exact(self, spark):
        from etl_tools_rs_spark.operators.features import winsorize

        df = spark.range(10_000).selectExpr("cast(id as double) AS v")
        ex = winsorize(df, ["v"], 0.05, 0.95)
        ap = winsorize(df, ["v"], 0.05, 0.95, exact=False, accuracy=10_000)
        lo_e, hi_e = ex.agg(F.min("v"), F.max("v")).first()
        lo_a, hi_a = ap.agg(F.min("v"), F.max("v")).first()
        # rank error <= n/accuracy = 1 at this accuracy
        assert abs(lo_a - lo_e) <= 2 and abs(hi_a - hi_e) <= 2
        assert ap.count() == 10_000

    def test_robust_scale_approx_runs_and_centers(self, spark):
        from etl_tools_rs_spark.operators.features import robust_scale

        df = spark.range(10_001).selectExpr("cast(id as double) AS v")
        out = robust_scale(df, ["v"], exact=False).agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        ).first()
        # (x - median)/iqr on uniform 0..10000: min ~ -1, max ~ +1
        assert -1.1 < out.lo < -0.9 and 0.9 < out.hi < 1.1

    def test_plan_uses_sketch_aggregate(self, spark):
        from etl_tools_rs_spark.operators.features import winsorize

        df = spark.range(100).selectExpr("cast(id as double) AS v")
        plan = winsorize(df, ["v"], exact=False)._jdf.queryExecution().executedPlan().toString()
        assert "percentile_approx" in plan
        plan_exact = winsorize(df, ["v"])._jdf.queryExecution().executedPlan().toString()
        assert "percentile_approx" not in plan_exact

    def test_validates_accuracy(self, spark):
        from etl_tools_rs_spark.operators.features import winsorize
        import pytest as _pytest

        df = spark.range(10).selectExpr("cast(id as double) AS v")
        with _pytest.raises(ValueError):
            winsorize(df, ["v"], exact=False, accuracy=10)


class TestRankNormalize:
    def test_basic_and_ties(self, spark):
        from etl_tools_rs_spark.operators.features import rank_normalize

        df = spark.sql(
            "SELECT * FROM VALUES (1, 10.0), (2, 20.0), (3, 20.0), (5, 30.0) "
            "t(id, v)"
        )
        got = {r.id: r.v for r in rank_normalize(df, ["v"]).collect()}
        assert got == {1: 0.0, 2: 0.333333, 3: 0.333333, 5: 1.0}

    def test_nulls_excluded_from_denominator(self, spark):
        from etl_tools_rs_spark.operators.features import rank_normalize

        df = spark.sql(
            "SELECT * FROM VALUES (1, 10.0), (2, CAST(NULL AS DOUBLE)), "
            "(3, 30.0) t(id, v)"
        )
        got = {r.id: r.v for r in rank_normalize(df, ["v"]).collect()}
        # NULL neither ranks nor counts: 10 -> 0, 30 -> 1 over m=2
        assert got == {1: 0.0, 2: None, 3: 1.0}

    def test_grouped_and_single_value_group(self, spark):
        from etl_tools_rs_spark.operators.features import rank_normalize

        df = spark.sql(
            "SELECT * FROM VALUES ('a', 1.0), ('a', 2.0), ('b', 5.0) t(g, v)"
        )
        got = sorted(
            (r.g, r.v) for r in rank_normalize(df, ["v"], by=["g"]).collect()
        )
        assert got == [("a", 0.0), ("a", 1.0), ("b", 0.0)]

    def test_validates_cols(self, spark):
        from etl_tools_rs_spark.operators.features import rank_normalize
        import pytest as _pytest

        with _pytest.raises(ValueError):
            rank_normalize(spark.range(3), [])

    def test_ungrouped_multi_column(self, spark):
        from etl_tools_rs_spark.operators.features import rank_normalize

        df = spark.sql(
            "SELECT * FROM VALUES (1, 10.0, 5.0), (2, 20.0, 1.0), "
            "(3, 30.0, 3.0) t(id, a, b)"
        )
        got = {r.id: (r.a, r.b) for r in rank_normalize(df, ["a", "b"]).collect()}
        assert got == {1: (0.0, 1.0), 2: (0.5, 0.0), 3: (1.0, 0.5)}
