"""Single-pass column profiler: exact stats, approx path, one-scan plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.profile import profile, profile_approx


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (1, 10.0, "a"),
        (2, None, "b"),
        (3, 30.0, None),
        (4, 30.0, "a"),
        (None, 5.0, "c"),
    ]
    return spark.createDataFrame(rows, "k: int, x: double, s: string")


class TestProfile:
    def test_exact_stats(self, spark, mixed):
        out = {r["column"]: r.asDict() for r in profile(mixed).collect()}
        assert set(out) == {"k", "x", "s"}
        k = out["k"]
        assert (k["n_rows"], k["n_nonnull"], k["n_distinct"]) == (5, 4, 4)
        assert (k["min_num"], k["max_num"]) == (1.0, 4.0)
        x = out["x"]
        assert (x["n_nonnull"], x["n_distinct"]) == (4, 3)
        assert (x["min_num"], x["max_num"]) == (5.0, 30.0)
        s = out["s"]
        assert (s["n_nonnull"], s["n_distinct"]) == (4, 3)
        assert s["min_num"] is None and s["max_num"] is None

    def test_column_subset(self, spark, mixed):
        out = profile(mixed, ["x"]).collect()
        assert len(out) == 1 and out[0]["column"] == "x"

    def test_approx_matches_exact_on_small(self, spark, mixed):
        ex = {r["column"]: r["n_distinct"] for r in profile(mixed).collect()}
        ap = {r["column"]: r["n_distinct"] for r in profile_approx(mixed).collect()}
        for c in ex:
            assert abs(ap[c] - ex[c]) <= max(1, 0.1 * ex[c])

    def test_single_scan(self, spark, mixed, tmp_path):
        # one parquet source must appear exactly once in the plan
        p = str(tmp_path / "m")
        mixed.write.parquet(p)
        df = spark.read.parquet(p)
        plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Relation") == 1

    def test_approx_has_partial_agg_no_distinct_expand(self, spark, mixed):
        from etl_tools_rs_spark.plans.inspect import plan_report

        rep = plan_report(profile_approx(mixed))
        assert "Expand" not in rep.text  # the multi-COUNT(DISTINCT) rewrite
        assert rep.num_exchanges == 1


class TestHistogram:
    def test_counts_and_empty_bins(self, spark):
        from etl_tools_rs_spark.operators.profile import histogram

        df = spark.createDataFrame(
            [(v,) for v in [-5.0, 0.0, 1.0, 2.5, 9.9, 10.0, 42.0, None]], "x double"
        )
        rows = {r["bin"]: r for r in histogram(df, "x", 0.0, 10.0, 4).collect()}
        assert set(rows) == {-1, 0, 1, 2, 3, 4}
        assert rows[-1]["n"] == 1  # -5
        assert rows[0]["n"] == 2  # 0.0, 1.0
        assert rows[1]["n"] == 1  # 2.5
        assert rows[2]["n"] == 0  # empty bin surfaces as 0
        assert rows[3]["n"] == 1  # 9.9
        assert rows[4]["n"] == 2  # 10.0 (== hi) and 42 overflow
        assert rows[0]["bin_lo"] == 0.0 and rows[0]["bin_hi"] == 2.5
        assert rows[-1]["bin_lo"] == float("-inf")
        assert rows[4]["bin_hi"] == float("inf")
        # total-preserving: every non-null value lands in exactly one bin
        assert sum(r["n"] for r in rows.values()) == 7

    def test_rejects_bad_args(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.profile import histogram

        df = spark.range(5).select(F.col("id").cast("double").alias("x"))
        with pytest.raises(ValueError, match="n_bins"):
            histogram(df, "x", 0.0, 1.0, 0)
        with pytest.raises(ValueError, match="hi > lo"):
            histogram(df, "x", 1.0, 1.0, 4)


class TestApproxQuantilesHist:
    def test_within_one_bin_of_exact(self, spark):
        from etl_tools_rs_spark.operators.profile import approx_quantiles_hist

        df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("x"))
        got = {
            r["prob"]: r["value"]
            for r in approx_quantiles_hist(
                df, "x", [0.25, 0.5, 0.9], 0.0, 1000.0, 100
            ).collect()
        }
        # uniform over 0..999: true quantiles ~ p*1000; bin width 10
        for p, v in got.items():
            assert abs(v - p * 1000) <= 10 + 1e-6, (p, v)

    def test_deterministic_under_repartition(self, spark):
        from etl_tools_rs_spark.operators.profile import approx_quantiles_hist

        df = spark.range(5000).select(
            (F.xxhash64("id") % 997).cast("double").alias("x")
        )
        a = approx_quantiles_hist(df, "x", [0.5, 0.9], -1000.0, 1000.0, 64).collect()
        b = approx_quantiles_hist(
            df.repartition(17), "x", [0.5, 0.9], -1000.0, 1000.0, 64
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_out_of_range_clamped_mass_preserved(self, spark):
        from etl_tools_rs_spark.operators.profile import approx_quantiles_hist

        df = spark.createDataFrame(
            [(-100.0,), (0.5,), (0.7,), (999.0,)], "x double"
        )
        got = {
            r["prob"]: r["value"]
            for r in approx_quantiles_hist(df, "x", [0.0, 1.0], 0.0, 1.0, 2).collect()
        }
        # p=0 -> rank 1 -> first occupied bin; p=1 -> rank 4 -> last bin
        assert 0.0 <= got[0.0] <= 0.5
        assert 0.5 <= got[1.0] <= 1.0

    def test_rejects_bad_probs(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.profile import approx_quantiles_hist

        df = spark.range(5).select(F.col("id").cast("double").alias("x"))
        with pytest.raises(ValueError, match="probs"):
            approx_quantiles_hist(df, "x", [1.5], 0.0, 1.0)
        with pytest.raises(ValueError, match="at least one"):
            approx_quantiles_hist(df, "x", [], 0.0, 1.0)


class TestOutliersMad:
    def test_hand_computed(self, spark):
        from etl_tools_rs_spark.operators.profile import outliers_mad

        # group a: 1..9 plus a wild 1000 -> median 5.5, MAD 2.5
        vals = [float(v) for v in range(1, 10)] + [1000.0]
        df = spark.createDataFrame([("a", v) for v in vals], "g string, x double")
        rows = {r["x"]: r for r in outliers_mad(df, "x", by=["g"], k=3.5).collect()}
        assert rows[1000.0]["is_outlier"]
        inliers = [v for v in vals if v != 1000.0]
        assert all(not rows[v]["is_outlier"] for v in inliers)
        # score of the wild point: |1000-5.5| / (1.4826*2.5), floor-scaled
        import math

        expect = math.floor(1e4 * (994.5 / (1.4826 * 2.5))) / 1e4
        assert rows[1000.0]["mad_score"] == expect

    def test_mad_zero_group(self, spark):
        from etl_tools_rs_spark.operators.profile import outliers_mad

        df = spark.createDataFrame(
            [("c", 5.0)] * 6 + [("c", 9.0)], "g string, x double"
        )
        rows = outliers_mad(df, "x", by=["g"]).collect()
        by_val = {}
        for r in rows:
            by_val.setdefault(r["x"], []).append(r)
        # MAD == 0: deviating value is an outlier (score NULL), equals-median rows are not
        assert all(r["is_outlier"] for r in by_val[9.0])
        assert all(r["mad_score"] is None for r in by_val[9.0])
        assert all(not r["is_outlier"] for r in by_val[5.0])

    def test_global_no_group(self, spark):
        from etl_tools_rs_spark.operators.profile import outliers_mad

        df = spark.createDataFrame(
            [(float(v),) for v in [1, 2, 3, 4, 100]], "x double"
        )
        rows = {r["x"]: r["is_outlier"] for r in outliers_mad(df, "x").collect()}
        assert rows[100.0] and not rows[1.0]


class TestGroupedQuantiles:
    def test_per_group_matches_global_of_each_group(self, spark):
        from etl_tools_rs_spark.operators.profile import approx_quantiles_hist

        df = spark.createDataFrame(
            [("a", float(i)) for i in range(100)]
            + [("b", float(i * 10)) for i in range(100)],
            "g string, x double",
        )
        grouped = {
            (r["g"], r["prob"]): r["value"]
            for r in approx_quantiles_hist(
                df, "x", [0.5, 0.9], 0.0, 1000.0, 100, by=["g"]
            ).collect()
        }
        for g in ("a", "b"):
            solo = {
                r["prob"]: r["value"]
                for r in approx_quantiles_hist(
                    df.filter(F.col("g") == g), "x", [0.5, 0.9], 0.0, 1000.0, 100
                ).collect()
            }
            for p, v in solo.items():
                assert grouped[(g, p)] == v


class TestGroupedHistogram:
    def test_every_group_gets_full_bin_range(self, spark):
        from etl_tools_rs_spark.operators.profile import histogram

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 9.0)], "g string, x double"
        )
        out = histogram(df, "x", 0.0, 10.0, 5, by=["g"]).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], {})[r["bin"]] = r["n"]
        assert set(by_g["a"]) == set(by_g["b"]) == {-1, 0, 1, 2, 3, 4, 5}
        assert by_g["a"][0] == 1 and by_g["a"][1] == 1 and by_g["a"][4] == 0
        assert by_g["b"][4] == 1 and by_g["b"][0] == 0
        assert sum(by_g["a"].values()) == 2 and sum(by_g["b"].values()) == 1


class TestCorrMatrix:
    def _cm(self, spark, rows, cols=("x", "y")):
        from etl_tools_rs_spark.operators.profile import corr_matrix

        df = spark.createDataFrame(
            rows, ", ".join(f"{c} double" for c in cols)
        )
        return {
            (r.col_a, r.col_b): r for r in corr_matrix(df, list(cols)).collect()
        }

    def test_perfect_positive_and_negative(self, spark):
        got = self._cm(
            spark,
            [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0)],
            cols=("x", "y", "z"),
        )
        assert abs(got[("x", "y")].corr - 1.0) < 1e-6
        assert abs(got[("x", "z")].corr + 1.0) < 1e-6
        assert abs(got[("y", "z")].corr + 1.0) < 1e-6
        assert len(got) == 3

    def test_zero_variance_yields_null(self, spark):
        got = self._cm(spark, [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)])
        r = got[("x", "y")]
        assert r.corr is None and abs(r.cov) < 1e-9

    def test_null_rows_excluded_pairwise(self, spark):
        # the (None, 100) row must not poison the pair
        got = self._cm(spark, [(1.0, 2.0), (2.0, 4.0), (None, 100.0)])
        r = got[("x", "y")]
        assert r.n == 2 and abs(r.corr - 1.0) < 1e-6

    def test_hand_computed_cov(self, spark):
        # x=[1,2,3], y=[1,3,2]: cov = mean(xy)-mean(x)mean(y) = 13/3 - 4
        got = self._cm(spark, [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0)])
        assert abs(got[("x", "y")].cov - (13.0 / 3 - 4.0)) < 1e-6

    def test_single_scan_plan(self, spark):
        from etl_tools_rs_spark.operators.profile import corr_matrix

        df = spark.range(100).selectExpr(
            "CAST(id AS DOUBLE) x", "CAST(id*2 AS DOUBLE) y",
            "CAST(id%7 AS DOUBLE) z"
        )
        plan = (
            corr_matrix(df, ["x", "y", "z"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one aggregate over one source; the long-form output is an
        # explode of the single row, not a unionAll of re-scans
        assert plan.count("Range (0, 100") == 1

    def test_requires_two_columns(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.profile import corr_matrix

        df = spark.range(5).selectExpr("CAST(id AS DOUBLE) x")
        with pytest.raises(ValueError):
            corr_matrix(df, ["x"])


class TestCatAssociation:
    def _assoc(self, spark, rows):
        from etl_tools_rs_spark.operators.profile import cat_association

        df = spark.createDataFrame(rows, "a string, b string")
        [r] = cat_association(df, "a", "b").collect()
        return r

    def test_independent_columns_zero_mi(self, spark):
        # perfectly independent 2x2: every (a,b) cell equally likely
        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
        r = self._assoc(spark, rows)
        assert r.n == 20 and r.r == 2 and r.c == 2
        assert abs(r.mi) < 1e-6 and abs(r.chi2) < 1e-6
        assert abs(r.cramers_v) < 1e-3

    def test_identical_columns_full_association(self, spark):
        rows = [("x", "x")] * 5 + [("y", "y")] * 5
        r = self._assoc(spark, rows)
        # MI = H = ln 2 for a balanced binary; V = 1
        import math

        assert abs(r.mi - math.log(2)) < 1e-6
        assert abs(r.cramers_v - 1.0) < 1e-6

    def test_degenerate_single_category_null_v(self, spark):
        r = self._assoc(spark, [("x", "u"), ("x", "v")])
        assert r.r == 1 and r.cramers_v is None
        assert abs(r.mi) < 1e-9

    def test_nulls_excluded(self, spark):
        rows = [("x", "x")] * 3 + [(None, "x"), ("x", None)]
        r = self._assoc(spark, rows)
        assert r.n == 3


class TestLinreg:
    def _fit(self, spark, rows, **kw):
        from etl_tools_rs_spark.operators.profile import linreg

        df = spark.createDataFrame(rows, "g string, x double, y double")
        return {
            r.g: r for r in linreg(df, "x", "y", by=["g"], **kw).collect()
        }

    def test_exact_line_recovered(self, spark):
        rows = [("a", float(i), 3.0 * i + 7.0) for i in range(10)]
        r = self._fit(spark, rows)["a"]
        assert abs(r.slope - 3.0) < 1e-6
        assert abs(r.intercept - 7.0) < 1e-6
        assert abs(r.r2 - 1.0) < 1e-6 and r.n == 10

    def test_negative_slope_and_noise_r2(self, spark):
        rows = [("a", 0.0, 10.0), ("a", 1.0, 8.0), ("a", 2.0, 7.0),
                ("a", 3.0, 4.0)]
        r = self._fit(spark, rows)["a"]
        assert r.slope < 0 and 0 < r.r2 < 1

    def test_constant_x_null_slope(self, spark):
        rows = [("a", 5.0, float(i)) for i in range(4)]
        r = self._fit(spark, rows)["a"]
        assert r.slope is None and r.intercept is None and r.r2 is None

    def test_constant_y_r2_null_slope_zero(self, spark):
        rows = [("a", float(i), 9.0) for i in range(4)]
        r = self._fit(spark, rows)["a"]
        assert r.slope == 0.0 and r.r2 is None

    def test_null_pairs_excluded(self, spark):
        rows = [("a", float(i), 2.0 * i) for i in range(5)] + [
            ("a", None, 99.0), ("a", 99.0, None)
        ]
        r = self._fit(spark, rows)["a"]
        assert r.n == 5 and abs(r.slope - 2.0) < 1e-6


class TestPsi:
    def _psi(self, spark, a_vals, b_vals, **kw):
        from etl_tools_rs_spark.operators.profile import psi

        da = spark.createDataFrame([(float(v),) for v in a_vals], "x double")
        db = spark.createDataFrame([(float(v),) for v in b_vals], "x double")
        rows = psi(da, db, "x", 0.0, 10.0, n_bins=5, **kw).collect()
        return rows, sum(r.psi_term for r in rows)

    def test_identical_distributions_near_zero(self, spark):
        vals = [0.5, 1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5, 8.5, 9.5] * 5
        _, total = self._psi(spark, vals, vals)
        assert abs(total) < 1e-9  # p_a == p_b bin-for-bin -> every term 0

    def test_shift_detected(self, spark):
        a = [1.0] * 50
        b = [9.0] * 50
        _, total = self._psi(spark, a, b)
        assert total > 0.25  # the act-now threshold

    def test_out_of_range_mass_registers(self, spark):
        # b drifts entirely past the grid: overflow bin carries it
        a = [5.0] * 50
        b = [50.0] * 50
        rows, total = self._psi(spark, a, b)
        over = [r for r in rows if r.bin == 5][0]
        assert over.n_b == 50 and over.n_a == 0 and total > 0.25

    def test_rows_cover_full_grid(self, spark):
        rows, _ = self._psi(spark, [1.0], [2.0])
        assert sorted(r.bin for r in rows) == list(range(-1, 6))

    def test_validates_smoothing(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.profile import psi

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            psi(df, df, "x", 0.0, 1.0, smoothing=0.0)


class TestCorrMatrixAssumeComplete:
    def test_matches_pairwise_form(self, spark):
        from etl_tools_rs_spark.operators.profile import corr_matrix

        df = spark.range(2_000).selectExpr(
            "cast(id % 97 as double) AS x",
            "cast((id * 7) % 89 as double) AS y",
            "cast(id % 13 as double) AS z",
        )
        a = sorted(map(tuple, corr_matrix(df, ["x", "y", "z"]).collect()))
        b = sorted(
            map(
                tuple,
                corr_matrix(df, ["x", "y", "z"], assume_complete=True).collect(),
            )
        )
        assert a == b

    def test_guard_raises_on_nulls(self, spark):
        """A wrong completeness declaration fails the job instead of
        silently mis-stating correlations."""
        from etl_tools_rs_spark.operators.profile import corr_matrix
        import pytest as _pytest

        df = spark.sql(
            "SELECT * FROM VALUES (1.0, 2.0), (2.0, CAST(NULL AS DOUBLE)), "
            "(3.0, 6.0) t(x, y)"
        )
        with _pytest.raises(Exception, match="NULL|assert"):
            corr_matrix(df, ["x", "y"], assume_complete=True).collect()


class TestConcentrationProfile:
    def test_uniform_is_zero_gini(self, spark):
        from etl_tools_rs_spark.operators.profile import concentration_profile

        df = spark.sql("SELECT * FROM VALUES (5.0),(5.0),(5.0),(5.0) t(v)")
        r = concentration_profile(df, "v", top_fracs=(0.5,)).first()
        assert r.gini == 0.0 and r.top_0_5_share == 0.5 and r.total == 20.0

    def test_max_concentration(self, spark):
        from etl_tools_rs_spark.operators.profile import concentration_profile

        df = spark.sql("SELECT * FROM VALUES (0.0),(0.0),(0.0),(100.0) t(v)")
        r = concentration_profile(df, "v", top_fracs=(0.25,)).first()
        # all mass on one of n rows: G = (n-1)/n
        assert r.gini == 0.75 and r.top_0_25_share == 1.0

    def test_matches_pairwise_definition(self, spark):
        """Rank form equals the mean-absolute-difference definition
        G = sum|xi-xj| / (2 n^2 mean) on random data."""
        import itertools
        import math

        from etl_tools_rs_spark.operators.profile import concentration_profile

        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = concentration_profile(df, "v").first().gini
        n, mean = len(vals), sum(vals) / len(vals)
        mad = sum(abs(a - b) for a, b in itertools.product(vals, vals))
        expect = math.floor(1e6 * (mad / (2 * n * n * mean))) / 1e6
        assert abs(got - expect) <= 1e-6

    def test_grouped_and_guard(self, spark):
        from etl_tools_rs_spark.operators.profile import concentration_profile
        import pytest as _pytest

        df = spark.sql(
            "SELECT * FROM VALUES ('a', 1.0), ('a', 3.0), ('b', 2.0) t(g, v)"
        )
        rows = {r.g: r for r in concentration_profile(df, "v", by=["g"]).collect()}
        assert rows["a"].n == 2 and rows["b"].gini is None  # single row: no gini
        bad = spark.sql("SELECT * FROM VALUES (1.0), (-2.0) t(v)")
        with _pytest.raises(Exception):
            concentration_profile(bad, "v").collect()
        with _pytest.raises(ValueError):
            concentration_profile(df, "v", top_fracs=(1.5,))


def test_concentration_ungrouped_has_no_global_window(spark):
    """The ungrouped path must use the two-phase rank — never a
    single-partition global-order window."""
    from etl_tools_rs_spark.operators.profile import concentration_profile

    import json as _json
    import sys

    sys.path.insert(0, ".")
    from tools.scale_audit import _build_tree, audit_plan

    df = spark.range(5_000).selectExpr("cast(id % 987 as double) AS v")
    out = concentration_profile(df, "v", top_fracs=(0.5,))
    qe = out._jdf.queryExecution()
    flags = audit_plan(
        _build_tree(_json.loads(qe.sparkPlan().toJSON())),
        qe.sparkPlan().toString(),
    )
    assert not flags["single_partition_window"]
    # and it still computes the right thing on a known distribution
    r = out.first()
    assert r.n == 5_000 and 0.30 < r.gini < 0.36  # uniform-ish: G ~ 1/3


class TestKsStatistic:
    def test_known_distributions(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic

        # a = {1,2,3,4}, b = {3,4,5,6}: max gap at x=2 -> |2/4 - 0/4| = 0.5
        rows = [("a", v) for v in [1, 2, 3, 4]] + [
            ("b", v) for v in [3, 4, 5, 6]
        ]
        df = spark.createDataFrame(rows, "g string, v int")
        out = ks_statistic(df, "v", "g", "a").collect()[0]
        assert out["ks"] == 0.5
        assert out["n_a"] == 4 and out["n_b"] == 4

    def test_identical_distributions_zero(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic

        rows = [("a", v) for v in range(10)] + [("b", v) for v in range(10)]
        df = spark.createDataFrame(rows, "g string, v int")
        assert ks_statistic(df, "v", "g", "a").collect()[0]["ks"] == 0.0

    def test_disjoint_distributions_one(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic

        rows = [("a", v) for v in range(5)] + [
            ("b", v) for v in range(100, 105)
        ]
        df = spark.createDataFrame(rows, "g string, v int")
        assert ks_statistic(df, "v", "g", "a").collect()[0]["ks"] == 1.0

    def test_matches_scipy_formula(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic

        # hand-computed reference on an asymmetric mix with ties
        a = [1, 1, 2, 5, 9]
        b = [1, 3, 3, 7]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v int")
        got = ks_statistic(df, "v", "g", "a").collect()[0]["ks"]
        import itertools

        xs = sorted(set(a + b))
        expect = max(
            abs(
                sum(1 for v in a if v <= x) / len(a)
                - sum(1 for v in b if v <= x) / len(b)
            )
            for x in xs
        )
        assert got == round(expect, 9)

    def test_no_global_window(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic

        rows = [("a", v) for v in range(20)] + [("b", v) for v in range(20)]
        df = spark.createDataFrame(rows, "g string, v int")
        import json as _json
        import sys

        sys.path.insert(0, ".")
        from tools.scale_audit import _build_tree, audit_plan

        qe = ks_statistic(df, "v", "g", "a")._jdf.queryExecution()
        tree = _build_tree(_json.loads(qe.sparkPlan().toJSON()))
        flags = audit_plan(tree, qe.sparkPlan().toString())
        # the cumsums must ride bucket-partitioned windows; the scalar
        # totals fold must read as the allowlisted 1-row broadcast
        assert not flags["single_partition_window"]
        assert not flags["bnl_join"] and not flags["cartesian"]

    def test_by_group_matches_global_per_slice(self, spark):
        from etl_tools_rs_spark.operators.profile import (
            ks_statistic,
            ks_statistic_by_group,
        )

        rows = (
            [("x", "a", v) for v in [1, 1, 2, 5, 9]]
            + [("x", "b", v) for v in [1, 3, 3, 7]]
            + [("y", "a", v) for v in range(5)]
            + [("y", "b", v) for v in range(100, 105)]
        )
        df = spark.createDataFrame(rows, "g string, s string, v int")
        got = {
            r["g"]: (r["ks"], r["n_a"], r["n_b"])
            for r in ks_statistic_by_group(df, "v", "g", "s", "a").collect()
        }
        for g in ("x", "y"):
            expect = ks_statistic(
                df.where(F.col("g") == g), "v", "s", "a"
            ).collect()[0]
            assert got[g] == (expect["ks"], expect["n_a"], expect["n_b"])

    def test_by_group_drops_one_sided_segments(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic_by_group

        rows = [("only_a", "a", 1), ("both", "a", 1), ("both", "b", 2)]
        df = spark.createDataFrame(rows, "g string, s string, v int")
        out = ks_statistic_by_group(df, "v", "g", "s", "a").collect()
        assert [r["g"] for r in out] == ["both"]

    def test_by_group_window_partitions_by_segment(self, spark):
        from etl_tools_rs_spark.operators.profile import ks_statistic_by_group

        rows = [("g1", "a", 1), ("g1", "b", 2)]
        df = spark.createDataFrame(rows, "g string, s string, v int")
        plan = (
            ks_statistic_by_group(df, "v", "g", "s", "a")
            ._jdf.queryExecution()
            .sparkPlan()
            .toString()
        )
        assert "SinglePartition" not in plan


class TestRaterAgreement:
    def _run(self, spark, rows):
        from etl_tools_rs_spark.operators.profile import rater_agreement

        df = spark.createDataFrame(rows, "a string, b string")
        return rater_agreement(df, "a", "b").collect()[0]

    def test_hand_computed_kappa(self, spark):
        # classic 2x2: a=(y,y,y,n,n,n,y,n,y,n), b agrees on 7 of 10
        rows = [("y", "y")] * 4 + [("n", "n")] * 3 + [("y", "n")] * 1 + [("n", "y")] * 2
        r = self._run(spark, rows)
        n, agree = 10, 7
        na = {"y": 5, "n": 5}
        nb = {"y": 6, "n": 4}
        s = na["y"] * nb["y"] + na["n"] * nb["n"]  # 50
        po, pe = agree / n, s / n**2
        want = (po - pe) / (1 - pe)
        assert r["n"] == n and r["agree"] == agree
        assert r["po"] == po and r["pe"] == pe
        assert abs(r["kappa"] - want) < 1e-9

    def test_perfect_agreement_is_one(self, spark):
        rows = [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")]
        r = self._run(spark, rows)
        assert r["po"] == 1.0 and r["kappa"] == 1.0

    def test_constant_raters_null_kappa(self, spark):
        # pe = 1: agreement beyond chance is undefined
        r = self._run(spark, [("x", "x")] * 5)
        assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None

    def test_negative_kappa_systematic_disagreement(self, spark):
        r = self._run(spark, [("a", "b"), ("b", "a")] * 3)
        assert r["agree"] == 0 and r["kappa"] < 0

    def test_nulls_excluded(self, spark):
        rows = [("a", "a"), ("a", None), (None, "a"), ("b", "b")]
        r = self._run(spark, rows)
        assert r["n"] == 2 and r["agree"] == 2

    def test_disjoint_label_spaces(self, spark):
        # no category shared: pe = 0, kappa = po = 0
        r = self._run(spark, [("a", "x"), ("b", "y")])
        assert r["pe"] == 0.0 and r["kappa"] == 0.0

    def test_by_group_matches_per_group_global(self, spark):
        from etl_tools_rs_spark.operators.profile import rater_agreement

        rows = (
            [("g1", "y", "y")] * 4 + [("g1", "n", "y")] * 2
            + [("g2", "a", "b"), ("g2", "b", "a"), ("g2", "c", "c")]
        )
        df = spark.createDataFrame(rows, "g string, a string, b string")
        by = {
            r["g"]: r
            for r in rater_agreement(df, "a", "b", by=["g"]).collect()
        }
        for g in ("g1", "g2"):
            solo = rater_agreement(
                df.filter(F.col("g") == g), "a", "b"
            ).collect()[0]
            got = by[g]
            assert (got["n"], got["agree"]) == (solo["n"], solo["agree"])
            assert got["po"] == solo["po"] and got["pe"] == solo["pe"]
            assert got["kappa"] == solo["kappa"]

    def test_by_group_disjoint_slice_gets_zero_pe(self, spark):
        from etl_tools_rs_spark.operators.profile import rater_agreement

        rows = [("s1", "a", "a"), ("s2", "x", "y"), ("s2", "w", "z")]
        df = spark.createDataFrame(rows, "g string, a string, b string")
        out = {r["g"]: r for r in rater_agreement(df, "a", "b", by=["g"]).collect()}
        assert out["s2"]["pe"] == 0.0 and out["s2"]["kappa"] == 0.0
        assert out["s1"]["kappa"] is None  # constant slice: pe = 1

    def test_by_group_null_key_slice_joins_its_cross_term(self, spark):
        # a NULL by-key must meet its OWN cross term (null-safe join),
        # not fall through to _s = 0 / pe = 0 / kappa = po
        from etl_tools_rs_spark.operators.profile import rater_agreement

        slice_rows = [("a", "b"), ("b", "a")] * 3  # po=0, pe=0.5, kappa=-1
        df = spark.createDataFrame(
            [(None, a, b) for a, b in slice_rows]
            + [("g2", a, b) for a, b in slice_rows],
            "g string, a string, b string",
        )
        out = {r["g"]: r for r in rater_agreement(df, "a", "b", by=["g"]).collect()}
        assert out["g2"]["kappa"] == -1.0
        assert out[None]["pe"] == out["g2"]["pe"] == 0.5
        assert out[None]["kappa"] == -1.0  # identical slice -> identical kappa
