"""range_join (bucketized interval join) and kmv_distinct (KMV sketch)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.join import range_join
from etl_tools_rs_spark.operators.sketch import kmv_distinct


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_range_join_containment_numeric(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 999.0)], "pid int, x double"
    )
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0), (30, 24.0, 26.0)],
        "iid int, s double, e double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "x", "s", "e", bucket_width=7.0).collect()
    )
    # 5∈[0,10), 15∈[10,20), 25∈[24,26); 999 unmatched; bounds: start
    # inclusive / end exclusive
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_range_join_end_exclusive_start_inclusive(spark):
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid int, x double")
    ivs = spark.createDataFrame([(9, 10.0, 20.0)], "iid int, s double, e double")
    got = [(r.pid, r.iid) for r in range_join(pts, ivs, "x", "s", "e", 5.0).collect()]
    assert got == [(1, 9)]


def test_range_join_no_duplicates_across_buckets(spark):
    # interval spans many buckets; each point still matches exactly once
    pts = spark.createDataFrame([(i, float(i)) for i in range(10)], "pid int, x double")
    ivs = spark.createDataFrame([(1, 0.0, 100.0)], "iid int, s double, e double")
    rows = range_join(pts, ivs, "x", "s", "e", bucket_width=2.0).collect()
    assert len(rows) == 10 and len({r.pid for r in rows}) == 10


def test_range_join_timestamp_with_key(spark):
    pts = spark.createDataFrame(
        [(1, "u1", _ts(5)), (2, "u2", _ts(5))], "pid int, u string, t timestamp"
    )
    ivs = spark.createDataFrame(
        [("u1", _ts(1), _ts(10), 100)], "ku string, s timestamp, e timestamp, iid int"
    )
    rows = range_join(
        pts, ivs, "t", "s", "e", bucket_width=86400.0, by="u", right_by="ku"
    ).collect()
    assert [(r.pid, r.iid) for r in rows] == [(1, 100)]  # u2 has no interval


def test_kmv_exact_below_capacity(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(1000)], "v int")
    [r] = kmv_distinct(df, "v", k=64).collect()
    assert r.est_distinct == 10.0  # < k distinct -> exact


def test_kmv_estimate_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "v int")
    [r] = kmv_distinct(df, "v", k=256).collect()
    assert abs(r.est_distinct - n) / n < 0.2  # ~1/sqrt(254) std err

def test_kmv_grouped(spark):
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v int")
    got = {r.g: r.est_distinct for r in kmv_distinct(df, "v", k=64, by=["g"]).collect()}
    assert got == {"a": 5.0, "b": 40.0}


def test_range_join_rejects_nonpositive_width(spark):
    import pytest

    pts = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    ivs = spark.createDataFrame([(10, 0.0, 10.0)], "iid int, s double, e double")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, ivs, "x", "s", "e", bucket_width=0.0)
    # timestamp width under 1 microsecond truncates to 0 -> also rejected
    tpts = spark.createDataFrame([(1, _ts(5))], "pid int, t timestamp")
    tivs = spark.createDataFrame([(9, _ts(1), _ts(10))], "iid int, s timestamp, e timestamp")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(tpts, tivs, "t", "s", "e", bucket_width=1e-7)


def test_kmv_ignores_nulls(spark):
    rows = [(i,) for i in range(30)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "v int")
    [r] = kmv_distinct(df, "v", k=64).collect()
    assert r.est_distinct == 30.0  # NULLs neither count nor occupy slots


def test_count_min_never_undercounts(spark):
    from etl_tools_rs_spark.operators.sketch import count_min, count_min_estimate

    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    sketch = count_min(df, "v", depth=4, width=32)
    keys = df.select("v").distinct()
    est = {r.v: r.est_count for r in
           count_min_estimate(sketch, keys, "v", depth=4, width=32).collect()}
    true = {r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    for k, n in true.items():
        assert est[k] >= n  # CM never undercounts


def test_count_min_absent_key_is_zero(spark):
    from etl_tools_rs_spark.operators.sketch import count_min, count_min_estimate

    df = spark.createDataFrame([("a",), ("b",)], "v string")
    sketch = count_min(df, "v", depth=4, width=1024)
    keys = spark.createDataFrame([("zzz-not-there",)], "v string")
    [r] = count_min_estimate(sketch, keys, "v", depth=4, width=1024).collect()
    assert r.est_count == 0


def test_count_min_merge_equals_whole(spark):
    from etl_tools_rs_spark.operators.sketch import count_min, merge_count_min

    rows = [(f"k{i % 5}",) for i in range(100)]
    df = spark.createDataFrame(rows, "v string")
    half_a = spark.createDataFrame(rows[:50], "v string")
    half_b = spark.createDataFrame(rows[50:], "v string")
    whole = {(r.d, r.w): r.cnt for r in count_min(df, "v", 4, 64).collect()}
    merged = {(r.d, r.w): r.cnt for r in merge_count_min(
        count_min(half_a, "v", 4, 64), count_min(half_b, "v", 4, 64)).collect()}
    assert whole == merged


def test_count_min_rejects_bad_dims(spark):
    import pytest

    from etl_tools_rs_spark.operators.sketch import count_min

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="depth and width"):
        count_min(df, "v", depth=0, width=16)


class TestKmvOverlap:
    def _overlap(self, spark, a_vals, b_vals, k=64):
        from etl_tools_rs_spark.operators.sketch import kmv_overlap

        da = spark.createDataFrame([(v,) for v in a_vals], "v string")
        db = spark.createDataFrame([(v,) for v in b_vals], "v string")
        [r] = kmv_overlap(da, db, "v", k=k).collect()
        return r

    def test_exact_below_capacity(self, spark):
        # |A|=30, |B|=30, |A∩B|=10 — union 50 < k, so everything exact
        a = [f"x{i}" for i in range(30)]
        b = [f"x{i}" for i in range(20, 50)]
        r = self._overlap(spark, a, b)
        assert r.n_union_sketch == 50 and r.est_union == 50.0
        assert abs(r.jaccard_est - 0.2) < 1e-6
        assert abs(r.est_intersection - 10.0) < 1e-6

    def test_disjoint_and_identical(self, spark):
        a = [f"a{i}" for i in range(20)]
        b = [f"b{i}" for i in range(20)]
        assert self._overlap(spark, a, b).jaccard_est == 0.0
        r = self._overlap(spark, a, a)
        assert r.jaccard_est == 1.0 and r.est_intersection == 20.0

    def test_estimate_above_capacity_within_tolerance(self, spark):
        # 2000-element union, 50% overlap, k=256: KMV rel. error ~ 1/sqrt(k)
        a = [f"u{i}" for i in range(1500)]
        b = [f"u{i}" for i in range(500, 2000)]
        r = self._overlap(spark, a, b, k=256)
        assert abs(r.est_union - 2000) / 2000 < 0.2
        assert abs(r.jaccard_est - 0.5) < 0.15

    def test_duplicates_ignored(self, spark):
        a = ["x"] * 100 + ["y"]
        b = ["x"] * 50
        r = self._overlap(spark, a, b)
        assert r.n_union_sketch == 2 and abs(r.jaccard_est - 0.5) < 1e-6

    def test_validates_k(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.sketch import kmv_overlap

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError):
            kmv_overlap(df, df, "v", k=1)


class TestQuantileSketch:
    """Bottom-k quantile sketch: SRS-by-hash quantiles, min-k merge law."""

    def _df(self, spark, n=500, start=0):
        return spark.range(start, start + n).selectExpr(
            "cast(id as string) AS k", "cast(id as double) AS v"
        )

    def test_exact_below_capacity(self, spark):
        from etl_tools_rs_spark.operators.sketch import (
            quantile_estimate,
            quantile_sketch,
        )

        df = self._df(spark, n=50)
        sk = quantile_sketch(df, "v", "k", k=256)
        est = {r.p: r.est_q for r in quantile_estimate(sk, [0.0, 0.5, 1.0]).collect()}
        # sample == population below capacity: exact interpolated quantiles
        assert est[0.0] == 0.0
        assert est[0.5] == 24.5
        assert est[1.0] == 49.0

    def test_estimate_accuracy_above_capacity(self, spark):
        from etl_tools_rs_spark.operators.sketch import (
            quantile_estimate,
            quantile_sketch,
        )

        df = self._df(spark, n=20_000)
        sk = quantile_sketch(df, "v", "k", k=512)
        assert sk.count() == 512
        est = {r.p: r.est_q for r in quantile_estimate(sk, [0.5]).collect()}
        # SRS of 512: standard error of the median ~ n/(2*sqrt(k)) ~ 440
        assert abs(est[0.5] - 10_000) < 2_000

    def test_merge_law(self, spark):
        from etl_tools_rs_spark.operators.sketch import (
            merge_quantile_sketch,
            quantile_sketch,
        )

        a = self._df(spark, n=1_000, start=0)
        b = self._df(spark, n=1_000, start=700)  # overlaps a: shared keys
        merged = merge_quantile_sketch(
            quantile_sketch(a, "v", "k", k=64),
            quantile_sketch(b, "v", "k", k=64),
            k=64,
        )
        whole = quantile_sketch(a.union(b).dropDuplicates(["k"]), "v", "k", k=64)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_grouped_sketch_caps_per_group(self, spark):
        from etl_tools_rs_spark.operators.sketch import quantile_sketch

        df = spark.range(300).selectExpr(
            "cast(id % 3 as string) AS g", "cast(id as string) AS k",
            "cast(id as double) AS v",
        )
        sk = quantile_sketch(df, "v", "k", k=10, by=["g"])
        per = {r.g: r.n for r in sk.groupBy("g").count().withColumnRenamed("count", "n").collect()}
        assert per == {"0": 10, "1": 10, "2": 10}

    def test_nulls_never_enter(self, spark):
        from etl_tools_rs_spark.operators.sketch import quantile_sketch

        df = spark.sql(
            "SELECT * FROM VALUES ('a', 1.0), (NULL, 2.0), ('c', NULL) t(k, v)"
        )
        assert quantile_sketch(df, "v", "k", k=8).count() == 1

    def test_validates_k(self, spark):
        from etl_tools_rs_spark.operators.sketch import quantile_sketch
        import pytest as _pytest

        with _pytest.raises(ValueError):
            quantile_sketch(self._df(spark, 5), "v", "k", k=1)


class TestHeavyHitters:
    def test_exact_vs_naive(self, spark):
        from etl_tools_rs_spark.operators.sketch import heavy_hitters
        import pyspark.sql.functions as F

        # zipf-ish: value i appears ~ 1000/i times
        rows = [(str(i),) for i in range(1, 60) for _ in range(1000 // i)]
        df = spark.createDataFrame(rows, "v string").repartition(13)
        n = len(rows)
        k = 20
        naive = {
            r.v: r.cnt
            for r in df.groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > n / k)
            .collect()
        }
        got = {r.v: r.cnt for r in heavy_hitters(df, "v", k=k).collect()}
        assert got == naive and len(got) > 0

    def test_candidate_set_is_bounded(self, spark):
        """The MG pass emits <= k candidates per partition — never the
        full distinct key set."""
        from etl_tools_rs_spark.operators.sketch import heavy_hitters

        df = (
            spark.range(50_000)
            .selectExpr("cast(id as string) AS v")  # all-unique: no hitters
            .repartition(4)
        )
        out = heavy_hitters(df, "v", k=10)
        assert out.count() == 0

    def test_nulls_ignored(self, spark):
        from etl_tools_rs_spark.operators.sketch import heavy_hitters

        df = spark.sql(
            "SELECT * FROM VALUES ('a'), ('a'), ('a'), (NULL), ('b') t(v)"
        )
        got = {r.v: (r.cnt, r.freq) for r in heavy_hitters(df, "v", k=2).collect()}
        # n counts non-null values only (4): a=3 > 4/2
        assert got == {"a": (3, 0.75)}

    def test_validates_k(self, spark):
        from etl_tools_rs_spark.operators.sketch import heavy_hitters
        import pytest as _pytest

        df = spark.range(3).selectExpr("cast(id as string) AS v")
        with _pytest.raises(ValueError):
            heavy_hitters(df, "v", k=1)

    def test_grouped_matches_naive(self, spark):
        from etl_tools_rs_spark.operators.sketch import heavy_hitters
        import pyspark.sql.functions as F

        rows = [("g1", str(i)) for i in range(1, 30) for _ in range(300 // i)]
        rows += [("g2", str(i)) for i in range(1, 10) for _ in range(100 // i)]
        df = spark.createDataFrame(rows, "g string, v string").repartition(7)
        k = 8
        naive = {
            (r.g, r.v): r.cnt
            for r in df.groupBy("g", "v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .join(
                df.groupBy("g").agg(F.count(F.lit(1)).alias("n")), "g"
            )
            .filter(F.col("cnt") > F.col("n") / k)
            .select("g", "v", "cnt")
            .collect()
        }
        got = {
            (r.g, r.v): r.cnt
            for r in heavy_hitters(df, "v", k=k, by=["g"]).collect()
        }
        assert got == naive and len(got) > 0
