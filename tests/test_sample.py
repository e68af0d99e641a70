"""Deterministic sampling / splitting (operators/sample.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


class TestMixtureSample:
    def test_rates_respected(self, spark):
        from etl_tools_rs_spark.operators.sample import mixture_sample

        df = spark.range(30_000).select(
            F.col("id").alias("k"),
            F.element_at(
                F.array(F.lit("web"), F.lit("books"), F.lit("logs")),
                (F.col("id") % 3).cast("int") + F.lit(1),
            ).alias("src"),
        )
        out = mixture_sample(df, "src", "k", {"books": 1.0, "web": 0.3})
        got = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got.get("books") == 10_000          # keep all
        assert abs(got.get("web", 0) - 3000) < 300  # ~30%
        assert "logs" not in got                    # default 0

    def test_nested_under_rate_increase(self, spark):
        from etl_tools_rs_spark.operators.sample import mixture_sample

        df = spark.range(10_000).select(F.col("id").alias("k"), F.lit("web").alias("src"))
        lo = {r["k"] for r in mixture_sample(df, "src", "k", {"web": 0.2}).collect()}
        hi = {r["k"] for r in mixture_sample(df, "src", "k", {"web": 0.5}).collect()}
        assert lo <= hi  # raising a rate only adds rows

    def test_validation(self, spark):
        from etl_tools_rs_spark.operators.sample import mixture_sample

        df = spark.range(10).select(F.col("id").alias("k"), F.lit("a").alias("src"))
        with pytest.raises(ValueError):
            mixture_sample(df, "src", "k", {"a": 1.5})


class TestEpochShuffle:
    def test_valid_permutation_and_determinism(self, spark):
        from etl_tools_rs_spark.operators.sample import epoch_shuffle_rank

        df = spark.range(1, 5001).select(F.col("id").alias("k"))
        r1 = {r["k"]: r["shuffle_rank"] for r in epoch_shuffle_rank(df, "k", epoch=1).collect()}
        assert sorted(r1.values()) == list(range(1, 5001))  # exact permutation
        r1b = {r["k"]: r["shuffle_rank"] for r in epoch_shuffle_rank(df, "k", epoch=1).collect()}
        assert r1 == r1b  # reproducible

    def test_epochs_differ(self, spark):
        from etl_tools_rs_spark.operators.sample import epoch_shuffle_rank

        df = spark.range(1, 2001).select(F.col("id").alias("k"))
        r1 = {r["k"]: r["shuffle_rank"] for r in epoch_shuffle_rank(df, "k", 1).collect()}
        r2 = {r["k"]: r["shuffle_rank"] for r in epoch_shuffle_rank(df, "k", 2).collect()}
        moved = sum(1 for k in r1 if r1[k] != r2[k])
        assert moved > 1800  # epochs are (near-)disjoint orders

    def test_no_single_partition_window(self, spark):
        from etl_tools_rs_spark.operators.sample import epoch_shuffle_rank
        from etl_tools_rs_spark.plans.inspect import plan_report

        df = spark.range(1, 5001).select(F.col("id").alias("k"))
        rep = plan_report(epoch_shuffle_rank(df, "k", epoch=3))
        assert "SinglePartition" not in rep.text


class TestNegativeSample:
    def test_k_negatives_no_self_pairs(self, spark):
        from etl_tools_rs_spark.operators.sample import negative_sample

        df = spark.range(1, 501).select(F.col("id").alias("k"))
        out = negative_sample(df, "k", k=3).collect()
        assert len(out) == 500 * 3
        assert all(r["k"] != r["neg_k"] for r in out)
        per_row = {}
        for r in out:
            per_row.setdefault(r["k"], set()).add(r["neg_rank"])
        assert all(v == {1, 2, 3} for v in per_row.values())

    def test_deterministic_across_runs(self, spark):
        from etl_tools_rs_spark.operators.sample import negative_sample

        df = spark.range(1, 201).select(F.col("id").alias("k"))
        a = {(r["k"], r["neg_rank"], r["neg_k"]) for r in negative_sample(df, "k", k=2).collect()}
        b = {(r["k"], r["neg_rank"], r["neg_k"]) for r in negative_sample(df, "k", k=2).collect()}
        assert a == b

    def test_negatives_roughly_uniform(self, spark):
        from etl_tools_rs_spark.operators.sample import negative_sample

        df = spark.range(1, 401).select(F.col("id").alias("k"))
        out = negative_sample(df, "k", k=5)
        counts = [r["n"] for r in out.groupBy("neg_k").agg(F.count(F.lit(1)).alias("n")).collect()]
        # 2000 draws over 400 targets: mean 5; no target should dominate
        assert max(counts) <= 20

    def test_validation(self, spark):
        from etl_tools_rs_spark.operators.sample import negative_sample

        df = spark.range(1, 2).select(F.col("id").alias("k"))
        with pytest.raises(ValueError):
            negative_sample(df, "k", k=0)
        with pytest.raises(ValueError):
            negative_sample(df, "k", k=2)  # single row: no possible negative


class TestWeightedSample:
    def test_monotone_under_weight_increase(self, spark):
        from etl_tools_rs_spark.operators.sample import weighted_sample

        df = spark.range(2000).select(
            F.col("id"), (F.col("id") % 10 / 20.0).alias("w")
        )
        low = {r["id"] for r in weighted_sample(df, "id", "w").collect()}
        high = {
            r["id"]
            for r in weighted_sample(df, "id", F.col("w") * 2).collect()
        }
        assert low <= high  # raising weights only adds rows
        assert len(low) < len(high)

    def test_extreme_weights_and_determinism(self, spark):
        from etl_tools_rs_spark.operators.sample import weighted_sample

        df = spark.range(500).select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit(5.0)).otherwise(F.lit(-1.0)).alias("w"),
        )
        kept = {r["id"] for r in weighted_sample(df, "id", "w").collect()}
        assert kept == {i for i in range(500) if i % 2 == 0}  # clamp to [0,1]
        again = {r["id"] for r in weighted_sample(df.repartition(13), "id", "w").collect()}
        assert kept == again


class TestTopP:
    def test_minimal_prefix_covers_p(self, spark):
        from etl_tools_rs_spark.operators.sample import top_p_by_group

        rows = [("g", i, float(w)) for i, w in enumerate([50, 30, 10, 5, 5])]
        df = spark.createDataFrame(rows, "g string, id int, w double")
        kept = {r["id"] for r in
                top_p_by_group(df, "w", "w", by=["g"], p=0.6, tie_col="id").collect()}
        # 50 alone is 50% < 60%; adding 30 reaches 80% >= 60% -> {50, 30}
        assert kept == {0, 1}

    def test_p_one_keeps_everything(self, spark):
        from etl_tools_rs_spark.operators.sample import top_p_by_group

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)], "g string, id int, w double"
        )
        assert top_p_by_group(df, "w", "w", by=["g"], p=1.0, tie_col="id").count() == 3

    def test_rejects_bad_p(self, spark):
        import pytest as _p

        from etl_tools_rs_spark.operators.sample import top_p_by_group

        df = spark.createDataFrame([("a", 1, 1.0)], "g string, id int, w double")
        with _p.raises(ValueError, match="p must be"):
            top_p_by_group(df, "w", "w", by=["g"], p=0.0)


def test_weighted_sample_plan_is_narrow(spark):
    """weighted_sample must stay a pure filter — no exchange, no UDF."""
    from etl_tools_rs_spark.operators.sample import weighted_sample
    from etl_tools_rs_spark.plans.inspect import plan_report

    df = spark.range(100).select(F.col("id"), (F.col("id") / 200.0).alias("w"))
    rep = plan_report(weighted_sample(df, "id", "w"))
    assert rep.num_exchanges == 0
    assert not rep.has_python_udf


def test_top_p_rejects_negative_and_zero_weights(spark):
    """Degenerate weights fail loudly at execution (ADVICE r2), not by
    silently dropping rows."""
    import pytest
    from etl_tools_rs_spark.operators import sample

    neg = spark.createDataFrame(
        [("g", 1.0, -5.0), ("g", 2.0, 1.0)], "grp string, score double, w double"
    )
    with pytest.raises(Exception, match="negative weight"):
        sample.top_p_by_group(neg, "score", "w", by=["grp"], p=0.9).collect()

    zero = spark.createDataFrame(
        [("g", 1.0, 0.0), ("g", 2.0, 0.0)], "grp string, score double, w double"
    )
    with pytest.raises(Exception, match="total is <= 0"):
        sample.top_p_by_group(zero, "score", "w", by=["grp"], p=0.9).collect()


class TestKfoldAssign:
    def test_disjoint_exhaustive_stable(self, spark):
        from etl_tools_rs_spark.operators.sample import kfold_assign

        df = spark.createDataFrame([(i,) for i in range(200)], "id int")
        got = {r.id: r.fold for r in kfold_assign(df, "id", k=5).collect()}
        assert set(got.values()) <= set(range(5))
        assert len(got) == 200
        # growth stability: adding rows never moves existing assignments
        df2 = spark.createDataFrame([(i,) for i in range(400)], "id int")
        got2 = {r.id: r.fold for r in kfold_assign(df2, "id", k=5).collect()}
        assert all(got2[i] == got[i] for i in got)
        # roughly balanced (hash-uniform): every fold populated
        from collections import Counter

        c = Counter(got.values())
        assert len(c) == 5 and min(c.values()) > 10

    def test_same_key_same_fold(self, spark):
        from etl_tools_rs_spark.operators.sample import kfold_assign

        df = spark.createDataFrame(
            [(7, "a"), (7, "b"), (8, "c")], "k int, v string"
        )
        rows = kfold_assign(df, "k", k=3).collect()
        folds = {r.v: r.fold for r in rows}
        assert folds["a"] == folds["b"]

    def test_validates_k(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.sample import kfold_assign

        df = spark.createDataFrame([(1,)], "id int")
        with pytest.raises(ValueError):
            kfold_assign(df, "id", k=1)


class TestLeakageSafeSplit:
    def test_duplicates_share_split(self, spark):
        from etl_tools_rs_spark.operators.sample import leakage_safe_split

        docs = [
            (i, text)
            for i, text in enumerate(
                ["same doc", "Same   DOC", " same doc ", "other one", "third"]
                * 8
            )
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = leakage_safe_split(
            df, {"train": 0.5, "val": 0.25, "test": 0.25}, "text"
        )
        # normalized-identical docs must all land in one split
        from etl_tools_rs_spark.functions import fingerprint
        from pyspark.sql import functions as F

        per_fp = (
            out.withColumn("_fp", fingerprint("text"))
            .groupBy("_fp")
            .agg(F.countDistinct("split").alias("n"))
            .collect()
        )
        assert all(r.n == 1 for r in per_fp)

    def test_splits_exhaustive_and_disjoint(self, spark):
        from etl_tools_rs_spark.operators.sample import leakage_safe_split

        df = spark.createDataFrame(
            [(i, f"doc number {i}") for i in range(100)], ["doc_id", "text"]
        )
        out = leakage_safe_split(df, {"a": 0.6, "b": 0.4}, "text")
        assert out.count() == 100
        assert set(r.split for r in out.select("split").distinct().collect()) <= {"a", "b"}

    def test_original_columns_preserved(self, spark):
        from etl_tools_rs_spark.operators.sample import leakage_safe_split

        df = spark.createDataFrame([(1, "x", 9)], ["doc_id", "text", "extra"])
        out = leakage_safe_split(df, {"train": 1.0}, "text")
        assert out.columns == ["doc_id", "text", "extra", "split"]


class TestTemperatureRates:
    def _rates(self, spark, counts, **kw):
        from etl_tools_rs_spark.operators.sample import temperature_rates

        rows = [(g, i) for g, n in counts.items() for i in range(n)]
        df = spark.createDataFrame(rows, ["grp_col", "i"])
        return {
            r.grp: r for r in temperature_rates(df, "grp_col", **kw).collect()
        }

    def test_alpha_one_is_proportional(self, spark):
        got = self._rates(spark, {"a": 30, "b": 10}, alpha=1.0)
        assert abs(got["a"].share - 0.75) < 1e-6
        assert abs(got["b"].share - 0.25) < 1e-6

    def test_small_alpha_upweights_small_groups(self, spark):
        got = self._rates(spark, {"big": 80, "small": 10}, alpha=0.5)
        # tempered share of 'small' exceeds its raw share 1/9
        assert got["small"].share > 10 / 90
        assert got["big"].share < 80 / 90

    def test_target_total_expected_rows(self, spark):
        got = self._rates(spark, {"a": 100, "b": 100}, alpha=1.0, target_total=50)
        # symmetric groups: each contributes ~25 expected rows
        for g in ("a", "b"):
            assert abs(got[g].rate * got[g].n - 25) < 0.01

    def test_rate_caps_at_one(self, spark):
        got = self._rates(spark, {"a": 2, "b": 200}, alpha=0.1, target_total=150)
        assert got["a"].rate == 1.0

    def test_no_target_scales_largest_to_one(self, spark):
        got = self._rates(spark, {"a": 100, "b": 25}, alpha=0.5)
        assert got["a"].rate == 1.0
        assert abs(got["b"].rate - 0.5) < 1e-6  # (25/100)^0.5

    def test_alpha_validation(self, spark):
        import pytest

        from etl_tools_rs_spark.operators.sample import temperature_rates

        df = spark.createDataFrame([("a", 1)], ["grp_col", "i"])
        with pytest.raises(ValueError):
            temperature_rates(df, "grp_col", alpha=0.0)


class TestCapPerGroup:
    def test_caps_and_passes_small_groups(self, spark):
        from etl_tools_rs_spark.operators.sample import cap_per_group

        df = spark.range(100).selectExpr(
            "CASE WHEN id < 80 THEN 'big' ELSE 'small' END AS g",
            "cast(id as string) AS k",
        )
        out = cap_per_group(df, by=["g"], k=30, key_col="k")
        per = {r.g: r["count"] for r in out.groupBy("g").count().collect()}
        assert per == {"big": 30, "small": 20}

    def test_kept_set_is_stable_under_growth(self, spark):
        """Adding rows to a group never swaps out a survivor that still
        ranks inside the cap — the incremental-pipeline property."""
        from etl_tools_rs_spark.operators.sample import cap_per_group

        small = spark.range(50).selectExpr("'g' AS g", "cast(id as string) AS k")
        grown = spark.range(200).selectExpr("'g' AS g", "cast(id as string) AS k")
        kept_small = {r.k for r in cap_per_group(small, ["g"], 10, "k").collect()}
        kept_grown = {r.k for r in cap_per_group(grown, ["g"], 10, "k").collect()}
        # survivors of the grown run that existed in the small input must
        # be a subset of the small run's survivors (hash order is global)
        assert {k for k in kept_grown if int(k) < 50} <= kept_small

    def test_deterministic_across_partitionings(self, spark):
        from etl_tools_rs_spark.operators.sample import cap_per_group

        df = spark.range(300).selectExpr(
            "cast(id % 3 as string) AS g", "cast(id as string) AS k"
        )
        a = sorted(map(tuple, cap_per_group(df, ["g"], 12, "k").collect()))
        b = sorted(
            map(tuple, cap_per_group(df.repartition(17), ["g"], 12, "k").collect())
        )
        assert a == b

    def test_validates_args(self, spark):
        from etl_tools_rs_spark.operators.sample import cap_per_group
        import pytest as _pytest

        df = spark.range(3).selectExpr("'g' AS g", "cast(id as string) AS k")
        with _pytest.raises(ValueError):
            cap_per_group(df, ["g"], 0, "k")
        with _pytest.raises(ValueError):
            cap_per_group(df, [], 5, "k")


class TestBudgetAllocate:
    def _domains(self, spark):
        return spark.sql(
            "SELECT * FROM VALUES ('a', 100.0, 1.0), ('b', 1000.0, 1.0), "
            "('c', 10000.0, 2.0) t(d, c, w)"
        )

    def test_water_filling_example(self, spark):
        from etl_tools_rs_spark.operators.sample import budget_allocate

        got = {
            r.d: (r.alloc, r.saturated)
            for r in budget_allocate(self._domains(spark), "c", "w", 2000.0).collect()
        }
        # a saturates at 100; remaining 1900 splits 1:2 across b and c
        assert got["a"] == (100.0, True)
        assert got["b"] == (633.333333, False)
        assert got["c"] == (1266.666666, False)

    def test_sum_is_min_budget_total(self, spark):
        from etl_tools_rs_spark.operators.sample import budget_allocate

        for budget in (50.0, 2000.0, 11100.0, 99999.0):
            rows = budget_allocate(self._domains(spark), "c", "w", budget).collect()
            assert abs(sum(r.alloc for r in rows) - min(budget, 11100.0)) < 1e-3

    def test_budget_exceeds_total_saturates_all(self, spark):
        from etl_tools_rs_spark.operators.sample import budget_allocate

        rows = budget_allocate(self._domains(spark), "c", "w", 99999.0).collect()
        assert all(r.saturated for r in rows)
        assert {r.d: r.alloc for r in rows} == {"a": 100.0, "b": 1000.0, "c": 10000.0}

    def test_no_saturation_small_budget(self, spark):
        from etl_tools_rs_spark.operators.sample import budget_allocate

        rows = {r.d: r for r in budget_allocate(self._domains(spark), "c", "w", 40.0).collect()}
        # tau = 40/4 = 10: below every saturation ratio
        assert rows["a"].alloc == 10.0 and rows["c"].alloc == 20.0
        assert not any(r.saturated for r in rows.values())

    def test_guards(self, spark):
        from etl_tools_rs_spark.operators.sample import budget_allocate
        import pytest as _pytest

        df = self._domains(spark)
        with _pytest.raises(ValueError):
            budget_allocate(df, "c", "w", 0.0)
        bad = spark.sql("SELECT * FROM VALUES ('a', 5.0, 0.0) t(d, c, w)")
        with _pytest.raises(Exception):
            budget_allocate(bad, "c", "w", 10.0).collect()


def test_temperature_rates_partition_invariant(spark):
    """Uniform group sizes put every share EXACTLY on a floor boundary
    (1/k) — the quantized-decimal sum must hold the same floored value
    at any partitioning (the raw double pow() sum flipped
    0.05 <-> 0.049999 with partition order)."""
    from etl_tools_rs_spark.operators.sample import temperature_rates

    df = spark.range(500).selectExpr("concat('s', id % 20) AS g")
    seen = set()
    for parts in (1, 7, 32):
        rows = sorted(
            map(
                tuple,
                temperature_rates(
                    df.repartition(parts), "g", alpha=0.7, target_total=300
                ).collect(),
            )
        )
        seen.add(tuple(rows))
        assert all(r[2] == 0.05 for r in rows)  # share column = 1/20 exactly
    assert len(seen) == 1
