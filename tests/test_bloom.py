"""Bloom-filter semi-join pruning: no false negatives, bounded false
positives, exact composition, and the broadcast/codegen plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.bloom import (
    BloomSpec,
    bloom_prune,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def dim_fact(spark):
    dim = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))  # multiples of 3
    fact = spark.range(0, 30_000).select(
        (F.col("id") % 9000).alias("k"), F.col("id").alias("v")
    )
    return dim, fact


class TestBloom:
    def test_sizing_math(self):
        spec = BloomSpec.for_items(10_000, fpr=0.01)
        assert spec.num_bits % 64 == 0
        assert 9 * 10_000 <= spec.num_bits <= 11 * 10_000  # ~9.6 bits/key at 1%
        assert spec.num_hashes in (6, 7)
        with pytest.raises(ValueError):
            BloomSpec.for_items(0)
        with pytest.raises(ValueError):
            BloomSpec.for_items(10, fpr=1.5)

    def test_no_false_negatives(self, spark, dim_fact):
        dim, fact = dim_fact
        spec = BloomSpec.for_items(2000, fpr=0.01)
        bloom = build_bloom(dim.select(F.col("k").alias("__bk")), "__bk", spec=spec)
        kept = set(
            r["k"] for r in bloom_prune(fact, "k", bloom, spec).select("k").distinct().collect()
        )
        true_keys = set(r["k"] for r in dim.collect()) & set(
            r["k"] for r in fact.select("k").distinct().collect()
        )
        assert true_keys <= kept  # every real match survives

    def test_false_positive_rate_bounded(self, spark, dim_fact):
        dim, fact = dim_fact
        spec = BloomSpec.for_items(2000, fpr=0.01)
        bloom = build_bloom(dim.select(F.col("k").alias("__bk")), "__bk", spec=spec)
        kept = bloom_prune(fact.select("k").distinct(), "k", bloom, spec).count()
        # fact distinct keys = 0..8999; dim = multiples of 3 in [0, 6000)
        true_matches = len([k for k in range(9000) if k % 3 == 0 and k < 6000])
        assert true_matches == 2000
        assert kept >= true_matches
        fpr_observed = (kept - true_matches) / (9000 - true_matches)
        assert fpr_observed < 0.05, f"observed FPR {fpr_observed}"

    def test_exact_composition(self, spark, dim_fact):
        dim, fact = dim_fact
        got = bloom_semi_join(fact, dim, "k", fpr=0.02)
        want = fact.join(dim, "k", "left_semi")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_null_keys_never_match(self, spark):
        dim = spark.createDataFrame([(1,), (None,)], "k: int")
        fact = spark.createDataFrame([(1, "a"), (None, "b")], "k: int, v: string")
        out = bloom_semi_join(fact, dim, "k", expected_items=2)
        rows = [(r["k"], r["v"]) for r in out.collect()]
        assert rows == [(1, "a")]

    def test_plan_broadcast_no_udf(self, spark, dim_fact):
        from etl_tools_rs_spark.plans.inspect import plan_report

        dim, fact = dim_fact
        spec = BloomSpec.for_items(2000)
        bloom = build_bloom(dim.select(F.col("k").alias("__bk")), "__bk", spec=spec)
        rep = plan_report(bloom_prune(fact, "k", bloom, spec))
        assert not rep.has_python_udf  # pure JVM bit math
        assert "BroadcastNestedLoopJoin" in rep.text or rep.has_broadcast_join
