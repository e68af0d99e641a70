"""Composed curation funnel (operators/curation.py) — stage semantics,
sequential-filter equivalence, and plan shape."""

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.operators.curation import curation_flags, curation_funnel

EN = (
    "the quick brown fox jumps over a lazy dog and many other animals "
    "wander through green fields while birds sing quietly above distant "
    "hills during early morning light bringing fresh air for everyone "
    "around here today"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, EN),                          # clean English — survives
        (2, EN.upper()),                  # exact dup of 1 under normalization
        (3, "der die das und nicht ist " * 8),   # German markers
        (4, "tiny doc"),                  # fails min_tokens
        (5, "spam " * 60),                # repetition: dup_word_frac ~ 1
        (6, EN + " extra unique tail"),   # near-but-not-exact of 1 — survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_flags_and_keep(spark, docs):
    out = {r["doc_id"]: r for r in curation_flags(docs).collect()}
    assert len(out) == 6
    assert out[1]["keep"] and out[1]["pass_lang"] and out[1]["pass_quality"]
    # dup of 1: passes both filters but loses canonicalization to min id
    assert out[2]["pass_lang"] and out[2]["pass_quality"] and not out[2]["keep"]
    assert out[3]["lang_pred"] == "de" and not out[3]["pass_lang"]
    assert not out[4]["pass_quality"] and not out[4]["keep"]
    assert not out[5]["pass_quality"]  # dup_word_frac way over 0.6
    assert out[6]["keep"]              # distinct content, own canonical


def test_matches_sequential_filter_chain(spark, docs):
    """keep == running the three standalone stages one after another."""
    from etl_tools_rs_spark.functions import fingerprint
    from etl_tools_rs_spark.operators.text import gopher_filter, lang_id

    s1 = docs.withColumn("_l", lang_id("text")).filter(F.col("_l") == "en")
    s2 = gopher_filter(
        s1, "text", min_tokens=30, max_dup_word_frac=0.6,
        max_top_word_frac=0.12,
    ).filter("keep")
    canon = (
        s2.withColumn("_fp", fingerprint("text"))
        .groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
    )
    expect = {r["doc_id"] for r in canon.collect()}
    got = {
        r["doc_id"]
        for r in curation_flags(docs).filter("keep").collect()
    }
    assert got == expect


def test_funnel_counts_monotone(spark, docs):
    row = curation_funnel(docs).collect()[0]
    assert row["n_total"] == 6
    assert row["n_total"] >= row["n_lang"] >= row["n_quality"] >= row["n_kept"]
    assert row["n_kept"] == 2  # docs 1 and 6


def test_one_scan_no_extra_shuffles(spark, docs):
    """The filter stages must fuse — the plan's only exchanges are the
    dedup groupBy + join-back (plus AQE reuse), never a per-stage
    shuffle of the corpus."""
    plan = (
        curation_flags(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_report_values(spark, docs):
    from etl_tools_rs_spark.operators.curation import corpus_report

    row = corpus_report(docs).collect()[0]
    assert row["n_docs"] == 6
    # docs 1 and 2 are exact dups under normalization: 6 docs, 5 distinct
    assert row["exact_dup_rate"] == int(10000 * 1 / 6) / 10000.0
    # quality passers: 1, 2, 6
    assert row["quality_pass_rate"] == 0.5
    assert row["n_tokens_total"] > 0
    assert 0.0 <= row["lang_share"] <= 1.0
