"""The examples/ scripts must stay runnable — they are the engine's
user-facing pipeline shapes."""

import importlib.util
import json
import sys


def _load(path):
    spec = importlib.util.spec_from_file_location("example_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_json_corpus_pipeline_end_to_end(spark, tmp_path, capsys):
    mod = _load("examples/json_corpus_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["corrupt_records"] == 2
    assert out["deduped_rows"] == 40
    assert out["sharded_rows"] == 40
    assert set(out["steps"].values()) == {"Complete"}

    # re-run: every step skips via persisted state (reference O3 semantics)
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["deduped_rows"] is None  # skipped steps return None
    assert set(again["steps"].values()) == {"Complete"}


def test_training_data_pipeline_end_to_end(spark, tmp_path, capsys):
    mod = _load("examples/training_data_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["input_docs"] == 500
    # each stage monotonically shrinks the corpus and none empties it
    chain = [
        out["input_docs"], out["after_quality"], out["after_dedup"],
        out["after_decontaminate"],
    ]
    assert chain == sorted(chain, reverse=True) and chain[-1] > 0
    assert out["packed_sequences"] == out["after_decontaminate"]
    assert set(out["steps"].values()) == {"Complete"}

    # resumability: second run skips all steps
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["after_dedup"] is None
    assert set(again["steps"].values()) == {"Complete"}


def test_curation_models_pipeline_end_to_end(spark, tmp_path, capsys):
    mod = _load("examples/curation_models_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["classifier_weights"] == 4  # intercept + 3 features
    assert out["bpe_merges"] == 8
    assert out["split_rows"] > 0
    assert out["flagged_docs"] >= 0
    assert set(out["steps"].values()) == {"Complete"}

    # resumability: second run skips all steps
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["bpe_merges"] is None
    assert set(again["steps"].values()) == {"Complete"}


def test_mixture_pipeline_end_to_end(spark, tmp_path, capsys):
    mod = _load("examples/mixture_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the draw respects the budget (expected-value sampling + hard cap)
    assert 0 < out["drawn"] <= out["budget"] * 1.1
    assert set(out["steps"].values()) == {"Complete"}

    # resumability: second run skips all steps
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["drawn"] is None  # skipped step returns None
    assert set(again["steps"].values()) == {"Complete"}


def test_multimodal_dedup_pipeline_end_to_end(spark, tmp_path, capsys):
    mod = _load("examples/multimodal_dedup_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # every 4th asset in each of 3 modalities has one twin -> 6 clusters
    # of size 2, one drop each
    assert out["dropped"] == 6
    assert set(out["steps"].values()) == {"Complete"}

    # resumability: second run skips all steps
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["dropped"] is None
    assert set(again["steps"].values()) == {"Complete"}


def test_governance_pipeline_end_to_end(spark, tmp_path, capsys):
    mod = _load("examples/governance_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["steps"].values()) == {"Complete"}
    rep = out["purge_report"]
    assert set(rep) == {"customer", "orders", "lineitem"}
    # the cascade purged someone, and kept+purged is conserved per table
    assert rep["customer"]["purged"] >= 1
    assert rep["orders"]["purged"] >= 1

    # resumability: second run skips all steps
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(again["steps"].values()) == {"Complete"}


def test_incremental_crawl_pipeline_end_to_end(spark, tmp_path, capsys):
    """r6 example (VERDICT r5 #9): the daily-crawl lifecycle — and the
    TWO-DELTA INDUCTION: pairs found incrementally across day 1 + day 2
    must equal the batch full-rebuild pairs restricted to pairs
    touching a non-day-0 doc (the equivalence law extended one more
    step: day 2 runs against state PRODUCED by day 1)."""
    from pyspark.sql import functions as F

    mod = _load("examples/incremental_crawl_pipeline.py")
    assert mod.main(str(tmp_path)) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["day0_docs"] > 0 and out["day1"]["kept"] > 0
    assert out["retention"]["expired"] > 0  # r8: the freshness sweep cut
    assert out["sharded_rows"] == out["selected"]
    assert set(out["steps"].values()) == {"Complete"}
    # r8: after the retention sweep, no band row may reference a corpus
    # doc older than the cutoff, and every KEPT corpus doc still has its
    # band rows (the index-store consistency the sweep promises)
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    index = spark.read.parquet(str(tmp_path / "index"))
    assert corpus.filter(F.col("crawl_date") < F.lit("2026-01-06")).count() == 0
    n_missing = (
        corpus.select("doc_id")
        .join(index.select("doc_id").distinct(), "doc_id", "left_anti")
        .count()
    )
    assert n_missing == 0

    # induction: replay both deltas' pair sets from the persisted state
    # law — batch rebuild over ALL docs, restricted to pairs touching a
    # day-1/day-2 doc, must equal the union of the incremental pairs
    from etl_tools_rs_spark.operators.dedup import dedup_minhash_lsh
    from etl_tools_rs_spark.operators.lsh_index import (
        incremental_near_dup,
        minhash_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    day = F.col("doc_id") % 3
    kw = dict(num_hashes=16, bands=4, shingle_n=3, hash_family="md5")
    d0, d1, d2 = (docs.filter(day == t) for t in (0, 1, 2))
    idx0 = minhash_band_index(d0, "text", "doc_id", **kw)
    p1, idx1 = incremental_near_dup(
        idx0, d0, d1, "text", "doc_id", threshold=0.5, **kw
    )
    p2, _ = incremental_near_dup(
        idx1, d0.unionByName(d1), d2, "text", "doc_id", threshold=0.5, **kw
    )
    incr = {
        frozenset((r.id_a, r.id_b))
        for df in (p1, p2)
        for r in df.collect()
    }
    new_ids = {r.doc_id for r in d1.unionByName(d2).select("doc_id").collect()}
    batch = {
        frozenset((r.id_a, r.id_b))
        for r in dedup_minhash_lsh(docs, threshold=0.5, **kw).collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }
    assert incr == batch and len(incr) > 0

    # resumability: second run skips every step via persisted state
    assert mod.main(str(tmp_path)) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["day1"] is None  # skipped steps return None
    assert set(again["steps"].values()) == {"Complete"}
