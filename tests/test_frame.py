"""EngineFrame facade: chains must produce the identical plan as direct
operator calls (the facade adds surface, never semantics)."""

import json

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.frame import EngineFrame


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "ann", 30), (2, "bob", 20), (2, "bob", 20), (3, "cat", 40)],
        "id int, name string, age int",
    )


def test_chain_matches_direct_calls(spark, people):
    from etl_tools_rs_spark.operators.dedup import dedup_exact
    from etl_tools_rs_spark.operators.transform import transform

    docs = people.select(F.col("id").alias("doc_id"), F.col("name").alias("text"))
    chained = (
        EngineFrame(docs)
        .dedup_exact("text", "doc_id")
        .transform(cols={"flag": F.col("dup_count") > 1}, where=F.col("doc_id") > 0)
        .df
    )
    direct = transform(
        dedup_exact(docs, "text", "doc_id"),
        cols={"flag": F.col("dup_count") > 1},
        where=F.col("doc_id") > 0,
    )
    assert chained.schema == direct.schema
    assert sorted(map(tuple, chained.collect())) == sorted(map(tuple, direct.collect()))
    # same logical plan → same optimized plan modulo expression ids
    import re

    def norm(df):
        return re.sub(r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString())

    assert norm(chained) == norm(direct)


def test_getattr_passthrough_rewraps(spark, people):
    out = EngineFrame(people).filter(F.col("age") > 25).select("name")
    assert isinstance(out, EngineFrame)
    assert {r["name"] for r in out.df.collect()} == {"ann", "cat"}
    # non-DataFrame results come back raw
    assert EngineFrame(people).count() == 4


def test_read_validate_write_roundtrip(spark, people, tmp_path):
    from etl_tools_rs_spark.operators import validate as v

    src = tmp_path / "in"
    people.write.mode("overwrite").parquet(str(src))
    out = (
        EngineFrame.read(spark, str(src), format="parquet")
        .validate([v.not_null("id"), v.unique("id")])
        .df
    )
    got = {r["rule"]: r["violations"] for r in out.collect()}
    assert got == {"not_null_id": 0, "unique_id": 1}


def test_pipe_and_shards(spark, people, tmp_path):
    m = (
        EngineFrame(people)
        .pipe(lambda df: df.dropDuplicates(["id"]))
        .write_training_shards(str(tmp_path / "sh"), 2, key_cols=["id"])
    )
    assert m.total_rows == 3 and m.n_shards == 2
    manifest = json.loads((tmp_path / "sh" / "manifest.json").read_text())
    assert manifest["total_rows"] == 3


def test_round3_ops_chainable(spark):
    from etl_tools_rs_spark.frame import EngineFrame

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    ranks = EngineFrame(edges).pagerank(iterations=1).collect()
    assert len(ranks) == 2

    ev = spark.createDataFrame(
        [(1, 1, "A", 1.0), (1, 2, "B", 2.0)], "u int, t int, s string, x double"
    )
    hist = (
        EngineFrame(ev)
        .scd2_history(keys=["u"], value_cols=["s"], ts_col="t")
        .collect()
    )
    assert len(hist) == 2
    z = EngineFrame(ev).rolling_zscore("x", ["u"], ["t"]).collect()
    assert len(z) == 2
    cm = EngineFrame(ev).corr_matrix(["t", "x"]).collect()
    assert len(cm) == 1
    ca = EngineFrame(ev).cat_association("s", "s").collect()
    assert len(ca) == 1


def test_round3_late_ops_chainable(spark):
    docs = spark.createDataFrame(
        [(1, "shared-twenty-chars!! one"), (2, "shared-twenty-chars!! two")],
        "doc_id long, text string",
    )
    spans = EngineFrame(docs).duplicate_spans(k=10).collect()
    assert len(spans) == 2
    clean = EngineFrame(docs).remove_duplicate_spans(k=10).collect()
    assert {r.doc_id for r in clean} == {1, 2}
    split = EngineFrame(docs).leakage_safe_split({"train": 1.0}).collect()
    assert all(r.split == "train" for r in split)

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    sd = EngineFrame(vecs).semdedup(n_clusters=1, threshold=0.99).collect()
    assert len(sd) == 2
    pj = EngineFrame(vecs).jl_project(dim=2, out_dim=2).collect()
    assert len(pj) == 2

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src int, dst int"
    )
    tc = EngineFrame(edges).triangle_count().collect()
    assert all(r.triangles == 1 for r in tc)

    from etl_tools_rs_spark.operators.bpe import bpe_train

    merges = bpe_train(docs, "text", num_merges=2)
    toks = EngineFrame(docs).bpe_tokenize(merges).collect()
    assert all(len(r.bpe_tokens) > 0 for r in toks)


def test_round3_late_ops_chain(spark):
    """cap_per_group → quantile_sketch / heavy_hitters chain through the
    facade and equal the direct operator calls."""
    from etl_tools_rs_spark.operators.sample import cap_per_group

    df = spark.range(500).selectExpr(
        "cast(id % 5 as string) AS g",
        "cast(id as string) AS k",
        "cast(id as double) AS v",
    )
    via_facade = (
        EngineFrame(df).cap_per_group(by=["g"], k=20, key_col="k").df.collect()
    )
    direct = cap_per_group(df, by=["g"], k=20, key_col="k").collect()
    assert sorted(map(tuple, via_facade)) == sorted(map(tuple, direct))

    hh = EngineFrame(df).heavy_hitters("g", k=4)
    assert isinstance(hh, EngineFrame)
    qs = EngineFrame(df).quantile_sketch("v", "k", k=32)
    assert qs.count() == 32


def test_round4_curation_audio_chainable(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog and many other "
                "animals wander through green fields while birds sing "
                "quietly above distant hills during early morning light "
                "bringing fresh air for everyone around here today"),
            (2, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    flags = EngineFrame(docs).curation_flags().collect()
    assert {r.doc_id for r in flags} == {1, 2}
    assert next(r for r in flags if r.doc_id == 1).keep
    funnel = EngineFrame(docs).curation_funnel().collect()[0]
    assert funnel.n_total == 2 and funnel.n_kept == 1

    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 100)
    media = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, content binary"
    )
    af = EngineFrame(media).audio_features().collect()
    assert af[0].decode_ok == "ok" and af[0].rms == 0.0


def test_r5_facade_methods_match_direct_calls(spark):
    """The r5 facade additions (DSIR, keep-best, band index, golden
    records) must produce the identical optimized plan / values as the
    direct operator calls."""
    from etl_tools_rs_spark.operators.dedup import keep_best_per_group
    from etl_tools_rs_spark.operators.dsir import (
        dsir_log_weights,
        dsir_model_vector,
        dsir_score,
    )
    from etl_tools_rs_spark.operators.lsh_index import minhash_band_index

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "el gato aqui")],
        ["doc_id", "text"],
    )
    tgt = docs.filter(F.col("doc_id") < 3).select("text")

    direct = dsir_log_weights(docs, tgt, num_buckets=32)
    via = EngineFrame(docs).dsir_log_weights(tgt, num_buckets=32).df
    assert sorted(map(tuple, via.collect())) == sorted(
        map(tuple, direct.collect())
    )

    lr = dsir_model_vector(docs, tgt, num_buckets=32)
    assert (
        EngineFrame(docs).dsir_score(lr).df.collect()
        == dsir_score(docs, lr).collect()
    )

    idx_direct = minhash_band_index(docs, num_hashes=8, bands=2)
    idx_via = EngineFrame(docs).minhash_band_index(num_hashes=8, bands=2).df
    assert sorted(map(tuple, idx_via.collect())) == sorted(
        map(tuple, idx_direct.collect())
    )

    q = spark.createDataFrame([(1, 5), (2, 9), (3, 1)], ["doc_id", "q"])
    groups = spark.createDataFrame([(1, 1), (2, 1)], ["member_id", "group_id"])
    kb_direct = keep_best_per_group(q, groups, "q")
    kb_via = EngineFrame(q).keep_best_per_group(groups, "q").df
    assert sorted(map(tuple, kb_via.collect())) == sorted(
        map(tuple, kb_direct.collect())
    )
