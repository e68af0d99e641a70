"""Training-shard writer (sinks/shards.py)."""

import pytest
from pyspark.sql import functions as F

from etl_tools_rs_spark.sinks import shards as sh


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(1000).select(
        F.col("id"), F.concat(F.lit("doc-"), F.col("id")).alias("text")
    )


def test_one_file_per_shard_and_manifest(spark, corpus, tmp_path):
    out = str(tmp_path / "shards")
    m = sh.write_training_shards(corpus, out, 8, key_cols=["id"])
    assert m.n_shards == 8 and m.total_rows == 1000
    assert len(m.shards) == 8
    assert all(s["files"] == 1 for s in m.shards)
    assert all(s["rows"] > 0 for s in m.shards)  # 1000 rows over 8 hash shards
    assert sum(s["rows"] for s in m.shards) == 1000
    assert m.total_bytes == sum(s["bytes"] for s in m.shards) > 0
    # manifest round-trips through the FS
    loaded = sh.read_manifest(spark, out)
    assert loaded["total_rows"] == 1000
    assert loaded["shards"] == m.shards


def test_assignment_deterministic_and_salted(spark, corpus, tmp_path):
    a = sh.write_training_shards(corpus, str(tmp_path / "a"), 8, key_cols=["id"])
    b = sh.write_training_shards(corpus, str(tmp_path / "b"), 8, key_cols=["id"])
    assert [s["rows"] for s in a.shards] == [s["rows"] for s in b.shards]
    c = sh.write_training_shards(
        corpus, str(tmp_path / "c"), 8, key_cols=["id"], salt=7
    )
    assert [s["rows"] for s in a.shards] != [s["rows"] for s in c.shards]


def test_rows_land_in_their_hash_shard(spark, corpus, tmp_path):
    out = str(tmp_path / "verify")
    sh.write_training_shards(corpus, out, 4, key_cols=["id"])
    back = spark.read.parquet(out).withColumn(
        "_expect", sh.shard_assignment(["id"], 4)
    )
    assert back.filter(F.col(sh.SHARD_COL) != F.col("_expect")).count() == 0
    # full content round-trip
    assert back.select("id", "text").exceptAll(corpus).count() == 0
    assert corpus.exceptAll(back.select("id", "text")).count() == 0


def test_order_within_shard(spark, corpus, tmp_path):
    out = str(tmp_path / "ordered")
    sh.write_training_shards(corpus, out, 2, key_cols=["id"], order_by=["id"])
    for k in (0, 1):
        ids = [
            r["id"]
            for r in spark.read.parquet(f"{out}/{sh.SHARD_COL}={k}").collect()
        ]
        assert ids == sorted(ids)


def test_rejects_bad_shard_count(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        sh.write_training_shards(corpus, str(tmp_path / "x"), 0)
