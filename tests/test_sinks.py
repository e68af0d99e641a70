"""Sink surface: file round-trips, noop counting, JDBC option mapping and
the row-level dead-letter path (reference K1-K5, SURVEY §2.2)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_tools_rs_spark.sinks.files import FileSink
from etl_tools_rs_spark.sinks.jdbc import JdbcSink, write_with_dlq
from etl_tools_rs_spark.sinks.noop import NoopSink
from etl_tools_rs_spark.sources.jdbc import JdbcSource


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(20)],
        "id int, name string, score double",
    )


def test_file_sink_parquet_roundtrip(spark, df, tmp_path):
    path = str(tmp_path / "out_parquet")
    FileSink(path, format="parquet").write(df)
    back = spark.read.parquet(path)
    assert back.count() == 20
    assert set(back.columns) == {"id", "name", "score"}


def test_file_sink_csv_single_file(spark, df, tmp_path):
    # reference LocalFs writes ONE file (fs.rs:184-242) — opt-in parity knob
    path = str(tmp_path / "out_csv")
    FileSink(path, format="csv", single_file=True).write(df)
    import glob

    parts = glob.glob(f"{path}/part-*")
    assert len(parts) == 1
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 20


def test_file_sink_partition_by(spark, df, tmp_path):
    path = str(tmp_path / "out_part")
    FileSink(
        path, format="parquet", partition_by=["name"]
    ).write(df.withColumn("name", F.lit("a")))
    back = spark.read.parquet(path)
    assert back.count() == 20
    import os

    assert any(e.startswith("name=") for e in os.listdir(path))


def test_noop_sink_counts(df):
    assert NoopSink().write(df) == 20


def test_jdbc_source_options():
    src = JdbcSource(
        url="jdbc:mysql://h:3306/db",
        query="SELECT * FROM t WHERE x > 1",
        user="u",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
    )
    opts = src.options()
    assert opts["query"].startswith("SELECT")
    assert opts["numPartitions"] == "8"
    with pytest.raises(ValueError):
        JdbcSource(url="x").options()  # neither query nor table
    with pytest.raises(ValueError):
        JdbcSource(url="x", query="q", table="t").options()  # both


def test_jdbc_sink_defaults():
    sink = JdbcSink(url="jdbc:mysql://h/db", table="t")
    assert sink.batch_size == 60  # reference on_put_num_rows default


def test_write_with_dlq(spark):
    """Batch fails → row-by-row retry → poison rows dead-lettered
    (reference datastore.rs:264-288)."""
    df = spark.createDataFrame(
        [(i,) for i in range(10)], "id int"
    ).coalesce(1)

    import tempfile
    import os
    import json

    tmp = tempfile.mkdtemp()
    ok_path = os.path.join(tmp, "ok.jsonl")
    dlq_path = os.path.join(tmp, "dlq.jsonl")

    def insert_batch(rows):
        # poison value 7 fails any batch containing it
        if any(r.id == 7 for r in rows):
            raise RuntimeError("constraint violation")
        with open(ok_path, "a") as f:
            for r in rows:
                f.write(json.dumps({"id": r.id}) + "\n")

    def on_failed_row(row, exc):
        with open(dlq_path, "a") as f:
            f.write(json.dumps({"id": row.id, "err": str(exc)}) + "\n")

    write_with_dlq(df, insert_batch, on_failed_row, batch_size=4)

    ok_ids = [json.loads(l)["id"] for l in open(ok_path)]
    dlq_ids = [json.loads(l)["id"] for l in open(dlq_path)]
    assert sorted(ok_ids) == [0, 1, 2, 3, 4, 5, 6, 8, 9]
    assert dlq_ids == [7]


def test_orc_roundtrip(spark, tmp_path):
    """ORC sink → source round-trip (columnar alternative to parquet —
    same native vectorized reader path)."""
    from etl_tools_rs_spark.sinks.files import FileSink
    from etl_tools_rs_spark.sources.files import FileSource

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, s string, v double"
    )
    path = str(tmp_path / "orc_out")
    FileSink(path, format="orc").write(df)
    back = FileSource([path], format="orc", with_source=False).to_df(spark)
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 1.5), (2, "b", 2.5),
    ]


def test_write_with_dlq_byte_budget_flush(spark):
    """Packet guard parity (reference datastore.rs:198-216): a batch
    flushes when the byte budget is hit BEFORE the row cap."""
    import json
    import os
    import tempfile

    # 6 rows of ~100-byte payload, byte cap 250 → flushes of 2-3 rows even
    # though batch_size=60 would hold all six
    df = spark.createDataFrame([("x" * 100,) for _ in range(6)], "v string").coalesce(1)
    tmp = tempfile.mkdtemp()
    sizes_path = os.path.join(tmp, "sizes.jsonl")

    def insert_batch(rows):
        with open(sizes_path, "a") as f:
            f.write(json.dumps(len(rows)) + "\n")

    write_with_dlq(
        df, insert_batch, lambda r, e: None, batch_size=60, max_batch_bytes=250
    )
    sizes = [json.loads(l) for l in open(sizes_path)]
    assert sum(sizes) == 6
    assert max(sizes) <= 3  # byte cap kicked in before the 60-row cap
    assert len(sizes) >= 2


def test_sql_insert_batch_map_query_rewrite(spark):
    """map_query hook parity (reference PreInsertFn, datastore.rs:22,40,
    365-371): the rendered INSERT is rewritten before execution."""
    import os
    import tempfile

    from etl_tools_rs_spark.sinks.jdbc import render_insert, sql_insert_batch

    df = spark.createDataFrame(
        [(1, "Alice"), (2, "O'Brien")], "id int, name string"
    ).coalesce(1)
    tmp = tempfile.mkdtemp()
    sql_path = os.path.join(tmp, "sql.log")

    def execute(sql):
        with open(sql_path, "a") as f:
            f.write(sql + "\n---\n")

    def map_query(sql):
        return sql + " ON DUPLICATE KEY UPDATE `name`=VALUES(`name`)"

    batch = sql_insert_batch(execute, "`db`.`people`", map_query=map_query)
    write_with_dlq(df, batch, lambda r, e: None, batch_size=60)

    stmts = open(sql_path).read().split("\n---\n")
    stmts = [s for s in stmts if s.strip()]
    assert len(stmts) == 1
    s = stmts[0]
    assert s.startswith("INSERT INTO `db`.`people` (`id`,`name`)")
    assert s.endswith("ON DUPLICATE KEY UPDATE `name`=VALUES(`name`)")
    assert "'O''Brien'" in s  # literal escaping

    # render_insert alone: reference statement shape
    r = render_insert("`d`.`t`", ["a"], df.select("id").limit(1).collect())
    assert r.splitlines()[0] == "INSERT INTO `d`.`t` (`a`) "
