"""Source surface: PERMISSIVE error-as-record parity with the reference's
decoders (SURVEY §2.1/§2.3: S1 LocalFs, S7 String, S8/S9 mocks, T6/T7
decoders, S5 enumerate)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_tools_rs_spark.sources.files import (
    CORRUPT_COL,
    SOURCE_COL,
    CsvOptions,
    FileSource,
    list_files,
    split_ok_err,
)
from etl_tools_rs_spark.sources.generate import EnumerateSource, enumerate_pandas
from etl_tools_rs_spark.sources.memory import (
    CsvLinesSource,
    JsonLinesSource,
    StringSource,
)
from tests.conftest import F1_LINES


def test_json_file_source_error_as_record(spark, fixture_dir):
    # reference contract: 10 lines, 1 malformed → 9 ok / 1 in-band error
    df = FileSource(
        [str(fixture_dir / "10_lines.ndjson")],
        format="json",
        schema="index string, words string",
    ).to_df(spark)
    # cache: Spark refuses corrupt-column-only queries on a raw scan
    df = df.cache()
    ok, err = split_ok_err(df)
    assert ok.count() == 9
    assert err.count() == 1
    # provenance travels with the data (reference mod.rs:53-54)
    assert SOURCE_COL in df.columns
    src = ok.select(SOURCE_COL).distinct().collect()
    assert len(src) == 1 and src[0][0].endswith("10_lines.ndjson")


def test_csv_file_source_clean(spark, fixture_dir):
    df = FileSource(
        [str(fixture_dir / "14_good_lines.csv")],
        format="csv",
        schema="index string, words string",
    ).to_df(spark)
    df = df.cache()
    ok, err = split_ok_err(df)
    assert ok.count() == 14
    assert err.count() == 0
    row = ok.filter(F.col("index") == "3").collect()[0]
    assert row["words"] == "some, quoted words"


def test_csv_dialect_options(spark):
    # custom delimiter + comment line (reference CsvReadOptions surface)
    src = CsvLinesSource(
        ["# a comment", "a|b", "1|x", "2|y"],
        csv_options=CsvOptions(delimiter="|", comment="#"),
        schema="a int, b string",
    )
    rows = src.to_df(spark).drop(CORRUPT_COL).collect()
    assert sorted((r.a, r.b) for r in rows) == [(1, "x"), (2, "y")]


def test_csv_strict_schema_corrupt_rows(spark):
    # F3 analogue: rows that violate the typed schema become corrupt records
    src = CsvLinesSource(
        ["id,qty", "1,10", "2,notanint", "3,30"],
        schema="id int, qty int",
    )
    ok, err = split_ok_err(src.to_df(spark))
    assert ok.count() == 2
    assert err.count() == 1


def test_json_lines_source_f1_mix(spark):
    # F1: 3 ok / 2 malformed (simple-pipeline.rs:61-63)
    df = JsonLinesSource(
        F1_LINES, schema="name string, todo array<string>, id string"
    ).to_df(spark)
    ok, err = split_ok_err(df)
    assert ok.count() == 3
    assert err.count() == 2
    ang = ok.filter(F.col("id") == "ang1").collect()[0]
    assert ang["todo"] == ["paint fence", "buy paint"]


def test_string_source_lines(spark):
    # F6: a 4-line string streams as 4 records (task-apply.rs:6-22)
    df = StringSource("\nline two\nline three\nline four").to_df(spark)
    assert df.count() == 4


def test_enumerate_source(spark):
    # S5: distributed generated source (enumerate.rs:6-59)
    df = EnumerateSource(
        max=100, create=lambda idx: {"sq": idx * idx}, num_partitions=4
    ).to_df(spark)
    rows = df.orderBy("id").collect()
    assert len(rows) == 100
    assert rows[7]["sq"] == 49
    assert df.rdd.getNumPartitions() == 4


def test_enumerate_pandas(spark):
    # S6: async/imperative creates run Arrow-batched, not per-row
    def gen(batches):
        for pdf in batches:
            pdf["doubled"] = pdf["id"] * 2
            yield pdf

    df = enumerate_pandas(spark, 10, gen, schema="id long, doubled long")
    assert df.filter(F.col("doubled") == 18).count() == 1


def test_list_files_regex(tmp_path):
    # S3 parity: prefix listing with regex filter (s3_utils.rs:9-46)
    for name in ["a_1.csv", "a_2.csv", "b_1.json"]:
        (tmp_path / name).write_text("x")
    assert len(list_files(str(tmp_path))) == 3
    assert len(list_files(str(tmp_path), regex=r"a_\d+\.csv$")) == 2
    assert len(list_files(str(tmp_path), glob="*.json")) == 1


def test_xml_roundtrip(spark, tmp_path):
    from etl_tools_rs_spark.sinks.files import FileSink
    from etl_tools_rs_spark.sources.files import FileSource

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta <&> gamma")], "id int, name string"
    )
    out = str(tmp_path / "xml_out")
    FileSink(path=out, format="xml", xml_row_tag="rec").write(df)
    back = FileSource(paths=[out], format="xml", xml_row_tag="rec").to_df(spark)
    got = sorted((r.id, r.name) for r in back.select("id", "name").collect())
    # special chars survive the XML escape round-trip
    assert got == [(1, "alpha"), (2, "beta <&> gamma")]
    assert "_source" in back.columns
