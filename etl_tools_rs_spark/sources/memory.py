"""In-memory sources (test/mock surface).

Reference parity:
- ``String`` as a source of its lines (etl-core/src/datastore/sources/string.rs:5-29)
- ``MockJsonDataSource`` — vector of JSON strings → typed records, bad lines
  as in-band errors (etl-core/src/datastore/mock.rs:80-142)
- ``MockCsvDataSource`` — in-memory CSV lines with header + dialect
  (etl-core/src/datastore/mock/mock_csv.rs:5-98)

Spark-first: createDataFrame of the raw lines, then the same PERMISSIVE
decode path as file sources — identical error-as-record semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tools_rs_spark.sources.files import CORRUPT_COL, CsvOptions


def _lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


@dataclass
class StringSource:
    """A string is a source of its lines (reference sources/string.rs)."""

    text: str

    def to_df(self, spark: SparkSession) -> DataFrame:
        return _lines_df(spark, self.text.splitlines())


@dataclass
class JsonLinesSource:
    """NDJSON lines → rows; malformed lines land in ``_corrupt_record``."""

    lines: list[str]
    schema: str | None = None

    def to_df(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql.types import StringType, StructType

        raw = _lines_df(spark, self.lines)
        if self.schema is None:
            # infer from the good lines
            sample = spark.read.json(raw.rdd.map(lambda r: r.value))
            inferred = [
                f for f in sample.schema.fields if f.name != CORRUPT_COL
            ]
            schema = StructType(inferred)
        else:
            schema = StructType.fromDDL(self.schema)
        # the corrupt column must live INSIDE the from_json schema:
        # PERMISSIVE mode fills it for malformed lines (a null-struct check
        # does not work — Spark returns an all-null row, not a null struct)
        if CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(CORRUPT_COL, StringType())
        parsed = raw.select(
            F.from_json(
                "value",
                schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("j")
        )
        return parsed.select("j.*")


@dataclass
class CsvLinesSource:
    """In-memory CSV with header line + dialect options."""

    lines: list[str]
    csv_options: CsvOptions = field(default_factory=CsvOptions)
    schema: str | None = None

    def to_df(self, spark: SparkSession) -> DataFrame:
        ds = spark.createDataFrame([(ln,) for ln in self.lines], "value string").rdd.map(
            lambda r: r.value
        )
        opts = self.csv_options.to_spark()
        reader = spark.read.options(**opts)
        if self.schema:
            schema = self.schema
            if CORRUPT_COL not in schema:
                schema = f"{schema}, {CORRUPT_COL} string"
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(ds)
