"""File sinks: local filesystem and object stores (one code path).

Reference parity:
- ``LocalFs`` output — writes records to a single local file, truncating
  (reference: etl-core/src/datastore/fs.rs:184-242).
- ``S3Storage`` output — 30 MB multipart upload, abort on failure
  (reference: etl-aws-utils/src/s3_datastore.rs:89-129,273-394).
- CSV/JSON encoders (reference: etl-core/src/encoder.rs:35-218) fuse into
  the writer format; no separate EncodedOutput glue is needed.

Spark-first: ``df.write`` with format options; S3 multipart/retry is the
committer's job. The reference writes ONE file per sink — that is a
single-writer bottleneck at scale, so the engine default is parallel
many-file output and ``single_file=True`` is an explicit opt-in (coalesce(1),
documented as a small-output-only knob).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from etl_tools_rs_spark.sources.files import CsvOptions


@dataclass
class FileSink:
    path: str
    format: str = "parquet"  # text | csv | json | parquet | orc | xml
    mode: str = "overwrite"  # reference LocalFs truncates → overwrite default
    csv_options: CsvOptions = field(default_factory=CsvOptions)
    single_file: bool = False
    partition_by: list[str] = field(default_factory=list)
    compression: str | None = None
    xml_row_tag: str = "row"  # xml only

    def write(self, df: DataFrame) -> None:
        if self.single_file:
            # parity knob with the reference's one-file outputs; loudly the
            # slow path — all rows funnel through one writer task.
            df = df.coalesce(1)
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        if self.compression:
            w = w.option("compression", self.compression)
        if self.format == "csv":
            # writer-side dialect: quote_style/terminator/double_quote
            # (reference CsvWriteOptions, etl-core/src/datastore/mod.rs:284-297)
            w = w.options(**self.csv_options.to_spark_write())
        elif self.format == "xml":
            w = w.option("rowTag", self.xml_row_tag)
        w.format(self.format).save(self.path)


@dataclass
class BucketedTableSink:
    """Bucketed managed table — the co-located-join primitive.

    Writing two fact tables bucketed by the same key into the same number
    of buckets lets every subsequent equi-join/groupBy on that key run
    WITHOUT a shuffle: each task reads matching bucket files from both
    sides. At 100 TB this converts the nightly fact-fact join from a
    full-network shuffle into a local merge — the single biggest plan win
    available to a pipeline author (Spark bucketing requires saveAsTable;
    plain path writes cannot carry bucket metadata).

    `tests/test_plans.py::test_bucketed_join_no_shuffle` pins the
    zero-Exchange plan.
    """

    table: str
    bucket_by: list[str]
    num_buckets: int = 8
    sort_by: list[str] | None = None
    format: str = "parquet"
    mode: str = "overwrite"

    def write(self, df: DataFrame) -> None:
        w = df.write.format(self.format).mode(self.mode).bucketBy(
            self.num_buckets, *self.bucket_by
        )
        if self.sort_by:
            w = w.sortBy(*self.sort_by)
        w.saveAsTable(self.table)
