"""Streaming sources.

- ``rate_stream``: EnumerateStream-with-pause parity (enumerate.rs:6-59 —
  a generated source with optional pause between records) via Spark's
  ``rate`` source: value = the enumeration index, rowsPerSecond = 1/pause.
- ``file_stream``: unbounded directory tail (the streaming upgrade of the
  LocalFs/S3 sources; ``maxFilesPerTrigger`` is the backpressure analogue
  of the reference's channel(1), SURVEY §4.2).
- queue consumers (QueueClient parity) map to the Kafka source; no broker
  exists in this container, so ``kafka_stream`` constructs options only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def rate_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """Unbounded enumerator: (timestamp, value) with value = index."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def file_stream(
    spark: SparkSession,
    path: str,
    format: str = "text",
    schema: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    r = spark.readStream.format(format)
    if schema:
        r = r.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.load(path)


def kafka_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """Option dict for the Kafka source (QueueClient parity; ack ≈ the
    streaming checkpoint commit, SURVEY §2.5 P4)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
