"""Sinks — the engine's write surface.

Reference inventory (SURVEY §2.2): LocalFs output (K1), S3 multipart output
(K2), MySQL batched insert with dead-letter (K3), null sink (K4), queue/SQS
publish (K5/K6), SimpleStore document store (K7).
"""

from etl_tools_rs_spark.sinks.files import BucketedTableSink, FileSink  # noqa: F401
from etl_tools_rs_spark.sinks.jdbc import JdbcSink  # noqa: F401
from etl_tools_rs_spark.sinks.noop import NoopSink  # noqa: F401
from etl_tools_rs_spark.sinks.simple_store import SimpleStore  # noqa: F401
