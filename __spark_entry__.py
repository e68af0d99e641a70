"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry from
``etl_tools_rs_spark.queries`` (one entry per implemented operator from
SURVEY.md §2 plus the extension ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_tools_rs_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-style pricing summary) on /root/testdata/sf0.001."""
    return _registry.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
