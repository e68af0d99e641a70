"""Sources — the engine's scan surface.

Reference inventory (SURVEY §2.1): LocalFs (S1), S3 (S2), S3 listing (S3),
MySQL select (S4), generated/enumerate (S5/S6), string (S7), in-memory
mocks (S8/S9), queue consumers (S11). All are re-expressed as thin
DataFrameReader wrappers so Catalyst keeps pushdown/pruning.
"""

from etl_tools_rs_spark.sources.files import FileSource, list_files  # noqa: F401
from etl_tools_rs_spark.sources.generate import EnumerateSource  # noqa: F401
from etl_tools_rs_spark.sources.memory import (  # noqa: F401
    CsvLinesSource,
    JsonLinesSource,
    StringSource,
)
from etl_tools_rs_spark.sources.jdbc import JdbcSource  # noqa: F401
