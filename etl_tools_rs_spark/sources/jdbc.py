"""JDBC source — relational database scans.

Reference parity: ``MySqlSelect<T>`` runs a SELECT (optionally with bound
params) and streams rows (reference: etl-mysql/src/datastore.rs:44-62,624-666).

Spark-first: ``spark.read.format("jdbc")`` with either ``dbtable`` or a
pushed-down ``query``. For scale, expose partitioned reads
(partitionColumn/lowerBound/upperBound/numPartitions) so a large table scan
fans out across executors instead of a single serial cursor — the reference
is single-connection; this is the 100 TB upgrade.

No JDBC driver jar ships in this container, so ``to_df`` raises a clear
error if the driver class is missing; unit tests cover option construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str  # e.g. jdbc:mysql://host:3306/db
    query: str | None = None  # pushed-down SELECT (reference .query/.query_as)
    table: str | None = None  # alternative: full-table scan
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    # partitioned-read knobs (scale path; reference has no equivalent)
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    fetchsize: int = 10_000

    def options(self) -> dict[str, str]:
        if (self.query is None) == (self.table is None):
            raise ValueError("exactly one of query/table required")
        opts: dict[str, str] = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.query is not None:
            opts["query"] = self.query
        else:
            opts["dbtable"] = self.table  # type: ignore[assignment]
        for k, v in (
            ("user", self.user),
            ("password", self.password),
            ("driver", self.driver),
            ("partitionColumn", self.partition_column),
            ("lowerBound", self.lower_bound),
            ("upperBound", self.upper_bound),
            ("numPartitions", self.num_partitions),
        ):
            if v is not None:
                opts[k] = str(v)
        return opts

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.options()).load()
