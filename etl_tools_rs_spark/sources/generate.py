"""Generated sources.

Reference parity: EnumerateStream / EnumerateStreamAsync — a source that
calls ``create(&state, idx) -> O`` for idx in 0..max, optionally paused
(reference: etl-core/src/datastore/enumerate.rs:6-135).

Spark-first: ``spark.range(n)`` is the distributed enumerator; the per-index
create function is a column expression (preferred — JVM-side) or a pandas
batch function (for genuinely imperative/async creates). The no-max +
pause variant maps to the ``rate`` streaming source (see streaming/).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession


@dataclass
class EnumerateSource:
    """``EnumerateSource(max=n, create=lambda idx_col: {...}).to_df(spark)``.

    ``create`` receives the ``id`` Column and returns a dict of column-name →
    Column, evaluated distributed via ``spark.range`` (splits across
    executors; no driver loop).
    """

    max: int
    create: Callable[[Column], dict[str, Column]] | None = None
    num_partitions: int | None = None

    def to_df(self, spark: SparkSession) -> DataFrame:
        rng = (
            spark.range(0, self.max, 1, self.num_partitions)
            if self.num_partitions
            else spark.range(self.max)
        )
        if self.create is None:
            return rng
        cols = self.create(rng["id"])
        out = rng
        for name, col in cols.items():
            out = out.withColumn(name, col)
        return out


def enumerate_pandas(
    spark: SparkSession,
    max: int,
    fn: Callable,
    schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """EnumerateStreamAsync parity (enumerate.rs:61-135): per-index creates
    that need Python (e.g. API calls) run as Arrow-batched ``mapInPandas``
    over the distributed range — batched, not per-row."""
    rng = (
        spark.range(0, max, 1, num_partitions) if num_partitions else spark.range(max)
    )
    return rng.mapInPandas(fn, schema=schema)
