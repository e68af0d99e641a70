"""Null sink: consume the frame, return the row count.

Reference parity: ``MockJsonDataOutput`` — serialize, log, count
(etl-core/src/datastore/mock.rs:16-76). Spark's ``noop`` format executes the
full plan without writing; we count via observe-free ``count()`` for the
stats contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class NoopSink:
    use_noop_format: bool = False

    def write(self, df: DataFrame) -> int:
        if self.use_noop_format:
            df.write.format("noop").mode("overwrite").save()
            return -1  # noop format reports no counts
        return df.count()
