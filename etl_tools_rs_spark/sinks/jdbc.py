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


def _row_bytes(row: Row) -> int:
    """Approximate encoded size of one row's VALUES tuple — the analogue of
    the reference's num_bytes accumulation over joined value strings
    (datastore.rs:207-216)."""
    return sum(len(str(v)) for v in row) + 3 * len(row)


def write_with_dlq(
    df: DataFrame,
    insert_batch: Callable[[list[Row]], None],
    on_failed_row: Callable[[Row, Exception], None],
    batch_size: int = 60,
    max_batch_bytes: int = 4_000_000,
) -> None:
    """Row-level dead-letter write path (reference datastore.rs:264-288:
    batch failure → retry one-by-one → dead-letter the stragglers).

    ``insert_batch`` runs per executor partition (create the DB client
    inside it, once per partition); rows that fail individually go to
    ``on_failed_row`` instead of failing the job.

    Batches flush at ``batch_size`` rows OR ``max_batch_bytes`` of encoded
    values, whichever comes first — the reference's 4 MB
    ``max_allowed_packet`` guard (datastore.rs:198-216) made a hard flush
    trigger instead of a console warning.
    """

    def _part(rows: Iterable[Row]) -> None:
        buf: list[Row] = []
        buf_bytes = 0

        def flush() -> None:
            nonlocal buf_bytes
            if not buf:
                return
            try:
                insert_batch(list(buf))
            except Exception:
                # batch failed: retry one-by-one; dead-letter the failures
                for r in buf:
                    try:
                        insert_batch([r])
                    except Exception as e:  # noqa: BLE001 — row goes to DLQ
                        on_failed_row(r, e)
            buf.clear()
            buf_bytes = 0

        for row in rows:
            buf.append(row)
            buf_bytes += _row_bytes(row)
            if len(buf) >= batch_size or buf_bytes >= max_batch_bytes:
                flush()
        flush()

    df.foreachPartition(_part)


def render_insert(table: str, columns: list[str], rows: list[Row]) -> str:
    """Multi-row INSERT in the reference's exact shape
    (datastore.rs:349-363): backtick-quoted identifiers, one VALUES tuple
    per row. Values are SQL-literal-escaped here (the reference
    pre-renders values upstream in utils::key_values)."""

    def lit(v: object) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, (int, float)):
            return str(v)
        s = str(v).replace("\\", "\\\\").replace("'", "''")
        return f"'{s}'"

    cols = ",".join(f"`{c}`" for c in columns)
    vals = ",\n".join("(" + ",".join(lit(v) for v in r) + ")" for r in rows)
    return f"INSERT INTO {table} ({cols}) \nVALUES \n{vals}"


def sql_insert_batch(
    execute: Callable[[str], None],
    table: str,
    map_query: Callable[[str], str] | None = None,
) -> Callable[[list[Row]], None]:
    """Build an ``insert_batch`` callable for :func:`write_with_dlq` that
    renders the reference-shaped INSERT, applies the optional ``map_query``
    pre-insert rewrite hook (reference PreInsertFn, datastore.rs:22,40 —
    applied to every statement before execution, datastore.rs:365-371),
    and hands the final SQL to ``execute`` (a DB cursor in production, a
    recorder in tests)."""

    def insert_batch(rows: list[Row]) -> None:
        if not rows:
            return
        columns = list(rows[0].asDict().keys())
        query = render_insert(table, columns, rows)
        if map_query is not None:
            query = map_query(query)
        execute(query)

    return insert_batch
