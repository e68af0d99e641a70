"""Batcher — predicate-driven record grouping.

Reference parity: ``Batcher<I>`` — order-sensitive grouping where a
predicate ``new_batch(&next, &current_batch) -> bool`` decides when to cut;
emits ``Vec<I>`` batches, flushing the final partial batch
(reference: etl-core/src/batch.rs:10-70, flush batch.rs:61-65).

Spark-first decomposition (SURVEY §7.3): the *global-order* form is
inherently sequential, so the engine offers the forms that distribute:

- ``batch_by_count``: fixed-size batches within a key, cut every N rows in
  a deterministic order — a window-function one-liner, fully parallel by
  key, and SQL-expressible (oracle-checkable).
- ``batch_by_predicate``: arbitrary cut predicate, applied per key-group in
  order via ``applyInPandas`` (Arrow-batched). The predicate sees the
  pending batch like the reference's ``&current_batch``.

A truly global ordered batch requires ``orderBy`` + single partition; at
100 TB that is a design smell — callers should pick a partition key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def batch_by_count(
    df: DataFrame,
    key: list[str],
    order: list[str | Column],
    n: int,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Assign 0-based batch ids cutting every ``n`` rows per key, ordered.
    Distributed: one shuffle on ``key``; SQL equivalent is
    ``floor((row_number() over (partition by key order by order)-1)/n)``."""
    w = Window.partitionBy(*key).orderBy(*order)
    return df.withColumn(
        batch_col, F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(n))
    )


def batch_by_predicate(
    df: DataFrame,
    key: list[str],
    order: list[str],
    new_batch: Callable,  # (next_row: pd.Series, current: pd.DataFrame) -> bool
    batch_col: str = "batch_id",
) -> DataFrame:
    """Arbitrary cut predicate per key-group (the general Batcher).

    Each key-group is sorted and walked in order inside one Arrow batch;
    ``new_batch(next_row, current_batch_df)`` mirrors the reference
    signature. Scale note: a key-group must fit in one executor's memory —
    that is the price of order-dependent semantics; choose keys accordingly.
    """
    import pandas as pd  # noqa: F401 — executor-side import

    from pyspark.sql.types import LongType, StructField, StructType

    # copy, don't .add(): StructType.add mutates in place and df.schema is
    # the DataFrame's cached schema object
    out_schema = StructType(list(df.schema.fields) + [StructField(batch_col, LongType())])

    def _group(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        ids = []
        batch_id = 0
        start = 0  # start index of the current batch
        for i in range(len(pdf)):
            if i > start and new_batch(pdf.iloc[i], pdf.iloc[start:i]):
                batch_id += 1
                start = i
            ids.append(batch_id)
        pdf[batch_col] = pd.Series(ids, dtype="int64") if ids else pd.Series([], dtype="int64")
        return pdf

    return df.groupBy(*key).applyInPandas(_group, schema=out_schema)
