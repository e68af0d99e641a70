"""Joins.

Reference parity: ``LeftJoin<L,R>`` — the reference's ONLY join: a left
outer theta-join by block-nested-loop with an arbitrary match predicate,
emitting ``(L, Some(R))`` per match and ``(L, None)`` for unmatched lefts
(reference: etl-core/src/joins.rs:15-185; block size joins.rs:18-20;
predicate joins.rs:23,87; null arm joins.rs:118-133).

Spark-first: ``left.join(right, pred, 'left')`` — Catalyst picks
BroadcastHashJoin / SortMergeJoin for equi-predicates and
BroadcastNestedLoopJoin for pure theta, instead of re-scanning the right
side once per left block. The reference's ``(L, Option<R>)`` output shape is
preserved by packing the right side into one nullable struct column.

The engine also exposes Spark's full join surface (inner/right/full/semi/
anti + broadcast hint) — the reference has none of these (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    right_struct: str | None = "r",
    broadcast_right: bool = False,
) -> DataFrame:
    """LeftJoin parity: left outer join on an arbitrary predicate.

    With ``right_struct`` set, right columns arrive as ONE nullable struct
    column (the ``Option<R>``); ``None`` disables packing and flattens
    right columns into the row (plain Spark style). ``broadcast_right``
    forces a broadcast — at scale, always set it when the right side fits
    (dimension tables), otherwise a theta predicate degenerates to BNLJ
    with a shuffled right side.
    """
    r = right
    if right_struct is not None:
        r = right.select(F.struct(*right.columns).alias(right_struct))
        # rewrite is caller's responsibility: predicate refers to r.<col>
    if broadcast_right:
        r = F.broadcast(r)
    return left.join(r, on, "left")


def join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Full join surface (inner/left/right/full/semi/anti/cross) — native
    Spark capability the engine exposes beyond the reference (SURVEY §7.2
    phase 4)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)
