"""Incremental aggregation: mergeable per-key aggregate state.

The incremental-view-maintenance pattern for 100 TB tables: computing a
daily GROUP BY over the whole history rescans everything; instead keep a
per-key state table of ALGEBRAIC aggregates (count/sum/min/max — each
mergeable by re-aggregation), aggregate only the new partition, and merge
the delta into the state. Derived values (avg = sum/count) come from the
state at read time, so they stay exact under any merge order.

The reference replays full sources on every run (its only incremental
hook is resume-at-index within one run, etl-job/src/job.rs:674-682);
this operator gives the engine true delta processing: cost per refresh is
O(delta + |state|), never O(history).

Laws (tested): for any split A ∪ B of the input,
``merge(agg_state(A), agg_state(B)) == agg_state(A ∪ B)`` — merge is
associative and commutative, so shard/partition/epoch merge trees all
yield the same state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INIT = {
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(F.col(c)),
    "sum": lambda c: F.sum(F.col(c)),
    "min": lambda c: F.min(F.col(c)),
    "max": lambda c: F.max(F.col(c)),
}
# how an already-aggregated column re-aggregates when states merge
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _check(measures: dict[str, tuple[str, str]]) -> None:
    if not measures:
        raise ValueError("need at least one measure")
    for out, (op, _col) in measures.items():
        if op not in _INIT:
            raise ValueError(
                f"measure {out!r}: op must be one of {sorted(_INIT)}, got {op!r}"
            )


def agg_state(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate ``df`` into per-key state. ``measures`` maps output
    column → ``(op, input_col)`` with op ∈ {count, sum, min, max}
    (``("count", "*")`` counts rows). One shuffle, map-side combined."""
    _check(measures)
    aggs = [_INIT[op](col).alias(out) for out, (op, col) in measures.items()]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge two state tables produced by :func:`agg_state` (or by prior
    merges): union + one re-aggregation on the keys. Keys present in only
    one side pass through (their measures merge with the identity)."""
    _check(measures)
    cols = [*keys, *measures]
    merged = state.select(*cols).unionByName(delta.select(*cols))
    aggs = [_MERGE[op](F.col(out)).alias(out) for out, (op, _c) in measures.items()]
    return merged.groupBy(*keys).agg(*aggs)


def refresh(
    state: DataFrame | None,
    new_rows: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """One maintenance step: aggregate the new partition and fold it into
    the running state (``state=None`` bootstraps). This is the whole
    nightly job: scan cost is the delta, not the history."""
    delta = agg_state(new_rows, keys, measures)
    if state is None:
        return delta
    return merge_agg_states(state, delta, keys, measures)
