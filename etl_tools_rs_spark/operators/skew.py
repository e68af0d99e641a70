"""Skew-mitigation operators.

No reference equivalent (the reference is single-process; skew is a
distributed-shuffle problem). At 100 TB a handful of hot keys (a viral
user_id, an empty-string fingerprint) can pin one reducer for hours while
the rest idle. Two remedies, in preference order:

1. AQE skew-join splitting — on by default in the engine session conf
   (`spark.sql.adaptive.skewJoin.enabled`); handles skew discovered at
   runtime with zero code change. Use it first.
2. ``salted_join`` below — explicit salting for the cases AQE cannot fix:
   aggregate-then-join patterns, or joins where one hot key exceeds a
   single task even after splitting.

``salted_agg`` handles the groupBy analogue (two-phase aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``num_salts``
    reducers: left rows get a deterministic salt from a sibling column
    hash (falling back to random per row), the right side is replicated
    ``num_salts``× with every salt value, and the join runs on
    (keys..., salt).

    Cost model: right side shuffles num_salts× its size — use when
    |right| ≪ |left| (dimension-ish) and the key histogram is too skewed
    for AQE. Result is identical to the unsalted join (salt never leaks
    into output)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics of others differ under replication)")
    l_salted = left.withColumn(
        SALT_COL, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    r_salted = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))),
    )
    out = l_salted.join(r_salted, [*on, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed groupBy keys: partial-aggregate on
    (keys, salt), then final-aggregate on keys. Only decomposable
    aggregates (sum/count/min/max) are valid — pass the PARTIAL expression
    in ``aggs``; the final phase re-applies sum for counts/sums and
    min/max for min/max based on the column's alias prefix:
    ``sum_``/``cnt_`` → sum, ``min_`` → min, ``max_`` → max.

    Note Spark's hash aggregation already does map-side partial
    aggregation; explicit salting only pays off when the FINAL aggregation
    of one key overwhelms a reducer (billions of rows per key) — rare but
    real at 100 TB."""
    salted = df.withColumn(
        SALT_COL, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    final_aggs = []
    for name in aggs:
        if name.startswith("min_"):
            final_aggs.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            final_aggs.append(F.max(name).alias(name))
        else:  # sums and counts both re-combine with sum
            final_aggs.append(F.sum(name).alias(name))
    return partial.groupBy(*keys).agg(*final_aggs)
