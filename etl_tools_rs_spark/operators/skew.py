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
    # shuffle_hash pin (r7): salting exists PRECISELY because the right
    # side is too big to broadcast (a broadcastable right needs no salt —
    # broadcast sidesteps skew entirely). Catalyst can't see that: the
    # replicated side sits above a Generate, its estimate understates by
    # ×num_salts, and a mis-broadcast both wastes the replication and
    # re-serializes the hot keys. Pin the join to the shuffled form the
    # operator's contract assumes.
    out = l_salted.join(r_salted.hint("shuffle_hash"), [*on, SALT_COL], how)
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


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
    scale: int = 6,
) -> DataFrame:
    """Join/aggregation-key skew diagnosis: the ``top_n`` heaviest keys
    with their row counts and share of the table — the pre-flight check
    before any big join ("will one key serialize a task?"; feed the
    verdict into ``salted_join``/AQE decisions). NULL keys count too —
    they're the classic hidden hot key.

    One map-side-combined count aggregate; the top-n is a
    TakeOrderedAndProject (per-partition top-k, never a global sort);
    the total joins back as a broadcast 1-row aggregate. Shares are
    floor-scaled. Output: ``(key_cols..., n bigint, share double,
    skew_ratio double)`` where skew_ratio = n / (total / n_keys) —
    how many times heavier than average this key is.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n!r}")
    p10 = float(10**scale)
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.agg(
        F.sum("n").cast("double").alias("_tot"),
        F.count(F.lit(1)).cast("double").alias("_nkeys"),
    )
    order = [F.col("n").desc()] + [F.col(c).asc() for c in key_cols]
    top = counts.orderBy(*order).limit(top_n)
    share = F.floor(F.lit(p10) * (F.col("n") / F.col("_tot"))) / F.lit(p10)
    ratio = (
        F.floor(F.lit(p10) * (F.col("n") / (F.col("_tot") / F.col("_nkeys"))))
        / F.lit(p10)
    )
    return top.crossJoin(F.broadcast(totals)).select(
        *key_cols, "n", share.alias("share"), ratio.alias("skew_ratio")
    )


def join_size_estimate(
    left: DataFrame,
    left_keys: list[str],
    right: DataFrame,
    right_keys: list[str],
    top_n: int = 10,
    scale: int = 6,
) -> DataFrame:
    """EXACT inner-equi-join output size — computed WITHOUT running the
    join: per-key counts on each side (two map-side-combined aggregates,
    each output ≈ distinct keys, never a fact-row shuffle), an equi-join
    of the two count tables, then ``Σ n_left·n_right``. The pre-flight
    for any big join: a 10^13-row answer means reconsider (pre-filter,
    semi-join, or aggregate first), and the top contributing keys are
    exactly the ones to salt (feed ``salted_join``) or let AQE split.

    One row out: ``(est_rows, matched_keys, max_key_rows,
    top{top_n}_share)`` — share of the output owed to the ``top_n``
    heaviest keys (floor-scaled; 1.0 ≈ the join IS its hot keys).
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n!r}")
    p10 = float(10**scale)
    lc = left.groupBy(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(left_keys)]
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_nl"))
    rc = right.groupBy(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(right_keys)]
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_nr"))
    per_key = lc.join(rc, [f"_k{i}" for i in range(len(left_keys))]).select(
        (F.col("_nl") * F.col("_nr")).alias("_rows")
    )
    # top-k contribution via TakeOrdered (per-partition top-k, no global
    # sort) folded back as a 1-row broadcast
    topk = per_key.orderBy(F.col("_rows").desc()).limit(top_n).agg(
        F.sum("_rows").cast("bigint").alias("_top_rows")
    )
    return (
        per_key.agg(
            F.sum("_rows").cast("bigint").alias("est_rows"),
            F.count(F.lit(1)).cast("bigint").alias("matched_keys"),
            F.max("_rows").cast("bigint").alias("max_key_rows"),
        )
        .crossJoin(F.broadcast(topk))
        .select(
            "est_rows",
            "matched_keys",
            "max_key_rows",
            (
                F.floor(F.lit(p10) * F.col("_top_rows") / F.col("est_rows"))
                / F.lit(p10)
            )
            .cast("double")
            .alias(f"top{top_n}_share"),
        )
    )
