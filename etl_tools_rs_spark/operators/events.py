"""Event-sequence analytics: ordered funnels and cohort retention.

The product-analytics queries every event pipeline serves (the reference
streams events but can only map/filter them — no ordering-aware
analysis exists there at all; closest is the order-sensitive Batcher,
etl-core/src/batch.rs:10-70).

Both operators are strictly relational — conditional aggregates and
key joins, no window over raw events, no Python — so they hold at
100 TB: per-step frames are one row per user (user-count-bounded, not
event-count-bounded) and join on the user key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: how many users performed ``steps[0]``, then
    ``steps[1]`` strictly after it, then ``steps[2]`` after that, …
    (earliest-qualifying-occurrence semantics: each step matches the
    FIRST occurrence after the previous step's matched time — the
    standard product-funnel definition).

    Returns one row per step: ``(step bigint, event string,
    n_users bigint)`` with n_users non-increasing down the funnel.

    Plan: per step, one conditional min-aggregate per user (map-side
    combined) joined to the survivors of the previous step — shuffles
    carry one row per user per step. No windows over raw events, so
    hot users cost nothing extra.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(event_col).alias("_e"),
        F.col(time_col).alias("_t"),
    )
    counts: list[tuple[int, str, int]] = []
    survivors: DataFrame | None = None  # (_u, _prev_t)
    for i, step in enumerate(steps):
        hits = ev.filter(F.col("_e") == step)
        if survivors is None:
            cur = hits.groupBy("_u").agg(F.min("_t").alias("_prev_t"))
        else:
            cur = (
                hits.join(survivors, "_u")
                .filter(F.col("_t") > F.col("_prev_t"))
                .groupBy("_u")
                .agg(F.min("_t").alias("_t2"))
                .select("_u", F.col("_t2").alias("_prev_t"))
            )
        survivors = cur
        counts.append((i, step, survivors.count()))
    spark = df.sparkSession
    return spark.createDataFrame(
        counts, "step bigint, event string, n_users bigint"
    )


def funnel_users(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Same traversal as :func:`funnel` but returns the per-user depth:
    ``(user_col, depth bigint)`` where depth = number of funnel steps
    completed in order (1-based; users who never did step 0 are absent).
    Fully lazy (no driver-side counts) — the oracle-checkable form."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(event_col).alias("_e"),
        F.col(time_col).alias("_t"),
    )
    survivors = None
    depth: DataFrame | None = None
    for i, step in enumerate(steps):
        hits = ev.filter(F.col("_e") == step)
        if survivors is None:
            cur = hits.groupBy("_u").agg(F.min("_t").alias("_prev_t"))
        else:
            cur = (
                hits.join(survivors, "_u")
                .filter(F.col("_t") > F.col("_prev_t"))
                .groupBy("_u")
                .agg(F.min("_t").alias("_t2"))
                .select("_u", F.col("_t2").alias("_prev_t"))
            )
        survivors = cur
        tier = cur.select("_u", F.lit(i + 1).alias("_d"))
        depth = tier if depth is None else depth.unionByName(tier)
    return depth.groupBy("_u").agg(F.max("_d").cast("bigint").alias("depth")).select(
        F.col("_u").alias(user_col), "depth"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-activity
    period; for each (cohort, periods-since-cohort) cell, how many of
    the cohort's users were active. Returns ``(cohort_period timestamp,
    period_offset bigint, n_users bigint)``.

    Plan: first-activity = one min-aggregate per user; activity periods
    = distinct (user, period) pairs; one user-key join + one final
    aggregate. Everything after the first pass is user×period-bounded.
    """
    day = F.lit(86_400 * period_days)
    ts_s = F.unix_timestamp(F.col(time_col).cast("timestamp"))
    period = F.from_unixtime(F.floor(ts_s / day) * day).cast("timestamp")
    ev = df.select(F.col(user_col).alias("_u"), period.alias("_p"))
    first = ev.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    active = ev.distinct()
    return (
        active.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_period"),
            (
                F.floor(
                    (F.unix_timestamp("_p") - F.unix_timestamp("_cohort")) / day
                )
            ).cast("bigint").alias("period_offset"),
        )
        .agg(F.countDistinct("_u").cast("bigint").alias("n_users"))
    )
