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
from pyspark.sql.window import Window


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


_JOIN_STRATEGIES = {"broadcast", "merge", "shuffle_hash", "shuffle_replicate_nl"}


def join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str],
    how: str = "inner",
    broadcast_right: bool = False,
    strategy: str | None = None,
) -> DataFrame:
    """Full join surface (inner/left/right/full/semi/anti/cross) — native
    Spark capability the engine exposes beyond the reference (SURVEY §7.2
    phase 4).

    ``strategy`` pins a physical strategy hint on the RIGHT side when the
    optimizer's estimate is known-wrong: ``broadcast`` (small dim that
    stats undercount), ``merge`` (both sides pre-sorted/bucketed on the
    key), ``shuffle_hash`` (one side much smaller but over the broadcast
    limit — builds a hash map instead of sorting both sides),
    ``shuffle_replicate_nl`` (cartesian). Hints beat config-wide
    threshold twiddling because they scope to ONE join."""
    if strategy is not None:
        if strategy not in _JOIN_STRATEGIES:
            raise ValueError(
                f"strategy must be one of {sorted(_JOIN_STRATEGIES)}, got {strategy!r}"
            )
        right = right.hint(strategy)
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    right_by: str | None = None,
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of (backward) join: for each left row, the most recent right row
    with ``right_time <= left_time`` for the same key. The timeseries /
    feature-lookup operator Spark lacks natively.

    Implementation is the scalable union-window decomposition, NOT a range
    self-join: tag both sides, union, then ``last(value, ignorenulls)``
    over a (key, time) window carries the latest right values forward onto
    left rows. Exactly ONE shuffle on the key — a naive inequality join
    would be a per-key cross product, quadratic on hot keys.

    ``right`` must be unique per (key, time) — pre-aggregate upstream if
    not (otherwise "the" most recent row is ambiguous on any engine).
    ``tolerance`` (a Column interval or duration expr) drops matches older
    than ``left_time - tolerance``.
    """
    rb = right_by or by
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in (rb, right_time)
    ]
    lt = F.col(left_time)

    r = right.select(
        F.col(rb).alias(by),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c) for c in vals],
    )
    left_keep = [c for c in left.columns]
    l = left.select(  # noqa: E741
        F.col(by),
        lt.alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in vals],
        F.struct(*left_keep).alias("_lrow"),
    )
    u = l.unionByName(r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType)))

    # right rows sort before left rows at equal times → "<=" semantics
    w = (
        Window.partitionBy(by)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in vals]
    match_t = F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True).over(w)

    out = u.select(
        F.col("_lrow"),
        F.col("_is_left"),
        match_t.alias("_match_t"),
        F.col("_t"),
        *carried,
    ).filter(F.col("_is_left") == 1)
    if tolerance is not None:
        keep = F.col("_match_t") >= (F.col("_t") - tolerance)
        out = out.select(
            "_lrow",
            *[F.when(keep, F.col(c)).alias(c) for c in vals],
        )
    else:
        out = out.select("_lrow", *vals)
    return out.select("_lrow.*", *vals)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    by: str | None = None,
    right_by: str | None = None,
    strategy: str | None = "shuffle_hash",
) -> DataFrame:
    """Range (interval-containment) join: left rows whose ``left_point``
    falls in ``[right_start, right_end)``, optionally with an equality key
    — the event-in-window primitive Spark has no native operator for.

    ``strategy`` pins the bucket join's physical form. The default
    ``"shuffle_hash"`` is the scale-safe shape: the interval side sits
    above a bucket Generate, so Catalyst's size estimate predates the
    data-dependent ×buckets-per-interval fan-out and can broadcast an
    arbitrarily understated frame (the broadcast_above_generate class —
    the r5 fuzzy mis-plan). A forfeited broadcast costs one linear
    shuffle; a mis-broadcast ships the fan-out to every executor. Pass
    ``"broadcast"`` when the interval side is genuinely tiny (a handful
    of campaign windows), or ``None`` to let Catalyst choose.

    Scale path — bucketized equi-join, NOT an inequality join (which
    Catalyst executes as a nested-loop / per-key cross product): each
    interval explodes into the time buckets it covers, each point maps to
    exactly one bucket, the join is a plain hash equi-join on
    (key, bucket) and the exact containment predicate filters within
    buckets. A (point, interval) pair can meet in only one bucket — the
    point's — so no post-join dedup is needed. Shuffle volume = points +
    intervals × buckets-per-interval; pick ``bucket_width`` near the
    typical interval length so that factor stays 1-2.

    ``bucket_width`` is seconds for timestamp columns, plain units for
    numerics. Column names must be disjoint across the two inputs (usual
    Spark join hygiene). Inner join only — for outer semantics, anti-join
    the matched keys back.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    is_ts = isinstance(
        left.schema[left_point].dataType, (TimestampType, TimestampNTZType)
    )

    def units(c: Column) -> Column:
        # NTZ casts to TIMESTAMP first (identity under the engine's fixed
        # UTC session zone) — unix_micros only accepts the LTZ type
        return F.unix_micros(c.cast("timestamp")) if is_ts else c

    width = int(bucket_width * 1_000_000) if is_ts else bucket_width
    # floor(x / width) is NULL for width <= 0 (and a timestamp width under
    # 1 microsecond truncates to 0), which would silently join nothing
    if not width or width <= 0:
        raise ValueError(
            f"bucket_width must be positive ({'>= 1 microsecond' if is_ts else '> 0'}); "
            f"got {bucket_width!r}"
        )
    lp = units(F.col(left_point))
    rs = units(F.col(right_start))
    re_ = units(F.col(right_end))

    l2 = left.withColumn("__rj_bucket", F.floor(lp / F.lit(width)))
    r2 = right.withColumn(
        "__rj_bucket",
        F.explode(F.sequence(F.floor(rs / F.lit(width)), F.floor(re_ / F.lit(width)))),
    )
    if strategy is not None:
        if strategy not in _JOIN_STRATEGIES:
            raise ValueError(
                f"strategy must be one of {sorted(_JOIN_STRATEGIES)} or None, got {strategy!r}"
            )
        r2 = r2.hint(strategy)
    cond = l2["__rj_bucket"] == r2["__rj_bucket"]
    if by is not None:
        cond = cond & (l2[by] == r2[right_by or by])
    return (
        l2.join(r2, cond)
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) < F.col(right_end))
        )
        .drop("__rj_bucket")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    by: str | None = None,
    right_by: str | None = None,
    strategy: str | None = "shuffle_hash",
) -> DataFrame:
    """Interval-OVERLAP join: pairs of rows whose half-open intervals
    ``[left_start, left_end)`` and ``[right_start, right_end)``
    intersect, optionally under an equality key — sessions × campaigns,
    downtime × SLA windows; the two-sided sibling of ``range_join``.

    Scale path — bucketized equi-join with a FIRST-SHARED-BUCKET filter
    instead of a distinct: both sides explode into the fixed-width
    buckets they cover and hash-join on (key, bucket). An overlapping
    pair shares every bucket its intersection touches, so the join alone
    would duplicate it; requiring ``bucket == bucket_of(max(starts))``
    — the first bucket of the intersection, computable row-locally from
    the joined pair — keeps exactly one copy WITHOUT a dedup shuffle.
    Shuffle volume = each side × its buckets-per-interval; pick
    ``bucket_width`` near the typical interval length.

    Inner join; column names must be disjoint across inputs (usual Spark
    join hygiene). Exact overlap (``ls < re AND rs < le``) is filtered
    within buckets, so boundary-touching intervals ([1,2) vs [2,3)) do
    NOT pair.

    ``strategy`` pins the bucket join's physical form; BOTH sides sit
    above bucket Generates here, so Catalyst's broadcast decision rests
    on doubly-understated estimates (broadcast_above_generate class).
    Default ``"shuffle_hash"`` is the scale-safe shape; pass
    ``"broadcast"`` for a genuinely tiny right side or ``None`` to let
    Catalyst choose (see :func:`range_join`).
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    is_ts = isinstance(
        left.schema[left_start].dataType, (TimestampType, TimestampNTZType)
    )

    def units(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp")) if is_ts else c

    width = int(bucket_width * 1_000_000) if is_ts else bucket_width
    if not width or width <= 0:
        raise ValueError(
            f"bucket_width must be positive ({'>= 1 microsecond' if is_ts else '> 0'}); "
            f"got {bucket_width!r}"
        )

    l2 = (
        left.withColumn("__oj_ls", units(F.col(left_start)))
        .withColumn("__oj_le", units(F.col(left_end)))
        .withColumn(
            "__oj_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__oj_ls") / F.lit(width)),
                    F.floor(F.col("__oj_le") / F.lit(width)),
                )
            ),
        )
    )
    r2 = (
        right.withColumn("__oj_rs", units(F.col(right_start)))
        .withColumn("__oj_re", units(F.col(right_end)))
        .withColumn(
            "__oj_rbucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__oj_rs") / F.lit(width)),
                    F.floor(F.col("__oj_re") / F.lit(width)),
                )
            ),
        )
    )
    if strategy is not None:
        if strategy not in _JOIN_STRATEGIES:
            raise ValueError(
                f"strategy must be one of {sorted(_JOIN_STRATEGIES)} or None, got {strategy!r}"
            )
        r2 = r2.hint(strategy)
    cond = l2["__oj_bucket"] == r2["__oj_rbucket"]
    if by is not None:
        cond = cond & (l2[by] == r2[right_by or by])
    return (
        l2.join(r2, cond)
        .filter(
            (F.col("__oj_ls") < F.col("__oj_re"))
            & (F.col("__oj_rs") < F.col("__oj_le"))
            # first shared bucket: the intersection starts at
            # max(ls, rs); keep the pair only in that bucket
            & (
                F.col("__oj_bucket")
                == F.floor(F.greatest(F.col("__oj_ls"), F.col("__oj_rs")) / F.lit(width))
            )
        )
        .drop("__oj_ls", "__oj_le", "__oj_rs", "__oj_re", "__oj_bucket", "__oj_rbucket")
    )
