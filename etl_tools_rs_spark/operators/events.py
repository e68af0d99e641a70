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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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

    Sugar over :func:`funnel_users` (r4, VERDICT r3 task #8): a user
    completed step i iff their funnel depth is > i, so every step's
    count is one conditional sum over the SAME per-user depth frame —
    one fully-lazy plan, one action when consumed. Earlier rounds ran
    k driver jobs (one ``count()`` + localCheckpoint per step); now
    construction triggers zero jobs (pinned in tests) and the k counts
    ride a single 1-row aggregate that posexplodes back to one row per
    step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    depths = funnel_users(df, steps, user_col, event_col, time_col)
    one_row = depths.agg(
        *[
            F.sum((F.col("depth") >= i + 1).cast("bigint")).alias(f"_s{i}")
            for i in range(len(steps))
        ]
    )
    tiers = F.array(
        *[
            F.struct(
                F.lit(step).alias("event"),
                F.coalesce(F.col(f"_s{i}"), F.lit(0)).alias("n_users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return one_row.select(
        F.posexplode(tiers).alias("step", "_tier")
    ).select(
        F.col("step").cast("bigint"),
        F.col("_tier.event").alias("event"),
        F.col("_tier.n_users").alias("n_users"),
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


def resample(
    df: DataFrame,
    time_col: str,
    step_seconds: int,
    start: str,
    end: str,
    by: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Regular time grid with gap filling: bucket events into
    ``step_seconds`` periods over [``start``, ``end``) and emit EVERY
    period for every group — empty periods as ``n = 0`` (and
    ``sum_value = NULL``) — the dense series downstream feature windows
    and charting need (a missing hour must read as zero traffic, not as
    an absent row).

    Explicit bounds keep the grid deterministic and the operator
    composable (a backfill over Jan replays with the same grid). The
    grid is ``spark.range`` (distributed, never a driver loop) crossed
    with the distinct groups; the event aggregate joins onto it.
    Returns ``(by..., period_start timestamp, n bigint[, sum_value])``.
    """
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds!r}")
    by = by or []
    spark = df.sparkSession
    lo = F.lit(start).cast("timestamp")
    hi = F.lit(end).cast("timestamp")
    lo_s = F.unix_timestamp(lo)
    step = F.lit(step_seconds)
    ts_s = F.unix_timestamp(F.col(time_col).cast("timestamp"))
    period = F.from_unixtime(
        F.floor((ts_s - lo_s) / step) * step + lo_s
    ).cast("timestamp")
    ev = df.filter(
        (F.col(time_col).cast("timestamp") >= lo)
        & (F.col(time_col).cast("timestamp") < hi)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("sum_value"))
    counts = ev.groupBy(*by, period.alias("period_start")).agg(*aggs)

    # the grid: one row per step in [start, end), built distributedly
    import datetime as _dt

    lo_py = _dt.datetime.fromisoformat(start)
    hi_py = _dt.datetime.fromisoformat(end)
    n_steps = int(
        (hi_py - lo_py).total_seconds() + step_seconds - 1
    ) // step_seconds
    grid = spark.range(n_steps).select(
        F.from_unixtime(F.col("id") * step + F.unix_timestamp(lo))
        .cast("timestamp")
        .alias("period_start")
    )
    if by:
        grid = df.select(*by).distinct().crossJoin(grid)
    out = grid.join(counts, [*by, "period_start"], "left")
    sel = [*by, "period_start", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")]
    if value_col is not None:
        sel.append(F.col("sum_value"))
    return out.select(*sel)


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Merge overlapping/touching intervals per group (the gaps-and-
    islands problem): collapse ``[start, end)`` rows into maximal
    disjoint spans — session stitching, coverage maps, downtime windows.

    Relational single-pass form: order intervals by start within each
    group; a new island begins where ``start > max(end) of everything
    before``; the island id is a running flag sum; one aggregate per
    island. Two windows + one aggregate, all partitioned by the group
    key — one shuffle, no iteration, works on timestamps or numerics.
    Returns ``(by..., span_start, span_end, n_merged bigint)``.
    """
    by = by or []
    s, e = F.col(start_col), F.col(end_col)
    w = Window.partitionBy(*by).orderBy(s.asc(), e.asc())
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new", F.when(prev_max_end.isNull() | (s > prev_max_end), 1).otherwise(0)
    )
    island = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("_isl", island)
        .groupBy(*by, "_isl")
        .agg(
            F.min(s).alias("span_start"),
            F.max(e).alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        )
        .drop("_isl")
    )


def assign_sessions(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
    session_col: str = "session_idx",
) -> DataFrame:
    """Gap-based session assignment: add ``session_col`` (1-based per
    user, in time order) — a new session starts after ``gap_seconds`` of
    inactivity. The reusable building block behind the sessionize query:
    downstream ops (funnels within session, per-session aggregates,
    session sampling) join/group on the id instead of re-deriving cuts.

    One shuffle on the user key; the new-session flag is a lag
    comparison and the id a running sum — both in the same window pass.
    Ties on the timestamp break by all remaining column order being
    irrelevant: rows with equal (user, ts) land in the same session by
    construction (gap 0 ≤ gap_seconds).
    """
    if gap_seconds < 0:
        raise ValueError(f"gap_seconds must be >= 0, got {gap_seconds!r}")
    ts_s = F.unix_timestamp(F.col(time_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(F.col(time_col).asc())
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(F.col(time_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_sess).over(run).cast("bigint"))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session summary built on :func:`assign_sessions`: one row per
    (user, session) with event count, start/end, and duration in
    seconds. Same single user-key shuffle — the session aggregate reuses
    the window pass's partitioning."""
    sessions = assign_sessions(df, user_col, time_col, gap_seconds)
    ts = F.col(time_col).cast("timestamp")
    return sessions.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.unix_timestamp(F.max(ts)) - F.unix_timestamp(F.min(ts)))
        .cast("bigint")
        .alias("duration_s"),
    )


def fill_series(
    df: DataFrame,
    time_col: str,
    value_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Gap filling over a (possibly NULL-holed) regular series: adds

    - ``locf_value`` — last observation carried forward (NULL until the
      first observation);
    - ``lerp_value`` — linear interpolation between the surrounding
      observations (LOCF after the last one, backfill before the first),
      quantized to 4 dp via the FLOOR form (floor(1e4·x)/1e4): round()
      half-way ties land differently across engines, floor of the
      bit-identical double never does (engine numeric policy,
      queries.py header).

    Composes with :func:`resample` (which emits every period with NULL
    value for empty buckets): resample → fill_series is the standard
    dense-and-interpolated telemetry series.

    One shuffle on the group key; the two window passes share it. Series
    are per-group — a single global series lands on one partition, which
    is fine for the post-aggregation row counts this operates on (one row
    per period, not per event).
    """
    by = by or []
    ts = F.unix_timestamp(F.col(time_col).cast("timestamp"))
    v = F.col(value_col)
    w = Window.partitionBy(*by).orderBy(time_col)
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_t = F.last(F.when(v.isNotNull(), ts), ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_t = F.first(F.when(v.isNotNull(), ts), ignorenulls=True).over(wf)
    lerp = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_v.isNull(), next_v.cast("double"))  # backfill head
        .when(next_v.isNull(), prev_v.cast("double"))  # LOCF tail
        .otherwise(
            prev_v
            + (next_v - prev_v) * (ts - prev_t) / (next_t - prev_t)
        )
    )
    return df.select(
        *by,
        time_col,
        value_col,
        prev_v.cast("double").alias("locf_value"),
        (F.floor(lerp * 10000) / 10000).cast("double").alias("lerp_value"),
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    by: list[str],
    order_cols: list[str],
    lookback: int = 10,
    min_periods: int = 5,
    threshold: float = 3.0,
    scale: int = 6,
    input_scale: int = 2,
) -> DataFrame:
    """Rolling-window anomaly detection: z-score each observation
    against the trailing ``lookback`` observations in its group
    (EXCLUDING itself — the point under test must not contaminate its
    own baseline). The streaming-metrics tripwire: "is this value wild
    relative to this key's recent history?".

    Window moments come from exact DECIMAL(18, ``input_scale``) sums
    over the trailing frame (add-order-proof, same discipline as
    ``standardize``); derived mean/sd/z are floor-scaled to ``scale``
    decimals so both engines agree bit-for-bit. Rows with fewer than
    ``min_periods`` trailing observations, or a zero-variance baseline,
    yield NULL z (no verdict — not "not anomalous").

    Plan: one shuffle on ``by``, a single window pass computing all
    three trailing sums, then pure per-row arithmetic. ``order_cols``
    must totally order each group (pass an id tie-break).
    """
    if lookback < 1 or min_periods < 1:
        raise ValueError("lookback and min_periods must be >= 1")
    p10 = float(10**scale)

    def fl(c: Column) -> Column:
        return F.floor(F.lit(p10) * c) / F.lit(p10)

    d = F.col(value_col).cast(f"decimal(18,{input_scale})")
    w = (
        Window.partitionBy(*by)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-lookback, -1)
    )
    n = F.count(d).over(w).cast("double")
    s1 = F.sum(d).over(w).cast("double")
    s2 = F.sum(d * d).over(w).cast("double")
    mean = fl(s1 / n)
    sd = F.sqrt(fl(s2 / n - (s1 / n) * (s1 / n)))
    z = F.when(
        (n >= float(min_periods)) & (sd > 0),
        fl((F.col(value_col).cast("double") - mean) / sd),
    )
    return df.select(
        *by,
        *order_cols,
        F.col(value_col).cast("double").alias(value_col),
        n.cast("bigint").alias("n_prior"),
        z.alias("zscore"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))).alias(
            "is_anomaly"
        ),
    )


def time_weighted_avg(
    df: DataFrame,
    time_col: str,
    value_col: str,
    by: list[str] | None = None,
    tiebreak: list[str] | None = None,
    scale: int = 6,
    input_scale: int = 2,
) -> DataFrame:
    """Time-weighted average per group for IRREGULARLY sampled series —
    the correct mean when observations carry their value until the next
    one (sensor states, prices, gauge metrics): plain AVG over-weights
    bursts. Left-Riemann weighting: each observation holds for
    ``dt = next_ts − ts`` (microsecond-exact); the last observation of a
    group spans no interval and contributes only to ``n_points``.

    ``twa = Σ(value·dt) / Σ(dt)`` with the products accumulated as exact
    decimals (value quantized at ``input_scale``, dt an exact bigint of
    microseconds), division floor-scaled to ``scale`` — partition-order
    proof, oracle-checkable. Returns ``(by..., twa double,
    span_micros bigint, n_points bigint)``; single-observation groups
    yield NULL twa (no interval to weight).

    Plan: one shuffle on the group key — the lead window and the final
    aggregate share the same partitioning.
    """
    by = by or []
    p10 = float(10**scale)
    ts = F.unix_micros(F.col(time_col).cast("timestamp"))
    # tied timestamps with different values would make dt assignment
    # order-dependent — require a tiebreak for a total order
    order = [ts.asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*by).orderBy(*order)
    dt = (F.lead(ts).over(w) - ts).cast("bigint")
    dec_v = F.col(value_col).cast(f"decimal(18,{input_scale})")
    staged = df.select(*by, dec_v.alias("_v"), dt.alias("_dt"))
    agg = staged.groupBy(*by).agg(
        F.sum(F.col("_v") * F.col("_dt")).alias("_wv"),
        F.sum("_dt").alias("_sdt"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
    )
    twa = (
        F.floor(
            F.lit(p10)
            * (F.col("_wv").cast("double") / F.col("_sdt").cast("double"))
        )
        / F.lit(p10)
    )
    return agg.select(
        *by,
        F.when(F.col("_sdt") > 0, twa).alias("twa"),
        F.coalesce(F.col("_sdt"), F.lit(0)).cast("bigint").alias("span_micros"),
        "n_points",
    )


def path_ngrams(
    df: DataFrame,
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
    n: int = 3,
    min_count: int = 1,
    tiebreak: list[str] | None = None,
    sep: str = ">",
) -> DataFrame:
    """Frequent behavioral paths: count every length-``n`` consecutive
    event sequence per user ("view>click>purchase") — the
    what-do-users-actually-do mining primitive behind funnel DISCOVERY
    (funnels verify a hypothesized path; this surfaces the paths worth
    hypothesizing). Returns ``(path string, n_occurrences bigint)``.

    One shuffle on the user key (all ``n−1`` leads share a single
    window pass), then a map-side-combined path count — paths crossing
    user boundaries are excluded by construction (lead returns NULL at
    the partition edge). Pass ``tiebreak`` (e.g. the event id) so tied
    timestamps order identically everywhere.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n!r}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count!r}")
    order = [F.col(time_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = [F.col(event_col)] + [
        F.lead(event_col, k).over(w) for k in range(1, n)
    ]
    # window expressions can't sit in a WHERE — project them first, then
    # filter on the materialized column (leads are monotone: the longest
    # lead going NULL marks an incomplete tail path)
    staged = df.select(
        F.concat_ws(sep, *steps).alias("_path"),
        steps[-1].alias("_last"),
    )
    return (
        staged.filter(F.col("_last").isNotNull())
        .groupBy(F.col("_path").alias("path"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
    tiebreak: list[str] | None = None,
    scale: int = 6,
) -> DataFrame:
    """First-order Markov transition model of user behavior: for every
    observed ``(from_event, to_event)`` pair of CONSECUTIVE events
    within a user, the transition count and row-normalized probability
    ``P(to | from)`` — the next-action model behind "users who did X
    usually do Y next" and behavioral drift monitoring (compare two
    periods' matrices).

    One user-key window pass for the lead, a map-side-combined pair
    count, and the per-source totals join back (source-event-count
    sized, broadcast). Probabilities are floor-scaled to ``scale``;
    counts are exact. Transitions never cross user boundaries (lead is
    NULL at the partition edge).
    """
    p10 = float(10**scale)
    order = [F.col(time_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(user_col).orderBy(*order)
    staged = df.select(
        F.col(event_col).alias("from_event"),
        F.lead(event_col).over(w).alias("to_event"),
    )
    counts = (
        staged.filter(F.col("to_event").isNotNull())
        .groupBy("from_event", "to_event")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = counts.groupBy("from_event").agg(
        F.sum("n").cast("double").alias("_tot")
    )
    prob = F.floor(F.lit(p10) * (F.col("n") / F.col("_tot"))) / F.lit(p10)
    return counts.join(F.broadcast(totals), "from_event").select(
        "from_event", "to_event", "n", prob.alias("p")
    )

def attribute_last_touch(
    df: DataFrame,
    convert_type: str = "purchase",
    touch_type: str = "click",
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    max_gap_hours: int = 168,
) -> DataFrame:
    """Last-touch attribution (r4): for every conversion event, the most
    recent touch event by the same user at-or-before the conversion
    (ties broken by event id), attributed only when the gap is within
    ``max_gap_hours``.

    Plan: ONE running conditional max over a rows-frame window keyed by
    user — no self-join, no per-conversion scan; hot users cost one
    sorted pass. Window order is (ts, id) so results are deterministic
    on any partitioning, and the SQL twin uses the identical frame so
    the oracle matches timestamp-for-timestamp.

    Output: ``(event_id, user_id, ts, touch_ts timestamp?, attributed
    boolean)`` — one row per conversion; ``touch_ts`` NULL when the user
    never touched before converting.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(time_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_touch = F.max(
        F.when(F.col(event_col) == touch_type, F.col(time_col))
    ).over(w)
    out = df.select(
        F.col(id_col), F.col(user_col), F.col(time_col), F.col(event_col),
        last_touch.alias("touch_ts"),
    ).filter(F.col(event_col) == convert_type)
    within = F.col("touch_ts") >= (
        F.col(time_col) - F.expr(f"INTERVAL {int(max_gap_hours)} HOURS")
    )
    return out.select(
        id_col,
        user_col,
        time_col,
        F.when(within, F.col("touch_ts")).alias("touch_ts"),
        F.coalesce(within, F.lit(False)).alias("attributed"),
    )
