"""Feature engineering: quantile discretization and standardization.

The last-mile numeric transforms before model training. Both are
deterministic by construction (the failure mode of naive ports is
nondeterministic float reductions — here every statistic comes from
exact or floor-scaled arithmetic), so transformed features are
reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_tools_rs_spark.operators.profile import approx_quantiles_hist


def bucketize_quantiles(
    df: DataFrame,
    col: str,
    n_buckets: int,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency discretization: add ``out_col`` (default
    ``{col}_bucket``) in [0, n_buckets) split at the histogram-CDF
    quantiles — deterministic cut points (see approx_quantiles_hist),
    so the same row always lands in the same bucket.

    The n_buckets-1 cut points are sketch-sized metadata: they collect
    to the driver (same deliberate exception as k-means centroids) and
    compile into a chain of comparisons — the transform itself is a
    pure narrow projection, no join, no shuffle. NULLs get NULL."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets!r}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = [
        r["value"]
        for r in approx_quantiles_hist(df, col, probs, lo, hi, n_bins)
        .orderBy("prob")
        .collect()
    ]
    c = F.col(col).cast("double")
    bucket: Column = F.lit(0)
    for cut in cuts:
        bucket = bucket + (c > F.lit(cut)).cast("int")
    out = F.when(c.isNotNull(), bucket.cast("int"))
    return df.withColumn(out_col or f"{col}_bucket", out)


def standardize(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    scale: int = 6,
    input_scale: int = 2,
) -> DataFrame:
    """Z-score standardization: replace each column in ``cols`` with
    ``(x - mean) / stddev`` (population stddev), optionally per ``by``
    group. Zero-variance columns yield NULL (no information — flag
    upstream with validate/outliers).

    Mean and variance come from exact DECIMAL(18, ``input_scale``)
    moment sums (same discipline as the stats_moments gate: values must
    be representable at ``input_scale`` decimals — true for prices,
    counts, quantized measures — so the cast is lossless and the sums
    are add-order-proof, unlike float accumulators). Derived stats are
    floor-scaled to ``scale`` decimals; the stats frame is
    group-count-sized and broadcasts back onto the rows.
    """
    if not cols:
        raise ValueError("standardize needs at least one column")
    by = by or []
    p10 = float(10**scale)
    dec_t = f"decimal(18,{input_scale})"
    aggs = []
    for i, c in enumerate(cols):
        d = F.col(c).cast(dec_t)
        aggs.append(F.sum(d).cast("double").alias(f"_s1_{i}"))
        aggs.append(F.sum(d * d).cast("double").alias(f"_s2_{i}"))
        aggs.append(F.count(F.col(c)).cast("double").alias(f"_n_{i}"))
    stats = df.groupBy(*by).agg(*aggs)

    def fl(c: Column) -> Column:
        return F.floor(F.lit(p10) * c) / F.lit(p10)

    sel = []
    for i, _c in enumerate(cols):
        n = F.col(f"_n_{i}")
        s1 = F.col(f"_s1_{i}")
        s2 = F.col(f"_s2_{i}")
        sel.append(fl(s1 / n).alias(f"_mean_{i}"))
        sel.append(F.sqrt(fl(s2 / n - (s1 / n) * (s1 / n))).alias(f"_sd_{i}"))
    stats = stats.select(*by, *sel)
    joined = (
        df.join(F.broadcast(stats), by) if by else df.crossJoin(F.broadcast(stats))
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            i = cols.index(c)
            z = F.when(
                F.col(f"_sd_{i}") > 0,
                fl(
                    (F.col(c).cast("double") - F.col(f"_mean_{i}"))
                    / F.col(f"_sd_{i}")
                ),
            )
            out_cols.append(z.cast("double").alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def minmax_scale(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Min-max normalization to [0, 1]: ``(x - min) / (max - min)`` per
    column, optionally per group. Constant columns (max == min) yield
    NULL. Unlike mean/variance, min and max are order-free aggregates —
    no decimal discipline needed; the single division is floor-scaled.

    One grouped min/max aggregate (map-side combined), stats broadcast
    back onto the rows — same plan shape as :func:`standardize`.
    """
    if not cols:
        raise ValueError("minmax_scale needs at least one column")
    by = by or []
    p10 = float(10**scale)
    aggs = []
    for i, c in enumerate(cols):
        d = F.col(c).cast("double")
        aggs.append(F.min(d).alias(f"_lo_{i}"))
        aggs.append(F.max(d).alias(f"_hi_{i}"))
    stats = df.groupBy(*by).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), by) if by else df.crossJoin(F.broadcast(stats))
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            i = cols.index(c)
            rng = F.col(f"_hi_{i}") - F.col(f"_lo_{i}")
            scaled = F.when(
                rng > 0,
                F.floor(
                    F.lit(p10) * ((F.col(c).cast("double") - F.col(f"_lo_{i}")) / rng)
                )
                / F.lit(p10),
            )
            out_cols.append(scaled.cast("double").alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def robust_scale(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    scale: int = 6,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Median/IQR robust scaling: ``(x − median) / (p75 − p25)`` per
    column (optionally per group) — the standardization that heavy tails
    and sentinel values cannot drag, the robust sibling of
    ``standardize``. Zero-IQR columns yield NULL (constant bulk — flag
    upstream, don't fabricate a scale).

    ``exact=True`` (default) uses exact interpolated percentiles
    (deterministic and oracle-checkable, unlike sketch percentiles; same
    discipline as ``outliers_mad``) — but ``F.percentile``'s partial
    state is ALL values of a group, so an ungrouped exact call
    concentrates the whole column in one final-merge buffer: fine up to
    ~10⁸ rows per group, a scale-killer beyond. ``exact=False`` switches
    to ``percentile_approx`` (GK sketch: fixed ``accuracy``-sized
    mergeable state, rank error ≤ 1/accuracy) — the 100 TB path; the
    clip/scale plan shape is identical. Either way: ONE grouped
    aggregate for all quantiles of every column, the group-count-sized
    stats frame broadcasts back, scaled values floor-scaled to ``scale``
    decimals.
    """
    if not cols:
        raise ValueError("robust_scale needs at least one column")
    by = by or []
    p10 = float(10**scale)
    pctl = _pctl_fn(exact, accuracy)
    aggs = []
    for i, c in enumerate(cols):
        d = F.col(c).cast("double")
        aggs.append(pctl(d, 0.5).alias(f"_med_{i}"))
        aggs.append(pctl(d, 0.25).alias(f"_p25_{i}"))
        aggs.append(pctl(d, 0.75).alias(f"_p75_{i}"))
    stats = df.groupBy(*by).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), by) if by else df.crossJoin(F.broadcast(stats))
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            i = cols.index(c)
            iqr = F.col(f"_p75_{i}") - F.col(f"_p25_{i}")
            scaled = (
                F.floor(
                    F.lit(p10)
                    * (F.col(c).cast("double") - F.col(f"_med_{i}"))
                    / iqr
                )
                / F.lit(p10)
            )
            out_cols.append(
                F.when(iqr > 0, scaled).cast("double").alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def _pctl_fn(exact: bool, accuracy: int):
    """Percentile aggregate picker: exact interpolation (all-values
    partial state — per-group memory O(group)) vs the GK sketch
    ``percentile_approx`` (fixed-size mergeable state — the shape that
    survives an ungrouped 100 TB column). Shared by the quantile-based
    scalers."""
    if exact:
        return lambda d, p: F.percentile(d, F.lit(float(p)))
    if accuracy < 100:
        raise ValueError(f"accuracy must be >= 100, got {accuracy!r}")
    return lambda d, p: F.percentile_approx(d, F.lit(float(p)), F.lit(accuracy))


def winsorize(
    df: DataFrame,
    cols: list[str],
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    by: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Percentile clipping: clamp each column into
    ``[quantile(p_lo), quantile(p_hi)]`` (optionally per group) — the
    standard tail-taming step before moment-based statistics or model
    features. Values inside the band pass through UNCHANGED (no
    re-scaling, so downstream semantics are preserved); NULLs stay NULL.

    Percentiles in one grouped aggregate, broadcast back; the clamp is a
    pure ``least/greatest`` projection — narrow, codegen,
    bit-reproducible (clipped values equal the percentile itself;
    unclipped values are untouched, so no scaling discipline is even
    needed). ``exact`` / ``accuracy`` trade oracle-exact interpolation
    against the fixed-state ``percentile_approx`` sketch exactly as in
    :func:`robust_scale` — prefer ``exact=False`` for ungrouped clips at
    scale.
    """
    if not cols:
        raise ValueError("winsorize needs at least one column")
    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    by = by or []
    pctl = _pctl_fn(exact, accuracy)
    aggs = []
    for i, c in enumerate(cols):
        d = F.col(c).cast("double")
        aggs.append(pctl(d, p_lo).alias(f"_lo_{i}"))
        aggs.append(pctl(d, p_hi).alias(f"_hi_{i}"))
    stats = df.groupBy(*by).agg(*aggs)
    joined = (
        df.join(F.broadcast(stats), by) if by else df.crossJoin(F.broadcast(stats))
    )
    out_cols = []
    for c in df.columns:
        if c in cols:
            i = cols.index(c)
            clipped = F.least(
                F.greatest(F.col(c).cast("double"), F.col(f"_lo_{i}")),
                F.col(f"_hi_{i}"),
            )
            # least/greatest IGNORE nulls (they'd resurrect a NULL as the
            # clip bound) — guard explicitly
            out_cols.append(
                F.when(F.col(c).isNotNull(), clipped).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def rank_normalize(
    df: DataFrame,
    cols: list[str],
    by: list[str] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Quantile (rank) transform: replace each column with its percent
    rank in ``[0, 1]`` (optionally per group) — the normalization that
    makes any monotone feature uniform regardless of its distribution,
    the nonparametric sibling of :func:`standardize` (heavy tails,
    mixed units and outliers all flatten to rank).

    Equal values get equal ranks (min-rank / SQL ``percent_rank``
    semantics), so the transform is deterministic without a tie-break.
    NULLs stay NULL and are EXCLUDED from the rank: they sort last
    (never shifting non-null ranks) and the denominator is the non-null
    count, so ``pr = (rank − 1) / (n_nonnull − 1)``; single-value groups
    rank 0.

    Plan — grouped: one window per column on the same partition key
    (Catalyst collapses same-key windows into a single sort per distinct
    order, so k columns cost one shuffle). UNGROUPED inputs never see a
    global-order window (one task would sort everything): min-rank comes
    from the distinct-VALUE frequency table instead — ``rank(x) = 1 +
    Σ count(v < x)``, i.e. an exclusive cumulative count over distinct
    values via the two-phase ``scalable_cumsum``, joined back on the
    value. Cost per column: the frequency aggregate, the (distinct-value
    -sized) cumsum, one value join; shuffle volume is bounded by the
    value CARDINALITY, not the row count. Ranks are floor-scaled to
    ``scale``.
    """
    if not cols:
        raise ValueError("rank_normalize needs at least one column")
    by = by or []
    p10 = float(10**scale)
    out = df
    if by:
        for c in cols:
            w = Window.partitionBy(*[F.col(g) for g in by]).orderBy(
                F.col(c).asc_nulls_last()
            )
            wp = Window.partitionBy(*[F.col(g) for g in by])
            m = F.count(F.col(c)).over(wp)
            pr = F.when(
                m > 1,
                (F.rank().over(w) - F.lit(1)).cast("double") / (m - F.lit(1)),
            ).otherwise(F.lit(0.0))
            out = out.withColumn(
                f"_rn_{c}",
                F.when(
                    F.col(c).isNotNull(),
                    F.floor(F.lit(p10) * pr) / F.lit(p10),
                ).cast("double"),
            )
    else:
        from etl_tools_rs_spark.operators.packing import scalable_cumsum

        for c in cols:
            d = F.col(c).cast("double")
            freq = (
                df.filter(d.isNotNull())
                .groupBy(d.alias("_val"))
                .agg(F.count(F.lit(1)).alias("_cnt"))
            )
            cum = scalable_cumsum(freq, "_val", "_cnt", out_col="_cum")
            m1 = cum.agg(F.sum("_cnt").alias("_m"))
            pr = F.when(
                F.col("_m") > 1,
                (F.col("_cum") - F.col("_cnt")).cast("double")
                / (F.col("_m") - F.lit(1)),
            ).otherwise(F.lit(0.0))
            vals = cum.crossJoin(F.broadcast(m1)).select(
                "_val",
                (F.floor(F.lit(p10) * pr) / F.lit(p10))
                .cast("double")
                .alias(f"_rn_{c}"),
            )
            out = out.join(
                vals, on=out[c].cast("double") == vals["_val"], how="left"
            ).drop("_val")
    sel = []
    for c in df.columns:
        if c in cols:
            sel.append(F.col(f"_rn_{c}").alias(c))
        else:
            sel.append(F.col(c))
    return out.select(*sel)
