"""Deterministic sampling & dataset splitting.

Training-data pipelines need reproducible samples: the same row must land
in the same split on every run, at any parallelism, on any engine —
`df.sample()`/`TABLESAMPLE` are seeded per-partition and reshuffle-unstable,
so everything here derives membership from a content hash instead
(md5 → uniform 60-bit integer, the same `kmv_hash` primitive the KMV
sketch uses). Hash-derived sampling is also exactly reproducible in the
DuckDB oracle, so these ops are value-checkable, not just rows-counted.

Scale: hash_sample / hash_split are pure narrow projections (no shuffle,
no state — they compose with any scan and push nothing to the driver);
stratified_sample_exact is one window shuffle on the stratum key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_tools_rs_spark.session import default_parallelism

from etl_tools_rs_spark.operators.sketch import TWO_POW_60, kmv_hash


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by content hash of ``key_col`` —
    deterministic, partitioning-independent, and stable across runs (a row
    once sampled stays sampled, the property incremental pipelines need).
    Narrow: no shuffle."""
    threshold = int(fraction * TWO_POW_60)
    return df.filter(kmv_hash(key_col) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. train/val/test)
    by hash bucket: ``weights`` maps split name → fraction (must sum to
    ≤ 1.0; any remainder falls into the last split). Disjoint and
    exhaustive by construction; adding rows later never moves existing
    rows between splits. Narrow: no shuffle."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    h = kmv_hash(key_col)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        bound = int(cum * TWO_POW_60)
        branch = F.when(h < F.lit(bound), F.lit(name))
        expr = branch if expr is None else expr.when(h < F.lit(bound), F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def stratified_sample_exact(
    df: DataFrame,
    stratum_cols: list[str],
    n_per_stratum: int,
    order_key: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), selected by hash order of ``order_key`` — a deterministic
    uniform draw within each stratum. One shuffle on the stratum key; the
    hash ranking replaces the usual ORDER BY rand() (unstable across
    engines and retries)."""
    w = Window.partitionBy(*stratum_cols).orderBy(
        kmv_hash(order_key), F.col(order_key)
    )
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= n_per_stratum)
        .drop("_sr")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group sampling rates — the corpus-mixture primitive: training
    recipes keep e.g. 100% of books, 30% of web, 5% of logs. ``rates``
    maps group value → keep fraction; unlisted groups keep
    ``default_rate``. Membership is the same content hash as
    ``hash_sample`` (deterministic, reshuffle-stable, engine-portable, and
    independent of the group column — re-weighting a group later keeps
    the retained set nested: raising a rate only ADDS rows, a property
    epoch-over-epoch data curricula rely on).

    Narrow projection, no shuffle: the rate lookup is a broadcast-free
    literal CASE over the (small) recipe map.
    """
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    h = kmv_hash(key_col)
    thr: Column = F.lit(int(default_rate * TWO_POW_60))
    expr = F.when(F.lit(False), F.lit(0))  # seed the CASE chain
    for g, r in rates.items():
        expr = expr.when(F.col(group_col) == F.lit(g), F.lit(int(r * TWO_POW_60)))
    return df.filter(h < expr.otherwise(thr))


def epoch_shuffle_rank(
    df: DataFrame, key_col: str, epoch: int, rank_col: str = "shuffle_rank"
) -> DataFrame:
    """Deterministic per-epoch global shuffle order: rank rows by a
    salted content hash (salt = epoch), so every epoch visits the corpus
    in a different but exactly reproducible order — replacing
    ``ORDER BY rand()``, which resamples on task retry and cannot be
    replayed. Ties are impossible up to hash collisions (md5-60bit);
    collision ties break by the key itself.

    The rank is a global row_number in hash order, computed with the
    two-phase distributed pattern (range-bucket the hash, rank within
    buckets in parallel, add per-bucket offsets) — NO single-partition
    window anywhere; for a pure output ORDER without the rank column,
    just ``orderBy`` the hash (a plain range shuffle).
    """
    from etl_tools_rs_spark.operators.packing import _bucket_of

    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(str(epoch)), F.col(key_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    spark = df.sparkSession
    n = default_parallelism(spark)
    hashed = df.withColumn("__eh", h)
    probs = [i / n for i in range(1, n)]
    bounds = sorted(set(hashed.stat.approxQuantile("__eh", probs, 0.001))) if probs else []
    bucketed = hashed.withColumn("__b", _bucket_of(F.col("__eh"), bounds))
    w = Window.partitionBy("__b").orderBy(F.col("__eh").asc(), F.col(key_col).asc())
    local = bucketed.withColumn("__local", F.row_number().over(w))
    counts = {
        r["__b"]: r["__n"]
        for r in bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    offsets, acc = [], 0
    for b in range(len(bounds) + 1):
        offsets.append(acc)
        acc += counts.get(b, 0)
    offs = F.array(*[F.lit(o).cast("bigint") for o in offsets])
    return (
        local.withColumn(
            rank_col,
            (
                F.col("__local") + F.element_at(offs, F.col("__b").cast("int") + F.lit(1))
            ).cast("bigint"),
        )
        .drop("__b", "__local", "__eh")
    )


def negative_sample(
    df: DataFrame,
    key_col: str,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling: pair every row with ``k``
    pseudo-random OTHER rows of the same frame (contrastive/retrieval
    training data). Output: ``(key_col, neg_rank 1..k, neg_<key_col>)``.

    No rand(), no cross join: each row's j-th negative is chosen by
    content hash (md5, engine-portable) modulo the corpus size, resolved
    through a dense hash-ordered index — so the sample is reproducible
    across runs, partitionings, and engines, and a retried task regenerates
    identical pairs. A probe that lands on the row itself shifts to the
    next index cyclically (+1 mod n) — always a different row, always in
    range, still deterministic.

    Plan: dense index via the two-phase distributed rank (no single-
    partition window), explode k probes (k·N narrow rows), one equi-join
    on the index. All hashing is JVM codegen.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    indexed = epoch_shuffle_rank(df.select(key_col), key_col, epoch=0, rank_col="__idx")
    n = indexed.count()
    if n < 2:
        raise ValueError("need at least 2 rows to draw negatives")
    key = F.col(key_col)

    def probe(j: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"), j.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return F.pmod(h, F.lit(n)) + F.lit(1)  # 1-based index

    probes = (
        indexed.select(key, F.col("__idx"), F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"))
        .withColumn("__cand", probe(F.col("neg_rank")))
        .withColumn(
            "__neg_idx",
            F.when(F.col("__cand") != F.col("__idx"), F.col("__cand")).otherwise(
                F.pmod(F.col("__cand"), F.lit(n)) + F.lit(1)
            ),
        )
        .select(key, "neg_rank", "__neg_idx")
    )
    lookup = indexed.select(
        F.col("__idx").alias("__neg_idx"), key.alias(f"neg_{key_col}")
    )
    # shuffle_hash pin (r7): probes sits above the k-probe Generate, so
    # Catalyst's size estimate understates it ×k and can broadcast a k·N
    # frame (broadcast_above_generate class). Neither side is small —
    # probes is k·N, lookup is N — so the shuffled hash join (build =
    # lookup, the narrower side) is the only shape that survives scale.
    return probes.join(lookup.hint("shuffle_hash"), "__neg_idx").drop("__neg_idx")


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str | Column
) -> DataFrame:
    """Per-row Bernoulli sampling with row-specific keep probability
    (quality-weighted corpus pruning: keep high-quality documents with
    probability ∝ their score): keep a row iff
    ``uniform_hash(key) < clamp(weight, 0, 1)``.

    Deterministic — the 'coin flip' is the content hash of ``key_col``,
    so re-runs keep exactly the same rows (and raising a row's weight
    can only ADD it, never drop it: monotone under weight increases,
    the property curriculum re-weighting needs). Narrow: no shuffle,
    no rand(). Weights outside [0, 1] clamp."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wc = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    u = kmv_hash(key_col).cast("double") / F.lit(TWO_POW_60)
    return df.filter(u < wc)


def top_p_by_group(
    df: DataFrame,
    score_col: str | Column,
    weight_col: str | Column,
    by: list[str] | None = None,
    p: float = 0.9,
    tie_col: str | None = None,
) -> DataFrame:
    """Nucleus (top-p) pruning per group: order rows by ``score_col``
    descending, keep the smallest prefix whose ``weight_col`` share
    reaches ``p`` of the group total (the row that crosses the
    threshold is INCLUDED — output shares are ≥ p, as in nucleus
    sampling). The corpus-pruning form of 'keep the best 90% of mass,
    not the best 90% of rows'.

    ``tie_col`` (default ``score_col``) breaks score ties
    deterministically — required for a stable result set.

    One shuffle on the group key; the cumulative window runs per group
    in parallel. Group totals come from a window (no second scan).
    """
    if not 0 < p <= 1:
        raise ValueError(f"p must be in (0, 1], got {p!r}")
    by = by or []
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    weight = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    if tie_col is None and not isinstance(score_col, str):
        raise ValueError("tie_col is required when score_col is an expression")
    tie = F.col(tie_col) if tie_col else score
    order = [score.desc(), tie.asc()]
    # weights must be non-negative and each group total positive — a zero/
    # negative total makes cumulative shares NaN/mis-ordered and rows would
    # silently vanish. The guards live INSIDE the computation path (not a
    # droppable side column), so they raise at execution time, loudly.
    checked_weight = F.when(
        weight < 0,
        F.raise_error(F.lit("top_p_by_group: negative weight encountered")),
    ).otherwise(weight)
    wsum = Window.partitionBy(*by)
    wcum = wsum.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    total_raw = F.sum(checked_weight).over(wsum)
    total = F.when(
        total_raw <= 0,
        F.raise_error(F.lit("top_p_by_group: group weight total is <= 0")),
    ).otherwise(total_raw)
    cum = F.sum(checked_weight).over(wcum)
    # exact-decimal weights keep the sums add-order-proof; the single
    # double division at the end is deterministic either way
    prev = (cum - weight).cast("double")
    return (
        df.withColumn("_prev_share", prev / total.cast("double"))
        .filter(F.col("_prev_share") < p)
        .drop("_prev_share")
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: every row lands in fold
    ``hash(key) mod k`` — the cross-validation splitter with the same
    contracts as ``hash_split``: disjoint, exhaustive, stable under
    data growth and re-partitioning (a row's fold never changes when
    other rows arrive), identical across engines. Narrow projection,
    no shuffle, no rand().

    Rows sharing ``key_col`` share a fold (group-level splitting — the
    leakage-safe behavior when the key identifies an entity)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k!r}")
    return df.withColumn(
        fold_col, F.pmod(kmv_hash(key_col), F.lit(k)).cast("int")
    )


def leakage_safe_split(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split that can never leak a duplicated document
    across splits: the split key is the exact-dup fingerprint (md5 of
    normalized text, functions.fingerprint), so byte-identical documents
    — however many copies, wherever they live — always land in the SAME
    split. The standard guard against test-set contamination by exact
    duplicates; near-dups need a group key from minhash/connected
    components instead (pass that key to ``hash_split`` directly).

    Same contracts as ``hash_split``: narrow projection, no shuffle,
    disjoint + exhaustive, growth-stable."""
    from etl_tools_rs_spark.functions import fingerprint

    return hash_split(
        df.withColumn("_fp", fingerprint(text_col)), "_fp", weights, split_col
    ).drop("_fp")


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.7,
    target_total: int | None = None,
    scale: int = 6,
) -> DataFrame:
    """Temperature-based mixture rates (the multilingual/multi-domain
    α-sampling rule: sample probability ∝ size^α, α < 1 upweights small
    domains): per group, its size, its α-tempered share, and the
    per-row keep ``rate`` that realizes ``target_total`` expected rows
    (capped at 1.0 — a small domain can't yield more rows than it has;
    when ``target_total`` is None, rates scale the LARGEST group to 1.0,
    i.e. pure re-balancing). Feed the rates straight into
    ``mixture_sample`` for the deterministic row draw.

    One size aggregate + a 1-row broadcast of the normalizing constant —
    group-count-sized throughout, composes at any scale. All shares are
    floor-scaled to ``scale`` dp (identical expression shape in the
    DuckDB oracle; floor has no half-way boundary, so pow()'s last-ulp
    engine differences can't flip values).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha!r}")
    p10 = float(10**scale)

    def fl(c: Column) -> Column:
        return F.floor(F.lit(p10) * c) / F.lit(p10)

    sizes = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # quantize each tempered size to `scale` dp BEFORE summing, and sum
    # as exact decimal: a raw double sum of pow() terms is add-order
    # sensitive, and when a share lands exactly on a floor boundary
    # (uniform groups: share = 1/k) the last ulp of the sum decides the
    # floored value — observed flipping 0.05 <-> 0.049999 across runs.
    # Quantized-decimal sums are partition/AQE/engine-order-proof.
    dec_t = f"decimal(38,{scale})"
    tempered = (
        F.floor(
            F.lit(p10) * F.pow(F.col("n").cast("double"), F.lit(float(alpha)))
        )
        / F.lit(p10)
    ).cast(dec_t)
    tot = sizes.agg(
        F.sum(tempered).cast("double").alias("_z"),
        F.max(tempered).cast("double").alias("_m"),
    )
    tempered = tempered.cast("double")
    share = fl(tempered / F.col("_z"))
    if target_total is None:
        rate = F.least(F.lit(1.0), fl(tempered / F.col("_m")))
    else:
        rate = F.least(
            F.lit(1.0),
            fl(
                F.lit(float(target_total))
                * (tempered / F.col("_z"))
                / F.col("n")
            ),
        )
    return sizes.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n",
        share.cast("double").alias("share"),
        rate.cast("double").alias("rate"),
    )


def cap_per_group(
    df: DataFrame,
    by: list[str],
    k: int,
    key_col: str,
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``k`` rows per ``by``
    group, chosen by content-hash order of ``key_col`` — the per-domain /
    per-source cap every crawl-scale corpus applies so a handful of huge
    hosts cannot dominate the training mix (the same shape as C4's and
    RefinedWeb's per-domain limits).

    Hash order (md5 of the row key, ties broken by the key itself) makes
    the KEPT SET stable across runs, partitionings and engines — rows
    added to a group later displace only rows whose hash ranks below
    them, never reshuffle the survivors arbitrarily — and makes the op
    oracle-checkable value-for-value, unlike ``ORDER BY rand()`` caps.

    Plan: one row_number window on the group key (single shuffle).
    Groups at or under ``k`` pass through whole. At 100 TB the window
    input can pre-shrink: a mega-group's rows all carry the group key,
    so AQE skew-split handles hot domains; no driver state, no collect.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    if not by:
        raise ValueError("cap_per_group needs at least one group column")
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        kmv_hash(key_col), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def budget_allocate(
    domains: DataFrame,
    count_col: str,
    weight_col: str,
    budget: float,
    scale: int = 6,
) -> DataFrame:
    """Water-filling budget allocation: split a total token/row
    ``budget`` across domains proportionally to ``weight_col`` but
    capped by each domain's availability ``count_col`` — the step
    between mixture weights (e.g. :func:`temperature_rates`) and an
    actual sampling quota: naive ``budget·wᵢ`` overshoots domains with
    too little data, and the surplus must cascade to the others.

    Allocation: ``aᵢ = min(cᵢ, τ·wᵢ)`` with the water level τ chosen so
    ``Σaᵢ = min(budget, Σc)`` — small/over-asked domains saturate at
    their full count, the rest share the remainder by weight. τ has a
    closed relational form: sort domains by saturation ratio
    ``rᵢ = cᵢ/wᵢ``, take prefix sums, and the unique segment where
    ``τ = (budget − cumC) / (W − cumW)`` lies between consecutive r's
    wins. Exact, deterministic, oracle-checkable — no iteration.

    ``domains`` is an AGGREGATED per-domain table (one row per domain —
    the output of a groupBy upstream), so the prefix-sum window runs
    over group-count-sized data; that is the same deliberate exception
    as every stats frame in the engine, documented here: do NOT call
    this on row-level data. Output: input columns + ``alloc double``
    (floor-scaled), ``saturated boolean``. Weights must be > 0 and
    counts ≥ 0 (guarded in-plan).
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget!r}")
    p10 = float(10**scale)

    def fl(c: Column) -> Column:
        return F.floor(F.lit(p10) * c) / F.lit(p10)

    c = F.col(count_col).cast("double")
    wgt = F.col(weight_col).cast("double")
    guard = F.assert_true(
        c.isNotNull() & (c >= 0) & wgt.isNotNull() & (wgt > 0),
        f"budget_allocate: need {count_col} >= 0 and {weight_col} > 0",
    )
    base = domains.select(
        "*",
        (c + F.coalesce(guard.cast("double"), F.lit(0.0))).alias("_c"),
        wgt.alias("_w"),
        (c / wgt).alias("_r"),
    )
    # prefix sums in saturation-ratio order over the DOMAIN table
    # (group-count-sized by contract — see docstring)
    w = Window.orderBy(F.col("_r").asc(), F.col("_c").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = base.select(
        "*",
        F.sum("_c").over(w).alias("_cumC"),
        F.sum("_w").over(w).alias("_cumW"),
        F.lead("_r").over(
            Window.orderBy(F.col("_r").asc(), F.col("_c").asc())
        ).alias("_rnext"),
    )
    totals = base.agg(
        F.sum("_c").alias("_Ctot"), F.sum("_w").alias("_Wtot")
    )
    # the winning segment: τ computed from everything at-or-below this
    # row's ratio; valid when τ falls in [r, r_next). Edge segments:
    # τ = budget/W below the smallest r; everything saturates when
    # budget >= total count.
    seg = pre.crossJoin(F.broadcast(totals))
    # try_divide: the LAST row has cumW == Wtot (zero divisor) and is
    # excluded by `valid` anyway — ANSI division would error first
    tau_here = F.try_divide(
        F.lit(float(budget)) - F.col("_cumC"),
        F.col("_Wtot") - F.col("_cumW"),
    )
    valid = (
        (F.col("_r") <= tau_here)
        & ((F.col("_rnext").isNull()) | (tau_here < F.col("_rnext")))
        & (F.col("_Wtot") > F.col("_cumW"))
    )
    tau0 = F.lit(float(budget)) / F.col("_Wtot")  # no domain saturates
    cand = seg.select(
        F.when(valid, tau_here).alias("_tau_seg"),
        F.when(
            F.min("_r").over(Window.orderBy(F.lit(1))) > tau0, tau0
        ).alias("_tau_zero"),
        "_Ctot",
    )
    tau_row = cand.agg(
        F.coalesce(
            F.max("_tau_zero"), F.max("_tau_seg"), F.lit(float("inf"))
        ).alias("_tau"),
        F.max("_Ctot").alias("_Call"),
    )
    out = base.crossJoin(F.broadcast(tau_row))
    alloc = F.when(
        F.lit(float(budget)) >= F.col("_Call"), F.col("_c")
    ).otherwise(F.least(F.col("_c"), F.col("_tau") * F.col("_w")))
    saturated = F.when(
        F.lit(float(budget)) >= F.col("_Call"), F.lit(True)
    ).otherwise(F.col("_c") <= F.col("_tau") * F.col("_w"))
    keep = [col for col in domains.columns]
    return out.select(
        *keep,
        fl(alloc).cast("double").alias("alloc"),
        saturated.alias("saturated"),
    )
