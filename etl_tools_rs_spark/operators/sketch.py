"""Distinct-count sketching — KMV (k-minimum-values).

The deterministic, oracle-checkable alternative to HyperLogLog for
approximate COUNT(DISTINCT): hash every value to a uniform 60-bit integer
(md5 prefix — identical in any engine with md5), keep the k smallest
distinct hashes per group; if the k-th smallest maps to fraction
``f = h_k / 2^60`` of the hash space, the group holds ≈ ``(k-1)/f``
distinct values. Standard error ≈ 1/sqrt(k-2).

Why not HLL (`approx_count_distinct`): engine sketches differ bit-for-bit
across implementations, so results can't be verified against an oracle.
KMV from md5 is exactly reproducible anywhere, and the sketch itself (the
k hashes) is mergeable across partitions/datasets by min-k union —
the property that matters at 100 TB (combine per-shard sketches without
rescanning).

Plan shape: distinct (one shuffle on (group, hash) with map-side partial
dedup) → per-group k smallest via row_number window (second shuffle on
group) → 1-row-per-group aggregate. For very hot groups the distinct
pre-shuffle bounds the window input to the number of DISTINCT values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TWO_POW_60 = float(1 << 60)


def kmv_hash(col: str | Column) -> Column:
    """Uniform 60-bit hash: first 15 hex chars of md5, as bigint. Matches
    DuckDB ``CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    by: list[str] | None = None,
    scale: int = 4,
) -> DataFrame:
    """Approximate distinct ``value_col`` count per ``by`` group.

    Output: group cols + ``est_distinct`` (double). Groups with fewer than
    ``k`` distinct values return the EXACT count (the sketch degenerates
    to exact below its capacity). The estimate division is floor-scaled so
    the value is bit-stable cross-engine.
    """
    by = by or []
    # md5(NULL) is NULL: drop NULL hashes before the window — Spark sorts
    # NULLs first while DuckDB sorts them last, and a NULL slot would both
    # occupy sketch capacity and skew _cnt (NULL never counts as a value)
    hashed = (
        df.select(*by, kmv_hash(value_col).alias("_hv"))
        .filter(F.col("_hv").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("_hv")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    agg = topk.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_cnt"), F.max("_hv").alias("_kth")
    )
    p = float(10**scale)
    est = F.when(F.col("_cnt") < k, F.col("_cnt").cast("double")).otherwise(
        F.floor(
            F.lit(p) * (F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("_kth"))
        )
        / p
    )
    return agg.select(*by, est.cast("double").alias("est_distinct"))


# ---------------------------------------------------------------------------
# Count-Min sketch — approximate per-key frequencies in bounded space
# ---------------------------------------------------------------------------


def cm_hash(value: Column, d: Column | int, width: int) -> Column:
    """Count-Min row hash: 60-bit md5 prefix of ``d || ':' || value``,
    mod ``width``. Matches DuckDB ``CAST(concat('0x', substring(
    md5(d || ':' || x), 1, 15)) AS BIGINT) % width`` bit-for-bit (both
    operands non-negative, so Spark's % and DuckDB's % agree)."""
    dc = F.lit(d) if isinstance(d, int) else d
    h = F.conv(
        F.substring(
            F.md5(F.concat(dc.cast("string"), F.lit(":"), value.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h % width


def count_min(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch of ``value_col`` frequencies: a ``depth`` ×
    ``width`` counter table ``(d, w, cnt)``.

    Why this sketch at 100 TB: cell counts are plain SUMs, so the sketch
    is (a) partitioning-independent — any shard order yields the same
    table, (b) mergeable — union per-shard sketches and re-sum cell-wise
    (``merge_count_min``), and (c) exactly oracle-checkable, unlike
    probabilistic-state sketches (HLL registers) whose bytes differ per
    implementation. Estimates overcount only (never undercount):
    est(v) = min over d of cell(d, h_d(v)), error ≤ 2N/width with
    probability ≥ 1 - (1/2)^depth.

    Plan shape: ``depth`` rows per input row generated in the narrow
    stage, then ONE groupBy(d, w) shuffle whose map-side combine caps the
    shuffle at depth × width rows per input partition — shuffle volume is
    bounded by the sketch size, not the data size. NULL values are
    excluded, matching COUNT(value_col) semantics.
    """
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth and width must be positive; got {depth}x{width}")
    rows = df.select(F.col(value_col).alias("_v")).filter(
        F.col("_v").isNotNull()
    ).select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), "_v"
    )
    hashed = rows.select("d", cm_hash(F.col("_v"), F.col("d"), width).alias("w"))
    return hashed.groupBy("d", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def merge_count_min(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with the same (depth, width, hash
    family): union + cell-wise re-sum. The per-shard path at scale —
    sketch each partition/day/source independently, merge for the global
    view."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each key,
    ``est_count`` = min over the key's ``depth`` cells (0 when a cell is
    absent — the key was never seen).

    The sketch is depth × width rows — broadcast it; the probe is then a
    narrow map-side join however large the key set is.
    """
    kd = keys.select(F.col(key_col)).filter(F.col(key_col).isNotNull()).select(
        key_col, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    )
    probed = kd.select(
        key_col, "d", cm_hash(F.col(key_col), F.col("d"), width).alias("w")
    )
    return (
        probed.join(F.broadcast(sketch), ["d", "w"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Apache DataSketches) — the native mergeable-sketch surface
# ---------------------------------------------------------------------------
#
# Complements KMV: HLL sketches are NOT oracle-checkable (the binary is
# engine-specific), but they are the production path for distinct counts
# at 100 TB — fixed 2^lg_k bytes per group regardless of cardinality, and
# the sketch column itself persists/merges across days and shards via
# hll_union_agg without rescanning history. Use KMV when cross-engine
# verifiability matters, HLL when state size and re-aggregation matter.


def hll_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch (binary column ``hll``) of distinct
    ``value_col`` values. One shuffle with map-side partial aggregation —
    each map task emits one lg_k-sized sketch per group, not its rows."""
    by = by or []
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias("hll")
    )


def merge_hll(*sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Union per-group sketches from multiple shards/days: the shuffle
    moves only sketch bytes. Output schema matches ``hll_sketch``."""
    by = by or []
    union = sketches[0]
    for s in sketches[1:]:
        union = union.unionByName(s)
    return union.groupBy(*by).agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimate(sketch_df: DataFrame) -> DataFrame:
    """Distinct-count estimates from a sketch frame: replaces the binary
    ``hll`` column with ``est_distinct`` (bigint)."""
    others = [c for c in sketch_df.columns if c != "hll"]
    return sketch_df.select(
        *others, F.hll_sketch_estimate("hll").cast("bigint").alias("est_distinct")
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 256,
    scale: int = 6,
) -> DataFrame:
    """Set-overlap estimation from KMV sketches (Beyer et al., SIGMOD'07):
    Jaccard, union and intersection cardinality of two key sets WITHOUT
    ever joining the raw sets — the audience-overlap / channel-overlap
    query at 100 TB, where the exact distinct-intersection would shuffle
    every key of both sides.

    ``S_A``/``S_B`` = the k smallest 60-bit hashes of each side's
    distinct keys; ``S_U`` = k smallest of their union; the fraction of
    ``S_U`` present in BOTH sketches estimates Jaccard, and the union
    cardinality comes from the kth smallest union hash. Below sketch
    capacity everything degenerates to exact. Deterministic (md5 hash
    order, no sampling) — oracle-checkable, and the same estimator both
    engines.

    Plan: each side is a distinct + ``orderBy().limit(k)`` —
    TakeOrderedAndProject (per-partition top-k + driver merge of
    k×partitions rows), NEVER a single-partition global window; the
    final flags/aggregate run over ≤ 2k rows. Output (1 row):
    ``(k, n_union_sketch bigint, est_union double, jaccard_est double,
    est_intersection double)``.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k!r}")
    p10 = float(10**scale)

    def fl(c: Column) -> Column:
        return F.floor(F.lit(p10) * c) / F.lit(p10)

    def sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(kmv_hash(value_col).alias("_hv"))
            .filter(F.col("_hv").isNotNull())
            .distinct()
            .orderBy("_hv")
            .limit(k)
        )

    sa = sketch(df_a)
    sb = sketch(df_b)
    su = sa.union(sb).distinct().orderBy("_hv").limit(k)
    flagged = (
        su.join(sa.withColumn("_in_a", F.lit(1)), "_hv", "left")
        .join(sb.withColumn("_in_b", F.lit(1)), "_hv", "left")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.max("_hv").alias("_kth"),
        F.count(
            F.when(F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull(), 1)
        ).alias("_both"),
    )
    est_union = F.when(
        F.col("_cnt") < k, F.col("_cnt").cast("double")
    ).otherwise(
        fl(F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("_kth"))
    )
    jacc = fl(F.col("_both") / F.col("_cnt"))
    return agg.select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("_cnt").cast("bigint").alias("n_union_sketch"),
        est_union.cast("double").alias("est_union"),
        F.when(F.col("_cnt") > 0, jacc).alias("jaccard_est"),
        F.when(F.col("_cnt") > 0, fl(jacc * est_union)).alias(
            "est_intersection"
        ),
    )


# ---------------------------------------------------------------------------
# Quantile sketch — bottom-k uniform-hash sample (mergeable SRS quantiles)
# ---------------------------------------------------------------------------
# The quantile member of the sketch family (KMV = distinct counts,
# Count-Min = frequencies, HLL = compact distinct state): a deterministic
# simple random sample taken as the k rows whose content hash is smallest.
# Bottom-k by a uniform hash IS an SRS without replacement, every row has
# equal inclusion probability, so equal-weight quantiles over the sample
# estimate population quantiles with the usual sqrt(k) error — and unlike
# engine-native quantile sketches (t-digest / KLL / GK), the state is
# plain (hash, value) rows: exactly reproducible in any engine with md5
# (oracle-checkable), mergeable by min-k union (`merge_quantile_sketch`
# — combine per-shard/per-day sketches without rescanning history), and
# partitioning-independent.
#
# Plan shape at 100 TB: ungrouped sketches are distinct-free
# TakeOrderedAndProject (per-partition bottom-k, driver merges
# k x partitions rows — never a global sort); grouped sketches are one
# row_number window on the group key. Estimation runs over <= k rows per
# group.


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    by: list[str] | None = None,
) -> DataFrame:
    """Bottom-k quantile sketch: the ``k`` rows of ``df`` (per ``by``
    group) with the smallest 60-bit md5 hash of ``key_col``, carrying
    ``value_col`` as double. Output: ``by`` cols + ``(_hv bigint,
    _qv double)`` — tall, mergeable, engine-neutral.

    ``key_col`` must identify a row (an id/PK): the hash is the sampling
    coin, so duplicate keys would collapse to one sample slot (that
    property is exactly what makes the min-k union merge exact — the
    same row arriving from two shards occupies one slot, not two).
    NULL keys and NULL values never enter the sketch.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k!r}")
    by = by or []
    rows = df.select(
        *by,
        kmv_hash(key_col).alias("_hv"),
        F.col(value_col).cast("double").alias("_qv"),
    ).filter(F.col("_hv").isNotNull() & F.col("_qv").isNotNull())
    if not by:
        return rows.orderBy("_hv").limit(k)
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("_hv")
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def merge_quantile_sketch(
    *sketches: DataFrame, k: int = 256, by: list[str] | None = None
) -> DataFrame:
    """Min-k union of quantile sketches (shards/days/backfills): union the
    tall sketch frames, dedupe the sample slot (a row present in several
    shards re-hashes identically), keep the k smallest per group. Exactly
    equals sketching the concatenated input — the merge law the unit
    tests pin — and the shuffle moves only sketch rows.
    """
    by = by or []
    union = sketches[0]
    for s in sketches[1:]:
        union = union.unionByName(s)
    union = union.dropDuplicates([*by, "_hv"])
    if not by:
        return union.orderBy("_hv").limit(k)
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy("_hv")
    return (
        union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantile_estimate(
    sketch_df: DataFrame,
    ps: list[float],
    by: list[str] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Quantile estimates from a sketch frame: one row per ``by`` group
    and requested quantile, ``(by..., p double, est_q double)``.

    Linear-interpolated percentile over the equal-weight sample — the
    same interpolation as DuckDB ``quantile_cont`` (rank ``p * (n-1)``),
    floor-scaled to ``scale`` decimals for cross-engine bit-stability.
    Below sketch capacity the sample is the population, so estimates are
    exact.
    """
    if not ps:
        raise ValueError("ps must name at least one quantile")
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"quantile {p!r} outside [0, 1]")
    by = by or []
    p10 = float(10**scale)
    aggs = [
        (
            F.floor(F.lit(p10) * F.percentile(F.col("_qv"), F.lit(float(p))))
            / F.lit(p10)
        ).alias(f"_q_{i}")
        for i, p in enumerate(ps)
    ]
    one = sketch_df.groupBy(*by).agg(*aggs)
    # long form via one explode — per-p union branches would re-plan the
    # aggregate once per quantile
    kv = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("p"),
                F.col(f"_q_{i}").cast("double").alias("est_q"),
            )
            for i, p in enumerate(ps)
        ]
    )
    return one.select(*by, F.explode(kv).alias("_kv")).select(
        *by, "_kv.p", "_kv.est_q"
    )


# ---------------------------------------------------------------------------
# Heavy hitters — Misra-Gries candidates + exact verify (two passes)
# ---------------------------------------------------------------------------


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    scale: int = 6,
    by: list[str] | None = None,
) -> DataFrame:
    """EXACT frequent items: every value with frequency > n/k, with its
    exact count and frequency — without ever shuffling the full distinct
    key set, which is what makes it a different operator from
    ``groupBy(col).count()`` at 100 TB: a plain group-by on an
    ultra-high-cardinality column (URLs, user ids, shingles) shuffles
    every distinct key; this shuffles at most ``k`` candidate keys.

    Pass 1 — Misra-Gries per partition (Arrow-batched ``mapInPandas``,
    ≤ ``k`` counters of bounded memory per task, batch-merged by the
    standard subtract-the-(k+1)-th-count reduction): by pigeonhole, any
    value with GLOBAL frequency > n/k has frequency > n_p/k in at least
    one partition, so the union of per-partition candidates has NO false
    negatives. Pass 2 — exact counts over candidate rows only (broadcast
    semi-join, then a ≤ k-key aggregate), filtered to the true > n/k
    hitters; false positives from pass 1 die here. Result is exact and
    deterministic — oracle = plain ``HAVING COUNT(*) > n/k``.

    Output: ``(by…, value_col, cnt bigint, freq double)`` with ``freq``
    floor-scaled to ``scale``. With ``by``, every group gets its own MG
    summary (per-task memory O(groups-in-partition × k)) and its own
    > n_group/k threshold — per-language top tokens, per-tenant top
    URLs, still without a full-distinct shuffle.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k!r}")
    by = by or []
    import pandas as pd

    proj = [*by, value_col]
    out_schema = df.select(*proj).schema

    def mg(pdfs) -> "pd.DataFrame":
        # one MG summary per group seen in this partition: memory is
        # O(groups-in-partition x k); with by=[] exactly one summary
        groups: dict[tuple, dict] = {}
        for pdf in pdfs:
            clean = pdf.dropna(subset=[value_col])
            vc = clean.groupby([*by, value_col], dropna=False, sort=False).size() if by else clean[value_col].value_counts()
            for key, c in vc.items():
                if by:
                    g, v = tuple(key[: len(by)]), key[len(by)]
                else:
                    g, v = (), key
                counters = groups.setdefault(g, {})
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > k:
                    # batched MG reduction: subtract the (k+1)-th
                    # largest count from everyone, keep the positive
                    # remainder
                    t = sorted(counters.values(), reverse=True)[k]
                    groups[g] = {v2: c2 - t for v2, c2 in counters.items() if c2 > t}
        out = {col: [] for col in proj}
        for g, counters in groups.items():
            for v in counters:
                for i, col in enumerate(by):
                    out[col].append(g[i])
                out[value_col].append(v)
        yield pd.DataFrame(
            {col: pd.Series(vals, dtype=object) for col, vals in out.items()}
        )

    cands = (
        df.select(*proj)
        .filter(F.col(value_col).isNotNull())
        .mapInPandas(mg, out_schema)
        .distinct()
    )
    total = df.groupBy(*by).agg(
        F.count(F.col(value_col)).cast("double").alias("_n")
    )
    counts = (
        df.select(*proj)  # verify scan carries only key columns
        .join(F.broadcast(cands), proj, "left_semi")
        .groupBy(*proj)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p10 = float(10**scale)
    joined = (
        counts.join(F.broadcast(total), by)
        if by
        else counts.crossJoin(F.broadcast(total))
    )
    return joined.filter(F.col("cnt") > F.col("_n") / k).select(
        *proj,
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.floor(F.lit(p10) * F.col("cnt") / F.col("_n")) / F.lit(p10))
        .cast("double")
        .alias("freq"),
    )
