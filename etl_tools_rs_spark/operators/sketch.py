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
