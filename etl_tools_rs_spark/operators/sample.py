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
