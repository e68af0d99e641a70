"""User-defined aggregate surface (Arrow-vectorized pandas grouped aggs).

The reference has no UDAF surface at all (SURVEY §2.7 — its only
"functions" are per-record user closures, etl-core/src/transformer.rs:7-65);
this module is the engine's native extension for aggregations that built-in
Spark functions can't express.

Scale posture: pandas grouped-agg UDFs run executor-side over Arrow
batches — one shuffle on the grouping key, no driver involvement, no
per-row Python crossings. They do NOT do map-side partial aggregation
(each group's values stream to one executor), so for algebraic aggregates
ALWAYS prefer built-ins or exact-decimal compositions
(functions.dsum/davg); reserve UDAFs for genuinely non-algebraic logic
(weighted quantiles, trimmed means, custom sketches).

Composition rule (Spark restriction): pandas UDAFs may share one ``agg``
with other pandas UDAFs but NOT with JVM aggregate functions
(INVALID_PANDAS_UDF_PLACEMENT) — compute built-ins in a separate
aggregation over the same keys and join the two results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def weighted_mean(value_col: str | Column, weight_col: str | Column) -> Column:
    """Weight-averaged value as a vectorized pandas UDAF:
    sum(v*w)/sum(w) per group (NaN-safe: zero total weight → NULL)."""

    @pandas_udf("double")
    def _wmean(v: pd.Series, w: pd.Series) -> float:
        tw = float(w.sum())
        if tw == 0.0 or np.isnan(tw):
            return None
        return float((v * w).sum() / tw)

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return _wmean(v, w)


def weighted_mean_exact(
    value_units: str | Column,
    weight_units: str | Column,
    input_scale: int = 2,
    scale: int = 6,
) -> Column:
    """Order-independent exact weighted mean as a pandas UDAF: both
    inputs must ALREADY be integer-quantized (``value_units`` = value ×
    10^``input_scale`` as long, ``weight_units`` integral long) — the
    accumulation is then pure int64, so the result is bit-identical
    under any partitioning/Arrow-batch order, unlike the float form
    (:func:`weighted_mean`, whose pandas float sums are
    order-dependent). The division happens ONCE, as arbitrary-precision
    Python integer floor-division scaled to ``scale`` decimals — the
    engine's exact-quantization convention (cf. profile.rater_agreement)
    — so a DuckDB oracle reproduces it value-for-value. Positive-domain
    floor semantics (``//``), matching DuckDB ``//`` on HUGEINT.
    Zero/NULL total weight → NULL."""
    p = 10**scale
    q = 10**input_scale

    @pandas_udf("double")
    def _wm(vc: pd.Series, w: pd.Series) -> float:
        m = vc.notna() & w.notna()
        vi = vc[m].to_numpy(dtype=np.int64)
        wi = w[m].to_numpy(dtype=np.int64)
        tw = int(wi.sum())
        if tw == 0:
            return None
        num = int((vi * wi).sum())
        return float(num * p // (tw * q)) / p

    v = F.col(value_units) if isinstance(value_units, str) else value_units
    w = F.col(weight_units) if isinstance(weight_units, str) else weight_units
    return _wm(v, w)


def trimmed_mean_exact(
    value_units: str | Column,
    trim_frac: float = 0.1,
    input_scale: int = 2,
    scale: int = 6,
) -> Column:
    """Order-independent exact trimmed mean over integer-quantized
    values (value × 10^``input_scale`` as long): sort, drop
    ``k = (n·trim_frac·10⁶)//10⁶`` from each end (exact integer k — no
    float len×frac truncation ambiguity), int-sum the kept slice, one
    floor-scaled division. Tie order at the cut boundary cannot change
    the result (tied values contribute the same amount whichever
    instance is dropped), so this is deterministic AND oracle-portable
    where the float form (:func:`trimmed_mean`) is rows-only."""
    p = 10**scale
    q = 10**input_scale
    tf_units = round(trim_frac * 10**6)

    @pandas_udf("double")
    def _tm(vc: pd.Series) -> float:
        vi = np.sort(vc.dropna().to_numpy(dtype=np.int64))
        n = len(vi)
        k = (n * tf_units) // 10**6
        kept = vi[k : n - k] if n > 2 * k else vi
        if len(kept) == 0:
            return None
        return float(int(kept.sum()) * p // (len(kept) * q)) / p

    v = F.col(value_units) if isinstance(value_units, str) else value_units
    return _tm(v)


def trimmed_mean(value_col: str | Column, trim_frac: float = 0.1) -> Column:
    """Mean after dropping the top/bottom ``trim_frac`` of values per group
    — order-statistic logic that has no algebraic decomposition, the
    canonical "genuinely needs a UDAF" case."""

    @pandas_udf("double")
    def _tmean(v: pd.Series) -> float:
        s = v.dropna().sort_values()
        k = int(len(s) * trim_frac)
        kept = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
        return float(kept.mean()) if len(kept) else None

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return _tmean(v)
