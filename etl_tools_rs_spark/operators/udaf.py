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
