"""Distributed logistic regression — the quality-classifier trainer.

No reference equivalent (extension surface): the standard corpus-curation
move (CCNet / GPT-3 / LLaMA data pipelines) is a linear classifier over
cheap document features that scores "does this look like the reference
corpus?". This is full-batch gradient descent where EVERY per-iteration
quantity is a relational aggregate:

- the gradient is ``Σ (σ(w·x) − y) · x_j`` — one codegen aggregate over
  the feature frame per iteration (map-side partial sums, a shuffle of
  exactly one row per partition), nothing but the (d+2)-value gradient
  vector ever reaches the driver;
- the weight update is d+1 Python floats — model state is metadata-sized
  (like k-means centroids in similarity.py), so T iterations cost T
  corpus scans and zero data collects. At 100 TB: ``.persist()`` the
  feature frame (computed once, scanned T times) or fit on a sample.

Determinism/oracle contract (the same policy as lm.py): each per-row
gradient term rounds to 6 dp and accumulates into an exact DECIMAL —
float add-order can never leak into the sums — and the weight update
``w − lr·(S/n)`` is a chain of correctly-rounded IEEE ops on exactly
reproducible inputs, so a DuckDB oracle that unrolls the SAME iterations
in SQL (``logreg_oracle_sql``) reproduces the weights BIT-FOR-BIT. An
oracle-checked iterative ML trainer: the hash gate covers not just one
query but the whole optimization trajectory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    features: list[Column],
    label: Column,
    iterations: int = 5,
    lr: float = 0.25,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch GD fit; returns ``[intercept, w_1, …, w_d]``.

    ``lr`` should be exactly binary-representable (0.25, 0.5, 0.125…)
    so the update arithmetic is engine-portable; features should be
    scaled to O(1) (this is plain GD — no line search). ``l2`` adds
    ridge shrinkage ``λ·w_j`` to each gradient (intercept excluded, the
    standard convention) — also exactly reproducible in the SQL oracle
    when λ is binary-representable."""
    feats = df.select(
        label.cast("double").alias("_y"),
        *[
            x.cast("double").alias(f"_x{j+1}")
            for j, x in enumerate(features)
        ],
    )
    d = len(features)
    w = [0.0] * (d + 1)
    for _ in range(iterations):
        z = F.lit(w[0])
        for j in range(d):
            z = z + F.lit(w[j + 1]) * F.col(f"_x{j+1}")
        err = _sigmoid(z) - F.col("_y")
        aggs = [
            F.sum(F.round(err, 6).cast("decimal(24,6)")).alias("_s0"),
            *[
                F.sum(
                    F.round(err * F.col(f"_x{j+1}"), 6).cast("decimal(24,6)")
                ).alias(f"_s{j+1}")
                for j in range(d)
            ],
            F.count(F.lit(1)).alias("_n"),
        ]
        row = feats.agg(*aggs).collect()[0]
        n = row["_n"]
        w = [
            w[i]
            - lr
            * (
                float(row[f"_s{i}"]) / n
                + (l2 * w[i] if (l2 and i > 0) else 0.0)
            )
            for i in range(d + 1)
        ]
    return w


def logreg_score(
    df: DataFrame, weights: list[float], features: list[Column]
) -> Column:
    """σ(w·x) as a column (rounded 6 dp) for the fitted weights."""
    z = F.lit(weights[0])
    for j, x in enumerate(features):
        z = z + F.lit(weights[j + 1]) * x.cast("double")
    return F.round(_sigmoid(z), 6)


def weights_frame(
    spark: SparkSession, weights: list[float], names: list[str]
) -> DataFrame:
    """``(feature, weight)`` frame for the fitted model (driver-side —
    the model IS metadata)."""
    rows = [("intercept", float(weights[0]))] + [
        (nm, float(wv)) for nm, wv in zip(names, weights[1:])
    ]
    return spark.createDataFrame(rows, "feature string, weight double")


def logreg_oracle_sql(
    feature_sql: list[str],
    label_sql: str,
    table: str,
    iterations: int = 5,
    lr: float = 0.25,
    feature_names: list[str] | None = None,
    l2: float = 0.0,
) -> str:
    """Unrolled DuckDB SQL reproducing ``logreg_fit`` exactly: one CTE
    per GD iteration (1-row weight relations cross-joined to the feature
    frame), identical expression shapes, identical 6-dp DECIMAL gradient
    sums, identical IEEE update arithmetic."""
    d = len(feature_sql)
    names = feature_names or [f"x{j+1}" for j in range(d)]
    xs = ", ".join(
        f"({sqlx}) AS x{j+1}" for j, sqlx in enumerate(feature_sql)
    )
    out = [f"WITH feat AS (SELECT ({label_sql}) AS y, {xs} FROM {table})"]
    zero = ", ".join(
        f"CAST(0.0 AS DOUBLE) AS w{i}" for i in range(d + 1)
    )
    out.append(f", it0 AS (SELECT {zero})")
    zexpr = " + ".join(
        ["p.w0"] + [f"p.w{j+1} * x{j+1}" for j in range(d)]
    )
    err = f"(1.0 / (1.0 + exp(-({zexpr}))) - y)"
    for t in range(1, iterations + 1):
        upd = []
        for i in range(d + 1):
            term = err if i == 0 else f"{err} * x{i}"
            reg = f" + {l2!r} * p.w{i}" if (l2 and i > 0) else ""
            upd.append(
                f"p.w{i} - {lr!r} * (CAST(sum(CAST(round({term}, 6) "
                f"AS DECIMAL(24,6))) AS DOUBLE) / count(*){reg}) AS w{i}"
            )
        gb = ", ".join(f"p.w{i}" for i in range(d + 1))
        out.append(
            f", it{t} AS (SELECT {', '.join(upd)} "
            f"FROM feat CROSS JOIN it{t-1} p GROUP BY {gb})"
        )
    final = [
        f"SELECT 'intercept' AS feature, w0 AS weight FROM it{iterations}"
    ] + [
        f"UNION ALL SELECT '{names[j]}', w{j+1} FROM it{iterations}"
        for j in range(d)
    ]
    return "\n".join(out) + "\n" + "\n".join(final)
