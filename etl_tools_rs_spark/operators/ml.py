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


def binary_metrics(
    df: DataFrame,
    label: Column,
    score: Column,
    threshold: float = 0.5,
    score_decimals: int = 6,
    scale: int = 6,
) -> DataFrame:
    """Classifier evaluation in ONE pass + one sketch-sized window: exact
    tie-aware AUC (Mann-Whitney rank-sum identity) and threshold
    confusion metrics — the evaluate step after ``logreg_fit`` /
    ``logreg_score`` (fit -> score -> EVALUATE closes the curation-
    classifier loop).

    AUC uses the average-rank identity: group rows by (rounded) score,
    rank blocks by cumulative counts, then
    ``AUC = (Σ_s np_s·(2·cum_before_s + m_s + 1) − n_pos·(n_pos+1))
    / (2·n_pos·n_neg)`` — everything integer/decimal until the final
    division, so the value is add-order-proof and oracle-exact.

    Scale: the corpus is touched by exactly two aggregates (confusion
    counts; per-score counts). The running-count window runs over the
    DISTINCT-SCORE table, whose size ``score_decimals`` bounds at
    10^decimals for [0,1] scores (≤1M rows at the default 6) — sketch-
    sized, never corpus-sized; the single-partition window is justified
    by that bound (same contract as the histogram-CDF quantile window).

    Returns one row: ``(n, n_pos, n_neg, tp, fp, tn, fn, prec, rec, f1,
    acc, auc)``; ratio metrics floor-scaled to ``scale`` decimals, NULL
    when undefined (no positives, empty predicted-positive set, ...).
    """
    from pyspark.sql.window import Window

    p = float(10**scale)
    thr = float(threshold)
    base = df.select(
        label.cast("int").alias("_y"),
        F.round(score.cast("double"), score_decimals).alias("_s"),
    )
    conf = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").cast("long").alias("_npos"),
        F.sum(F.when(F.col("_s") >= thr, F.col("_y")).otherwise(0))
        .cast("long")
        .alias("_tp"),
        F.sum(F.when(F.col("_s") >= thr, 1 - F.col("_y")).otherwise(0))
        .cast("long")
        .alias("_fp"),
    )
    grouped = base.groupBy("_s").agg(
        F.sum("_y").cast("long").alias("_gp"),
        F.count(F.lit(1)).alias("_m"),
    )
    w = (
        Window.orderBy(F.col("_s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = grouped.select(
        (
            F.col("_gp").cast("decimal(38,0)")
            * (
                F.lit(2) * F.coalesce(F.sum("_m").over(w), F.lit(0))
                + F.col("_m")
                + F.lit(1)
            ).cast("decimal(38,0)")
        ).alias("_c2")
    )
    aucrow = contrib.agg(F.sum("_c2").alias("_sum2"))

    def ratio(num: Column, den: Column) -> Column:
        return F.floor(F.lit(p) * (num / den)) / F.lit(p)

    npos_d = F.col("_npos").cast("double")
    nneg = F.col("_n") - F.col("_npos")
    nneg_d = nneg.cast("double")
    tp_d = F.col("_tp").cast("double")
    fp_d = F.col("_fp").cast("double")
    prec_raw = tp_d / (tp_d + fp_d)
    rec_raw = tp_d / npos_d
    return conf.crossJoin(F.broadcast(aucrow)).select(
        F.col("_n").alias("n"),
        F.col("_npos").alias("n_pos"),
        nneg.cast("long").alias("n_neg"),
        F.col("_tp").alias("tp"),
        F.col("_fp").alias("fp"),
        (nneg - F.col("_fp")).cast("long").alias("tn"),
        (F.col("_npos") - F.col("_tp")).cast("long").alias("fn"),
        F.when(F.col("_tp") + F.col("_fp") > 0, ratio(tp_d, tp_d + fp_d))
        .cast("double")
        .alias("prec"),
        F.when(F.col("_npos") > 0, ratio(tp_d, npos_d))
        .cast("double")
        .alias("rec"),
        F.when(
            (F.col("_tp") + F.col("_fp") > 0)
            & (F.col("_npos") > 0)
            & (F.col("_tp") > 0),
            ratio(
                F.lit(2.0) * prec_raw * rec_raw, prec_raw + rec_raw
            ),
        )
        .cast("double")
        .alias("f1"),
        ratio(
            (F.col("_tp") + nneg - F.col("_fp")).cast("double"),
            F.col("_n").cast("double"),
        )
        .cast("double")
        .alias("acc"),
        F.when(
            (F.col("_npos") > 0) & (nneg > 0),
            F.floor(
                F.lit(p)
                * (
                    (
                        F.col("_sum2").cast("double")
                        - npos_d * (npos_d + F.lit(1.0))
                    )
                    / (F.lit(2.0) * npos_d * nneg_d)
                )
            )
            / F.lit(p),
        )
        .cast("double")
        .alias("auc"),
    )


def binary_metrics_oracle_sql(
    label_sql: str,
    score_sql: str,
    table: str,
    threshold: float = 0.5,
    score_decimals: int = 6,
    scale: int = 6,
) -> str:
    """DuckDB oracle mirroring ``binary_metrics`` exactly: identical
    rounding, identical integer rank-sum arithmetic, identical double
    expression shapes (``p * (a/b)`` parenthesization) for the final
    ratios."""
    p = f"{float(10 ** scale):.1f}"
    return f"""
WITH base AS (
  SELECT CAST(({label_sql}) AS INT) AS y,
         round(CAST(({score_sql}) AS DOUBLE), {score_decimals}) AS s
  FROM {table}
), conf AS (
  SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS npos,
         CAST(sum(CASE WHEN s >= {threshold!r} THEN y ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s >= {threshold!r} THEN 1 - y ELSE 0 END) AS BIGINT) AS fp
  FROM base
), g AS (
  SELECT s, CAST(sum(y) AS BIGINT) AS gp, count(*) AS m
  FROM base GROUP BY s
), r AS (
  SELECT CAST(gp AS DECIMAL(38,0)) *
         CAST(2 * COALESCE(sum(m) OVER (ORDER BY s ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + m + 1 AS DECIMAL(38,0)) AS c2
  FROM g
), a AS (SELECT sum(c2) AS sum2 FROM r)
SELECT n, npos AS n_pos, n - npos AS n_neg, tp, fp,
       (n - npos) - fp AS tn, npos - tp AS fn,
       CASE WHEN tp + fp > 0 THEN
         FLOOR({p} * (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)))) / {p}
       END AS prec,
       CASE WHEN npos > 0 THEN
         FLOOR({p} * (CAST(tp AS DOUBLE) / CAST(npos AS DOUBLE))) / {p}
       END AS rec,
       CASE WHEN tp + fp > 0 AND npos > 0 AND tp > 0 THEN
         FLOOR({p} * (2.0 * (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)))
                          * (CAST(tp AS DOUBLE) / CAST(npos AS DOUBLE))
                      / ((CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)))
                         + (CAST(tp AS DOUBLE) / CAST(npos AS DOUBLE))))) / {p}
       END AS f1,
       FLOOR({p} * (CAST(tp + (n - npos) - fp AS DOUBLE) / CAST(n AS DOUBLE))) / {p} AS acc,
       CASE WHEN npos > 0 AND n - npos > 0 THEN
         FLOOR({p} * ((CAST(sum2 AS DOUBLE) - CAST(npos AS DOUBLE) * (CAST(npos AS DOUBLE) + 1.0))
                      / (2.0 * CAST(npos AS DOUBLE) * CAST(n - npos AS DOUBLE)))) / {p}
       END AS auc
FROM conf, a
"""


def calibration_bins(
    df: DataFrame,
    label: Column,
    score: Column,
    n_bins: int = 10,
    score_decimals: int = 6,
    scale: int = 6,
) -> DataFrame:
    """Reliability diagram for a probabilistic classifier — the
    calibration companion to :func:`binary_metrics` (AUC ranks, it
    cannot see that a 0.9 score wins only 60% of the time): bucket
    scores into ``n_bins`` equal-width bins and report, per bin, the
    observed positive rate vs the mean claimed score, plus the bin's
    Expected-Calibration-Error contribution
    ``(n_b/N)·|frac_pos_b − mean_score_b|`` — sum the ``ece_term``
    column for ECE.

    One corpus aggregate (bin-keyed, map-side combined; shuffle =
    n_bins rows) + a 1-row total broadcast. Scores are quantized to
    ``score_decimals`` and summed as exact decimals, so bin means are
    add-order-proof; ratios floor-scale to ``scale`` decimals at the
    very end. Output: ``(bin, n, frac_pos, mean_score, ece_term)``,
    empty bins absent (their ECE term is zero).
    """
    p = float(10**scale)
    base = df.select(
        label.cast("int").alias("_y"),
        F.round(score.cast("double"), score_decimals).alias("_s"),
    )
    binned = base.withColumn(
        "_b",
        F.greatest(
            F.least(
                F.floor(F.col("_s") * n_bins).cast("int"), F.lit(n_bins - 1)
            ),
            F.lit(0),
        ),
    )
    per = binned.groupBy("_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").cast("long").alias("_pos"),
        F.sum(F.col("_s").cast(f"decimal(18,{score_decimals})")).alias("_ss"),
    )
    tot = per.agg(F.sum("n").alias("_N"))

    def fs(c: Column) -> Column:
        return F.floor(F.lit(p) * c) / F.lit(p)

    frac = F.col("_pos").cast("double") / F.col("n").cast("double")
    mean = F.col("_ss").cast("double") / F.col("n").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))  # 1-row scalar fold
        .select(
            F.col("_b").alias("bin"),
            "n",
            fs(frac).alias("frac_pos"),
            fs(mean).alias("mean_score"),
            fs(
                (F.col("n").cast("double") / F.col("_N").cast("double"))
                * F.abs(frac - mean)
            ).alias("ece_term"),
        )
        .orderBy("bin")
    )


def calibration_oracle_sql(
    label_sql: str,
    score_sql: str,
    table: str,
    n_bins: int = 10,
    score_decimals: int = 6,
    scale: int = 6,
) -> str:
    """DuckDB oracle mirroring ``calibration_bins`` exactly — identical
    quantization, identical decimal bin sums, identical double
    expression shapes before the one floor-scale per output column."""
    p = f"{float(10 ** scale):.1f}"
    return f"""
WITH base AS (
  SELECT CAST(({label_sql}) AS INT) AS y,
         round(CAST(({score_sql}) AS DOUBLE), {score_decimals}) AS s
  FROM {table}
), binned AS (
  SELECT y, s,
         GREATEST(LEAST(CAST(FLOOR(s * {n_bins}) AS INT), {n_bins - 1}), 0) AS b
  FROM base
), per AS (
  SELECT b, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
         sum(CAST(s AS DECIMAL(18,{score_decimals}))) AS ss
  FROM binned GROUP BY b
), t AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM per)
SELECT b AS bin, n,
       FLOOR({p} * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))) / {p} AS frac_pos,
       FLOOR({p} * (CAST(ss AS DOUBLE) / CAST(n AS DOUBLE))) / {p} AS mean_score,
       FLOOR({p} * ((CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE))
              * abs(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)))) / {p} AS ece_term
FROM per, t
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes — the bag-of-words curation classifier
# ---------------------------------------------------------------------------


class NaiveBayesModel:
    """Fitted multinomial NB: lazy count frames + smoothing constant.

    The model IS two DataFrames of exact integer counts — per-(label,
    token) occurrence counts and per-label document counts. Nothing is
    collected at fit time; log-probabilities derive lazily at scoring so
    fit → score composes into one Catalyst plan.
    """

    def __init__(
        self, token_counts: DataFrame, doc_counts: DataFrame, alpha: float = 0.5
    ):
        self.token_counts = token_counts  # (label, tok, c bigint)
        self.doc_counts = doc_counts  # (label, nd bigint)
        self.alpha = alpha


def nb_fit(
    train: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    alpha: float = 0.5,
) -> NaiveBayesModel:
    """Fit a multinomial Naive Bayes text classifier (the fastText-style
    curation move: cheap bag-of-words classifier for language / quality /
    domain routing — Joulin et al. 2016 use a linear BoW model for
    exactly this job; NB is its counting-only sibling).

    No reference equivalent (extension surface). Everything is a
    relational aggregate over exact integers: token counts per (label,
    token) shuffle once (map-side combined), document priors are one
    label-keyed aggregate. At 100 TB the model is vocab×labels-sized —
    orders of magnitude smaller than the corpus — and fit is a single
    corpus scan.
    """
    if not (0.0 < alpha):
        raise ValueError(f"alpha must be > 0, got {alpha!r}")
    from etl_tools_rs_spark.operators.lm import LM_TOKEN_PATTERN

    # tokenize with the label carried along — no id join needed, the
    # count aggregate is the only shuffle and it's map-side combined
    toks = train.select(
        F.col(label_col).alias("label"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(LM_TOKEN_PATTERN), 0
            )
        ).alias("tok"),
    )
    tc = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    dc = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    return NaiveBayesModel(tc, dc, alpha)


def _nb_label_stats(model: NaiveBayesModel) -> DataFrame:
    """(label, prior_lp, t, v) — per-label log-prior, token total, and
    the global vocab size folded in via 1-row broadcasts. Label-count-
    sized: always broadcastable."""
    tot = model.token_counts.groupBy("label").agg(F.sum("c").alias("t"))
    voc = model.token_counts.agg(F.countDistinct("tok").alias("v"))
    nd_tot = model.doc_counts.agg(F.sum("nd").alias("n"))
    return (
        model.doc_counts.join(tot, "label", "left")
        .na.fill({"t": 0})
        .crossJoin(F.broadcast(voc))
        .crossJoin(F.broadcast(nd_tot))
        .select(
            "label",
            F.round(
                F.log(F.col("nd").cast("double") / F.col("n")), 6
            ).alias("prior_lp"),
            "t",
            "v",
        )
    )


def nb_score(
    df: DataFrame,
    model: NaiveBayesModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, label) NB log-posterior:
    ``(id, label, score_dec decimal, n_tokens bigint)`` where
    ``score_dec = round6(ln prior) + Σ_tok round6(ln p(tok|label))``
    summed as exact DECIMAL (add-order-proof, same policy as lm.py).
    Out-of-vocabulary tokens get the per-label smoothed mass
    ``α/(T_label + α·V)``; documents with zero tokens yield no row.

    Shape at scale: tokens shuffle once to join the model (label
    fan-out is ×|labels| — bounded, labels are a small closed set),
    then one (id, label)-keyed aggregate, all map-side combined. The
    per-label stats frame is |labels| rows — broadcast.
    """
    from etl_tools_rs_spark.operators.lm import lm_tokens

    a = model.alpha
    toks = lm_tokens(df, text_col, id_col)
    stats = _nb_label_stats(model)
    denom = F.col("t") + F.lit(a) * F.col("v")
    scored = (
        toks.crossJoin(F.broadcast(stats))
        .join(model.token_counts, ["tok", "label"], "left")
        .select(
            id_col,
            "label",
            "prior_lp",
            F.when(
                F.col("c").isNotNull(),
                F.round(F.log((F.col("c") + F.lit(a)) / denom), 6),
            )
            .otherwise(F.round(F.log(F.lit(a) / denom), 6))
            .alias("lp"),
        )
    )
    return scored.groupBy(id_col, "label").agg(
        (
            F.first("prior_lp").cast("decimal(20,6)")
            + F.sum(F.col("lp").cast("decimal(20,6)"))
        ).alias("score_dec"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )


def nb_predict(
    df: DataFrame,
    model: NaiveBayesModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Argmax over :func:`nb_score`:
    ``(id, pred_label, score double, margin double, n_tokens)`` —
    ``margin`` is best-minus-runner-up log-posterior (decision
    confidence; 0-margin ties break on label ascending, deterministic
    because scores are exact decimals). The ranking window partitions by
    document (|labels| rows per partition key — never a single-partition
    window)."""
    from pyspark.sql import Window

    sc = nb_score(df, model, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_dec").desc(), F.col("label").asc()
    )
    ranked = sc.select(
        id_col,
        "label",
        "score_dec",
        "n_tokens",
        F.row_number().over(w).alias("_rn"),
        F.lead("score_dec").over(w).alias("_next"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        id_col,
        F.col("label").alias("pred_label"),
        F.round(F.col("score_dec").cast("double"), 6).alias("score"),
        F.round(
            F.coalesce(
                (F.col("score_dec") - F.col("_next")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("margin"),
        "n_tokens",
    )


def nb_self_predict_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    include_actual: bool = False,
) -> str:
    """DuckDB oracle for the self-train-self-predict query: identical
    tokenization, smoothing, 6-dp rounding, exact DECIMAL sums, and the
    same (score DESC, label ASC) argmax. ``include_actual=True`` joins
    the true label back on for the evaluation form (adds
    ``actual_<label_col>`` and ``is_correct``)."""
    from etl_tools_rs_spark.operators.lm import LM_TOKEN_PATTERN

    eval_cols = (
        f""",
       d.{label_col} AS actual_{label_col},
       (r.label = d.{label_col}) AS is_correct"""
        if include_actual
        else ""
    )
    eval_join = (
        f" JOIN {table} d USING ({id_col})" if include_actual else ""
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}),
                          '{LM_TOKEN_PATTERN}')) AS tok
  FROM {table}
), lab AS (
  SELECT {id_col}, {label_col} AS label FROM {table}
), tc AS (
  SELECT l.label, t.tok, count(*) AS c
  FROM toks t JOIN lab l USING ({id_col}) GROUP BY 1, 2
), prior AS (
  SELECT label, count(*) AS nd FROM lab GROUP BY label
), nd_tot AS (SELECT sum(nd) AS n FROM prior),
voc AS (SELECT count(DISTINCT tok) AS v FROM tc),
tot AS (SELECT label, sum(c) AS t FROM tc GROUP BY label),
stats AS (
  SELECT p.label, round(ln(CAST(p.nd AS DOUBLE) / n.n), 6) AS prior_lp,
         COALESCE(tt.t, 0) AS t, v.v AS v
  FROM prior p CROSS JOIN nd_tot n LEFT JOIN tot tt USING (label)
  CROSS JOIN voc v
), scored AS (
  SELECT tk.{id_col}, s.label, s.prior_lp,
         CASE WHEN tc.c IS NOT NULL
              THEN round(ln((tc.c + {alpha}) / (s.t + {alpha} * s.v)), 6)
              ELSE round(ln({alpha} / (s.t + {alpha} * s.v)), 6)
         END AS lp
  FROM toks tk CROSS JOIN stats s
  LEFT JOIN tc ON tc.tok = tk.tok AND tc.label = s.label
), agg AS (
  SELECT {id_col}, label,
         CAST(any_value(prior_lp) AS DECIMAL(20,6))
           + sum(CAST(lp AS DECIMAL(20,6))) AS score_dec,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM scored GROUP BY 1, 2
), ranked AS (
  SELECT {id_col}, label, score_dec, n_tokens,
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY score_dec DESC, label ASC) AS rn,
         lead(score_dec) OVER (PARTITION BY {id_col}
                               ORDER BY score_dec DESC, label ASC) AS nxt
  FROM agg
)
SELECT r.{id_col}, r.label AS pred_label,
       round(CAST(score_dec AS DOUBLE), 6) AS score,
       round(COALESCE(CAST(score_dec - nxt AS DOUBLE), 0.0), 6) AS margin,
       n_tokens{eval_cols}
FROM ranked r{eval_join} WHERE rn = 1
"""
