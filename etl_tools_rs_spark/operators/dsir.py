"""DSIR: data selection with importance resampling (Xie et al., 2023).

The standard recipe for "make my 100 TB crawl look like this curated
target corpus": fit two bag-of-hashed-ngram unigram models — one on the
TARGET (the distribution you want) and one on the RAW corpus (what you
have) — then weight every raw document by its log likelihood ratio
log p_target(doc) − log p_raw(doc) and resample proportionally. Feature
hashing is the part that makes it a 100 TB operator: the model is a
FIXED-SIZE bucket table (``num_buckets`` rows, a broadcast), never a
corpus-sized vocabulary, no matter how big either side grows.

Numeric policy (the engine's exact-accumulation convention — see
``profile.rater_agreement``, ``lm.bigram_score``): per-bucket log ratios
are quantized ONCE to integer micro-units (``floor(10^scale · (ln p −
ln q))`` as BIGINT), so every per-document sum is exact integer
arithmetic — order-independent under any partitioning, bit-identical in
any engine — and only the final display value divides. Gumbel keys for
the resample step quantize the same way, with the uniform drawn from
the portable 60-bit md5 hash (``sketch.kmv_hash``), so selection is
deterministic and a SQL engine replays it value-for-value.

Reference parity note: the reference engine (ytitov/etl-tools-rs) has no
data-selection surface (its transforms are row-wise, etl-core/src/
transformer.rs); this is extension surface for the LLM-curation brief,
implemented from the public paper (arXiv:2302.03169).

At 100 TB: one explode+count over each corpus (map-side combined), one
(doc, bucket) aggregate bounded by distinct doc-bucket pairs, a
``num_buckets``-row broadcast, one per-doc sum. The target side is
typically sample-sized; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.functions import tokens
from etl_tools_rs_spark.operators.sketch import TWO_POW_60, kmv_hash


def hashed_ngram_buckets(
    text: Column, num_buckets: int, ngram_n: int = 2
) -> Column:
    """Array of hashed feature buckets for a document: whitespace
    unigrams plus space-joined n-grams up to ``ngram_n``, each mapped to
    ``kmv_hash(gram) % num_buckets``. Pure column functions — the
    feature extractor never leaves codegen."""
    toks = tokens(text)
    grams = [toks]
    for n in range(2, ngram_n + 1):
        # zip_with pads the shorter side with null -> the trailing
        # (n-1) windows concat to null and are filtered out
        shifted = [F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(0)))
                   for i in range(1, n)]
        g = toks
        for s in shifted:
            g = F.zip_with(g, s, lambda a, b: F.concat_ws(" ", a, b))
        # a window that ran off the end has fewer than n tokens: its
        # concat_ws silently dropped the null, so token count < n
        g = F.filter(
            g, lambda x: F.size(F.split(x, " ")) == n
        )
        grams.append(g)
    allg = grams[0]
    for g in grams[1:]:
        allg = F.concat(allg, g)
    return F.transform(allg, lambda g: kmv_hash(g) % F.lit(num_buckets))


def dsir_bucket_weights(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    num_buckets: int = 1024,
    ngram_n: int = 2,
    smoothing: float = 0.5,
    scale: int = 6,
    target_filter: Column | None = None,
) -> DataFrame:
    """The fitted model: one row per feature bucket with target/raw
    counts and the quantized log likelihood ratio.

    Output ``(bucket, n_target, n_raw, lr_micro)`` — ``lr_micro`` is
    ``floor(10^scale · (ln p_target − ln p_raw))`` as BIGINT, where each
    probability is add-λ smoothed over the FIXED bucket domain:
    ``p = (c + λ) / (N + λ·num_buckets)``. Every bucket in
    ``[0, num_buckets)`` is present (zero counts smoothed), so the
    per-document join below never drops a feature.

    ``target_filter`` (r9) is the FUSED fit for the common shape where
    the target slice is a row filter of ``raw`` (e.g. ``lang = 'en'``):
    pass the predicate (and ``target=None``) and BOTH bucket count
    vectors come out of ONE gram-hash pass over ``raw`` — the raw count
    counts every exploded gram, the target count sums an indicator
    evaluated on the source row before the explode. Identical integers
    to the two-frame path (``n_target`` over pred-true rows ==
    counts(raw.filter(pred)); pinned by a unit test): the per-gram
    md5-family ``kmv_hash`` is the dominant fit cost, and the two-frame
    path pays it once for the corpus and again for the target slice.
    """
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing!r}")
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets!r}")
    if (target is None) == (target_filter is None):
        raise ValueError(
            "exactly one of target / target_filter must be provided"
        )
    lam = float(smoothing)
    p10 = float(10**scale)

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    hashed_ngram_buckets(F.col(text_col), num_buckets, ngram_n)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    spark = raw.sparkSession
    domain = spark.range(num_buckets).select(F.col("id").alias("bucket"))
    if target_filter is not None:
        # one explode pass; the indicator is evaluated on the source row
        # (before the generator), so a NULL predicate counts as not-target
        # exactly like filter() would drop the row
        fused = (
            raw.select(
                F.explode(
                    hashed_ngram_buckets(F.col(text_col), num_buckets, ngram_n)
                ).alias("bucket"),
                F.when(target_filter, F.lit(1)).otherwise(F.lit(0)).alias("_t"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_raw"),
                F.sum("_t").cast("bigint").alias("n_target"),
            )
        )
        tab = domain.join(fused, "bucket", "left").select(
            "bucket",
            F.coalesce("n_target", F.lit(0)).cast("bigint").alias("n_target"),
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n_raw"),
        )
        return _bucket_weights_from_counts(tab, lam, num_buckets, p10)
    ct, cr = counts(target, "n_target"), counts(raw, "n_raw")
    tab = (
        domain.join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_target", F.lit(0)).cast("bigint").alias("n_target"),
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n_raw"),
        )
    )
    return _bucket_weights_from_counts(tab, lam, num_buckets, p10)


def _bucket_weights_from_counts(
    tab: DataFrame, lam: float, num_buckets: int, p10: float
) -> DataFrame:
    """Quantized log-ratio over a complete ``(bucket, n_target, n_raw)``
    table — shared by the fused and two-frame fit paths, so their
    outputs differ only in how the counts were scanned (never in what
    they are)."""
    totals = tab.agg(
        F.sum("n_target").cast("double").alias("_nt"),
        F.sum("n_raw").cast("double").alias("_nr"),
    )
    lp = F.log(
        (F.col("n_target").cast("double") + F.lit(lam))
        / (F.col("_nt") + F.lit(lam * num_buckets))
    )
    lq = F.log(
        (F.col("n_raw").cast("double") + F.lit(lam))
        / (F.col("_nr") + F.lit(lam * num_buckets))
    )
    return tab.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "n_target",
        "n_raw",
        F.floor(F.lit(p10) * (lp - lq)).cast("bigint").alias("lr_micro"),
    )


def _log_weights_micro(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str,
    id_col: str,
    num_buckets: int,
    ngram_n: int,
    smoothing: float,
    scale: int,
    target_filter: Column | None = None,
) -> DataFrame:
    """(id_col, n_feats, _lw_micro) — the exact-integer accumulation
    shared by :func:`dsir_log_weights` (which divides for display) and
    :func:`dsir_sample` (which keys on the micro value directly, no
    float round-trip)."""
    weights = dsir_bucket_weights(
        raw, target, text_col, num_buckets, ngram_n, smoothing, scale,
        target_filter=target_filter,
    ).select("bucket", "lr_micro")
    feats = raw.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), num_buckets, ngram_n)
        ).alias("bucket"),
    )
    per_doc_bucket = feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    # num_buckets rows — always a broadcast, never a shuffle of the corpus
    joined = per_doc_bucket.join(F.broadcast(weights), "bucket", "left")
    return joined.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("bucket").isNotNull(), F.col("_c")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_feats"),
        F.sum(F.coalesce(F.col("_c") * F.col("lr_micro"), F.lit(0)))
        .cast("bigint")
        .alias("_lw_micro"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    ngram_n: int = 2,
    smoothing: float = 0.5,
    scale: int = 6,
    target_filter: Column | None = None,
) -> DataFrame:
    """Per-document importance weights: ``(id_col, n_feats,
    log_weight)`` where ``log_weight = Σ_buckets c_doc[b] · lr[b]`` —
    accumulated entirely in integer micro-units (exact under any
    partitioning) and divided once for display. Higher = more
    target-like. Documents with zero features get log_weight 0.0.
    ``target_filter`` selects the fused one-pass fit (see
    :func:`dsir_bucket_weights`)."""
    p10 = float(10**scale)
    return _log_weights_micro(
        raw, target, text_col, id_col, num_buckets, ngram_n, smoothing,
        scale, target_filter=target_filter,
    ).select(
        id_col,
        "n_feats",
        (F.col("_lw_micro") / F.lit(p10)).cast("double").alias("log_weight"),
    )


def dsir_model_vector(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    num_buckets: int = 1024,
    ngram_n: int = 2,
    smoothing: float = 0.5,
    scale: int = 6,
    target_filter: Column | None = None,
) -> list[int]:
    """Fit and COLLECT the model as a dense ``num_buckets``-long list of
    integer micro-unit log-ratios (index = bucket). The model is
    driver-sized by construction (kB for the default 1024 buckets) —
    this is the fit-once-offline artifact that :func:`dsir_score` ships
    into a plan as a literal, the same vocab-in-closure pattern as the
    BPE/unigram tokenizers."""
    rows = (
        dsir_bucket_weights(
            raw, target, text_col, num_buckets, ngram_n, smoothing, scale,
            target_filter=target_filter,
        )
        .select("bucket", "lr_micro")
        .collect()
    )
    lr = [0] * num_buckets
    for r in rows:
        lr[r["bucket"]] = r["lr_micro"]
    return lr


def dsir_score(
    df: DataFrame,
    lr_micro: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 2,
    scale: int = 6,
) -> DataFrame:
    """Score documents against a PRE-FIT model (the deployment shape:
    fit offline on a sample, score the 100 TB corpus — or a live
    stream). Entirely ROW-LOCAL: features hash in codegen, the model is
    an array literal indexed by ``element_at``, and the per-doc sum is
    one ``aggregate`` fold over the feature array — no shuffle, no
    state, so the same expression scores a STREAMING DataFrame
    unchanged (stateless stage). Output matches
    :func:`dsir_log_weights`: ``(id_col, n_feats, log_weight)``, and
    equality with the join-based path is pinned in tests."""
    num_buckets = len(lr_micro)
    if num_buckets < 2:
        raise ValueError(f"model must have >= 2 buckets, got {num_buckets}")
    p10 = float(10**scale)
    model = F.array(*[F.lit(int(v)).cast("long") for v in lr_micro])
    # NULL text scores like empty text (0 features, weight 0.0) — matches
    # dsir_log_weights' explode_outer arm
    feats = F.coalesce(
        hashed_ngram_buckets(F.col(text_col), num_buckets, ngram_n),
        F.array().cast("array<bigint>"),
    )
    lw_micro = F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(model, (b + 1).cast("int")),
    )
    return df.select(
        F.col(id_col),
        F.size(feats).cast("bigint").alias("n_feats"),
        (lw_micro / F.lit(p10)).cast("double").alias("log_weight"),
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame | None,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    ngram_n: int = 2,
    smoothing: float = 0.5,
    scale: int = 6,
    target_filter: Column | None = None,
) -> DataFrame:
    """Importance RESAMPLING: draw ``k`` documents without replacement
    with probability ∝ exp(log_weight), via the Gumbel-top-k identity —
    ``argtop_k(log w_i + g_i)`` with i.i.d. Gumbel noise is exactly a
    weighted sample. The Gumbel draw is deterministic: ``u`` comes from
    the portable 60-bit content hash of the document id, so the sample
    is stable across runs/partitionings and replayable by any engine
    with md5. Keys are quantized to integer micro-units and ties break
    on id — fully deterministic. Output: ``(id_col, n_feats,
    log_weight, gumbel_key)`` for the selected k, descending key.

    One corpus-wide top-k (TakeOrdered — no full sort, no single
    partition)."""
    lw = _log_weights_micro(
        raw, target, text_col, id_col, num_buckets, ngram_n, smoothing,
        scale, target_filter=target_filter,
    )
    p10 = float(10**scale)
    # u in (0,1): (h+1) / (2^60+1) never hits 0 or 1 -> both logs finite
    u = (kmv_hash(F.col(id_col).cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(TWO_POW_60 + 1))
    g_micro = F.floor(F.lit(p10) * -F.log(-F.log(u))).cast("bigint")
    keyed = lw.select(
        id_col,
        "n_feats",
        "_lw_micro",
        (F.col("_lw_micro") + g_micro).alias("_key_micro"),
    )
    return (
        keyed.orderBy(F.col("_key_micro").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "n_feats",
            (F.col("_lw_micro") / F.lit(p10)).cast("double").alias(
                "log_weight"
            ),
            (F.col("_key_micro") / F.lit(p10)).cast("double").alias(
                "gumbel_key"
            ),
        )
    )
