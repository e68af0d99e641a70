"""Composed corpus-curation pipeline — the filter funnel a training-data
run actually executes, as ONE lazy plan.

The reference pipelines chain independent per-record transformers
(etl-core/src/transformer.rs:18-94 feeding job steps,
etl-job/src/job.rs:141-210); this operator is the corpus-level analogue
for LLM data curation: language ID -> Gopher-style quality band -> exact
near-dup canonicalization, each stage reported as its own flag so the
funnel is auditable (which stage killed a document), with the final
``keep`` the conjunction.

Spark shape: the two filter stages are pure column expressions fused
into one codegen projection over a single scan (lang markers + quality
signals share the tokenization subtree); only the dedup stage shuffles —
ONE exchange of the narrow flag rows keyed by the md5 fingerprint, with
the canonical id resolved by a min-over-survivors window inside each
fingerprint group (a groupBy+join-back would consume the filter
projection twice — a second scan+projection unless exchange reuse
happens to fire — and pay a second exchange for the join). Text never
shuffles, no stage materializes an intermediate corpus. Fingerprint
groups are
duplicate-sets, so the window's per-group buffering is bounded by the
corpus's worst duplication factor (and spills, not OOMs, on a
pathological all-identical corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tools_rs_spark.functions import fingerprint
from etl_tools_rs_spark.operators.text import gopher_filter, lang_id


def curation_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    max_dup_word_frac: float = 0.6,
    max_top_word_frac: float = 0.12,
) -> DataFrame:
    """Per-document curation funnel flags.

    Returns one row per input row: ``(id_col, lang_pred, pass_lang,
    n_tokens, mean_token_len, dup_word_frac, top_word_frac,
    pass_quality, keep)`` where ``keep`` additionally requires the
    document to be the canonical (minimum-id) representative of its
    exact-content group *among stage survivors* — duplicates of a kept
    document, and documents whose only twin failed an earlier stage,
    both drop out exactly as a sequential filter chain would have it.
    """
    flagged = gopher_filter(
        df.select(id_col, text_col),
        text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_dup_word_frac=max_dup_word_frac,
        max_top_word_frac=max_top_word_frac,
    ).select(
        id_col,
        lang_id(text_col).alias("lang_pred"),
        "n_tokens",
        "mean_token_len",
        "dup_word_frac",
        "top_word_frac",
        F.col("keep").alias("pass_quality"),
        fingerprint(text_col).alias("_fp"),
    )
    flagged = flagged.withColumn(
        "pass_lang", F.col("lang_pred").isin(*allowed_langs)
    )
    # canonical representative per exact-content group, computed over the
    # SURVIVOR subset only (dedup runs after the cheap filters, as in a
    # real pipeline) — min-over-survivors window per fingerprint group so
    # the filter projection runs ONCE (see module docstring)
    from pyspark.sql import Window

    surv = F.col("pass_lang") & F.col("pass_quality")
    canon_id = F.min(F.when(surv, F.col(id_col))).over(
        Window.partitionBy("_fp")
    )
    keep = surv & (F.col(id_col) == canon_id)
    return flagged.select(
        id_col,
        "lang_pred",
        "pass_lang",
        "n_tokens",
        "mean_token_len",
        "dup_word_frac",
        "top_word_frac",
        "pass_quality",
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    allowed_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    max_dup_word_frac: float = 0.6,
    max_top_word_frac: float = 0.12,
) -> DataFrame:
    """One-row corpus data card: the summary a curation run reports
    before anyone commits GPU-hours to the corpus — document/token
    volume, allowed-language share, quality pass rate, and exact
    duplicate rate, in ONE aggregate over the same fused stage
    projection as :func:`curation_flags` (one scan; the only shuffle is
    the two-phase count-distinct on the 16-byte fingerprint). Ratios are
    floor-scaled to 4dp (engine convention — no half-way rounding
    boundary, bit-for-bit reproducible against the SQL oracle)."""
    flagged = gopher_filter(
        df.select(id_col, text_col),
        text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_dup_word_frac=max_dup_word_frac,
        max_top_word_frac=max_top_word_frac,
    ).select(
        "n_tokens",
        F.col("keep").alias("pass_quality"),
        lang_id(text_col).isin(*allowed_langs).alias("pass_lang"),
        fingerprint(text_col).alias("_fp"),
    )
    n = F.count(F.lit(1))
    r4 = lambda num, den: (  # noqa: E731 — floor-based 4dp ratio
        F.floor(F.lit(10000.0) * num / F.greatest(den, F.lit(1))) / 10000.0
    ).cast("double")
    return flagged.agg(
        n.cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_total"),
        r4(F.sum("n_tokens"), n).alias("avg_doc_tokens"),
        r4(F.sum(F.when(F.col("pass_lang"), 1).otherwise(0)), n).alias(
            "lang_share"
        ),
        r4(F.sum(F.when(F.col("pass_quality"), 1).otherwise(0)), n).alias(
            "quality_pass_rate"
        ),
        r4(n - F.count_distinct(F.col("_fp")), n).alias("exact_dup_rate"),
    )


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """One-row funnel summary: survivor counts after each stage
    (``n_total >= n_lang >= n_quality >= n_kept``). Derived from
    :func:`curation_flags` by a single aggregate — the flags plan runs
    once, the counts are conditional sums over it."""
    flags = curation_flags(df, text_col, id_col, **kwargs)
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        cnt(F.col("pass_lang")).alias("n_lang"),
        cnt(F.col("pass_lang") & F.col("pass_quality")).alias("n_quality"),
        cnt(F.col("keep")).alias("n_kept"),
    )
